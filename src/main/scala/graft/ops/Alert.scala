package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Coupon-fraud alert pipeline — batch analog of the reference's sliding
  * window alert job.
  *
  * Reference semantics reproduced (citations into /root/reference/):
  *  - 5-minute window keyed by device:
  *    gmall-realtime/src/main/scala/com/atguigu/app/AlertApp.scala:39-41
  *  - per-device distinct uid/item collection for coupon events (A7):
  *    AlertApp.scala:43-59
  *  - veto: ANY clickItem in the window disqualifies the device (A8):
  *    AlertApp.scala:49-61
  *  - threshold: ≥ 3 distinct uids (A9): AlertApp.scala:62
  *  - ≤ 1 alert per device per minute via ES doc-id `mid + ts/1000/60` (T6):
  *    AlertApp.scala:74
  *
  * Mapping (FIXTURES.md §3): user_id ≙ mid, props.k ≙ uid,
  * event_type 'purchase' ≙ "coupon", 'click' ≙ "clickItem".
  *
  * Scale design: one hash aggregate keyed (window, user_id); collect_set is
  * bounded by the distinct-uid cardinality per device-window (small), and
  * the veto/threshold are partial-aggregatable (max / count distinct), so
  * the shuffle carries compact per-key state. The streaming variant
  * (graft.streaming.Pipelines.alerts) runs the same aggregate incrementally
  * with a watermark instead of re-scanning the window per batch.
  */
object Alert {

  /** Windowed alerts (A7+A8+A9 over T2's window, batch tumbling analog).
    * `ws` is the window start in epoch seconds. The reference runs a 5-min
    * window with a ≥3-uid threshold (AlertApp.scala:39,62); the registered
    * defaults widen to a 1-day window / ≥2 uids so the synthetic event
    * density actually produces alerts — the unit tests pin the reference's
    * exact 5-min/3-uid parameters on literal data. */
  def alerts(spark: SparkSession, dir: String,
             windowSec: Long = 86400L, minUids: Int = 2): DataFrame =
    Tables.events(spark, dir)
      .select(
        (unix_micros(col("ts")).divide(lit(1000000L)).cast("long")
          .divide(lit(windowSec)).cast("long") * windowSec).as("ws"),
        col("user_id"),
        col("event_type"),
        get_json_object(col("props"), "$.k").as("uid"))
      .groupBy("ws", "user_id")
      .agg(
        array_sort(collect_set(when(col("event_type") === "purchase", col("uid"))))
          .as("uids_arr"),
        max(when(col("event_type") === "click", 1).otherwise(0)).as("clicked"),
        array_sort(collect_set(col("event_type"))).as("events_arr"))
      .filter(size(col("uids_arr")) >= minUids && col("clicked") === 0)
      .select(
        col("ws"),
        col("user_id"),
        array_join(col("uids_arr"), ",").as("uids"),
        size(col("uids_arr")).cast("long").as("uid_ct"),
        array_join(col("events_arr"), ",").as("events"))
      .orderBy("ws", "user_id")

  /** T2 batch analog with a true SLIDING window: 10-minute windows
    * sliding every 5 (the reference slides its 5-min window every 3 s
    * batch, AlertApp.scala:39). Spark's `window()` explodes each event
    * into its dur/slide containing windows — here exactly 2. */
  def slidingWindowCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("ct"),
        countDistinct(col("user_id")).as("users"))
      .select(unix_seconds(col("w.start")).as("ws"), col("ct"), col("users"))
      .orderBy("ws")

  /** T6 analog: per-device activity collapsed to one row per minute —
    * count of distinct active minutes per device. */
  def activeMinutes(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("user_id"),
        (unix_micros(col("ts")).divide(lit(60000000L)).cast("long")).as("minute_bucket"))
      .distinct()
      .groupBy("user_id")
      .agg(count(lit(1)).as("active_minutes"))
      .orderBy("user_id")
}
