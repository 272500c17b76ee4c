package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event sessionization + the literal per-batch full-outer join.
  *
  * Sessions extend the reference's event-analytics surface with the
  * standard gap-based session operator (Spark `session_window`, which
  * also runs incrementally under Structured Streaming with a watermark —
  * the T2/T3 machinery generalized to data-driven windows). A new
  * session starts when the gap to the previous event is ≥ the gap
  * parameter (matching Spark's merge rule: windows [ts, ts+gap) merge
  * only on strict overlap).
  *
  * `fullOuterOrders` is SURVEY §2.5 J1 verbatim — the reference's
  * per-batch `fullOuterJoin` (SaleDetailApp.scala:50-51) as a batch
  * relational op, unmatched sides surviving with nulls. */
object Sessions {

  /** Per-user sessions with a 30-minute inactivity gap. Output window
    * end is last-event-ts + gap (Spark session_window semantics). */
  def userSessions(spark: SparkSession, dir: String,
                   gap: String = "30 minutes"): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"))
      .orderBy("user_id", "session_start_us")

  /** J1: full outer orders ⋈ lineitem, aggregated per key — orders with
    * zero details keep a row (n_details = 0, status non-null); orphan
    * details would keep rows with null status. */
  def fullOuterOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "full_outer")
      .groupBy(coalesce(o("o_orderkey"), l("l_orderkey")).as("okey"))
      .agg(
        count(l("l_orderkey")).as("n_details"),
        max(o("o_orderstatus")).as("order_status"))
      .orderBy("okey")
  }
}
