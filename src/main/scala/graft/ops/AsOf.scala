package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Temporal joins Spark has no single operator for: as-of (nearest
  * preceding event) and bounded range join — the lookup shapes of
  * feature-engineering and attribution pipelines.
  *
  * Scale design (why these formulations and not a naive theta-join):
  *  - The as-of join is the union-then-window formulation: tag both
  *    streams, ONE shuffle on the key, one per-key ordered pass carrying
  *    the last-seen left row forward (`last(..., ignoreNulls)` over an
  *    unbounded-preceding frame). A theta-join `b.ts <= a.ts` would plan
  *    as a per-key cross product (O(n·m) per user); this is O(n+m) per
  *    key and needs no range condition at all.
  *  - The range join buckets time into window-sized buckets and joins on
  *    (key, bucket) equality — each left row probes exactly 2 buckets, so
  *    the equi-join machinery (hash/sort-merge, AQE) applies and the
  *    interval predicate only filters within-bucket candidates. This is
  *    the standard bucketed range-join rewrite (a built-in optimization
  *    in some engines; expressed here directly in the plan).
  */
object AsOf {

  /** As-of join: each 'purchase' event picks the latest 'view' of the
    * same user with view.ts <= purchase.ts (ties on ts: the view wins —
    * '<=' semantics — and among equal-ts views the highest event_id).
    * Purchases with no preceding view keep NULL as-of columns (left
    * as-of join). */
  def viewBeforePurchase(spark: SparkSession, dir: String): DataFrame =
    asofCore(Tables.events(spark, dir))

  /** Core of the as-of join over any frame with (user_id, ts, event_id,
    * event_type) — split out so tests can drive literal rows. */
  def asofCore(events: DataFrame): DataFrame = {
    val e = events
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        // views sort before purchases at equal ts => '<=' as-of semantics
        when(col("event_type") === "view", 0).otherwise(1).as("kind"),
        when(col("event_type") === "view", unix_micros(col("ts"))).as("v_ts"),
        when(col("event_type") === "view", col("event_id")).as("v_id"))
    val w = Window.partitionBy("user_id")
      .orderBy("ts", "kind", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("view_ts_us", last(col("v_ts"), ignoreNulls = true).over(w))
      .withColumn("view_event_id", last(col("v_id"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("view_ts_us"), col("view_event_id"))
      .orderBy("event_id")
  }

  /** Bounded range join (attribution): for each purchase, the views of
    * the same user in the window [purchase.ts − windowSec, purchase.ts).
    * Implemented as the bucketed rewrite: views bucket once, purchases
    * probe buckets {b, b−1} (window length == bucket size, so exactly two
    * buckets can contain matches), exact interval filter after the
    * equi-join. Emits one row per purchase with ≥ 1 attributed view. */
  def attributedPurchases(spark: SparkSession, dir: String,
                          windowSec: Long = 600L): DataFrame =
    attributionCore(Tables.events(spark, dir), windowSec)

  /** Core of the bucketed range join — tests drive literal rows. */
  def attributionCore(events: DataFrame, windowSec: Long): DataFrame = {
    val e = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val usec = windowSec * 1000000L
    // integer `div` for bucketing — a double division could place the two
    // sides of a boundary timestamp in different buckets
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us").as("v_us"),
        expr(s"ts_us div ${usec}L").as("bucket"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_us").as("p_us"),
        explode(expr(s"array(ts_us div ${usec}L, ts_us div ${usec}L - 1L)")).as("bucket"))
    purchases.join(views, Seq("user_id", "bucket"))
      .filter(col("v_us") >= col("p_us") - usec && col("v_us") < col("p_us"))
      .groupBy(col("event_id"), col("p_us"))
      .agg(count(lit(1)).as("n_views"), max(col("v_us")).as("last_view_us"))
      .select(col("event_id"), col("p_us"), col("n_views"), col("last_view_us"))
      .orderBy("event_id")
  }
}
