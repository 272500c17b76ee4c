package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** OLAP extensions over the publisher's flat GROUP BYs: hierarchical
  * rollup, pivot (crosstab), and window-frame analytics — the aggregate
  * shapes a dashboard layer issues against the same tables
  * (reference analog: the dw-chart dashboards aggregate the publisher's
  * REST results client-side, e.g.
  * dw-chart/src/main/java/com/demo/controller/IndexController.java:23-208;
  * here they are first-class engine operators).
  *
  * Scale design: rollup/pivot are single hash aggregates (rollup adds one
  * grouping-set expansion pre-shuffle, pivot folds into conditional
  * aggregates — neither adds a join or an extra shuffle); the moving
  * average partitions its window by user so WindowExec parallelizes per
  * key group (no global single-partition sort).
  */
object Olap {

  /** Revenue rollup over the nation → segment hierarchy (GROUPING SETS):
    * (nation, segment), (nation), () — NULL group keys surfaced as 'ALL'
    * (unambiguous: dimension values never contain literal 'ALL'). */
  def revenueRollup(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment"), col("o_totalprice"))
    // toDF() re-aliases the rollup output with fresh attribute ids — the
    // grouping columns otherwise carry duplicate lineage through the
    // Expand node and the analyzer's ambiguous-self-join check rejects
    // any later unqualified reference to them
    base.rollup(col("n_name"), col("c_mktsegment"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("gmv"),
        count(lit(1)).as("order_cnt"))
      .toDF("g_nation", "g_segment", "gmv", "order_cnt")
      .select(
        coalesce(col("g_nation"), lit("ALL")).as("nation"),
        coalesce(col("g_segment"), lit("ALL")).as("segment"),
        col("gmv"), col("order_cnt"))
      .orderBy("nation", "segment")
  }

  /** Full CUBE over the same two dimensions as [[revenueRollup]] — adds
    * the (segment-only) grouping set the rollup hierarchy omits, i.e.
    * every marginal a dashboard can slice. Same single-hash-aggregate
    * shape: the Expand node emits 4 grouping-set rows per input row
    * before the one shuffle; no joins, no second pass. */
  def revenueCube(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment"), col("o_totalprice"))
    // toDF() re-aliases for the same ambiguous-self-join reason as rollup
    base.cube(col("n_name"), col("c_mktsegment"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("gmv"),
        count(lit(1)).as("order_cnt"))
      .toDF("g_nation", "g_segment", "gmv", "order_cnt")
      .select(
        coalesce(col("g_nation"), lit("ALL")).as("nation"),
        coalesce(col("g_segment"), lit("ALL")).as("segment"),
        col("gmv"), col("order_cnt"))
      .orderBy("nation", "segment")
  }

  /** TPC-H market segments — the fixed pivot column domain (explicit list
    * so the pivot plans as one aggregate instead of a distinct-scan). */
  val Segments: Seq[String] =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  /** Customer-count crosstab: nation × market segment, one column per
    * segment. Explicit pivot values keep this a single-pass conditional
    * aggregate (Spark otherwise prepends a distinct job to discover the
    * domain — an extra scan at 100 TB). */
  def segmentPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .pivot("c_mktsegment", Segments)
      .agg(count(lit(1)))
      .select(col("nation") +: Segments.map(s =>
        coalesce(col(s), lit(0L)).as(s.toLowerCase(java.util.Locale.ROOT))): _*)
      .orderBy("nation")

  /** Decile banding via ntile over a total order (balance, key) — the
    * ranked-bucketing aggregate of a dashboard layer. The global window
    * is a single ordered pass here; at scale the same statistic comes
    * from approx_percentile boundaries + a bucket join (no global sort)
    * — both paths expressed, this one exact. Averages go through
    * DECIMAL(18,2) so the value is aggregation-order independent. */
  def balanceDeciles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"),
        min(col("c_acctbal")).as("bal_min"),
        max(col("c_acctbal")).as("bal_max"),
        (sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") / count(lit(1)))
          .as("bal_avg"))
      .orderBy("decile")
  }

  /** Per-nation spend distribution: percent_rank + cume_dist over each
    * customer's total spend — rank analytics partition-parallel by
    * nation (no global sort). Both measures are single exact divisions
    * ((rank−1)/(n−1), rows≤current/n), bit-identical across engines. */
  def spendDistribution(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("user_id"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("spend"))
    val withNation = spend
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey").as("user_id"), col("c_nationkey"))), Seq("user_id"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
    val w = Window.partitionBy("n_name").orderBy(col("spend").asc, col("user_id").asc)
    withNation
      .select(col("n_name").as("nation"), col("user_id"), col("spend"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("nation", "user_id")
  }

  /** Per-user daily activity with a trailing 7-row moving average and a
    * day-over-day delta — the window-frame (ROWS BETWEEN) and lag/lead
    * surface. The frame is over *present* days (no gap fill), and the
    * average is emitted as one division sum/count so the value is
    * bit-identical across engines regardless of frame content. */
  def dailyMovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("log_date"))
      .agg(count(lit(1)).as("ct"))
    val ordered = Window.partitionBy("user_id").orderBy("log_date")
    val trailing7 = ordered.rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("ma7",
        sum(col("ct")).over(trailing7).cast("double") / count(lit(1)).over(trailing7))
      .withColumn("delta", (col("ct") - lag(col("ct"), 1).over(ordered)).cast("long"))
      .orderBy("user_id", "log_date")
  }
}
