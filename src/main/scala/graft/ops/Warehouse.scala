package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Classic warehouse analytics over the full star schema — the
  * multi-join report shapes (TPC-H Q3/Q5 style) that exercise join
  * ordering, broadcast selection, and decimal-exact money arithmetic
  * end-to-end. The reference's publisher never joins more than one
  * dimension at a time (PublisherServiceImpl aggregates one index per
  * REST call); these queries are the natural next step a warehouse user
  * asks of the same tables, and they pin the engine's join planning at
  * scale.
  *
  * Scale design: dimensions (customer, supplier, nation, region)
  * broadcast; the fact scan stays partition-parallel with filters pushed
  * to parquet. Revenue math is SUM(DECIMAL × DECIMAL) — exact,
  * aggregation-order independent — cast to double only at the end
  * (the q83-verified pattern). */
object Warehouse {

  private def revenue: org.apache.spark.sql.Column =
    sum(col("l_extendedprice").cast("decimal(18,2)")
      * (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))

  /** TPC-H Q3 shape: top-10 unshipped BUILDING-segment orders by
    * outstanding revenue — orders placed before the cutoff whose items
    * shipped after it. Two broadcast dims + one fact scan; the top-k is
    * a TakeOrdered over the per-order aggregate, never a global sort. */
  def revenueTopOrders(spark: SparkSession, dir: String,
                       cutoff: String = "1998-01-01", k: Int = 10): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .agg(revenue.cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(k)
  }

  /** TPC-H Q5 shape: revenue by nation where the CUSTOMER and the
    * SUPPLIER sit in the same ASIA nation, for 1997 orders — the 6-way
    * join (region → nation → customer → orders → lineitem → supplier)
    * with the co-nationality predicate. All four dims broadcast; the
    * only shuffles are the two fact-side equi-joins and the final
    * |nations|-row aggregate. */
  def localSupplierVolume(spark: SparkSession, dir: String,
                          region: String = "ASIA",
                          yearStart: String = "1997-01-01",
                          yearEnd: String = "1998-01-01"): DataFrame = {
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(spark, dir)
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val supp = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(yearStart).cast("timestamp")
        && col("o_orderdate") < lit(yearEnd).cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    localVolumeJoin(Tables.lineitem(spark, dir), ord, cust, supp)
  }

  /** The fact-side join chain of [[localSupplierVolume]], shared with
    * ScaleProbe so the probe measures the real plan. */
  private[graft] def localVolumeJoin(lineitem: DataFrame, ord: DataFrame,
                                     cust: DataFrame, supp: DataFrame): DataFrame = {
    lineitem
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey")
        && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(revenue.cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("nation")
  }

  /** Revenue impact by discount band (integer percent): how much gross
    * revenue each discount level touches and what it costs — the
    * pricing-analytics readout. One partial-agg pass; bands are exact
    * integer keys (floor(x·100 + 0.5), the shared rounding idiom). */
  def discountImpact(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(expr("cast(floor(l_discount * 100.0d + 0.5d) as bigint)").as("discount_pct"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("gross"),
        sum(col("l_extendedprice").cast("decimal(18,2)")
          * col("l_discount").cast("decimal(18,2)")).cast("double").as("discount_cost"))
      .orderBy("discount_pct")

  /** Order-to-ship latency stats per return flag: exact lerp percentiles
    * and extrema of datediff(ship, order) in days. Fulfilment-SLO
    * profiling. The HEADLINE name runs the scale-safe histogram plan
    * ([[shipLagStatsScalable]]) — the day-lag domain is a few hundred
    * distinct values, so the percentile shuffle is tiny regardless of
    * fact-row count. The buffering `percentile` form survives as
    * [[shipLagStatsBuffering]], pinned equal by CoreOpsSpec. */
  def shipLagStats(spark: SparkSession, dir: String): DataFrame =
    shipLagStatsScalable(spark, dir)

  /** The buffering exact form (spec-only cross-check — see
    * [[shipLagStats]]): Spark's exact `percentile` buffers every group
    * value in executor memory, an OOM against ~6B-row groups at 100 TB. */
  def shipLagStatsBuffering(spark: SparkSession, dir: String): DataFrame =
    shipLagRows(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(lag_days, 0.5d)").as("p50_days"),
        expr("percentile(lag_days, 0.95d)").as("p95_days"),
        min(col("lag_days")).as("min_days"),
        max(col("lag_days")).as("max_days"))
      .orderBy("l_returnflag")

  /** The fact-scale join feeding every ship-lag variant: (flag, lag). */
  private def shipLagRows(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_returnflag", "l_shipdate")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_returnflag"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("lag_days"))
  }

  /** [[shipLagStats]] via the scale path: exact lerp percentiles computed
    * from a (flag, lag) HISTOGRAM ([[Percentiles.fromHistogram]]) — the
    * shuffle carries one row per distinct day lag per flag (a few hundred
    * rows) instead of buffering ~6B lag values per group in executor
    * memory the way Spark's exact `percentile` does. Same output schema
    * and values as [[shipLagStats]]; its oracle SQL mirrors the lerp
    * arithmetic op-for-op so the hash matches by construction. */
  def shipLagStatsScalable(spark: SparkSession, dir: String): DataFrame = {
    val hist = shipLagRows(spark, dir)
      .groupBy(col("l_returnflag"), col("lag_days").cast("double").as("v"))
      .agg(count(lit(1)).as("cnt"))
    Percentiles.fromHistogram(hist, "l_returnflag",
        Seq("p50_days" -> 0.5, "p95_days" -> 0.95))
      .select(col("l_returnflag"), col("n"),
        col("p50_days"), col("p95_days"),
        col("vmin").cast("long").as("min_days"),
        col("vmax").cast("long").as("max_days"))
      .orderBy("l_returnflag")
  }

  /** Sketch twin of [[shipLagStats]] (mirrors q44's pattern): single-pass
    * approx_percentile, bounded memory per group regardless of the value
    * domain. Rows-only check — sketch layouts are engine-specific. */
  def shipLagStatsApprox(spark: SparkSession, dir: String): DataFrame =
    shipLagRows(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        expr("approx_percentile(lag_days, 0.5d, 1000)").as("p50_approx"),
        expr("approx_percentile(lag_days, 0.95d, 1000)").as("p95_approx"),
        min(col("lag_days")).as("min_days"),
        max(col("lag_days")).as("max_days"))
      .orderBy("l_returnflag")
}
