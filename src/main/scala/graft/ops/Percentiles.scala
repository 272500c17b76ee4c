package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact linear-interpolation percentiles computed from a value HISTOGRAM
  * instead of Spark's buffering `percentile` aggregate.
  *
  * Why: `percentile` is a TypedImperativeAggregate that buffers EVERY
  * value of a group in executor memory — at 100 TB (~6B lineitem rows in
  * 3 return-flag groups) that is an OOM, not a slow query. This path
  * first collapses the input to one row per (group, value) with a count —
  * a partial-aggregating shuffle whose size is the DISTINCT VALUE DOMAIN,
  * not the row count — then computes the exact lerp percentile over that
  * tiny histogram with window functions. Correct whenever the value
  * domain is bounded (day lags, integer cents, catalog prices); for
  * genuinely unbounded double domains the approx_percentile sketch path
  * (q44) is the scale answer.
  *
  * Determinism: position = p·(n−1) and the lerp
  * `v_lo + (pos − floor(pos)) · (v_hi − v_lo)` are written with the same
  * operation ORDER here and in the DuckDB oracle SQL, so results
  * hash-match bit-for-bit by construction (the shared-formula idiom used
  * throughout SparkEntry).
  */
object Percentiles {

  /** `hist` must have columns (groupCol, v: double, cnt: long) with one
    * row per distinct (group, value). Returns one row per group:
    * (groupCol, n, <name per requested percentile>, vmin, vmax). */
  def fromHistogram(hist: DataFrame, groupCol: String,
                    ps: Seq[(String, Double)]): DataFrame = {
    val wOrd = Window.partitionBy(groupCol).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
    val c = hist
      .withColumn("cum", sum(col("cnt")).over(wOrd))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("lo0", col("cum") - col("cnt")) // first rank of this value
    // pos = p·(n−1); the value holding integer rank i is the histogram row
    // with lo0 <= i < cum. n is group-constant, so pos/floor/ceil are too.
    def pos(p: Double): Column = lit(p) * (col("n") - lit(1L)).cast("double")
    def pick(idx: Column): Column =
      max(when(col("lo0") <= idx && idx < col("cum"), col("v")))
    val aggs = ps.flatMap { case (name, p) =>
      Seq(pick(floor(pos(p))).as(s"__lo_$name"),
        pick(ceil(pos(p))).as(s"__hi_$name"))
    } ++ Seq(max(col("n")).as("n"),
      min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    val g = c.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    val outCols = Seq(col(groupCol), col("n")) ++ ps.map { case (name, p) =>
      val position = pos(p)
      val lo = floor(position)
      val vlo = col(s"__lo_$name"); val vhi = col(s"__hi_$name")
      when(lo.cast("double") === position, vlo)
        .otherwise(vlo + (position - lo) * (vhi - vlo)).as(name)
    } ++ Seq(col("vmin"), col("vmax"))
    g.select(outCols: _*)
  }

  /** q196: WEIGHTED median per group — the percentile family member the
    * unweighted lerp paths (q43/q122) can't express: each value counts
    * with its weight (here l_quantity), the median is the smallest value
    * whose cumulative weight reaches half the total (the lower weighted
    * median — an exact data value, no interpolation, so the definition
    * is integer-deterministic in both engines).
    *
    * Same scale shape as [[fromHistogram]]: the shuffle carries one row
    * per distinct (group, value) with a SUMMED weight (map-side partial
    * agg), the cumulative pass is a group-partitioned window over the
    * value domain, and the final pick is a filtered min — no row-level
    * buffering anywhere. 2·cumw ≥ totw is a pure BIGINT compare. */
  def weightedMedian(spark: org.apache.spark.sql.SparkSession,
                     dir: String): DataFrame = {
    val hist = graft.Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_extendedprice").as("v"))
      .agg(sum(col("l_quantity")).cast("long").as("w"))
    val wOrd = Window.partitionBy("l_returnflag").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("l_returnflag")
    hist
      .withColumn("cumw", sum(col("w")).over(wOrd))
      .withColumn("totw", sum(col("w")).over(wAll))
      .filter(col("cumw") * 2 >= col("totw"))
      .groupBy("l_returnflag")
      .agg(min(col("v")).as("weighted_median"), max(col("totw")).as("total_weight"))
      .orderBy("l_returnflag")
  }
}
