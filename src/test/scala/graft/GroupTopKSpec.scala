package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import graft.plans.{GroupTopK, GroupTopKFinalExec, GroupTopKPartialExec}

/** The custom grouped-top-k operator: semantics (vs the window-function
  * formulation), edge cases, and physical-plan shape. */
class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  test("custom top-k equals the window formulation, incl. ties and small groups") {
    GroupTopK.install(spark)
    // group a: 4 rows with a tie on v (tie-break id asc); group b: 1 row
    // (k larger than the group); spread over many partitions so the
    // partial phase genuinely merges per-partition heaps
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0), ("a", 4L, 20.0),
      ("b", 5L, 5.0))
      .toDF("g", "id", "v").repartition(8)
    val custom = GroupTopK(df, Seq("g"), Seq(col("v").desc, col("id").asc), 2)
      .select("g", "rk", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(custom === Set(
      ("a", 1L, 2L, 30.0), ("a", 2L, 3L, 30.0), // tie on v -> id asc
      ("b", 1L, 5L, 5.0)))                      // k=2 > group size 1
  }

  test("custom top-k matches row_number() on real data at k=5") {
    GroupTopK.install(spark)
    val base = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_returnflag").as("g"), col("l_orderkey").as("id"),
        col("l_extendedprice").as("v"))
    val custom = GroupTopK(base, Seq("g"), Seq(col("v").desc, col("id").asc), 5)
      .select("g", "rk", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val reference = base.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5).select("g", "rk", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(custom === reference)
  }

  test("global top-k (no group) gathers to one task — never per-partition ranks") {
    GroupTopK.install(spark)
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "v").repartition(8)
    // direct API with empty group: exactly k rows, globally ranked
    val direct = GroupTopK(df, Seq.empty, Seq(col("v").desc), 5)
      .select("id", "rk").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(direct === Set((100L, 1L), (99L, 2L), (98L, 3L), (97L, 4L), (96L, 5L)))
    // the rewrite fires for un-partitioned windows too and must stay global
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v").desc)
    val decl = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
    assert(decl.queryExecution.optimizedPlan.collect {
      case p: graft.plans.GroupTopKPlan => p }.nonEmpty)
    assert(decl.select("id").collect().map(_.getLong(0)).toSet ===
      Set(100L, 99L, 98L, 97L, 96L))
  }

  test("optimizer rule rewrites row_number()<=k filters into the custom operator") {
    GroupTopK.install(spark)
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("b", 4L, 5.0))
      .toDF("g", "id", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val declarative = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
    // the rewrite fired...
    assert(declarative.queryExecution.optimizedPlan.collect {
      case p: graft.plans.GroupTopKPlan => p }.nonEmpty,
      declarative.queryExecution.optimizedPlan.treeString)
    // ...and the result is the row_number() result, rank typed int
    val rows = declarative.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    assert(rows === Set(("a", 2L, 1), ("a", 3L, 2), ("b", 4L, 1)))
    // rank == 1 equality form rewrites too
    val top1 = df.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
    assert(top1.queryExecution.optimizedPlan.collect {
      case p: graft.plans.GroupTopKPlan => p }.nonEmpty)
    assert(top1.collect().map(_.getLong(1)).toSet === Set(2L, 4L))
    // huge k must NOT rewrite (bounded-heap guard)
    val bigK = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 100000)
    assert(bigK.queryExecution.optimizedPlan.collect {
      case p: graft.plans.GroupTopKPlan => p }.isEmpty)
  }

  test("physical plan is partial heaps -> exchange -> final heaps") {
    GroupTopK.install(spark)
    // AQE off for the shape assertion only: query stages hide the
    // sub-plans from a plain collect
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try { planShapeAssertions() }
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def planShapeAssertions(): Unit = {
    val df = Seq(("a", 1L, 1.0)).toDF("g", "id", "v")
    val out = GroupTopK(df, Seq("g"), Seq(col("v").desc), 1)
    out.collect()
    val plan = out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val nodes = plan.collect { case n => n }
    assert(nodes.exists(_.isInstanceOf[GroupTopKPartialExec]))
    assert(nodes.exists(_.isInstanceOf[GroupTopKFinalExec]))
    // the exchange between them shuffles the ALREADY-REDUCED rows: the
    // partial node must sit BELOW the shuffle
    val exchange = nodes.collectFirst { case e: ShuffleExchangeLike => e }
    assert(exchange.nonEmpty, "expected a shuffle exchange in the plan")
    assert(exchange.get.collect { case p: GroupTopKPartialExec => p }.nonEmpty,
      "partial top-k must run below the exchange (map side)")
  }
}
