package graft

import org.apache.spark.sql.functions._

/** Unit tests for the fourth round-3 operator batch: referential-
  * integrity audit, column profiling, hourly gap-fill, PageRank, and
  * chi-square contingency cells. Claims are recomputed independently on
  * collected sf0.001 rows (and, for the audit, on a doctored input with
  * planted orphans) so data regeneration cannot stale them. */
class GraphSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("integrityAudit: clean star schema reports zero violations on every edge") {
    val out = ops.Quality.integrityAudit(spark, dir).collect()
    assert(out.map(_.getString(0)).toSeq ===
      Seq("customer->nation", "lineitem->orders", "nation->region", "orders->customer"))
    out.foreach(r => assert(r.getLong(1) === 0L, s"edge ${r.getString(0)}"))
  }

  test("integrityAudit: planted orphans are counted exactly") {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    // three lineitems pointing at order keys that cannot exist
    val orphans = Seq(-1L, -2L, -3L).toDF("l_orderkey")
      .withColumn("l_partkey", lit(1L))
    val lineitem = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey").unionByName(orphans)
    val out = ops.Quality.integrityAuditCore(
      lineitem, orders, Tables.customer(spark, dir),
      Tables.nation(spark, dir), Tables.region(spark, dir)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("lineitem->orders") === 3L)
    assert(out("orders->customer") === 0L)
  }

  test("columnProfile matches per-column null/distinct recomputes in one scan") {
    val out = ops.Quality.columnProfile(spark, dir).collect()
    assert(out.map(_.getString(0)).sorted === ops.Quality.ProfiledCols.sorted.toArray)
    val ev = Tables.events(spark, dir)
    val nRows = ev.count()
    out.foreach { r =>
      val c = r.getString(0)
      assert(r.getLong(3) === nRows)
      assert(r.getLong(1) === ev.filter(col(c).isNull).count(), s"nulls($c)")
      assert(r.getLong(2) === ev.filter(col(c).isNotNull)
        .select(c).distinct().count(), s"distinct($c)")
    }
  }

  test("columnProfile plans the multi-distinct as a single Expand pass") {
    val plan = ops.Quality.columnProfile(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("Expand"), "expected one Expand-based multi-distinct scan")
    // one scan of events feeds the whole profile
    assert("(?s)Scan parquet".r.findAllIn(plan).size === 1)
  }

  test("gapFillHourly: spine is complete, gaps are zero-filled, counts match") {
    val out = ops.Olap.gapFillHourly(spark, dir).collect()
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH")
      .withZone(java.time.ZoneOffset.UTC)
    val ev = Tables.events(spark, dir)
      .select(unix_micros(col("ts")).as("us"), col("event_type")).collect()
    val hourUs = 3600L * 1000000L
    def hourOf(us: Long) = fmt.format(java.time.Instant.ofEpochSecond(
      math.floorDiv(us, hourUs) * 3600L))
    val lo = ev.map(_.getLong(0)).min / hourUs
    val hi = ev.map(_.getLong(0)).max / hourUs
    assert(out.length === (hi - lo + 1).toInt, "one row per hour in the span")
    val errCounts = ev.filter(_.getString(1) == "error")
      .groupBy(r => hourOf(r.getLong(0))).view.mapValues(_.size.toLong).toMap
    var gaps = 0
    out.foreach { r =>
      val expected = errCounts.getOrElse(r.getString(0), 0L)
      assert(r.getLong(1) === expected)
      assert(r.getBoolean(2) === (expected == 0L))
      if (r.getBoolean(2)) gaps += 1
    }
    assert(gaps > 0, "sf0.001 must exercise the gap path")
  }

  test("pageRank matches a single-threaded power iteration to 1e-9") {
    val out = ops.Graph.pageRank(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // local replay: same edges, same damped fixed-iteration recursion
    val edges = ops.Publisher.eventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to ops.Graph.Iterations) {
      val inflow = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => rank(e._1) * e._3).sum
      }
      rank = nodes.map { v =>
        val raw = (1.0 - ops.Graph.Damping) / n +
          ops.Graph.Damping * inflow.getOrElse(v, 0.0)
        // mirror the engine's per-iteration ROUND(...,9) determinism step
        v -> BigDecimal(raw).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    }
    assert(out.keySet === rank.keySet)
    out.foreach { case (v, r) => assert(math.abs(r - rank(v)) < 1e-9, v) }
    // every state has successors here, so rank mass is conserved (up to
    // the per-node 0.5e-9 iteration-rounding slack)
    assert(math.abs(out.values.sum - 1.0) < 1e-7)
  }

  test("chisqCells: marginals recompute and contributions follow (O-E)^2/E") {
    val out = ops.Quality.chisqCells(spark, dir).collect()
    assert(out.nonEmpty)
    val obs = Tables.events(spark, dir)
      .select(col("event_type"), date_format(col("ts"), "HH").as("h")).collect()
      .groupBy(r => (r.getString(0), r.getString(1))).view.mapValues(_.size.toLong).toMap
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet === obs.keySet)
    val rowTot = obs.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val colTot = obs.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = obs.values.sum
    out.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val o = r.getLong(2)
      assert(o === obs(key))
      val e = (rowTot(key._1) * colTot(key._2)).toDouble / n
      assert(r.getDouble(3) === e)
      val d = o.toDouble - e
      assert(r.getDouble(4) === d * d / e)
    }
  }
}
