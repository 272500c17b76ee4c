package graft

import org.apache.spark.sql.functions._

/** Unit tests for the seventh round-3 operator batch: TPC-H-shaped
  * multi-join reports, cross-source near-dup matrix, Zipf curve,
  * day-of-week seasonality, discount impact, and ship-lag stats. Claims
  * recomputed independently on collected sf0.001 rows. */
class Round3fSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def money(d: Double): BigDecimal =
    BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)

  private def lerp(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    val pos = p * (s.length - 1)
    val lo = s(pos.toInt); val hi = s(math.ceil(pos).toInt)
    lo + (hi - lo) * (pos - pos.toInt)
  }

  // timestamp[ms] parquet columns surface as TIMESTAMP_NTZ -> LocalDateTime
  private def utcDate(v: Any): java.time.LocalDate =
    v.asInstanceOf[java.time.LocalDateTime].toLocalDate

  private lazy val lineitem = Tables.lineitem(spark, dir)
    .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
      "l_returnflag", "l_shipdate").collect()
  private lazy val orders: Map[Long, (Long, Any)] = Tables.orders(spark, dir)
    .select("o_orderkey", "o_custkey", "o_orderdate").collect()
    .map(r => r.getLong(0) -> (r.getLong(1), r.get(2): Any)).toMap

  test("revenueTopOrders matches a BigDecimal replay of the Q3 shape") {
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val cutoff = java.time.LocalDate.parse("1998-01-01")
    val rev = collection.mutable.Map.empty[(Long, String), BigDecimal]
    lineitem.foreach { r =>
      val ok = r.getLong(0)
      orders.get(ok).foreach { case (cust, odate) =>
        if (building(cust) && utcDate(odate).isBefore(cutoff)
          && utcDate(r.get(5)).isAfter(cutoff)) {
          val key = (ok, utcDate(odate).toString)
          val contrib = money(r.getDouble(2)) * (BigDecimal(1) - money(r.getDouble(3)))
          rev(key) = rev.getOrElse(key, BigDecimal(0)) + contrib
        }
      }
    }
    val expected = rev.toSeq
      .sortBy { case ((ok, _), v) => (-v.toDouble, ok) }.take(10)
    val out = ops.Warehouse.revenueTopOrders(spark, dir).collect()
    assert(out.length === expected.length)
    out.zip(expected).foreach { case (row, ((ok, d), v)) =>
      assert(row.getLong(0) === ok)
      assert(row.getString(1) === d)
      assert(row.getDouble(2) === v.toDouble)
    }
  }

  test("localSupplierVolume matches a co-nationality join replay") {
    val nations = Tables.nation(spark, dir)
      .select("n_nationkey", "n_name", "n_regionkey").collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getInt(2))).toMap
    val asia = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
      .select("r_regionkey").collect().map(_.getInt(0)).toSet
    val custNation = Tables.customer(spark, dir)
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val suppNation = Tables.supplier(spark, dir)
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val lo = java.time.LocalDate.parse("1997-01-01")
    val hi = java.time.LocalDate.parse("1998-01-01")
    val agg = collection.mutable.Map.empty[String, (BigDecimal, Long)]
    lineitem.foreach { r =>
      orders.get(r.getLong(0)).foreach { case (cust, odate) =>
        val od = utcDate(odate)
        val cn = custNation(cust)
        if (!od.isBefore(lo) && od.isBefore(hi)
          && suppNation.get(r.getLong(1)).contains(cn)
          && asia(nations(cn)._2)) {
          val name = nations(cn)._1
          val contrib = money(r.getDouble(2)) * (BigDecimal(1) - money(r.getDouble(3)))
          val (s, n) = agg.getOrElse(name, (BigDecimal(0), 0L))
          agg(name) = (s + contrib, n + 1)
        }
      }
    }
    val out = ops.Warehouse.localSupplierVolume(spark, dir).collect()
    assert(out.map(_.getString(0)).toSet === agg.keySet)
    out.foreach { r =>
      val (s, n) = agg(r.getString(0))
      assert(r.getDouble(1) === s.toDouble)
      assert(r.getLong(2) === n)
    }
  }

  test("crossSourcePairs maps the exact Jaccard pairs through sources") {
    val srcs = Tables.documents(spark, dir).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = dedup.DedupOps.ngramJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.map { case (a, b) =>
      val (sa, sb) = (srcs(a), srcs(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val out = dedup.DedupOps.crossSourcePairs(spark, dir).collect()
    assert(out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      === expected)
    assert(out.map(_.getLong(2)).sum === pairs.length.toLong)
  }

  test("zipfCurve matches a term-frequency recompute with total tie order") {
    val freqs = Tables.documents(spark, dir).select("text").collect()
      .flatMap(_.getString(0).toLowerCase.trim.split("\\s+"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = freqs.toSeq.sortBy { case (t, f) => (-f, t) }.take(100)
    val out = graft.text.TextOps.zipfCurve(spark, dir).collect()
    assert(out.length === expected.length)
    out.zip(expected).zipWithIndex.foreach { case ((row, (t, f)), i) =>
      assert(row.getLong(0) === i + 1L)
      assert(row.getString(1) === t, s"rank ${i + 1}")
      assert(row.getLong(2) === f)
      assert(row.getLong(3) === (i + 1L) * f)
    }
  }

  test("dowSeasonality: dow matches UTC Sunday=0 and shares sum to 1 per type") {
    val rows = Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("us")).collect()
    val expected = rows.groupBy(_.getString(0)).view.mapValues { rs =>
      rs.groupBy { r =>
        java.time.Instant.ofEpochSecond(r.getLong(1) / 1000000L)
          .atZone(java.time.ZoneOffset.UTC).getDayOfWeek.getValue % 7
      }.view.mapValues(_.length.toLong).toMap
    }.toMap
    val out = ops.Olap.dowSeasonality(spark, dir).collect()
    out.foreach { r =>
      val byDow = expected(r.getString(0))
      assert(r.getLong(2) === byDow(r.getLong(1).toInt), s"${r.getString(0)}/${r.getLong(1)}")
      val total = byDow.values.sum
      assert(r.getDouble(3) === r.getLong(2).toDouble / total.toDouble)
    }
    // per-type shares sum to 1 within one ulp per cell
    out.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    }
  }

  test("discountImpact matches a BigDecimal band replay") {
    val agg = collection.mutable.Map.empty[Long, (Long, BigDecimal, BigDecimal)]
    lineitem.foreach { r =>
      val band = math.floor(r.getDouble(3) * 100.0 + 0.5).toLong
      val price = money(r.getDouble(2))
      val cost = price * money(r.getDouble(3))
      val (n, g, c) = agg.getOrElse(band, (0L, BigDecimal(0), BigDecimal(0)))
      agg(band) = (n + 1, g + price, c + cost)
    }
    val out = ops.Warehouse.discountImpact(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSet === agg.keySet)
    out.foreach { r =>
      val (n, g, c) = agg(r.getLong(0))
      assert(r.getLong(1) === n)
      assert(r.getDouble(2) === g.toDouble)
      assert(r.getDouble(3) === c.toDouble)
    }
  }

  test("shipLagStats matches a lerp recompute of order-to-ship days") {
    val lags = lineitem.flatMap { r =>
      orders.get(r.getLong(0)).map { case (_, odate) =>
        r.getString(4) ->
          java.time.temporal.ChronoUnit.DAYS.between(
            utcDate(odate), utcDate(r.get(5))).toDouble
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val out = ops.Warehouse.shipLagStats(spark, dir).collect()
    assert(out.map(_.getString(0)).toSet === lags.keySet)
    out.foreach { r =>
      val xs = lags(r.getString(0))
      assert(r.getLong(1) === xs.size.toLong)
      assert(r.getDouble(2) === lerp(xs, 0.5))
      assert(r.getDouble(3) === lerp(xs, 0.95))
      assert(r.getLong(4) === xs.min.toLong)
      assert(r.getLong(5) === xs.max.toLong)
    }
  }
}
