package graft

import org.apache.spark.sql.functions._

/** Unit tests for the sixth round-3 operator batch: equi-depth histogram,
  * last-touch attribution, funnel timing, vocabulary growth, spend Gini,
  * covariance cells, k-means assignment, childless-parent audit,
  * in-session funnel, and dense_rank price levels. Every claim is
  * recomputed independently on collected sf0.001 rows. */
class Round3eSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def lerp(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    val pos = p * (s.length - 1)
    val lo = s(pos.toInt); val hi = s(math.ceil(pos).toInt)
    lo + (hi - lo) * (pos - pos.toInt)
  }

  private def orderedEvents(): Map[Long, Seq[(Long, Long, String, Double)]] =
    Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"), col("value")).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(r => (r.getLong(1), r.getLong(2)))
        .map(r => (r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
        .toSeq)
      .toMap

  test("equiDepthHistogram: bucket counts match a lerp-boundary recompute") {
    val prices = Tables.orders(spark, dir)
      .select("o_totalprice").collect().map(_.getDouble(0)).toSeq
    val qs = (1 to 9).map(i => lerp(prices, i / 10.0))
    val expected = prices.groupBy(x => 1 + qs.count(x > _)).view
      .mapValues(v => (v.size.toLong, v.min, v.max)).toMap
    val out = ops.Olap.equiDepthHistogram(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSet === expected.keySet.map(_.toLong))
    out.foreach { r =>
      val (n, lo, hi) = expected(r.getLong(0).toInt)
      assert(r.getLong(1) === n, s"bucket ${r.getLong(0)}")
      assert(r.getDouble(2) === lo && r.getDouble(3) === hi)
    }
    // equi-depth: every bucket within a factor of the ideal tenth
    assert(out.map(_.getLong(1)).sum === prices.size.toLong)
  }

  test("lastTouchAttribution matches a per-user replay") {
    val expected = collection.mutable.Map.empty[String, (Long, BigDecimal)]
    orderedEvents().values.foreach { rows =>
      var touch: String = null
      rows.foreach { case (_, _, et, v) =>
        if (et == "purchase") {
          val key = Option(touch).getOrElse("direct")
          val (n, s) = expected.getOrElse(key, (0L, BigDecimal(0)))
          expected(key) = (n + 1,
            s + BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        } else touch = et
      }
    }
    val out = ops.Publisher.lastTouchAttribution(spark, dir).collect()
    assert(out.map(_.getString(0)).toSet === expected.keySet)
    out.foreach { r =>
      val (n, s) = expected(r.getString(0))
      assert(r.getLong(1) === n)
      assert(r.getDouble(2) === s.toDouble)
    }
  }

  test("funnelTiming: percentiles match a lerp recompute over converted users") {
    val f = ops.Publisher.funnel(spark, dir).collect()
      .filter(!_.isNullAt(3))
    val dts = f.map(r => (r.getLong(3) - r.getLong(1)).toDouble).toSeq
    val out = ops.Publisher.funnelTiming(spark, dir).collect().head
    assert(out.getLong(0) === dts.size.toLong)
    assert(out.getDouble(1) === lerp(dts, 0.5))
    assert(out.getDouble(2) === lerp(dts, 0.95))
    assert(out.getLong(3) === dts.max.toLong)
  }

  test("vocabGrowth matches an in-order scan per source") {
    val docs = Tables.documents(spark, dir)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).toLowerCase.trim.split("\\s+").toSet))
    val expected = docs.groupBy(_._1).view.mapValues { rows =>
      val seen = collection.mutable.Set.empty[String]
      rows.sortBy(_._2).flatMap { case (_, id, toks) =>
        val fresh = toks.diff(seen)
        seen ++= fresh
        if (fresh.nonEmpty) Some(id -> (fresh.size.toLong, seen.size.toLong)) else None
      }.toMap
    }.toMap
    val out = graft.text.TextOps.vocabGrowth(spark, dir).collect()
    assert(out.length === expected.values.map(_.size).sum)
    out.foreach { r =>
      val (newTerms, vocab) = expected(r.getString(0))(r.getLong(1))
      assert(r.getLong(2) === newTerms, s"doc ${r.getLong(1)}")
      assert(r.getLong(3) === vocab)
    }
  }

  test("spendGini matches the rank-formula recompute per nation") {
    val orders = Tables.orders(spark, dir)
      .select("o_custkey", "o_totalprice").collect()
      .groupBy(_.getLong(0)).view.mapValues(rows =>
        (rows.map(r => BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP))
          .sum * 100).toLongExact).toMap
    val nations = {
      val nn = Tables.nation(spark, dir).select("n_nationkey", "n_name").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      Tables.customer(spark, dir).select("c_custkey", "c_nationkey").collect()
        .map(r => r.getLong(0) -> nn(r.getInt(1))).toMap
    }
    val byNation = orders.toSeq.map { case (cust, cents) => (nations(cust), cust, cents) }
      .groupBy(_._1)
    val out = ops.Olap.spendGini(spark, dir).collect()
    assert(out.map(_.getString(0)).toSet === byNation.keySet)
    out.foreach { r =>
      val rows = byNation(r.getString(0)).sortBy(t => (t._3, t._2))
      val n = rows.size.toLong
      val s0 = rows.map(_._3).sum
      val s1 = rows.zipWithIndex.map { case ((_, _, c), i) => (i + 1) * c }.sum
      assert(r.getLong(1) === n)
      assert(r.getDouble(2) === (2 * s1 - (n + 1) * s0).toDouble / (n * s0).toDouble)
    }
  }

  test("covCells matches an exact micro-int recompute") {
    val vs = Tables.embeddings(spark, dir).select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong))
    val out = graft.vector.VectorOps.covCells(spark, dir).collect()
    assert(out.length === 16 * 17 / 2)
    out.foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      val n = vs.length.toDouble
      val sx = vs.map(_(i)).sum.toDouble
      val sy = vs.map(_(j)).sum.toDouble
      val sxy = vs.map(v => v(i) * v(j)).sum.toDouble
      val cov = BigDecimal((sxy / n - (sx / n) * (sy / n)) / 1e12)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getLong(2) === vs.length.toLong)
      assert(r.getDouble(3) === cov, s"cell ($i,$j)")
    }
  }

  test("kmeansAssign matches a sequential-fold argmin recompute") {
    val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val cents = (0L until 8L).map(c => c -> vecs(c))
    val assign = vecs.filter(_._1 >= 8L).map { case (id, v) =>
      val best = cents.map { case (c, cv) =>
        (dot(v, v) - 2.0 * dot(v, cv) + dot(cv, cv), c)
      }.min
      (id, best._2, best._1)
    }
    val expected = assign.groupBy(_._2).view.mapValues { rows =>
      (rows.size.toLong, rows.map(t => (t._3, t._1)).min)
    }.toMap
    val out = graft.vector.VectorOps.kmeansAssign(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSet === expected.keySet)
    out.foreach { r =>
      val (n, (d, v)) = expected(r.getLong(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === v && r.getDouble(3) === d)
    }
  }

  test("childlessParents matches set-difference counts") {
    def keys(df: org.apache.spark.sql.DataFrame, c: String): Set[Long] =
      df.select(c).collect().map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, dir)
    val expected = Map(
      "customer-no-orders" ->
        (keys(Tables.customer(spark, dir), "c_custkey") --
          keys(Tables.orders(spark, dir), "o_custkey")).size.toLong,
      "orders-no-lineitem" ->
        (keys(Tables.orders(spark, dir), "o_orderkey") -- keys(li, "l_orderkey")).size.toLong,
      "part-no-lineitem" ->
        (keys(Tables.part(spark, dir), "p_partkey") -- keys(li, "l_partkey")).size.toLong,
      "supplier-no-lineitem" ->
        (keys(Tables.supplier(spark, dir), "s_suppkey") -- keys(li, "l_suppkey")).size.toLong)
    val out = ops.Quality.childlessParents(spark, dir).collect()
    assert(out.map(r => r.getString(0) -> r.getLong(1)).toMap === expected)
  }

  test("sessionFunnel matches a session replay with the 30-minute gap rule") {
    val gap = 1800000000L
    case class Sess(startUs: Long, hasView: Boolean, converted: Boolean)
    val sessions = orderedEvents().values.flatMap { rows =>
      val out = collection.mutable.ArrayBuffer.empty[Sess]
      var cur = collection.mutable.ArrayBuffer.empty[(Long, String)]
      var lastUs = Long.MinValue
      def flush(): Unit = if (cur.nonEmpty) {
        val vt = cur.collectFirst { case (us, "view") => us }
        out += Sess(cur.head._1, vt.isDefined,
          vt.exists(v => cur.exists { case (us, et) => et == "purchase" && us > v }))
        cur = collection.mutable.ArrayBuffer.empty
      }
      rows.foreach { case (us, _, et, _) =>
        if (lastUs != Long.MinValue && us - lastUs >= gap) flush()
        cur += ((us, et)); lastUs = us
      }
      flush()
      out
    }.toSeq
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
      .withZone(java.time.ZoneOffset.UTC)
    val byDay = sessions.groupBy(s => fmt.format(
      java.time.Instant.ofEpochSecond(s.startUs / 1000000L)))
    val out = ops.Sessions.sessionFunnel(spark, dir).collect()
    assert(out.map(_.getString(0)).toSet === byDay.keySet)
    out.foreach { r =>
      val ss = byDay(r.getString(0))
      assert(r.getLong(1) === ss.size.toLong)
      assert(r.getLong(2) === ss.count(_.hasView).toLong)
      assert(r.getLong(3) === ss.count(_.converted).toLong)
    }
  }

  test("topPriceLevels keeps the 3 highest distinct prices per flag with counts") {
    val rows = Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val expected = rows.groupBy(_._1).view.mapValues { vs =>
      val byPrice = vs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      byPrice.keys.toSeq.sorted(Ordering[Double].reverse).take(3).zipWithIndex
        .map { case (p, i) => (i + 1L, p, byPrice(p)) }
    }.toMap
    val out = ops.Olap.topPriceLevels(spark, dir).collect()
    assert(out.length === expected.values.map(_.size).sum)
    out.foreach { r =>
      val lvl = expected(r.getString(0)).find(_._1 == r.getLong(1)).get
      assert(r.getDouble(2) === lvl._2 && r.getLong(3) === lvl._3)
    }
  }
}
