package graft

import org.apache.spark.sql.functions._

/** Unit tests for the second round-3 operator batch: fuzzy edit-distance
  * dedup, RFM segmentation, revenue concentration, growth/histogram/corr
  * profiling, rolling distinct users, repetition stats, BPE-ish token
  * estimate, and z-score anomaly days. Each test recomputes the operator's
  * claim independently (brute force on collected sf0.001 rows) rather than
  * asserting fixed values, so data regeneration cannot silently stale
  * them. */
class Round3bSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("editDistancePairs: blocking respected and distances match a Scala recompute") {
    val out = dedup.DedupOps.editDistancePairs(spark, dir).collect()
    assert(out.nonEmpty)
    val norm = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        substring(text.TextOps.normText(col("text")), 1,
          dedup.DedupOps.EditPrefixLen).as("p"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getString(3)))
      .toMap
    out.foreach { r =>
      val (a, b, dist) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(a < b)
      assert(norm(a)._1 === norm(b)._1, "same-lang blocking")
      assert(math.abs(norm(a)._2 - norm(b)._2) <= 10, "length band")
      assert(dist >= 0 && dist <= 20)
      assert(dist === levenshtein(norm(a)._3, norm(b)._3))
    }
  }

  test("rfmSegments: scores in 1..4 and segment sizes partition the customers") {
    val out = ops.Publisher.rfmSegments(spark, dir).collect()
    out.foreach { r =>
      (0 to 2).foreach(i => assert(r.getInt(i) >= 1 && r.getInt(i) <= 4))
    }
    val nCust = Tables.orders(spark, dir)
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(out.map(_.getLong(3)).sum === nCust)
  }

  test("revenueConcentration matches a single-threaded brute-force Pareto") {
    val out = ops.Olap.revenueConcentration(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set(50, 80, 90))
    val spend = Tables.orders(spark, dir).groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("s"))
      .collect()
      .map(r => r.getLong(0) -> r.getDecimal(1))
      .sortBy { case (k, s) => (s.negate, k) }
    val total = spend.map(_._2.doubleValue).sum
    Seq(50, 80, 90).foreach { t =>
      var cum = 0.0; var need = 0
      while (cum * 100 < total * t - 1e-6) { cum += spend(need)._2.doubleValue; need += 1 }
      assert(out(t) === need.toLong, s"threshold $t")
    }
  }

  test("monthlyGrowth: growth recomputes from adjacent gmv values; first month null") {
    val rows = ops.Olap.monthlyGrowth(spark, dir).collect()
    assert(rows.head.isNullAt(3))
    rows.sliding(2).foreach { case Array(prev, cur) =>
      val expect = math.floor(
        (cur.getDouble(1) - prev.getDouble(1)) / prev.getDouble(1) * 1000 + 0.5) / 10
      assert(cur.getDouble(3) === expect)
    case _ => ()
    }
  }

  test("priceHistogram: bins cover every order exactly once") {
    val rows = ops.Olap.priceHistogram(spark, dir).collect()
    assert(rows.map(_.getLong(2)).sum === Tables.orders(spark, dir).count())
    rows.foreach { r =>
      assert(r.getDouble(1) === r.getLong(0) * 50000.0)
    }
  }

  test("qtyPriceCorr matches a direct per-row computation within 1e-9") {
    val byFlag = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .groupBy(_.getString(0))
    val got = ops.Olap.qtyPriceCorr(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    byFlag.foreach { case (flag, rs) =>
      val n = rs.length.toDouble
      val xs = rs.map(_.getDouble(1)); val ys = rs.map(_.getDouble(2))
      val sx = xs.sum; val sy = ys.sum
      val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val corr = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      assert(got(flag)._1 === rs.length.toLong)
      assert(math.abs(got(flag)._2 - corr) < 1e-9, s"corr for $flag")
    }
  }

  test("rollingUv7 matches a brute-force window recompute") {
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = pairs.map(_._2).distinct.sorted((a: java.time.LocalDate, b: java.time.LocalDate) => a.compareTo(b))
    val expect = days.map { d =>
      d.toString -> pairs.collect {
        case (u, pd) if !pd.isAfter(d) && !pd.isBefore(d.minusDays(6)) => u
      }.distinct.length.toLong
    }.toMap
    val got = ops.Dau.rollingUv7(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect)
  }

  test("repetitionStats matches a Scala token-count recompute") {
    val texts = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = text.TextOps.repetitionStats(spark, dir).collect()
    assert(got.length === texts.size)
    got.take(20).foreach { r =>
      val toks = texts(r.getLong(0)).toLowerCase.trim.split("\\s+")
      val counts = toks.groupBy(identity).map(_._2.length)
      assert(r.getLong(1) === toks.length.toLong)
      assert(r.getLong(2) === counts.size.toLong)
      assert(r.getDouble(3) === counts.max.toDouble / toks.length)
      assert(r.getDouble(4) === 1.0 - counts.size.toDouble / toks.length)
    }
  }

  test("bpeTokenEstimate counts GPT2-ish pre-token classes over props JSON") {
    val got = text.TextOps.bpeTokenEstimate(spark, dir).collect()
    val props = Tables.events(spark, dir).select("event_id", "props").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val re = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]".r
    got.take(50).foreach { r =>
      val p = props(r.getLong(0))
      assert(r.getLong(1) === re.findAllIn(p).length.toLong)
      assert(r.getLong(2) === p.length.toLong)
      // JSON payloads must tokenize finer than whitespace would
      assert(r.getLong(1) > 1L || p.isEmpty)
    }
  }

  test("gmvAnomalies: every flagged day exceeds the z threshold recomputed from dailies") {
    val daily = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("gmv"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val n = daily.size.toDouble
    val mean = daily.values.sum / n
    val std = math.sqrt(daily.values.map(g => g * g).sum / n - mean * mean)
    val flagged = ops.Olap.gmvAnomalies(spark, dir).collect()
    flagged.foreach { r =>
      assert(math.abs(r.getDouble(2)) > ops.Olap.AnomalyZ)
      assert(math.abs((daily(r.getString(0)) - mean) / std - r.getDouble(2)) < 1e-9)
    }
    // and no day above threshold is missing
    val flaggedDays = flagged.map(_.getString(0)).toSet
    daily.foreach { case (d, g) =>
      if (math.abs((g - mean) / std) > ops.Olap.AnomalyZ)
        assert(flaggedDays.contains(d), s"missing anomaly day $d")
    }
  }
}
