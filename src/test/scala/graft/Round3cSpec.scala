package graft

import org.apache.spark.sql.functions._

/** Unit tests for the third round-3 operator batch: association rules,
  * weekly cohort retention, MAD outlier days, Markov event transitions,
  * time-weighted averages, the inverted index, per-label centroids, and
  * regex scrubbing. Each test recomputes the operator's claim
  * independently (brute force on collected sf0.001 rows) rather than
  * asserting fixed values, so data regeneration cannot silently stale
  * them. */
class Round3cSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def userTypes(): Map[Long, Set[String]] =
    Tables.events(spark, dir).select("user_id", "event_type").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap

  test("assocRules: support/confidence/lift match a brute-force basket recompute") {
    val out = ops.Publisher.assocRules(spark, dir).collect()
    assert(out.nonEmpty)
    val baskets = userTypes()
    val total = baskets.size.toLong
    def usersWith(t: String) = baskets.count(_._2.contains(t)).toLong
    out.foreach { r =>
      val ante = r.getAs[String]("antecedent")
      val cons = r.getAs[String]("consequent")
      val pair = r.getAs[Long]("pair_users")
      assert(pair === baskets.count { case (_, s) => s.contains(ante) && s.contains(cons) }.toLong)
      assert(r.getAs[Double]("confidence") === pair.toDouble / usersWith(ante))
      assert(r.getAs[Double]("lift") ===
        (pair * total).toDouble / (usersWith(ante) * usersWith(cons)))
    }
    // directed: every ordered pair with nonzero support appears
    val types = baskets.values.flatten.toSet
    for (a <- types; b <- types if a != b) {
      val sup = baskets.count { case (_, s) => s.contains(a) && s.contains(b) }
      assert(out.exists(r => r.getAs[String]("antecedent") == a &&
        r.getAs[String]("consequent") == b) === (sup > 0))
    }
  }

  test("cohortRetention: offset-0 cell equals cohort size and users never exceed it") {
    val out = ops.Dau.cohortRetention(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.nonEmpty)
    val cohortSizes = out.collect { case ((w, 0L), n) => w -> n }
    assert(cohortSizes.nonEmpty)
    out.foreach { case ((w, off), n) =>
      assert(off >= 0)
      assert(n <= out((w, 0L)), s"cell ($w,$off) larger than its cohort")
    }
    // cohort sizes partition the user base
    val nUsers = Tables.events(spark, dir)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(cohortSizes.map(_._2).sum === nUsers)
  }

  test("gmvMadOutliers: flagged days exceed k*MAD recomputed from the dailies") {
    val daily = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("gmv"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val h = (s.length - 1) * 0.5
      val lo = s(h.toInt); val hi = s(math.ceil(h).toInt)
      lo + (hi - lo) * (h - h.toInt)
    }
    val med = medianOf(daily.values.toSeq)
    val mad = medianOf(daily.values.map(v => math.abs(v - med)).toSeq)
    val flagged = ops.Olap.gmvMadOutliers(spark, dir).collect()
    val expected = daily.filter { case (_, v) => math.abs(v - med) > ops.Olap.MadK * mad }
    assert(flagged.map(_.getString(0)).toSet === expected.keySet)
    flagged.foreach { r =>
      assert(r.getDouble(3) === math.abs(daily(r.getString(0)) - med))
      assert(r.getDouble(4) === mad)
    }
  }

  test("eventTransitions: counts match a per-user sequence replay and probs row-normalize") {
    val out = ops.Publisher.eventTransitions(spark, dir).collect()
    assert(out.nonEmpty)
    val seqs = Tables.events(spark, dir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .groupBy(_.getLong(0)).values
      .flatMap { rows =>
        val ordered = rows.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
          .map(_.getString(3))
        ordered.sliding(2).collect { case Array(a, b) => (a, b) }
      }.toSeq
    val expected: Map[(String, String), Long] =
      seqs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap === expected)
    // probabilities sum to 1 per prev_type (up to fp addition of <|types| terms)
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-12)
    }
  }

  test("twapPerUser matches a single-threaded weighted recompute") {
    val out = ops.Olap.twapPerUser(spark, dir).collect()
    assert(out.nonEmpty)
    val byUser = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect().groupBy(_.getLong(0))
    out.foreach { r =>
      val rows = byUser(r.getLong(0)).sortBy(x => (x.getLong(1), x.getLong(2)))
      val ivs = rows.sliding(2).collect {
        case Array(a, b) => (a.getLong(3), b.getLong(1) - a.getLong(1))
      }.toSeq
      val wsum = ivs.map { case (c, dt) => c * dt }.sum
      val dtTot = ivs.map(_._2).sum
      assert(r.getAs[Long]("dt_total") === dtTot)
      assert(r.getAs[Long]("n_intervals") === ivs.size.toLong)
      assert(r.getAs[Double]("twap") === wsum.toDouble / (dtTot.toDouble * 100.0))
    }
  }

  test("invertedIndex: df and postings head match a token-set recompute") {
    val out = text.TextOps.invertedIndex(spark, dir).collect()
    assert(out.nonEmpty)
    val docTerms = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.trim.split("\\s+").toSet)
    val byTerm = docTerms.flatMap { case (id, ts) => ts.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(out.map(_.getString(0)).toSet === byTerm.keySet)
    out.foreach { r =>
      val ids = byTerm(r.getString(0))
      assert(r.getLong(1) === ids.length.toLong)
      assert(r.getString(2) === ids.take(text.TextOps.PostingsCap).mkString(","))
    }
  }

  test("labelCentroids: per-cell micro-sums match a brute-force recompute") {
    val out = vector.VectorOps.labelCentroids(spark, dir).collect()
    assert(out.nonEmpty)
    val vecs = Tables.embeddings(spark, dir).select("label", "embedding").collect()
      .map(r => (r.getInt(0).toLong, r.getSeq[Float](1).map(_.toDouble)))
    val dims = vecs.head._2.length
    assert(out.length === vecs.map(_._1).distinct.length * dims)
    val cells = vecs.flatMap { case (l, v) =>
      v.zipWithIndex.map { case (x, i) => (l, i.toLong) -> math.floor(x * 1e6 + 0.5).toLong }
    }.groupBy(_._1).view.mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
    out.foreach { r =>
      val (n, sm) = cells((r.getLong(0), r.getLong(1)))
      assert(r.getLong(2) === n)
      assert(r.getLong(3) === sm)
      assert(r.getDouble(4) === sm.toDouble / (n * 1e6))
    }
  }

  test("scrubDigits masks every digit run and counts them") {
    val out = text.TextOps.scrubDigits(spark, dir).collect()
    assert(out.nonEmpty)
    val props = Tables.events(spark, dir).select("event_id", "props").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val raw = props(r.getLong(0))
      assert(r.getString(1) === raw.replaceAll("[0-9]+", "#"))
      assert(!r.getString(1).exists(_.isDigit))
      assert(r.getLong(2) === "[0-9]+".r.findAllIn(raw).size.toLong)
    }
  }
}
