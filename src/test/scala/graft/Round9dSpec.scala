package graft

import org.apache.spark.sql.functions._
import graft.vector.VectorOps

/** Round-9d: PQ asymmetric-distance search (q186). The load-bearing
  * claim is the ADC identity — when every corpus sub-vector sits
  * exactly on a codebook entry, the lookup-table distance IS the true
  * squared L2, so the approximate ranking equals the exact one and
  * recall is exactly 1.0. Integer-valued vectors keep all arithmetic
  * FP-exact, so the test pins the identity bit-for-bit, not "close". */
class Round9dSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ADC is exact (recall 1.0) when corpus sub-vectors sit on codebook entries") {
    import spark.implicits._
    // dim 8, m = 4 → 2-wide subspaces. ids 0..3 codebook, 4..5 queries,
    // 6..13 corpus rows assembled FROM codebook slices (varied mixes).
    val cb = Seq(
      Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Seq(4.0, 1.0, 3.0, 2.0, 7.0, 5.0, 1.0, 6.0),
      Seq(9.0, 8.0, 2.0, 7.0, 1.0, 3.0, 8.0, 2.0),
      Seq(5.0, 3.0, 6.0, 1.0, 4.0, 9.0, 2.0, 7.0))
    def mix(codes: Seq[Int]): Seq[Double] =
      codes.zipWithIndex.flatMap { case (c, s) => cb(c).slice(2 * s, 2 * s + 2) }
    val queries = Seq(
      Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0),
      Seq(8.0, 1.0, 4.0, 2.0, 9.0, 3.0, 5.0, 0.0))
    val corpus = Seq(
      mix(Seq(0, 1, 2, 3)), mix(Seq(1, 1, 1, 1)), mix(Seq(2, 0, 3, 1)),
      mix(Seq(3, 2, 1, 0)), mix(Seq(0, 0, 2, 2)), mix(Seq(1, 3, 0, 2)),
      mix(Seq(2, 2, 2, 2)), mix(Seq(3, 0, 1, 3)))
    val e = (cb ++ queries ++ corpus).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "v")
    // shortlist = k: the re-rank stage gets NO slack — the test pins the
    // ADC ranking itself, not the re-rank's ability to repair it
    val out = VectorOps.adcRecallCore(e, m = 4, c = 4, nQueries = 2L, k = 3,
      shortlist = 3).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("recall_micro") === 1000000L,
        s"query ${r.getAs[Long]("query_id")}: ADC must be exact on " +
          "codebook-aligned corpora")
    }
  }

  test("ADC recall on the real corpus clears the SketchBounds floor with headroom") {
    val recalls = VectorOps.adcRecall(spark, dir).collect()
      .map(_.getAs[Long]("recall_micro").toDouble / 1e6)
    assert(recalls.nonEmpty)
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.40, s"mean recall $mean under the SketchBounds gate")
    assert(recalls.min >= 0.20, s"min recall ${recalls.min} under the gate")
  }

  test("intervalCoverage banded-lead plan equals the naive global cumsum+lead") {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.Sessions
    val got = Sessions.intervalCoverage(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val sessions = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("ns",
        when(lag(col("ts"), 1).over(w).isNull
          || unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) >= 1800000000L,
          1L).otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(unix_micros(min(col("ts"))).as("s_us"),
        unix_micros(max(col("ts"))).as("e_us"))
    val gw = Window.orderBy(col("t").asc)
    val naive = sessions.select(col("s_us").as("t"), lit(1L).as("d"))
      .unionByName(sessions.select(col("e_us").as("t"), lit(-1L).as("d")))
      .groupBy("t").agg(sum(col("d")).as("net"))
      .withColumn("conc", sum(col("net")).over(
        gw.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("nt", lead(col("t"), 1).over(gw))
      .groupBy(date_format(timestamp_micros(col("t")), "yyyy-MM-dd").as("d"))
      .agg(sum(when(col("conc") > 0 && col("nt").isNotNull,
        col("nt") - col("t")).otherwise(lit(0L))).as("cov"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === naive)
    // band width must be semantics-free (boundary stitch exercised hard:
    // a prime band width scatters boundaries across all hours)
    val odd = Sessions.intervalCoverage(spark, dir, bandUs = 9999991L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === odd)
    // coverage can never exceed the wall-clock span of its day
    got.values.foreach(v => assert(v >= 0L && v <= 86400000000L))
  }

  test("shardPacking equals the naive global row_number deal and balances the shards") {
    import org.apache.spark.sql.expressions.Window
    val got = graft.text.Curation.shardPacking(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " "))
          .cast("long").as("n_tokens"))
    val naive = toks
      .withColumn("rn", row_number().over(
        Window.orderBy(col("n_tokens").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("n_tokens"),
        ((col("rn") - 1) % 8).cast("long").as("shard"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === naive.toSeq)
    // the deal's balance promises: shard CARDINALITIES within 1, and
    // token totals within one max-doc of each other per adjacent rank
    // (descending round-robin keeps every shard's total within the
    // largest single document of any other's)
    val byShard = got.groupBy(_._3)
    assert(byShard.keySet === (0L until 8L).toSet)
    val counts = byShard.view.mapValues(_.size).values.toSeq
    assert(counts.max - counts.min <= 1)
    val totals = byShard.view.mapValues(_.map(_._2).sum).values.toSeq
    val maxDoc = got.map(_._2).max
    assert(totals.max - totals.min <= maxDoc,
      s"shard totals ${totals.sorted} spread more than one max-doc ($maxDoc)")
  }

  test("applyDiff(old, diff(old, new)) reconstructs new exactly, including null transitions") {
    import spark.implicits._
    import graft.ops.Maintenance
    val old = Seq((1L, Option("a"), Option(1.0)), (2L, Option("b"), None),
      (3L, None, Option(3.0)), (4L, Option("d"), Option(4.0)))
      .toDF("k", "s", "v")
    val nw = Seq((1L, Option("a"), Option(1.0)), (2L, None, None),
      (4L, Option("d"), Option(9.0)), (5L, Option("e"), Option(5.0)))
      .toDF("k", "s", "v")
    val changes = Maintenance.snapshotDiffFull(old, nw, "k", Seq("s", "v"))
    val rebuilt = Maintenance.applyDiff(old, changes, "k", Seq("s", "v"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    val target = nw.collect().map(r => (r.getLong(0), Option(r.getString(1)),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(rebuilt === target)
    // and the reference-scale round trip on real orders
    val n = Maintenance.ordersMergeApply(spark, dir).count()
    val expect = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 89 =!= 0).count()
    assert(n === expect)
  }

  test("asOfSnapshot degenerates to latestPerUser past the end of history") {
    import graft.ops.Changelog
    val snap = Changelog.asOfSnapshot(spark, dir, cutoff = "2099-01-01")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val latest = Changelog.latestPerUser(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3))).toSeq
    assert(snap.nonEmpty && snap === latest)
    // and before history began, the dimension is empty
    assert(Changelog.asOfSnapshot(spark, dir, cutoff = "2000-01-01").count() === 0L)
  }

  test("pqEncode still matches its oracle shape after the pqCodes refactor") {
    // q165 is oracle-gated at verify time; here just pin the invariants
    // the refactor must preserve: one row per encoded vector, codes in
    // [0, c), err2 non-negative
    val out = VectorOps.pqEncode(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      (1 to 4).foreach { i =>
        val code = r.getInt(i)
        assert(code >= 0 && code < 16)
      }
      assert(r.getAs[Long]("err2_micro") >= 0L)
    }
  }
}
