package graft

import org.apache.spark.sql.functions._

/** Round-14 pins: the q285 tokenizer-drift mechanics (zero-frequency
  * invariance + planted vocabulary-shift batch) and the q284 PQ
  * encode/reconstruction kernels. */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  test("q285 zero-frequency invariance: union-vocab training picks EXACTLY the corpus-only merge sequence and stops where it stops") {
    // corpus {abab:3, abx:2} trains ab -> abab -> abx then exhausts (3
    // merges). The union adds fresh-only words at freq 0: their pairs
    // (q,z)/(ab,q) must never win — without the cnt >= 1 stop guard the
    // loop would keep merging zero-count pairs after exhaustion and the
    // "frozen" tokenizer would diverge from corpus-only training.
    val corpus = Seq(("abab", 3L), ("abx", 2L)).toDF("word", "freq")
    val union = corpus.unionByName(
      Seq(("qz", 0L), ("abq", 0L)).toDF("word", "freq"))
    val (mCorpus, _) = graft.text.Curation.bpeTrainCore(spark, corpus, 10)
    val (mUnion, segU) = graft.text.Curation.bpeTrainCore(spark, union, 10)
    assert(mCorpus === Seq(
      (1L, "a", "b", "ab", 8L),
      (2L, "ab", "ab", "abab", 3L),
      (3L, "ab", "x", "abx", 2L)))
    assert(mUnion === mCorpus,
      "freq-0 words changed the frozen merge sequence")
    // the freq-0 words' final states ARE the frozen tokenizer applied
    // to unseen words: abq picked up the trained ab merge, qz did not
    val segs = segU.select(
      regexp_replace(trim(col("s")), " ", "").as("word"),
      size(split(trim(col("s")), "  ")).cast("long").as("n"),
      col("freq")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(segs === Map(
      "abab" -> (1L, 3L), "abx" -> (1L, 2L),
      "qz" -> (2L, 0L), "abq" -> (2L, 0L)))
  }

  test("q285 planted vocabulary-shift batch: OOV bucketed, frozen fertility pays the drift a retrain recovers") {
    val base = java.nio.file.Files.createTempDirectory("graft_bpedrift").toString
    Seq(
      (1L, "corpus", "en", "aba aba caca"),   // corpus side (doc_id < 250)
      (300L, "f1", "en", "aba zzz"))          // fresh batch with unseen zzz
      .toDF("doc_id", "source", "lang", "text")
      .write.parquet(s"$base/documents.parquet")
    val out = graft.text.Curation.bpeDrift(spark, base).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "f1")
    assert(r.getLong(1) === 2L, "n_tokens")
    assert(r.getLong(2) === 1L, "zzz is OOV under the corpus vocabulary")
    assert(r.getLong(3) === 500000L, "oov_micro")
    // frozen (corpus-trained) merges collapse aba but have never seen
    // z: zzz stays 3 chars -> (1 + 3) / 2 = 2.0 symbols/token. The
    // retrain learns zz -> zzz and reaches 1.0 — the drift table is
    // exactly the retrain payoff.
    assert(r.getLong(4) === 2000000L, "frozen_fertility_micro")
    assert(r.getLong(5) === 1000000L, "retrained_fertility_micro")
    assert(r.getLong(6) === 1000000L, "drift_micro")
  }

  test("pqCodesCol/pqReconCol: hand-worked encode, lower-cid ties, exact reconstruction") {
    val cb = Map(
      (0, 0) -> Seq(1.0, 0.0), (0, 1) -> Seq(0.0, 1.0),
      // sub 1 entries are identical: the argmin is a pure tie and must
      // go to the LOWER cid (the q282 assignment discipline)
      (1, 0) -> Seq(2.0, 2.0), (1, 1) -> Seq(2.0, 2.0))
    val row = Seq((1L, Seq(0.9, 0.1, 3.0, 3.0))).toDF("vec_id", "v")
      .withColumn("codes", graft.vector.VectorOps.pqCodesCol("v", cb, 2, 2))
      .withColumn("recon", graft.vector.VectorOps.pqReconCol("codes", cb, 2, 2))
      .head()
    assert(row.getSeq[Int](2) === Seq(0, 0))
    assert(row.getSeq[Double](3) === Seq(1.0, 0.0, 2.0, 2.0))
  }

  test("q286 t-closeness: hand-worked EMD — the balanced stratum passes t, the concentrated one pays the cumsum mass") {
    val base = java.nio.file.Files.createTempDirectory("graft_tclose").toString
    Seq((1L, "SEG1", 0), (2L, "SEG1", 1))
      .toDF("c_custkey", "c_mktsegment", "c_nationkey")
      .write.parquet(s"$base/customer.parquet")
    Seq((1L, "a"), (1L, "a"),
      (2L, "a"), (2L, "b"), (2L, "a"), (2L, "b"))
      .toDF("o_custkey", "o_orderpriority")
      .write.parquet(s"$base/orders.parquet")
    // global: a 4/6 -> 666667 micro, b 2/6 -> 333333.
    // Stratum (SEG1,0) is all-a: cumsums 333333 then 0 -> EMD 333333,
    // over t=200000 -> fails. Stratum (SEG1,1) is 50/50: cumsums
    // -166667 then 0 -> EMD 166667 -> passes. (m-1 = 1, so EMD is the
    // plain |cumsum| sum here.)
    val got = graft.ops.Quality.tCloseness(spark, base).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === Seq(
      ("SEG1", 0L, 1L, 2L, 333333L, 0L),
      ("SEG1", 1L, 1L, 4L, 166667L, 1L)))
  }

  test("distributed CC: pointer jumping converges in O(log diameter) rounds on a planted chain, with the exact min labeling") {
    // a 512-node chain has diameter 511: edge propagation alone needs
    // ~511 rounds (the judge-r13 chain hazard); pointer jumping must
    // land in ~log2(512)+slack and still label every node 0
    val n = 512
    val pairs = spark.range(n - 1)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val (labels, rounds) = graft.dedup.DedupOps.minLabelFixpoint(pairs)
    assert(rounds <= 14, s"chain-512 took $rounds rounds — shortcut broken")
    val bad = labels.filter(col("label") =!= 0L).count()
    assert(bad === 0L, s"$bad nodes missed the component minimum")
    assert(labels.count() === n.toLong)
    // and through the public operator, forced onto the distributed path
    val docs = spark.range(n).select(col("id").as("doc_id"))
    val cc = graft.dedup.DedupOps
      .connectedComponents(docs, pairs, localThreshold = -1L)
    assert(cc.filter(col("cluster_id") =!= 0L || col("cluster_size") =!= n.toLong)
      .count() === 0L)
  }

  test("q288/q289 structural pins: drift covers every subspace with consistent gains; IVFADC returns dense in-corpus top-k") {
    val dir = "/root/testdata/sf0.001"
    val d = graft.vector.VectorOps.pqDrift(spark, dir).collect()
    assert(d.length === 16, "one row per gate subspace (m=16)")
    d.foreach { r =>
      assert(r.getLong(3) === r.getLong(1) - r.getLong(2), "gain = frozen - retrained")
      assert(r.getLong(4) === (if (r.getLong(2) <= r.getLong(1)) 1L else 0L))
    }
    val topk = graft.vector.VectorOps.ivfAdcTopK(spark, dir).collect()
    val byQ = topk.groupBy(_.getLong(0))
    assert(byQ.size === 5)
    byQ.foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq === (1L to 10L), "dense ranks")
      assert(rows.forall(_.getLong(2) < 250L), "results come from the corpus side only")
    }
  }

  test("rankWindowCheck: in-window passes (including ties and tiny n), out-of-window trips") {
    import graft.ops.SketchBounds.rankWindowCheck
    // n=10, q=0.5 -> target 5, slack eps*n+1 = 1.01: value occupying
    // rank 5 passes; rank interval [9,9] is 2.99 slack-units out
    assert(rankWindowCheck("t", "m", 0.5, 0.001, Seq((4L, 5L, 10L))).ok)
    assert(!rankWindowCheck("t", "m", 0.5, 0.001, Seq((8L, 9L, 10L))).ok)
    // heavy ties: interval [1, 9] straddles the target -> passes
    assert(rankWindowCheck("t", "m", 0.5, 0.001, Seq((0L, 9L, 10L))).ok)
    // the sf0.001 case that mis-fired the old 2%-VALUE gate: a 3000-row
    // group where the returned value sits 3 ranks from target — far
    // inside eps*n+1 = 4 — but one integer day-lag step = 9% in value
    assert(rankWindowCheck("t", "m", 0.5, 0.001, Seq((1497L, 1497L, 3000L))).ok)
    // q=0.95 edge: target 9.5 of n=10, max element (interval [10,10]) ok
    assert(rankWindowCheck("t", "m", 0.95, 0.001, Seq((9L, 10L, 10L))).ok)
    // worst-case normalization: violation distance scales by the slack
    val v = rankWindowCheck("t", "m", 0.5, 0.001, Seq((8L, 9L, 10L)))
    assert(v.worstErr > 1.0 && v.bound === 0.0)
  }

  test("q284 exact twin equals q261's verdict column-for-column (same probed cells, same threshold)") {
    val dir = "/root/testdata/sf0.001"
    val pq = graft.vector.VectorOps.pqAdmission(spark, dir)
      .select(col("vec_id"), col("n_cand"),
        col("exact_best_cos_micro"), col("exact_admit")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3))).toSeq
    val ex = graft.vector.VectorOps.annAdmission(spark, dir)
      .select(col("vec_id"), col("n_cand"),
        col("best_cos_micro"), col("admit")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3))).toSeq
    assert(pq === ex,
      "the twin riding in q284 must be q261's exact gate, not a variant")
  }
}
