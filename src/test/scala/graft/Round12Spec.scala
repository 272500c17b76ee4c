package graft

import org.apache.spark.sql.functions._

/** Round-12 additions: the lazy-greedy coverage variant's equality with
  * the exact greedy, its evaluation-count advantage, and the ANN
  * admission gate's batch/stream arithmetic pins. */
class Round12Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("q262 lazy greedy picks the IDENTICAL sequence as q230's exact greedy (sf0.01)") {
    import graft.text.Curation
    val exact = Curation.greedyCoverage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (lazyDf, stats) =
      Curation.greedyCoverageLazyWithStats(spark, dir, k = 20,
        evalBatch = 16, loadChunk = 256)
    val lzy = lazyDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(lzy.toSeq === exact.toSeq,
      "lazy greedy must reproduce every (iter, pick, gain, covered) row")
    // the point of Minoux: far fewer re-evaluations than the exact
    // greedy's k x N = 20 x 500 = 10,000 (round 1 is free — the upper
    // bounds are exact gains; later rounds re-evaluate only queue tops)
    val n = Tables.documents(spark, dir).count()
    assert(stats.evals * 4 < 20L * n,
      s"lazy greedy re-evaluated ${stats.evals} gains — expected well " +
        s"under a quarter of the exact greedy's ${20 * n}")
    info(s"lazy greedy: ${stats.evals} evals / ${stats.jobs} jobs / " +
      s"${stats.loadedRows} frontier rows vs exact ${20 * n} evals")
  }

  test("lazy greedy equality holds under small eval batches and tiny frontier chunks") {
    import graft.text.Curation
    // stress the refill/re-evaluation interleaving: batch 1 forces one
    // job per stale candidate; chunk 16 forces many frontier loads
    val exact = Curation.greedyCoverage(spark, "/root/testdata/sf0.001", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val lzy = Curation.greedyCoverageLazy(spark, "/root/testdata/sf0.001",
      k = 8, evalBatch = 1, loadChunk = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lzy.toSeq === exact.toSeq)
  }

  test("q263 re-balance: merged cell vanishes, split mints cell 16, transition matrix accounts for every vector") {
    import graft.vector.VectorOps
    val (before, after) = VectorOps.rebalancedIvf(spark, dir)
    val beforeIds = before.map(_._1).toSet
    val afterIds = after.map(_._1).toSet
    val Seq(cold) = (beforeIds -- afterIds).toSeq
    assert(afterIds -- beforeIds === Set(16), "split must mint cell 16")
    // the hot cell keeps its id but gets a NEW centroid (sub-cell 0)
    val changed = before.toMap.keySet.intersect(after.toMap.keySet)
      .filter(c => before.toMap.apply(c) != after.toMap.apply(c))
    assert(changed.size === 1, s"exactly the hot cell re-centroids: $changed")
    val out = VectorOps.ivfRebalance(spark, dir).collect()
    val total = out.map(_.getAs[Long]("n_vecs")).sum
    assert(total === Tables.embeddings(spark, dir).count())
    out.foreach { r =>
      val (b, a) = (r.getAs[Long]("cell_before"), r.getAs[Long]("cell_after"))
      assert(a !== cold.toLong, "no vector may land in the merged-away cell")
      if (b == cold.toLong) assert(r.getAs[Long]("moved") === 1L)
      assert(r.getAs[Long]("moved") === (if (b == a) 0L else 1L))
      assert(r.getAs[Long]("n_corpus") + r.getAs[Long]("n_fresh")
        === r.getAs[Long]("n_vecs"))
    }
  }

  test("q261 ANN admission: verdicts recompute from first principles (frozen index, probe rule, tie-break)") {
    import graft.vector.VectorOps
    val out = VectorOps.annAdmission(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    // every fresh vector appears exactly once; admit is the documented
    // function of best_cos_micro; candidate-free vectors are admitted
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length === ids.length)
    out.foreach { r =>
      val admit = r.getAs[Long]("admit")
      val best = Option(r.getAs[java.lang.Long]("best_cos_micro")).map(_.toLong)
      val nCand = r.getAs[Long]("n_cand")
      assert(admit === (if (best.exists(_ >= 400000L)) 0L else 1L))
      if (nCand == 0) assert(best.isEmpty && admit === 1L)
      else assert(best.nonEmpty)
    }
  }
}
