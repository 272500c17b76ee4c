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
    // the point of Minoux + the bulk fallback: fewer gain evaluations
    // than the exact greedy's k x N (round 1 is free — upper bounds are
    // exact gains) AND a bounded JOB count (<= ~5 jobs/round: two
    // escalating batches, one bulk refresh, the winner payload, frontier
    // loads) — per-job overhead is what actually dominates on a small
    // cluster, and 873 unbounded hunt jobs is the regression this pins
    val n = Tables.documents(spark, dir).count()
    assert(stats.evals < 20L * n,
      s"lazy greedy re-evaluated ${stats.evals} gains — must stay under " +
        s"the exact greedy's ${20 * n} (round 1 alone is free)")
    assert(stats.jobs <= 5L * 20 + 10,
      s"lazy greedy launched ${stats.jobs} jobs — the bulk fallback " +
        "must bound the per-round hunt (pure-Minoux regressed to 873)")
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

  test("q264 sensitivity sweep: monotone in the threshold and anchored to the full ledger at 0.7") {
    import graft.dedup.PrefixJoin
    val rows = PrefixJoin.dedupSensitivity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.length === 6)
    // raising the threshold can only LOSE pairs/removals and GAIN survivors
    rows.sliding(2).foreach {
      case Array((_, p1, d1, t1, s1), (_, p2, d2, t2, s2)) =>
        assert(p2 <= p1 && d2 <= d1 && t2 <= t1 && s2 >= s1)
      case _ =>
    }
    // the 0.7 row is the whole ledger
    assert(rows.head._2 === PrefixJoin.ppjoinPairs(spark, dir).count())
  }

  test("q265 modal agreement: bands partition the q204 ledger; min <= mean <= max per band") {
    import graft.vector.VectorOps
    val rows = VectorOps.modalAgreement(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_pairs")).sum
    assert(total === graft.dedup.PrefixJoin.ppjoinPairs(spark, dir).count())
    rows.foreach { r =>
      val band = r.getAs[Long]("jaccard_band_micro")
      assert(band >= 700000L && band <= 1000000L && band % 50000L === 0L)
      assert(r.getAs[Long]("min_cos_micro") <= r.getAs[Long]("mean_cos_micro"))
      assert(r.getAs[Long]("mean_cos_micro") <= r.getAs[Long]("max_cos_micro"))
    }
  }

  test("q266 power iteration: unit eigenvector, positive variance, eig bounded by trace") {
    import graft.vector.VectorOps
    val rows = VectorOps.powerIteration(spark, dir).collect()
    assert(rows.length === 64)
    val eig = rows.map(_.getAs[Long]("eig_micro")).distinct
    assert(eig.length === 1 && eig.head > 0L,
      s"one positive Rayleigh estimate expected: ${eig.toSeq}")
    // micro-requantized unit vector: sum of squares within the
    // quantization envelope of 1 (64 components, each off by <= 0.5e-6)
    val ss = rows.map { r =>
      val v = r.getAs[Long]("v_micro").toDouble / 1e6; v * v
    }.sum
    assert(math.abs(ss - 1.0) < 1e-3, s"eigenvector norm^2 = $ss")
    // dominant eigenvalue <= trace = total variance (micro units)
    val e2 = Tables.embeddings(spark, dir)
    val trace = graft.vector.VectorOps.quantizationAudit(spark, dir)
      .agg(org.apache.spark.sql.functions.sum(col("sig_sq_nano"))).head().getLong(0)
    // sig_sq is UNcentered energy (>= centered variance), nano per
    // vector summed over all: convert to a per-vector mean micro bound
    val n = e2.count()
    assert(eig.head <= trace / n / 1000L + 1000L,
      s"eig ${eig.head} exceeds the uncentered-energy bound")
  }

  test("q267 chunk dup audit: internal consistency and total-chunk reconciliation with q40") {
    import graft.text.TextOps
    val rows = TextOps.chunkDupAudit(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dup_chunks")
        === r.getAs[Long]("n_chunks") - r.getAs[Long]("distinct_chunks"))
      assert(r.getAs[Long]("dup_chunks") >= 0L)
      assert(r.getAs[Long]("shared_fps") <= r.getAs[Long]("distinct_chunks"))
    }
    assert(rows.map(_.getAs[Long]("n_chunks")).sum
      === TextOps.chunk(spark, dir).count())
  }

  test("q268 Hellinger divergence: full pair coverage, [0,1] range, one pair re-derived from raw counts") {
    import graft.text.Curation
    val rows = Curation.sourceDivergence(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Long]("h2_micro")))
    val nSources = Tables.documents(spark, dir)
      .select("source").distinct().count().toInt
    assert(rows.length === nSources * (nSources - 1) / 2)
    rows.foreach { case (_, h2) => assert(h2 >= 0L && h2 <= 1000000L) }
    // re-derive one pair's H^2 directly (plain double sums — the nano
    // discipline only changes the last digits)
    val (sa, sb) = rows.head._1
    val toks = Tables.documents(spark, dir)
      .filter(col("source").isin(sa, sb))
      .select(col("source"), explode(expr(graft.text.TextOps.TokensExpr)).as("w"))
      .groupBy("source", "w").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val vocabAll = Tables.documents(spark, dir)
      .select(explode(expr(graft.text.TextOps.TokensExpr)).as("w"))
      .distinct().count()
    val ca = toks.filter(_._1 == sa).map(t => t._2 -> t._3).toMap
    val cb = toks.filter(_._1 == sb).map(t => t._2 -> t._3).toMap
    val da = ca.values.sum + vocabAll.toDouble
    val db = cb.values.sum + vocabAll.toDouble
    val union = ca.keySet ++ cb.keySet
    val bcPresent = union.toSeq.map { w =>
      math.sqrt((ca.getOrElse(w, 0L) + 1L).toDouble / da
        * (cb.getOrElse(w, 0L) + 1L).toDouble / db)
    }.sum
    val bc = bcPresent + (vocabAll - union.size) / math.sqrt(da * db)
    val expected = 1.0 - bc
    assert(math.abs(rows.head._2 / 1e6 - expected) < 1e-3,
      s"pair ($sa, $sb): got ${rows.head._2 / 1e6}, direct $expected")
  }

  test("q269 fertility: one (source, lang) group re-derived from raw documents") {
    import graft.text.TextOps
    val rows = TextOps.tokenizerFertility(spark, dir).collect()
    assert(rows.nonEmpty)
    val r = rows.head
    val (src, lang) = (r.getString(0), r.getString(1))
    val docs = Tables.documents(spark, dir)
      .filter(col("source") === src && col("lang") === lang)
      .select(col("text")).collect().map(_.getString(0))
    val toks = docs.map(_.trim.split("\\s+").length.toLong).sum
    assert(r.getAs[Long]("n_docs") === docs.length.toLong)
    assert(r.getAs[Long]("total_tokens") === toks)
    assert(r.getAs[Long]("total_chars") === docs.map(_.length.toLong).sum)
    assert(r.getAs[Long]("chars_per_token_micro")
      === math.floor(1e6 * docs.map(_.length.toLong).sum / toks + 0.5).toLong)
  }

  test("q270 cluster sizes: counts factor, masses partition the corpus") {
    import graft.dedup.DedupOps
    val rows = DedupOps.clusterSizeDist(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // n_docs in a size band = size x number of clusters of that size
      assert(r.getAs[Long]("n_docs")
        === r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum
      === Tables.documents(spark, dir).count())
  }

  test("q271 truncation waste: mass conservation and monotonicity across budgets") {
    import graft.text.Curation
    val rows = Curation.truncationWaste(spark, dir).collect()
      .sortBy(_.getAs[Long]("budget"))
    assert(rows.length === 4)
    val totals = rows.map(r =>
      r.getAs[Long]("tokens_kept") + r.getAs[Long]("tokens_lost")).distinct
    assert(totals.length === 1, "kept + lost must equal corpus tokens at every budget")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("docs_fit") >= a.getAs[Long]("docs_fit"))
        assert(b.getAs[Long]("tokens_lost") <= a.getAs[Long]("tokens_lost"))
      case _ =>
    }
  }

  test("q272 k-hop BFS: seed at hop 0, hop-1 set is exactly the seed's neighborhood, hops are shortest") {
    import graft.ops.Graph
    val sdir = "/root/testdata/sf0.001"
    val out = Graph.khopReach(spark, sdir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("hop")).toMap
    val li = Tables.lineitem(spark, sdir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }
    val seed = li.map(_._2).min
    assert(out(seed) === 0L)
    val nbrs = byOrder.filter(_.contains(seed)).flatten.toSet - seed
    assert(out.filter(_._2 == 1L).keySet === nbrs,
      "hop-1 must be exactly the seed's co-purchase neighborhood")
    // shortest-path property via a driver BFS reference
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
    byOrder.foreach { parts =>
      parts.foreach(p => adj(p) = adj.getOrElse(p, Set.empty) ++ (parts - p))
    }
    var vis = Map(seed -> 0L)
    var frontier = Set(seed)
    for (h <- 1 to 3) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- vis.keySet
      vis ++= next.map(_ -> h.toLong)
      frontier = next
    }
    assert(out === vis)
  }

  test("q273 cosine explain: 5 ranked dims per pair, contributions re-derived from the raw embeddings") {
    import graft.vector.VectorOps
    val rows = VectorOps.cosineExplain(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Long]("rank"),
        r.getAs[Long]("dim"), r.getAs[Long]("contrib_nano")))
    assert(rows.nonEmpty && rows.length % 5 === 0)
    val embs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows.groupBy(_._1).foreach { case ((a, b), g) =>
      val products = embs(a).zip(embs(b)).zipWithIndex.map { case ((x, y), i) =>
        (i.toLong, math.floor(1e9 * x * y + 0.5).toLong)
      }
      val expected = products.sortBy { case (dim, p) => (-math.abs(p), dim) }.take(5)
      val got = g.sortBy(_._2).map(t => (t._3, t._4)).toSeq
      assert(got === expected.toSeq, s"pair ($a, $b)")
    }
  }

  test("bench warm-median and variance-flag helpers behave on the boundary cases") {
    import graft.Bench.{warmMedian, varianceFlagged}
    assert(warmMedian(Vector.empty) === -1.0)
    assert(warmMedian(Vector(2.0)) === 2.0)
    // lower-middle for even counts: the steady pass, never the noisy one
    assert(warmMedian(Vector(6.881, 1.087)) === 1.087)
    assert(warmMedian(Vector(1.0, 2.0, 9.0)) === 2.0)
    // variance flag: needs >= 2 warm passes, a non-trivial max (> 0.5 s),
    // and a >3x spread
    assert(!varianceFlagged(Vector.empty))
    assert(!varianceFlagged(Vector(5.0)))
    assert(varianceFlagged(Vector(1.087, 6.881)))
    assert(!varianceFlagged(Vector(1.0, 2.9)))        // < 3x spread
    assert(!varianceFlagged(Vector(0.1, 0.45)))       // sub-0.5 s noise
    assert(varianceFlagged(Vector(0.1, 0.2, 0.9)))    // 9x with real max
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
