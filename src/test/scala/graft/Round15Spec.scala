package graft

import org.apache.spark.sql.functions._

/** Round-15 pins: the data-carried coarse quantizer (HOF-literal
  * probe/assignment and the broadcast-join form must implement the
  * exact lexicographic argmin a driver replay computes, at cell counts
  * past the old expression-inlining wall), codebook-shape validation,
  * residual quantization (q291), and pruned-BPE (q292) mechanics. */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  private def sdot(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0d; var i = 0; val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  // deterministic little test grid: 40 vectors, dim 6
  private def testVecs(n: Int = 40, dim: Int = 6): Seq[(Long, Seq[Double])] =
    (0 until n).map { i =>
      (i.toLong, (0 until dim).map(j => ((i * 7 + j * 13) % 19 - 9) / 3.0d))
    }

  private def driverCell(v: Seq[Double], cents: Seq[(Int, Seq[Double])]): Int =
    cents.map { case (c, cv) =>
      (sdot(v, v) - 2.0d * sdot(v, cv) + sdot(cv, cv), c)
    }.min._2

  test("cellOf (HOF literal), assignCellsJoin, and a driver replay agree — including non-contiguous cell ids and ties to the lower id") {
    val vs = testVecs()
    val e = vs.toDF("vec_id", "v")
    // non-contiguous ids (the rebalance before/after sets' shape) and a
    // DUPLICATED centroid vector so the tie-break actually fires
    val cents: Seq[(Int, Seq[Double])] = Seq(
      3 -> vs(0)._2, 7 -> vs(5)._2, 12 -> vs(0)._2, 20 -> vs(9)._2)
    val got = e.withColumn("cell", graft.vector.VectorOps.cellOf(cents))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = vs.map { case (id, v) => id -> driverCell(v, cents) }.toMap
    assert(got === want)
    // the duplicated centroid must always lose to its lower-id twin
    assert(!got.values.exists(_ == 12))
    // join form (contiguous ids 0..k-1 by construction) vs driver
    val centsSeq = cents.map(_._2)
    val contJoin = graft.vector.VectorOps.assignCellsJoin(e, centsSeq)
      .select("corpus_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val contWant = vs.map { case (id, v) =>
      id -> driverCell(v, centsSeq.zipWithIndex.map { case (cv, c) => (c, cv) })
    }.toMap
    assert(contJoin === contWant)
  }

  test("the coarse quantizer plan stays constant-size past the expression-inlining wall (k = 1024 cells compiles and runs)") {
    val vs = testVecs(64, 8)
    val e = vs.toDF("vec_id", "v")
    def centsOf(k: Int): Seq[(Int, Seq[Double])] = (0 until k).map { c =>
      c -> (0 until 8).map(j => ((c * 11 + j * 5) % 23 - 11) / 4.0d).toSeq
    }
    // STRUCTURAL pin (advisor r15: a wall-clock bound flakes on a loaded
    // host independent of any plan regression): past InlineMaxCells the
    // assignment must ride the HOF-literal form, whose expression tree is
    // CONSTANT-SIZE in k — the centroid grid lives inside two Literal
    // nodes, never as per-centroid struct expressions. The r14 pathology
    // (k inlined structs -> ~40 s of Janino compile per plan at k=1e3)
    // is exactly a tree that GROWS with k.
    def treeSize(k: Int): Int =
      org.apache.spark.sql.GraftSqlShim
        .expression(graft.vector.VectorOps.cellOf(centsOf(k)))
        .collect { case x => x }.size
    val s256 = treeSize(256)
    val s1024 = treeSize(1024)
    assert(s1024 === s256,
      s"cellOf expression tree grew with k ($s256 nodes at k=256 vs " +
        s"$s1024 at k=1024) — the constant-plan HOF-literal form regressed")
    assert(s1024 < 200, s"cellOf tree unexpectedly large: $s1024 nodes")
    // and the k=1024 plan still compiles + runs end to end
    val n = e.withColumn("cell",
        graft.vector.VectorOps.cellOf(centsOf(1024)))
      .groupBy("cell").count().count()
    assert(n >= 1L)
  }

  test("probeCells keeps the nProbe nearest cells with (dist, cell) lexicographic order") {
    val vs = testVecs(10, 4)
    val e = vs.toDF("vec_id", "v")
    val cents: Seq[Seq[Double]] =
      Seq(vs(0)._2, vs(1)._2, vs(0)._2, vs(3)._2) // dup -> tie at cells 0/2
    val probed = e
      .withColumn("pc", graft.vector.VectorOps.probeCells(col("v"), cents, 2))
      .select(col("vec_id"), expr("transform(pc, x -> x.cell)").as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    vs.foreach { case (id, v) =>
      val want = cents.zipWithIndex
        .map { case (cv, c) => (sdot(v, v) - 2.0d * sdot(v, cv) + sdot(cv, cv), c) }
        .sorted.take(2).map(_._2)
      assert(probed(id) === want, s"vec $id")
      // the duplicated-centroid twins tie on distance, so when both
      // make the cut the LOWER id must come first (the q35 probe rule)
      if (probed(id).contains(0) && probed(id).contains(2))
        assert(probed(id).indexOf(0) < probed(id).indexOf(2))
    }
  }

  test("codebookShape rejects empty and holed codebooks, accepts full grids") {
    val full = (for { s <- 0 until 2; k <- 0 until 3 }
      yield (s, k) -> Seq(s.toDouble, k.toDouble)).toMap
    assert(graft.vector.VectorOps.codebookShape(full) === (2, 3))
    intercept[IllegalArgumentException] {
      graft.vector.VectorOps.codebookShape(Map.empty)
    }
    intercept[IllegalArgumentException] {
      graft.vector.VectorOps.codebookShape(full - ((1, 1)))
    }
  }

  test("q291 residual quantization: stage 2 reduces distortion on the real store and both stages' integers are consistent") {
    val out = graft.vector.VectorOps.rqTrain(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length === graft.vector.VectorOps.PqM)
    out.foreach { r =>
      val (s1, s2, gain, improved) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(gain === s1 - s2)
      assert(improved === (if (s2 <= s1) 1L else 0L))
      // measured property of the fixture store (not a Lloyd guarantee —
      // stage 2 has no zero-centroid escape): the second stage pays off
      assert(improved === 1L, s"stage 2 made sub ${r.getLong(0)} worse")
      assert(s2 > 0L, "residual distortion collapsed to zero — degenerate fixture")
    }
  }

  test("q292 pruned BPE: the pruned merge sequence is a strict PREFIX of the full one — the floor only stops training early") {
    val words = Seq(
      ("aaaa", 50L), ("aab", 30L), ("bcbc", 4L), ("bcd", 3L))
      .toDF("word", "freq")
    val (full, _) = graft.text.Curation.bpeTrainCore(spark, words, 8)
    val (pruned, _) = graft.text.Curation.bpeTrainCore(spark, words, 8,
      minCount = 20L)
    assert(pruned.length < full.length)
    assert(full.take(pruned.length) === pruned,
      "pruning altered the merge sequence instead of truncating it")
    assert(pruned.forall(_._5 >= 20L))
    assert(full.drop(pruned.length).forall(_._5 < 20L),
      "a merge above the floor was pruned")
  }

  test("q294 sq8: a hand-worked dim quantizes exactly, zero-span dims short-circuit, codes clamp") {
    val base = java.nio.file.Files.createTempDirectory("graft_sq8").toString
    // dim 0: span [0, 255] — every integer value reconstructs exactly
    // (scale 1.0). dim 1: constant (zero span). dim 2: span [0, 2.55]
    // with a mid value 1.0 -> code floor(1.0/0.01 + 0.5) = 100 ->
    // recon 1.00 exactly (scale = 2.55/255 = 0.01).
    Seq((0L, Seq(0.0f, 7.0f, 0.00f), 0),
        (1L, Seq(255.0f, 7.0f, 2.55f), 0),
        (2L, Seq(17.0f, 7.0f, 1.00f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$base/embeddings.parquet")
    val out = graft.vector.VectorOps.sq8Train(spark, base).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(0L) === ((0L, 255000000L, 3L, 0L)), "integer-grid dim must be lossless")
    assert(out(1L) === ((7000000L, 7000000L, 3L, 0L)), "zero-span dim short-circuits")
    val (mn2, mx2, n2, err2) = out(2L)
    assert((mn2, mx2, n2) === ((0L, 2550000L, 3L)))
    // 1.0 -> code 100 -> recon exactly 1.0 in double? 2.55/255 is not
    // exact binary, so allow only sub-micro residue
    assert(err2 <= 1L, s"quantization residue $err2 exceeds a micro")
  }

  test("q295 tiers: more bytes never cost more distortion on the real store, and the rows carry the right byte costs") {
    val rows = graft.vector.VectorOps.compressionTiers(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet === Set("pq", "rq2", "sq8"))
    assert(rows("pq")._1 === graft.vector.VectorOps.PqM.toLong)
    assert(rows("rq2")._1 === 2L * graft.vector.VectorOps.PqM)
    assert(rows("sq8")._1 === 64L)
    assert(rows("rq2")._2 <= rows("pq")._2,
      "the second RQ stage must not add distortion")
    assert(rows("sq8")._2 <= rows("rq2")._2,
      "8x the bytes must beat the coded tiers on this store")
  }

  test("q296 allocation: on a store whose variance concentrates in one natural subspace, the balanced allocation wins overall") {
    val base = java.nio.file.Files.createTempDirectory("graft_opq").toString
    // dims 0..15 (exactly natural subspace 0 at m=4/dim=64) carry all
    // the variance; the rest are constants. Natural slicing forces one
    // 16-entry codebook to quantize ALL the signal; the snake deal
    // spreads the 16 hot dims 4-per-subspace.
    val rows = (0L until 50L).map { id =>
      val v = (0 until 64).map { d =>
        if (d < 16) (((id * 31 + d * 7) % 101).toFloat / 10.0f)
        else 0.001f * d
      }
      (id, v, 0)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$base/embeddings.parquet")
    val out = graft.vector.VectorOps.opqAllocate(spark, base).collect()
    assert(out.length === graft.vector.VectorOps.PqM)
    out.foreach { r =>
      assert(r.getLong(3) === r.getLong(1) - r.getLong(2), "gain arithmetic")
    }
    val totalNatural = out.map(_.getLong(1)).sum
    val totalBalanced = out.map(_.getLong(2)).sum
    assert(totalBalanced < totalNatural,
      s"balanced $totalBalanced did not beat natural $totalNatural on the planted store")
  }

  test("q297 gate tiers: the 64-byte sq8 gate agrees with the exact gate at least as often as the 16-byte PQ gate (the q295 tradeoff in the gate dimension)") {
    val dir = "/root/testdata/sf0.001"
    def agreeRate(df: org.apache.spark.sql.DataFrame): Double = {
      val r = df.agg(sum(col("agree")).cast("double"), count(lit(1)).cast("double")).head()
      r.getDouble(0) / r.getDouble(1)
    }
    val sq8 = agreeRate(graft.vector.VectorOps.sq8Admission(spark, dir))
    val pq = agreeRate(graft.vector.VectorOps.pqAdmission(spark, dir))
    assert(sq8 >= pq,
      f"sq8 gate agreement $sq8%.3f fell below the PQ gate's $pq%.3f — more bytes bought worse decisions?")
    assert(sq8 >= 0.95, f"near-lossless tier agreement only $sq8%.3f")
  }

  test("q298 structural pins: overlaps bounded by k, recall arithmetic exact, and two-stage recon never leaves the code domain") {
    val out = graft.vector.VectorOps.rqRetrievalGain(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length === graft.vector.VectorOps.AdcGainQueries)
    out.foreach { r =>
      val (np, rp, nr, rr) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(np <= graft.vector.VectorOps.AdcGainK && nr <= graft.vector.VectorOps.AdcGainK)
      assert(rp === math.floor(1000000.0 * np / graft.vector.VectorOps.AdcGainK + 0.5).toLong)
      assert(rr === math.floor(1000000.0 * nr / graft.vector.VectorOps.AdcGainK + 0.5).toLong)
    }
  }

  test("q299 hierarchical assignment: exact on well-separated clusters, honest transition mass on the real store") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_hier").toString
    // 16 tight clusters around far-apart one-hot centers (the regime
    // where the two-level shortcut is lossless); vec 0..15 ARE the
    // centers (the derivable seed rule), 16..47 orbit them
    val rows = (0L until 48L).map { id =>
      val c = (id % 16).toInt
      val v = (0 until 16).map { d =>
        (if (d == c) 100.0f else 0.0f) +
          (if (id >= 16) ((id * 7 + d * 3) % 5).toFloat / 10.0f else 0.0f)
      }
      (id, v, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$base/embeddings.parquet")
    val planted = graft.vector.VectorOps.hierAssignAudit(spark, base).collect()
    assert(planted.forall(_.getLong(3) === 1L),
      "two-level assignment diverged from flat on separated clusters")
    assert(planted.map(_.getLong(2)).sum === 48L)
    // real store: total mass preserved, agree flag arithmetic exact
    val real = graft.vector.VectorOps
      .hierAssignAudit(spark, "/root/testdata/sf0.001").collect()
    assert(real.map(_.getLong(2)).sum === 500L)
    real.foreach { r =>
      assert(r.getLong(3) === (if (r.getLong(0) == r.getLong(1)) 1L else 0L))
    }
  }

  test("large-star/small-star CC equals union-find on random graphs and pointer jumping on every shape tried") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val pairs = Seq.fill(30)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
        .filter { case (a, b) => a != b }.distinct
      val df = pairs.toDF("doc_a", "doc_b")
      val (starLabels, _) = graft.dedup.DedupOps.largeSmallStarFixpoint(df)
      val got = starLabels.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      starLabels.unpersist()
      // union-find reference (union by min root = component minimum)
      val parent = Array.tabulate(20)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val expected = nodes.map(n => n -> find(n.toInt).toLong).toMap
      assert(got === expected)
      // and the pointer-jumping path agrees
      val (mlLabels, _) = graft.dedup.DedupOps.minLabelFixpoint(df)
      val ml = mlLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      mlLabels.unpersist()
      assert(ml === got)
    }
  }

  test("large-star/small-star CC: a planted 512-chain converges in O(log n) rounds to the exact min labeling") {
    val n = 512
    val pairs = spark.range(n - 1)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val (labels, rounds) = graft.dedup.DedupOps.largeSmallStarFixpoint(pairs)
    assert(rounds <= 14, s"chain-512 took $rounds rounds — star contraction broken")
    assert(labels.filter(col("label") =!= 0L).count() === 0L)
    assert(labels.count() === n.toLong)
    labels.unpersist()
  }

  test("q292 fertility tax is non-negative per source (fewer merges can never shrink symbol counts)") {
    val out = graft.text.Curation.bpePruned(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(7) >= 0L,
        s"source ${r.getString(0)}: pruned tokenizer got BETTER fertility?")
      assert(r.getLong(6) <= graft.text.Curation.BpeDefaultMerges.toLong)
    }
  }
}
