package graft

import org.apache.spark.sql.functions._

/** Round-16 pins: the hierarchical index-build assignment (q300/q301),
  * its exactness/prune semantics, and the auto-dispatch threshold. */
class Round16Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q300's full transition-matrix agreement equals q301's rank-shortcut row at the wired s") {
    val wired = graft.vector.VectorOps.HierAuditTopS
    val m = graft.vector.VectorOps.hierPruneAudit(spark, dir)
      .agg(sum(when(col("agree") === 1L, col("n_vecs")).otherwise(0L)),
        sum(col("n_vecs"))).head()
    val sweep = graft.vector.VectorOps.hierProbeSweep(spark, dir)
      .filter(col("top_s") === wired.toLong)
      .select("n_agree", "n_vecs").head()
    assert(m.getLong(1) === sweep.getLong(1)) // same store size
    assert(m.getLong(0) === sweep.getLong(0),
      "the prune can only miss when the flat cell's supercell is outside " +
        "the probe — the full run and the rank shortcut must count the " +
        "same agreements")
  }

  test("hier assignment with topS = nSuper (no prune) equals the flat exact argmin row-for-row") {
    val vs = (0 until 60).map { i =>
      (i.toLong, (0 until 6).map(j => ((i * 13 + j * 7) % 19 - 9) / 3.0d))
    }
    val e = vs.toDF("vec_id", "v")
    val cents: Seq[(Int, Seq[Double])] = (0 until 12).map { c =>
      c -> (0 until 6).map(j => ((c * 5 + j * 3) % 17 - 8) / 2.0d)
    }
    val flat = graft.vector.VectorOps.assignCellsJoinIdx(e, cents)
      .select("corpus_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hier = graft.vector.VectorOps.assignCellsHierIdx(e, cents, 3, 3)
      .select("corpus_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hier === flat,
      "probing every supercell makes the candidate set the whole grid — " +
        "any divergence is an arithmetic or tie-break drift")
  }

  test("hier assignment with a pruned probe only ever returns a cell from a probed supercell, and misses are exactly the out-of-probe vectors") {
    val vs = (0 until 80).map { i =>
      (i.toLong, (0 until 6).map(j => ((i * 11 + j * 5) % 23 - 11) / 4.0d))
    }
    val e = vs.toDF("vec_id", "v")
    val cents: Seq[(Int, Seq[Double])] = (0 until 16).map { c =>
      c -> (0 until 6).map(j => ((c * 7 + j * 3) % 19 - 9) / 3.0d)
    }
    val flat = graft.vector.VectorOps.assignCellsJoinIdx(e, cents)
      .select("corpus_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hier1 = graft.vector.VectorOps.assignCellsHierIdx(e, cents, 4, 1)
      .select("corpus_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // where the s=1 prune agrees with flat it IS flat; where it doesn't,
    // widening the probe to every supercell must recover flat exactly
    val agree = vs.count { case (id, _) => hier1(id) == flat(id) }
    assert(agree > 0 && vs.forall { case (id, _) =>
      hier1(id) == flat(id) ||
        graft.vector.VectorOps.assignCellsHierIdx(
          e.filter(col("vec_id") === id), cents, 4, 4)
          .select("cell").head().getInt(0) == flat(id)
    })
  }

  test("assignCellsAuto keeps small grids on the flat exact path and switches to the prune past the threshold") {
    val vs = (0 until 40).map { i =>
      (i.toLong, (0 until 4).map(j => ((i * 13 + j * 7) % 19 - 9) / 3.0d))
    }
    val e = vs.toDF("vec_id", "v")
    val small: Seq[Seq[Double]] = (0 until 8).map { c =>
      (0 until 4).map(j => ((c * 5 + j * 3) % 17 - 8) / 2.0d)
    }
    val wantFlat = graft.vector.VectorOps
      .assignCellsJoinIdx(e, small.zipWithIndex.map { case (cv, c) => (c, cv) })
      .select("corpus_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val gotSmall = graft.vector.VectorOps.assignCellsAuto(e, small)
      .select("corpus_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(gotSmall === wantFlat)
    // a grid past HierAssignMinCells rides the prune: same output shape,
    // and every assigned cell is a valid grid id
    val big: Seq[Seq[Double]] = (0 until 300).map { c =>
      (0 until 4).map(j => ((c * 5 + j * 3) % 257 - 128) / 32.0d)
    }
    val gotBig = graft.vector.VectorOps.assignCellsAuto(e, big)
      .select("corpus_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(gotBig.size === vs.size)
    assert(gotBig.values.forall(c => c >= 0 && c < 300))
  }

  test("supercellsOf: duplicate grid rows tie to the lower cell id and the Lloyd step is the exact micro-mean") {
    // 4 grid rows, 2 supers: rows 0/1 seed; rows 2/3 duplicate row 0, so
    // they join super 0 and its refined centroid is the micro-mean of
    // rows {0, 2, 3}; super 1 keeps row 1 alone
    val grid: Seq[(Int, Seq[Double])] = Seq(
      0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0),
      2 -> Seq(1.0, 0.0), 3 -> Seq(1.0, 0.0))
    val (supers, members) = graft.vector.VectorOps.supercellsOf(grid, 2)
    assert(supers(0) === Seq(1.0, 0.0)) // mean of three identical rows
    assert(supers(1) === Seq(0.0, 1.0))
    assert(members(0).map(_._1).sorted === Seq(0, 2, 3))
    assert(members(1).map(_._1) === Seq(1))
  }
}
