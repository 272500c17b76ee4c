package graft

import org.apache.spark.sql.functions._

/** Round-18 pins: the advisor-r17 fixes (codepoint fingerprint fold,
  * numeric segment ordering, bench round inference), the cross-round
  * regression gate's pure logic, and the duplicate-seed Lloyd guard. */
class Round18Spec extends SparkSpec {

  // ---------------------------------------------------------------- //
  // tokFpOf folds CODEPOINTS (advisor r17): the DuckDB oracle's
  // ascii(s[i]) walks characters, so a non-BMP piece must contribute
  // ONE codepoint term, not two surrogate terms.
  // ---------------------------------------------------------------- //

  test("tokFpOf: non-BMP characters fold as one codepoint term (oracle semantics), ASCII pins unchanged") {
    import graft.streaming.Sinks
    // "a" then U+1D11E (musical G clef, two UTF-16 code units):
    // ((7*31 + 97) * 31 + 0x1D11E) % 1e12 = 314*31 + 119070 = 128804
    assert(Sinks.tokFpOf("a𝄞") === 128804L)
    // a UTF-16 code-unit fold would instead produce two surrogate terms
    val surrogateFold = "a𝄞".foldLeft(7L)(
      (acc, c) => (acc * 31 + c.toLong) % 1000000000000L)
    assert(Sinks.tokFpOf("a𝄞") !== surrogateFold)
    // the existing cross-engine ASCII pins are byte-identical
    assert(Sinks.tokFpOf("hello") === 299566379L)
    assert(Sinks.tokFpOf("") === 7L)
  }

  // ---------------------------------------------------------------- //
  // Segment manifest ordering is numeric (advisor r17): %05d names
  // widen at seg-100000 and lexical order inverts exactly there.
  // ---------------------------------------------------------------- //

  test("loadSegmentNames orders by parsed segment number across the 5->6 digit boundary") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_segord").toString
    val path = s"$base/idx"
    Seq("seg-100000", "seg-00002", "seg-99999", "seg-100001")
      .toDF("segment").write.parquet(path + "/segments")
    assert(graft.streaming.Sinks.loadSegmentNames(spark, path) ===
      Seq("seg-00002", "seg-99999", "seg-100000", "seg-100001"))
  }

  // ---------------------------------------------------------------- //
  // Bench round inference (advisor r17) + cross-round regression gate
  // (judge r17 task 4) — pure logic.
  // ---------------------------------------------------------------- //

  test("currentRound: env wins; otherwise max(BENCH_r+1, BENCH_DETAIL_r) keeps same-round re-runs stable") {
    assert(Bench.currentRound(Some("12"), Seq("BENCH_r17.json")) === 12)
    assert(Bench.currentRound(Some("junk"), Seq("BENCH_r17.json")) === 18)
    // driver's end-of-round run: BENCH_r17 committed, detail r17 present
    assert(Bench.currentRound(None,
      Seq("BENCH_r17.json", "BENCH_DETAIL_r17.json")) === 18)
    // same-round re-run: this round's detail already written — stay on it
    assert(Bench.currentRound(None,
      Seq("BENCH_r17.json", "BENCH_DETAIL_r18.json")) === 18)
    // fresh repo: round 1
    assert(Bench.currentRound(None, Seq.empty) === 1)
  }

  test("parseDetailQueries: extracts per-query bests and window_ok; garbage yields empty") {
    val json = """{"metric":"total","queries":{"q1_a":0.5,"q2_b":1.25,"q3_c":-1.0},"window_ok":true,"x":1}"""
    val (m, wok) = Bench.parseDetailQueries(json)
    assert(m === Map("q1_a" -> 0.5, "q2_b" -> 1.25, "q3_c" -> -1.0))
    assert(wok)
    assert(Bench.parseDetailQueries("not json at all") ===
      ((Map.empty[String, Double], false)))
  }

  test("regressionFlags: >1.5x AND >+0.2s on clean windows; noise, new queries, failures and dirty windows never flag") {
    val prev = Map("qa" -> 1.0, "qb" -> 0.05, "qc" -> 2.0, "qf" -> 1.0)
    val cur = Seq(
      "qa" -> 1.6,   // 1.6x and +0.6s -> flags
      "qb" -> 0.09,  // 1.8x but +0.04s -> sub-noise, no flag
      "qc" -> 2.9,   // 1.45x -> no flag
      "qd" -> 5.0,   // new query, no prior -> no flag
      "qf" -> -1.0)  // failed this round -> not a timing, no flag
    assert(Bench.regressionFlags(prev, cur, bothWindowsOk = true) ===
      Seq(("qa", 1.0, 1.6)))
    assert(Bench.regressionFlags(prev, cur, bothWindowsOk = false).isEmpty)
    // the absolute leg alone is not enough either: 1.2x but +10s stays
    // unflagged (a legitimately rescaled query needs the ratio too)
    assert(Bench.regressionFlags(Map("qg" -> 50.0), Seq("qg" -> 60.0),
      bothWindowsOk = true).isEmpty)
  }

  // ---------------------------------------------------------------- //
  // lloydStepOnSeeds dedupes duplicate seed vectors (judge r17):
  // a repeat in the first k of a real corpus must degrade to k-1
  // cells, not abort the index build.
  // ---------------------------------------------------------------- //

  test("lloydStepOnSeeds: duplicate seed vectors dedupe to first occurrence instead of aborting") {
    import spark.implicits._
    val e = Seq(Seq(0.0, 0.0), Seq(0.2, 0.0), Seq(2.0, 2.0), Seq(2.2, 2.0))
      .toDF("v")
    val dup = Seq(Seq(0.0, 0.0), Seq(0.0, 0.0), Seq(2.0, 2.0))
    val got = graft.vector.VectorOps.lloydStepOnSeeds(e, dup)
    val want = graft.vector.VectorOps.lloydStepOnSeeds(e,
      Seq(Seq(0.0, 0.0), Seq(2.0, 2.0)))
    assert(got === want)
    assert(got.size === 2)
  }
}
