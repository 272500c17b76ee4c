package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark harness. Prints ONE JSON line with per-query best times plus
  * the raw per-pass times, so a host-noise window (this shared box stalls
  * for tens of seconds on a ~half-hour cycle) is visible in the artifact
  * instead of silently inflating the headline number.
  *
  * Noise defenses, in order:
  *   1. Pass 1 runs queries in natural order, pass 2 in REVERSED order —
  *      a time-localized stall therefore inflates a different contiguous
  *      block of queries in each pass, and min-over-passes recovers.
  *   2. Every pass's time is recorded in the JSON ("passes") so a reader
  *      can see divergence per query rather than trusting the min.
  *   3. After the two guaranteed passes, queries whose pass times diverge
  *      >3x, or whose min exceeds 3x an sf0.001-derived expectation, get
  *      up to two budget-gated extra passes.
  */
object Bench {
  /** Smallest SF, used for cheap JIT/codegen warm-up and as the adaptive
    * re-run expectation baseline. Shared with Prof so a profiling run
    * warms up against the same data as the benchmark it mimics. */
  private[graft] val WarmupDir = "/root/testdata/sf0.001"

  /** Median of warm passes; lower-middle for even counts (with exactly
    * two warm passes the upper-middle would report the NOISY pass as
    * the median, inverting the field's purpose). Pure: spec-pinned. */
  private[graft] def warmMedian(warm: Vector[Double]): Double =
    if (warm.isEmpty) -1.0 else warm.sorted.apply((warm.length - 1) / 2)

  /** True when a query's WARM passes diverge >3x after the adaptive
    * re-runs — interference (GC / scheduler) that min-over-passes hides
    * and a shared cluster would see at p99. Pure: spec-pinned. */
  private[graft] def varianceFlagged(warm: Vector[Double]): Boolean =
    warm.length >= 2 && warm.max > 0.5 &&
      warm.max / math.max(warm.min, 1e-3) > 3.0

  /** Per-query budget gate (judge r8): round 8 shipped a 768 s query —
    * 90% of the whole bench — because nothing re-checked per-query cost
    * after the last plan audit. Flag every query whose best (warm) time
    * exceeds max(`absFloorSec`, `medianMult` × median-of-best): the
    * absolute floor keeps ordinary sf0.1 queries (median ~0.3 s, p99
    * ~2.7 s in r8) from flagging, the median multiple scales the gate
    * up with SF so a full-corpus run doesn't flag everything. Flags are
    * emitted as a `slow_flags` JSON field (the artifact the driver and
    * judge read) AND as stderr lines, so a pathological plan can never
    * ride into a round snapshot silently again. Pure function: the
    * planted-slow-query case is pinned in Round9Spec. */
  private[graft] def slowFlags(best: Seq[(String, Double)],
                               absFloorSec: Double = 10.0,
                               medianMult: Double = 5.0): Seq[String] = {
    val ok = best.collect { case (_, v) if v >= 0 => v }.sorted
    if (ok.isEmpty) Seq.empty
    else {
      val median = ok(ok.length / 2)
      val gate = math.max(absFloorSec, medianMult * median)
      best.collect { case (n, v) if v > gate => n }
    }
  }

  private def runOne(spark: SparkSession,
                     fn: (SparkSession, String) => DataFrame,
                     dir: String): Double = {
    val t0 = System.nanoTime()
    // a throwing pass must NOT record its (near-zero) elapsed time —
    // min() would silently prefer the failure over any real run
    val ok = try { fn(spark, dir).count(); true }
    catch { case _: Throwable => false }
    if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val smallDir = WarmupDir
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // functions + custom strategy/rule up front: rank-filter queries must
    // hit the bounded-heap rewrite in EVERY pass, not only after the
    // query that happens to install it has run once
    graft.functions.GraftFunctions.register(spark)
    // Targeted mode (presnapshot's perf gate): args are query-name
    // prefixes; a non-empty selection benches only those queries and
    // writes `bench_partial.json` — NEVER `bench_last.json`, so a
    // partial run can't masquerade as a full bench to the driver.
    val only = args.flatMap(_.split(',')).filter(_.nonEmpty)
    val allQueries = SparkEntry.queries.toIndexedSeq
    val ordered =
      if (only.isEmpty) allQueries
      else allQueries.filter { case (n, _) => only.exists(n.startsWith) }
    // a typo'd prefix must FAIL, not write an empty artifact: an empty
    // bench_partial.json has vacuously-empty slow_flags and would
    // greenlight presnapshot for source changes it never measured
    // (advisor r11) — refuse before any file is touched
    if (only.nonEmpty && ordered.isEmpty) {
      System.err.println(s"[bench] REFUSING: prefix selection " +
        s"'${only.mkString(",")}' matches zero queries — nothing measured, " +
        "no artifact written")
      spark.stop()
      sys.exit(2)
    }

    // warm-up at the smallest SF: JIT + codegen + catalyst caches get hot
    // cheaply. (Warming at the target SF was tried and measured WORSE —
    // the doubled workload leaves enough cached/GC pressure to slow the
    // timed pass more than the leftover first-run costs it removes.)
    ordered.foreach { case (_, fn) =>
      try { fn(spark, smallDir).count() }
      catch { case _: Throwable => () }
    }
    // second (warm) sf0.001 pass: a per-query expectation baseline used by
    // the adaptive re-run criterion below
    val expectSmall = ordered.map { case (name, fn) =>
      name -> runOne(spark, fn, smallDir)
    }.toMap
    // the warm-up's cached sf0.001 memo tables must NOT occupy the heap
    // during the timed passes — at ~100 queries the stacked old-gen
    // state inflated timings up to 7x through GC pressure
    Tables.clearMemo(spark)

    val passTimes =
      scala.collection.mutable.LinkedHashMap.empty[String, Vector[Double]]
    def record(name: String, sec: Double): Unit =
      passTimes(name) = passTimes.getOrElse(name, Vector.empty) :+ sec
    def okTimes(name: String): Vector[Double] =
      passTimes.getOrElse(name, Vector.empty).filter(_ >= 0)

    // two guaranteed passes (pass 1 pays every memo/index build at the
    // target SF, so a single-pass run would report index-construction
    // time as query time); pass 2 reversed per the noise defense above
    System.gc()
    ordered.foreach { case (name, fn) => record(name, runOne(spark, fn, sfDir)) }
    System.gc()
    ordered.reverse.foreach { case (name, fn) =>
      record(name, runOne(spark, fn, sfDir))
    }

    // Scaled expectation: warm sf0.001 time x sqrt(data ratio). Sub-linear
    // because per-query fixed costs (planning, codegen, task launch)
    // dominate at tiny SF; empirically sf0.1 cold runs land ~10-20x the
    // sf0.001 warm time on a quiet host. Floored at 1 s so sub-second
    // jitter never flags.
    val sfOf = "sf([0-9.]+)".r
    def sf(dir: String): Double =
      sfOf.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.1)
    val scaleUp = math.sqrt(sf(sfDir) / sf(smallDir))
    def expectation(name: String): Double = {
      val e = expectSmall.getOrElse(name, -1.0)
      if (e < 0) -1.0 else math.max(e * scaleUp, 1.0)
    }
    def flaggedNow(slowOnly: Boolean): IndexedSeq[(String, (SparkSession, String) => DataFrame)] =
      ordered.filter { case (name, _) =>
        val ts = okTimes(name)
        ts.nonEmpty && {
          val mn = ts.min
          val exp = expectation(name)
          val slow = exp > 0 && mn > 3.0 * exp
          // divergence looks only at WARM passes (every recorded pass
          // after the first): pass 1 deliberately pays memo/index builds
          // at the target SF, so cold-vs-warm ratios >3x are expected for
          // index-backed queries and must not burn the adaptive budget —
          // only a warm pass blowing past the best time signals host
          // noise worth a re-run.
          val warm = ts.drop(1)
          val diverged = !slowOnly && warm.nonEmpty && {
            val wmx = warm.max
            wmx > 0.5 && wmx / math.max(mn, 1e-3) > 3.0
          }
          slow || diverged
        }
      }

    // adaptive passes: 3rd for diverged-or-slow, 4th only for still-slow;
    // budget-gated so a low-CPU driver run still finishes promptly
    val adaptBudget = 180.0
    val adaptStart = System.nanoTime()
    var round = 0
    var todo = flaggedNow(slowOnly = false)
    while (round < 2 && todo.nonEmpty &&
      (System.nanoTime() - adaptStart) / 1e9 < adaptBudget) {
      System.gc()
      todo.foreach { case (name, fn) => record(name, runOne(spark, fn, sfDir)) }
      round += 1
      todo = flaggedNow(slowOnly = true)
    }

    def fmt(d: Double): String = BigDecimal(d)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // -1.0 markers mean every pass of that query threw; they are not
    // timings, so the headline total sums only real measurements and the
    // failure count is reported separately.
    val best = ordered.map { case (name, _) =>
      val ts = okTimes(name)
      name -> (if (ts.isEmpty) -1.0 else ts.min)
    }
    val qs = best.map { case (k, v) => s"\"$k\":${fmt(v)}" }
      .mkString("{", ",", "}")
    val rawPasses = ordered.map { case (name, _) =>
      val l = passTimes.getOrElse(name, Vector.empty).map(fmt).mkString("[", ",", "]")
      s"\"$name\":$l"
    }.mkString("{", ",", "}")
    // cold-build cost, separated explicitly (judge r5 task 6): pass 1
    // pays every memo/index build at the target SF, so pass1 − warm-min
    // is the one-time index-construction cost for memo-backed queries
    // (q80/q29-style 4.3s→0.7s patterns) and ~0 for the rest. -1 = not
    // measurable (pass 1 threw, or no warm pass succeeded).
    val coldExtra = ordered.map { case (name, _) =>
      val ts = passTimes.getOrElse(name, Vector.empty)
      val warm = ts.drop(1).filter(_ >= 0)
      val c = if (ts.isEmpty || ts.head < 0 || warm.isEmpty) -1.0
        else math.max(0.0, ts.head - warm.min)
      s"\"$name\":${fmt(c)}"
    }.mkString("{", ",", "}")
    // median-of-warm beside min (judge r11): min-over-passes is the
    // steady-state number, but a query whose WARM passes still diverge
    // >3x after the adaptive re-runs is seeing real interference (GC or
    // local[32] scheduling) that min hides and that would be a p99
    // problem on a shared cluster — both the medians and the divergent
    // set ship in the artifact.
    val warmMedianJson = ordered.map { case (name, _) =>
      val warm = passTimes.getOrElse(name, Vector.empty).drop(1).filter(_ >= 0)
      s"\"$name\":${fmt(warmMedian(warm))}"
    }.mkString("{", ",", "}")
    val varianceFlags = ordered.collect {
      case (name, _) if varianceFlagged(
        passTimes.getOrElse(name, Vector.empty).drop(1).filter(_ >= 0)) => name
    }
    val varianceJson = varianceFlags.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = best.collect { case (_, v) if v >= 0 => v }.sum
    val failed = best.count(_._2 < 0)
    // per-query budget gate: loud in the artifact AND on stderr
    val flags = slowFlags(best)
    flags.foreach { n =>
      System.err.println(s"[bench] SLOW QUERY over budget gate: $n " +
        s"best=${fmt(best.toMap.apply(n))}s — fix the plan before snapshot")
    }
    val flagsJson = flags.map("\"" + _ + "\"").mkString("[", ",", "]")
    // passes >= 2 reuse session-memoized artifacts (cached dims, IVF
    // model, LSH band index), so min-over-passes is a warm timing for the
    // index-backed queries — stated here rather than silently implied.
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${ordered.length},"queries":$qs,"passes":$rawPasses,"warm_median":$warmMedianJson,"cold_extra":$coldExtra,"failed":$failed,"slow_flags":$flagsJson,"variance_flags":$varianceJson,"timing":"min over recorded passes; pass1 natural order, pass2 reversed, pass3+ adaptive re-runs of diverged/slow queries; passes >= 2 warm; cold_extra = pass1 - warm min (one-time memo/index build cost); warm_median = median of warm passes; variance_flags = warm passes diverge >3x after adaptive re-runs (host noise / GC interference a shared cluster would see at p99)","sf":"$sfDir"}"""
    println(json)
    // safety net beside the stdout contract: a file copy of the same line
    // (round-1 grading lost the stdout line to an sbt log prefix)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        if (only.isEmpty) "bench_last.json" else "bench_partial.json"),
      json + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
