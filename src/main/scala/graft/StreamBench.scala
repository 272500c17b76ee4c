package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming throughput benchmark (judge r13 task 5): the rate source
  * feeds synthetic rows through each STATEFUL pipeline and ingest GATE
  * to a noop sink; reports sustained processedRowsPerSecond (true
  * throughput — the rate source backlogs when processing can't keep
  * up, so processed-rows/s measures the pipeline, not the generator)
  * and the state-store row count per pipeline. Writes ONE JSON line to
  * stdout and `streambench_last.json` (the bench_last.json pattern),
  * so streaming throughput finally ships as a per-round artifact
  * beside the batch bench. Usage:
  *   runMain graft.StreamBench [rowsPerSec] [seconds] */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val rate = if (args.length > 0) args(0).toInt else 200000
    val runSec = if (args.length > 1) args(1).toInt else 20
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    def rateSrc(rowsPerSec: Int): DataFrame =
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSec).option("numPartitions", 8).load()

    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, (Double, Long, Int)]
    def measure(name: String, df: DataFrame, mode: String,
                target: Int): Unit = {
      val q = df.writeStream.format("noop").outputMode(mode)
        .trigger(Trigger.ProcessingTime("2 seconds")).start()
      // adaptive window: a heavy gate's early batches can each take
      // seconds (state-store init + backlog), so wait until enough
      // post-ramp-up batches exist for a sustained number, capped at
      // 3x the nominal window
      val deadline = System.nanoTime() + 3L * runSec * 1000000000L
      Thread.sleep(runSec * 1000L)
      while (Option(q.recentProgress).getOrElse(Array.empty).length < 5 &&
        System.nanoTime() < deadline) Thread.sleep(2000L)
      val progress = Option(q.recentProgress).getOrElse(Array.empty)
      val rates = progress.drop(2) // skip ramp-up batches
        // isFinite, not just !isNaN: a zero-duration batch reports
        // processedRowsPerSecond = Infinity, which passes r > 0 and then
        // blows up BigDecimal at report time (advisor r14)
        .map(_.processedRowsPerSecond).filter(r => r.isFinite && r > 0)
      val stateRows = progress.lastOption
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      q.stop()
      val avg = if (rates.nonEmpty) rates.sum / rates.length else 0.0
      results(name) = (avg, stateRows, target)
      println(f"[stream-bench] $name: ${avg}%,.0f rows/s sustained " +
        f"(target $target%,d), state rows $stateRows%,d")
    }

    // events-shaped stream for the reference pipelines
    def events(rowsPerSec: Int): DataFrame = rateSrc(rowsPerSec).select(
      col("timestamp").as("ts"),
      (col("value") % 10000).as("user_id"),
      (col("value") % 5).cast("string").as("event_type"),
      (col("value") % 100).cast("double").as("value"))

    measure("dedup_user_day",
      graft.streaming.Pipelines.dauDedup(events(rate),
        watermark = "10 seconds"), "append", rate)
    measure("windowed_agg",
      events(rate).withWatermark("ts", "10 seconds")
        .groupBy(window(col("ts"), "1 minute", "10 seconds"), col("user_id"))
        .agg(count(lit(1)).as("ct"), sum(col("value")).as("v")),
      "update", rate)

    // --- ingest GATES (judge r13 task 5: per-gate rows/s + state) ---
    // Static index artifacts are SMALL by design (the frozen-index
    // discipline: the gate probes an index, it never scans the corpus),
    // built from deterministic synthetic data so the bench needs no SF
    // dir and rates are comparable across rounds.

    // near-dup + fp-dedup + quality gate + chunking (corpusIngest):
    // ~12 pseudo-random words per doc; the corpus index is 1000 docs
    // from the same generator, so a slice of the stream near-dups it.
    val synthText = expr(
      """concat_ws(' ', transform(sequence(0, 11),
        |  i -> concat('w', cast((value * 7 + i * 13) % 5000 as string))))""".stripMargin)
    val corpusDocs = spark.range(1000)
      .select(col("id").as("doc_id"), col("id").as("value"))
      .select(col("doc_id"), synthText.as("text"))
      .repartition(spark.sparkContext.defaultParallelism)
    val corpusArr = corpusDocs
      .select(col("doc_id"), expr("graft_shingle_hashes(text, 3)").as("arr"))
      .cache()
    val postings = graft.dedup.PrefixJoin.prefixPostingsOf(corpusArr).cache()
    postings.count()
    val docRate = math.max(1000, rate / 20)
    measure("neardup_ingest_gate",
      graft.streaming.TrainingPipeline.corpusIngest(
        rateSrc(docRate).select(
          (col("value") + 1000000L).as("doc_id"), lit("rate").as("source"),
          lit("en").as("lang"), synthText.as("text")),
        stopRatioMin = 0.0,
        nearDupIndex = Some((postings, corpusArr))),
      "append", docRate)

    // DECONTAMINATION gate (r16): the broadcast benchmark artifact is
    // the first 100 synthetic docs' distinct shingles, so a slice of
    // the stream (same generator) collides and is vetoed — the probe
    // leg and the fold both do real work.
    val evalSet = corpusArr.filter(col("doc_id") < 100)
      .select(explode(col("arr")).as("sh64")).distinct().cache()
    evalSet.count()
    measure("decontam_gate",
      graft.streaming.TrainingPipeline.decontamGate(
        rateSrc(docRate).select(
          (col("value") + 2000000L).as("doc_id"), lit("rate").as("source"),
          synthText.as("text")),
        evalSet),
      "append", docRate)

    // ANN admission gate, full-precision corpus state (q261's shape):
    // tokenizer-health monitor: the same synthetic word pool, with a
    // frozen vocabulary covering word ids < 2500 (half the pool) so the
    // OOV path does real work; state is 3 longs per source (16 here).
    val vocab = spark.range(2500)
      .select(concat(lit("w"), col("id").cast("string")).as("word"),
        (col("id") % 3 + 1).as("n_syms"))
      .cache()
    vocab.count()
    // target rate/2: each input row explodes to ~12 tokens before the
    // vocab join + fold, so the monitor moves ~12x the token volume of
    // the row-shaped pipelines per reported row
    measure("oov_monitor",
      graft.streaming.TrainingPipeline.oovMonitor(
        rateSrc(rate).select(
          col("value").as("doc_id"),
          concat(lit("src"), (col("value") % 16).cast("string")).as("source"),
          synthText.as("text")),
        vocab).toDF(),
      "append", rate / 2)

    // BYTE-level fertility monitor (r16): the vocab-free twin — the
    // frozen byte-merge sequence is applied IN-ROW as chained replaces
    // (no join at all), so the pipeline is one narrow projection into
    // the 2-long-per-source fold. Merges cover the synthetic pool's
    // hottest byte pairs ("w" + digits).
    val byteMerges = Seq(("119", "48", "119-48"), ("119", "49", "119-49"),
      ("49", "50", "49-50"), ("50", "51", "50-51"))
    measure("byte_fertility_monitor",
      graft.streaming.TrainingPipeline.fertilityMonitorBytes(
        rateSrc(rate).select(
          col("value").as("doc_id"),
          concat(lit("src"), (col("value") % 16).cast("string")).as("source"),
          synthText.as("text")),
        byteMerges).toDF(),
      "append", rate / 2)

    // UNIGRAM fertility monitor (r16): the frozen lattice runs in-row
    // over the same synthetic pool — vocab = single chars (w + digits)
    // + hot two-char pieces, so the DP does real multi-candidate work.
    val uniProbs: Map[String, Long] =
      (("w" +: (0 to 9).map(_.toString)).map(_ -> 20000L) ++
        Seq("w1" -> 60000L, "w2" -> 50000L, "12" -> 40000L,
          "23" -> 30000L, "34" -> 25000L)).toMap
    // doc-gate rate, not the row rate: each input row explodes to ~12
    // tokens and every token runs the INTERPRETED Viterbi lattice
    // (HOFs don't codegen — the r15 lesson); at the row rate the
    // backlog coalesces into one batch that outlives the measurement
    // window and reports 0. Production pre-tokenizes or batches by
    // DISTINCT word (the q308 shape) before the lattice.
    measure("unigram_fertility_monitor",
      graft.streaming.TrainingPipeline.fertilityMonitorUnigram(
        rateSrc(docRate).select(
          col("value").as("doc_id"),
          concat(lit("src"), (col("value") % 16).cast("string")).as("source"),
          synthText.as("text")),
        uniProbs).toDF(),
      "append", docRate)

    // 16-dim synthetic vectors, 8-cell frozen quantizer, 1024-vector
    // corpus.
    val synthVec = expr(
      "transform(sequence(0, 15), i -> cast((value * (i + 3)) % 997 + 1 as double) / 998.0d)")
    val corpusVecs = spark.range(1024)
      .select(col("id").as("corpus_id"), col("id").as("value"))
      .select(col("corpus_id"), synthVec.as("v"))
      .repartition(spark.sparkContext.defaultParallelism)
    val cents: Seq[Seq[Double]] = corpusVecs.filter(col("corpus_id") < 8)
      .orderBy("corpus_id").collect().map(_.getSeq[Double](1).toSeq).toIndexedSeq
    val corpusAssigned = corpusVecs
      .select(col("corpus_id").as("vec_id"), col("v"))
      .transform(v => graft.vector.VectorOps.assignCellsJoin(v, cents))
      .select(col("cell"), col("corpus_id"), col("cv"))
      .cache()
    corpusAssigned.count()
    // each fresh vector verifies ~nProbe/k of the corpus (~512
    // candidates here), so the gate's sustainable rate sits ~1.5
    // orders below the row pipelines; the target oversubscribes it
    // slightly so the backlogged batches measure true capacity
    val vecRate = math.max(1000, rate / 20)
    def freshVecs(rowsPerSec: Int): DataFrame = rateSrc(rowsPerSec).select(
      (col("value") + 10000000L).as("vec_id"), lit(0L).as("label"),
      synthVec.as("v"))
    measure("ann_gate_exact",
      graft.streaming.TrainingPipeline.annGate(
        freshVecs(vecRate), cents, corpusAssigned),
      "append", vecRate)

    // PQ-compressed ADC gate (q284's shape): same corpus as CODES only
    // (m=4 ints/vector) + an m=4/c=8 codebook seeded from the corpus
    // head — the state the gate holds when full precision doesn't fit.
    val cbRows = corpusVecs.filter(col("corpus_id") < 8)
      .orderBy("corpus_id").collect().map(_.getSeq[Double](1).toSeq)
    val codebook: Map[(Int, Int), Seq[Double]] = (for {
      s <- 0 until 4; k <- 0 until 8
    } yield (s, k) -> cbRows(k).slice(s * 4, (s + 1) * 4)).toMap
    val corpusCodes = corpusAssigned
      .withColumn("codes", graft.vector.VectorOps.pqCodesCol("cv", codebook, 4, 8))
      .select(col("cell"), col("corpus_id"), col("codes"))
      .cache()
    corpusCodes.count()
    measure("ann_gate_adc",
      graft.streaming.TrainingPipeline.annGateAdc(
        freshVecs(vecRate), cents, codebook, corpusCodes),
      "append", vecRate)

    // decode-or-quarantine gate: a 64-payload pool of real PNG bytes
    // (with planted corruption) joined in by id — the stream decodes
    // REAL compressed bytes per row, the codec cost the gate pays.
    val pool = (0 until 64).map { i =>
      val w = 1 + i % 16
      val h = 1 + (i * 5) % 12
      val png = graft.multimodal.ImageIoCodec.encodePng(w, h, (x, y) => {
        val v = ((i * 31 + x * 7 + y * 13) % 256)
        (v, (v + 1) % 256, (v + 2) % 256)
      })
      val bytes = if (i % 8 == 7) png.take(png.length / 2) else png // planted truncation
      (i.toLong, bytes)
    }.toDF("pid", "payload")
    val poolDf = pool.cache(); poolDf.count()
    val payloadRate = math.max(1000, rate / 20)
    measure("decode_gate",
      graft.multimodal.Multimodal.decodeGate(
        rateSrc(payloadRate)
          .select(col("value").as("doc_id"), (col("value") % 64).as("pid"))
          .join(broadcast(poolDf), Seq("pid"))
          .select(col("doc_id"), col("payload"))),
      "append", payloadRate)

    def fmt(d: Double): String = BigDecimal(d)
      .setScale(1, BigDecimal.RoundingMode.HALF_UP).toString
    val pipesJson = results.map { case (n, (r, st, tgt)) =>
      s""""$n":{"rows_per_sec":${fmt(r)},"state_rows":$st,"target_rows_per_sec":$tgt}"""
    }.mkString("{", ",", "}")
    val json = s"""{"metric":"stream_throughput","unit":"rows_per_sec","run_sec":$runSec,"pipelines":$pipesJson,"note":"sustained processedRowsPerSecond from query progress (ramp-up batches dropped); rate source backlogs under load so this is pipeline throughput, not generator speed; state_rows = state-store rows at the last progress"}"""
    println(json)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("streambench_last.json"), json + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
