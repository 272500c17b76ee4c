package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val mode = args.headOption.getOrElse("index")
    if (mode == "index" || mode == "all")
      for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
        for (tier <- Seq("full", "pq", "sq8", "opq")) {
          val path = s"/tmp/driftprobe/${new java.io.File(dir).getName}/$tier"
          graft.streaming.TrainingPipeline.trainAndPublishIndex(spark, dir, path, tier)
          // the "undrifted" delta: the fresh half of the SAME store
          val delta = graft.vector.VectorOps.vecs(spark, dir)
            .filter(col("vec_id") >= graft.vector.VectorOps.GateSplitAt)
          val d = graft.streaming.TrainingPipeline.publishedIndexDriftMicro(spark, path, delta)
          println(s"[drift-probe] $dir $tier undrifted-delta max drift_micro = $d")
        }
      }
    // tokenizer band (judge r17 task 1): per family, fertility drift of
    // an UNDRIFTED same-distribution delta (the corpus's fresh half)
    // and of the planted drifted delta (letter-doubled text) against
    // the published train-time baseline — the two sides the
    // maintainTokenizer budget must separate.
    if (mode == "tokenizer" || mode == "all")
      for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
        val docs = Tables.documents(spark, dir)
          .repartition(spark.sparkContext.defaultParallelism)
          .select("doc_id", "source", "text")
        val fresh = docs.filter(col("doc_id") >= graft.text.Curation.DriftSplitAt)
        val doubled = fresh.withColumn("text",
          regexp_replace(lower(col("text")), "([a-z])", "$1$1"))
        for (fam <- Seq("char-bpe", "byte-bpe", "unigram")) {
          val path = s"/tmp/driftprobe/${new java.io.File(dir).getName}/tok-$fam"
          graft.streaming.TrainingPipeline.trainAndPublishTokenizer(spark, dir, path, fam)
          val base = graft.streaming.Sinks.loadTokenizerBaseline(spark, path).get
          val (_, _, fFresh) = graft.streaming.TrainingPipeline
            .tokenizerFertilityStats(fresh, path)
          val (_, _, fDoubled) = graft.streaming.TrainingPipeline
            .tokenizerFertilityStats(doubled, path)
          println(s"[drift-probe] $dir $fam baseline=$base " +
            s"fresh_drift=${math.abs(fFresh - base)} " +
            s"doubled_drift=${math.abs(fDoubled - base)}")
        }
      }
    spark.stop()
  }
}
