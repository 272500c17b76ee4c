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
    spark.stop()
  }
}
