package graft
import org.apache.spark.sql.functions._
object Scratch16 {
  def main(args: Array[String]): Unit = {
    val builder = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val out = graft.vector.VectorOps.opqRetrievalGain(spark, "/root/testdata/sf0.01")
    out.coalesce(1).write.mode("overwrite").parquet("/tmp/opq_gain_spark")
    out.show(10, false)
    spark.stop()
  }
}
