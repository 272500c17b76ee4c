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
    val dir = "/root/testdata/sf0.01"
    Seq(64, 128, 256).foreach { st =>
      val out = graft.vector.VectorOps.opqRotate(spark, dir, steps = st)
      val r = out.agg(sum("natural_err_micro"), sum("balanced_err_micro"),
        sum("rotated_err_micro")).head()
      println(s"[sweep] steps=$st natural=${r.getLong(0)} balanced=${r.getLong(1)} rotated=${r.getLong(2)}")
    }
    val out = graft.vector.VectorOps.opqRotate(spark, dir)
    out.coalesce(1).write.mode("overwrite").parquet("/tmp/opq_rotate_spark")
    // angle literals exactly as SparkEntry would interpolate them
    println("[angles] " + graft.vector.VectorOps.OpqAngles
      .map { case (c, s) => s"($c,$s)" }.mkString(" "))
    spark.stop()
  }
}
