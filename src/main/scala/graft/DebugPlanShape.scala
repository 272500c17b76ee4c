package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugPlanShape {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(("a", 1L, 2.0)).toDF("g", "id", "v")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val q = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
    println("=== OPTIMIZED ===")
    println(q.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
