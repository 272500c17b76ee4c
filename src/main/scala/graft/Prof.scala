package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness: times one query N times in a session
  * configured exactly like Bench, optionally after the warm-up loop.
  * Usage: runMain graft.Prof <query> [sfDir] [reps] [warmupAll] [warmupDir]
  *
  * The warm-up pass runs every registered query against `warmupDir`
  * (default [[Bench.WarmupDir]], the cheap sf — codegen/memo warm-up, not
  * a timing pass); pass an explicit dir to warm indexes at the profiled
  * SF instead.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val warmupAll = args.length > 3 && args(3) == "true"
    val warmupDir = if (args.length > 4) args(4) else Bench.WarmupDir
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    if (warmupAll) {
      if (!new java.io.File(warmupDir).isDirectory)
        println(s"[prof] WARNING: warm-up dir $warmupDir missing — warm-up is a no-op")
      val t0 = System.nanoTime()
      SparkEntry.queries.foreach { case (_, fn) =>
        try { fn(spark, warmupDir).count() }
        catch { case _: Throwable => () }
      }
      println(f"[prof] warmup-all took ${(System.nanoTime() - t0) / 1e9}%.1f s")
      Tables.clearMemo(spark)
    }
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[prof] $name rep $i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
