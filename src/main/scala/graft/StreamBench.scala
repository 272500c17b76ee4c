package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming throughput benchmark: the rate source feeds an events-shaped
  * stream through the stateful dedup and windowed-aggregation pipelines
  * to a noop sink; reports sustained processedRowsPerSecond from query
  * progress. Usage: runMain graft.StreamBench [rowsPerSec] [seconds] */
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

    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", rate).option("numPartitions", 8).load()
      .select(
        col("timestamp").as("ts"),
        (col("value") % 10000).as("user_id"),
        (col("value") % 5).cast("string").as("event_type"),
        (col("value") % 100).cast("double").as("value"))

    def measure(name: String, df: org.apache.spark.sql.DataFrame,
                mode: String): Unit = {
      val q = df.writeStream.format("noop").outputMode(mode)
        .trigger(Trigger.ProcessingTime("2 seconds")).start()
      Thread.sleep(runSec * 1000L)
      val rates = Option(q.recentProgress).getOrElse(Array.empty)
        .drop(2) // skip ramp-up batches
        .map(_.processedRowsPerSecond).filter(r => !r.isNaN && r > 0)
      q.stop()
      val avg = if (rates.nonEmpty) rates.sum / rates.length else 0.0
      println(f"[stream-bench] $name: ${avg}%,.0f rows/s sustained (target $rate%,d)")
    }

    measure("stateful dedup (user,day)",
      graft.streaming.Pipelines.dauDedup(events, watermark = "10 seconds"), "append")
    measure("windowed agg (1min window / 10s slide)",
      events.withWatermark("ts", "10 seconds")
        .groupBy(window(col("ts"), "1 minute", "10 seconds"), col("user_id"))
        .agg(count(lit(1)).as("ct"), sum(col("value")).as("v")), "update")

    spark.stop()
  }
}
