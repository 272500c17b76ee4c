package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end Structured Streaming run over the real testdata: file
  * streams → dau dedup / windowed alerts / stream-stream join → memory
  * sinks, processed with Trigger.AvailableNow. Usage:
  *   runMain graft.StreamDemo [sfDir]
  * Prints one summary line per pipeline; non-zero counts = the streaming
  * topology works end-to-end on real data (the MemoryStream tests pin
  * exact semantics on literal fixtures). */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val builder = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the file-stream source needs a DIRECTORY; stage each single-file
    // table into a temp dir (testdata is read-only)
    val stage = java.nio.file.Files.createTempDirectory("graft_stream").toString
    def staged(name: String): String = {
      val d = java.nio.file.Paths.get(stage, name)
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/$name.parquet"),
        d.resolve(s"$name.parquet"))
      d.toString
    }
    val eventsDir = staged("events")
    val ordersDir = staged("orders")
    val lineitemDir = staged("lineitem")

    // file-stream the events table (schema from the batch read; ts is
    // nanos-as-long on the wire, converted exactly like Tables.events)
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val rawStream = spark.readStream.schema(batchSchema)
      .parquet(eventsDir)
    val events = Tables.normalizeEventTs(rawStream)

    def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
                    mode: String = "append"): Long = {
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name).count()
    }

    val dau = runToMemory(
      graft.streaming.Pipelines.dauDedup(events, watermark = "40 days"), "demo_dau")
    println(s"[stream-demo] dau rows (distinct user-days): $dau")

    val alerts = runToMemory(
      graft.streaming.Pipelines.alerts(events,
        windowDur = "1 day", slide = "1 day", watermark = "1 day",
        minUids = 2), "demo_alerts", mode = "append")
    println(s"[stream-demo] day-window alerts: $alerts")

    // stream-stream join: orders vs lineitem keyed on the order key with
    // both sides timestamped by o_orderdate (same day → joins)
    val oSchema = spark.read.parquet(s"$sfDir/orders.parquet").schema
    val orders = spark.readStream.schema(oSchema).parquet(ordersDir)
      .select(col("o_orderkey").as("o_order_id"), col("o_orderdate").cast("timestamp").as("o_ts"))
    val lSchema = spark.read.parquet(s"$sfDir/lineitem.parquet").schema
    val details = spark.readStream.schema(lSchema).parquet(lineitemDir)
      .join(spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("d_id"),
        col("l_orderkey").as("d_order_id"), col("o_orderdate").cast("timestamp").as("d_ts"))
    val joined = runToMemory(
      graft.streaming.Pipelines.saleDetailJoin(orders, details, watermark = "1 hour"),
      "demo_join")
    println(s"[stream-demo] stream-stream joined rows: $joined")

    spark.stop()
  }
}
