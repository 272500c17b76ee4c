package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Kafka source/sink wiring — the S1/K6 analog of the reference's
  * MyKafkaUtil (utils/MyKafkaUtil.scala:26-53) and MyKafkaSender
  * (gamll-canal/.../MyKafkaSender.java:13-33).
  *
  * Delivery semantics upgrade (SURVEY §4): offsets ride the streaming
  * checkpoint (at-least-once) instead of `enable.auto.commit=true`
  * (at-most-once, reference MyKafkaUtil.scala:34-37); paired with the
  * keyed idempotent sinks in [[graft.streaming.Sinks]] the end-to-end
  * effect is exactly-once.
  *
  * NOTE: this container ships no spark-sql-kafka connector jar, so these
  * builders are exercised only up to plan construction in tests; on a
  * real cluster with the connector on the classpath they run as-is. The
  * unit/streaming tests drive the same downstream pipelines through
  * MemoryStream / file sources instead. */
object Kafka {

  /** S1: subscribe to a topic; `value` is cast to STRING (P6 raw
    * projection, reference UserInfoApp.scala:25) ready for from_json. */
  def source(spark: SparkSession, brokers: String, topic: String,
             startingOffsets: String = "latest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")

  /** K6: produce a `value` column to a topic; exactly-once via
    * checkpointed offsets + broker-side idempotence settings. */
  def sink(df: DataFrame, brokers: String, topic: String,
           checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
}
