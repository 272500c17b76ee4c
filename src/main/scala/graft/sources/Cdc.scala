package graft.sources

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CDC changelog router — the engine-side analog of the reference's Canal
  * binlog → Kafka fan-out (S2, gamll-canal/src/main/java/com/atguigu/app/
  * CanalClient.java:72-119): rows arrive as (table, op, after-image JSON)
  * and are routed by (table, op) to per-entity frames, with the
  * after-image parsed against a declared schema (P1) or re-serialized
  * (P2, `to_json(struct(*))`) for a downstream topic.
  *
  * The routing rules mirror CanalClient exactly:
  *   order_info + INSERT → order topic; order_detail + INSERT → detail
  *   topic; user_info + INSERT ∪ UPDATE → user topic (dim changelog).
  */
object Cdc {

  /** One routing rule: which (table, ops) feed an output, and the target
    * schema the after-image is parsed into. */
  case class Route(table: String, ops: Seq[String], schema: StructType)

  /** The reference's three routes (CanalClient.java:74-118). */
  def referenceRoutes(orderSchema: StructType, detailSchema: StructType,
                      userSchema: StructType): Map[String, Route] = Map(
    "orders"  -> Route("order_info", Seq("INSERT"), orderSchema),
    "details" -> Route("order_detail", Seq("INSERT"), detailSchema),
    "users"   -> Route("user_info", Seq("INSERT", "UPDATE"), userSchema))

  /** Route a changelog frame (columns: table, op, data:String json) into
    * named typed frames. Works on batch and streaming frames alike. */
  def route(changelog: DataFrame, routes: Map[String, Route]): Map[String, DataFrame] =
    routes.map { case (name, r) =>
      name -> changelog
        .filter(col("table") === r.table && col("op").isin(r.ops: _*))
        .select(from_json(col("data"), r.schema).as("d"))
        .select("d.*")
    }

  /** P2: serialize a typed frame back to a JSON `value` column (the wire
    * shape the reference produces per topic, MyKafkaSender analog). */
  def toWire(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
}
