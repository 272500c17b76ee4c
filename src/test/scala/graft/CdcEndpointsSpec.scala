package graft

import org.apache.spark.sql.types._
import graft.sources.Cdc

/** CDC routing (S2) + publisher endpoint shapes (§3.3). */
class CdcEndpointsSpec extends SparkSpec {
  import spark.implicits._

  test("CDC router fans (table, op) to typed frames with the reference's rules") {
    val changelog = Seq(
      ("order_info", "INSERT", """{"id":"1","total_amount":9.5}"""),
      ("order_info", "UPDATE", """{"id":"1","total_amount":11.0}"""), // dropped (orders: INSERT only)
      ("order_detail", "INSERT", """{"id":"d1","order_id":"1","sku_name":"widget"}"""),
      ("user_info", "INSERT", """{"id":"u1","gender":"M"}"""),
      ("user_info", "UPDATE", """{"id":"u1","gender":"F"}"""), // kept (users: INSERT ∪ UPDATE)
      ("other_table", "INSERT", """{"id":"x"}"""))
      .toDF("table", "op", "data")
    val routes = Cdc.referenceRoutes(
      orderSchema = StructType(Seq(StructField("id", StringType), StructField("total_amount", DoubleType))),
      detailSchema = StructType(Seq(StructField("id", StringType), StructField("order_id", StringType), StructField("sku_name", StringType))),
      userSchema = StructType(Seq(StructField("id", StringType), StructField("gender", StringType))))
    val out = Cdc.route(changelog, routes)
    assert(out("orders").collect().map(_.getString(0)).toSeq === Seq("1"))
    assert(out("orders").collect().head.getDouble(1) === 9.5)
    assert(out("details").collect().map(_.getString(2)).toSeq === Seq("widget"))
    assert(out("users").collect().map(_.getString(1)).sorted.toSeq === Seq("F", "M"))
  }

  test("toWire serializes rows to one JSON value column (P2)") {
    val df = Seq(("u1", "F")).toDF("id", "gender")
    val wire = Cdc.toWire(df).collect().head.getString(0)
    assert(wire === """{"id":"u1","gender":"F"}""")
  }

  test("endpoint shapes assemble from registered queries on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val cards = graft.ops.Endpoints.realtimeTotal(spark, dir)
    assert(cards.cards.map(_.id) === Seq("dau", "new_mid", "order_amount"))
    assert(cards.cards.head.value.toLong > 0)
    val hours = graft.ops.Endpoints.realtimeHours(spark, dir)
    assert(hours.nonEmpty && hours.forall(h => h.today + h.yesterday > 0))
    val sd = graft.ops.Endpoints.saleDetail(spark, dir)
    assert(sd.total >= sd.detail.size)
    val ratios = sd.stat.head.options.map(_.value)
    assert(math.round(ratios.sum * 10) === 1000L)
  }
}
