package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Wide-table builder — batch analog of the reference's order × detail ×
  * user-dim join job.
  *
  * Reference semantics reproduced (citations into /root/reference/):
  *  - order ⋈ detail on order_id, one order → N details:
  *    gmall-realtime/src/main/scala/com/atguigu/app/SaleDetailApp.scala:50-139
  *    (per-batch fullOuterJoin + Redis-buffered completion; end-to-end
  *    observable semantics = inner equi-join, SURVEY §2.5 J2)
  *  - stream → dimension lookup join, null-safe on dim miss ⇒ LEFT OUTER:
  *    SaleDetailApp.scala:142-157, bean/SaleDetail.scala:45
  *  - field-by-field wide-row merge: bean/SaleDetail.scala:19-58
  *  - numeric-as-string price cast: bean/SaleDetail.scala:40
  *
  * Mapping (FIXTURES.md §3): orders ≙ OrderInfo, lineitem ≙ OrderDetail,
  * customer ≙ UserInfo, nation ≙ area dim.
  *
  * Scale design: the orders ⋈ lineitem join shuffles both sides on the
  * order key (the unavoidable big join — both sides co-partition on one
  * exchange each); customer and nation are dimension tables and are
  * broadcast explicitly, so the fact table is touched by exactly ONE
  * shuffle end-to-end. At 100 TB the same plan holds — dims stay broadcast
  * and AQE handles order-key skew.
  */
object SaleDetail {

  /** The wide sale-detail table (J2 + J3 + P7/P9). */
  def wide(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val customer = Tables.customer(spark, dir)
    val nation = Tables.nation(spark, dir)

    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"), "inner")
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"), "left_outer")
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"), "left_outer")
      .select(
        // detail-line id: orderkey * 10 + linenumber (linenumber is 1..7)
        (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("order_detail_id"),
        col("l_orderkey").as("order_id"),
        col("o_custkey").as("user_id"),
        col("l_partkey").as("sku_id"),
        col("l_quantity").as("sku_num"),
        // numeric-as-string → double round-trip (P9, bean/SaleDetail.scala:40)
        col("l_extendedprice").cast("string").cast("double").as("sku_price"),
        col("o_orderstatus").as("order_status"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("create_date"),
        col("c_name").as("user_name"),
        col("c_mktsegment").as("user_segment"),
        col("n_name").as("user_nation"))
  }

  /** Driver-verified slice of the wide table, deterministically ordered. */
  def wideQuery(spark: SparkSession, dir: String): DataFrame =
    wide(spark, dir).orderBy("order_detail_id")

  /** Customer "age" in /365-years (P8 semantics, bean/SaleDetail.scala:48-54)
    * measured from first order to a fixed as-of date — the reference's
    * deliberately leap-ignorant `(now − birthday)/365d` formula, with the
    * first order date standing in for birthday on this schema. */
  def customerAge(spark: SparkSession, dir: String, asOf: String = "2002-01-01"): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("user_id"))
      .agg(min(to_date(col("o_orderdate"))).as("first_order"))
      .select(
        col("user_id"),
        floor(datediff(to_date(lit(asOf)), col("first_order")) / 365)
          .cast("long").as("age_years"))
      .orderBy("user_id")
}
