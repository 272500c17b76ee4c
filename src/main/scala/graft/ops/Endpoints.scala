package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference publisher's composite REST endpoints assembled from the
  * registered queries — full response-shape parity (FIXTURES.md §2):
  *  - /realtime-total → [{id,name,value}] (Controller.java:35-74)
  *  - /realtime-hours → {yesterday: {HH: n}, today: {HH: n}}
  *    (Controller.java:76-100)
  *  - /sale_detail → {total, stat, detail} (Controller.java:102-107,
  *    PublisherServiceImpl.java:81-192)
  * Returned as small case classes (the JSON layer is presentation, not
  * engine, so the shapes are typed rather than stringified). */
object Endpoints {

  case class TotalCard(id: String, name: String, value: String)
  case class HourPair(hour: String, today: Long, yesterday: Long)
  case class StatOption(name: String, value: Double)
  case class Stat(title: String, options: Seq[StatOption])
  case class SaleDetailResponse(total: Long, stat: Seq[Stat], detail: Seq[String])

  /** /realtime-total: DAU + new-mids + GMV cards. */
  def realtimeTotal(spark: SparkSession, dir: String,
                    day: String = Dau.Day): TotalCardSet = {
    val dau = Dau.dauByDay(spark, dir)
      .filter(col("log_date") === day)
      .select("dau").collect().headOption.map(_.getLong(0)).getOrElse(0L)
    val newUsers = Dau.newUsers(spark, dir, day).count()
    val gmv = Gmv.gmvByDate(spark, dir)
      .filter(col("create_date") === Gmv.Day)
      .select("gmv").collect().headOption.map(_.getDouble(0)).getOrElse(0.0)
    TotalCardSet(Seq(
      TotalCard("dau", "新增日活", dau.toString),
      TotalCard("new_mid", "新增设备", newUsers.toString),
      TotalCard("order_amount", "新增交易额", gmv.toString)))
  }
  case class TotalCardSet(cards: Seq[TotalCard])

  /** /realtime-hours: paired today/yesterday hour map from one scan. */
  def realtimeHours(spark: SparkSession, dir: String,
                    day: String = Dau.Day, prev: String = Dau.PrevDay): Seq[HourPair] =
    Publisher.todayVsYesterday(spark, dir, day, prev).collect().toSeq
      .map(r => HourPair(r.getString(0), r.getLong(1), r.getLong(2)))

  /** /sale_detail: keyword-filtered details + total + age/gender-style
    * stat blocks with the reference's complement-rounded percentages. */
  def saleDetail(spark: SparkSession, dir: String,
                 keyword: String = "small widget",
                 page: Int = 1, pageSize: Int = 10): SaleDetailResponse = {
    val hits = graft.Tables.part(spark, dir)
      .filter(Publisher.keywordPredicate(col("p_name"), keyword))
    val total = hits.count()
    val detail = Publisher.keywordSearch(spark, dir, keyword, page, pageSize)
      .select("p_name").collect().toSeq.map(_.getString(0))
    val bandRow = Publisher.balanceBandRatio(spark, dir).collect().head
    val segRow = Publisher.segmentRatio(spark, dir).collect().head
    SaleDetailResponse(
      total = total,
      stat = Seq(
        Stat("用户等级占比", Seq(
          StatOption("low", bandRow.getDouble(0)),
          StatOption("mid", bandRow.getDouble(1)),
          StatOption("high", bandRow.getDouble(2)))),
        Stat("用户性别占比", Seq(
          StatOption("seg", segRow.getDouble(0)),
          StatOption("rest", segRow.getDouble(1))))),
      detail = detail)
  }
}
