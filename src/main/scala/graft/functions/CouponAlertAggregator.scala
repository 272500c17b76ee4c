package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed-Dataset showcase UDAF (SURVEY §2.12): the alert group scan of
  * the reference (AlertApp.scala:43-64) as an `Aggregator` — collects
  * distinct coupon uids + item ids, records the veto flag, and the final
  * alert decision is `uids.size >= minUids && !vetoed` (A7+A8+A9).
  *
  * The groupBy/collect_set formulation in [[graft.ops.Alert]] is the
  * preferred (partial-aggregatable, codegen'd) path; this exists for the
  * typed API surface and is exercised by the unit tests. The buffer is
  * mergeable (set unions + OR), so Catalyst runs it partial+final like
  * any other aggregate. */
object CouponAlertAggregator {

  case class EventRow(user_id: Long, event_type: String, uid: String, item_id: String)
  case class AlertBuf(uids: Set[String], itemIds: Set[String],
                      events: List[String], vetoed: Boolean)
  case class AlertResult(uids: Seq[String], itemIds: Seq[String],
                         events: Seq[String], vetoed: Boolean, fires: Boolean)

  def apply(minUids: Int = 3,
            couponEvent: String = "purchase",
            vetoEvent: String = "click"): Aggregator[EventRow, AlertBuf, AlertResult] =
    new Aggregator[EventRow, AlertBuf, AlertResult] {
      override def zero: AlertBuf = AlertBuf(Set.empty, Set.empty, Nil, vetoed = false)

      override def reduce(b: AlertBuf, e: EventRow): AlertBuf = {
        val coupon = e.event_type == couponEvent
        AlertBuf(
          uids = if (coupon && e.uid != null) b.uids + e.uid else b.uids,
          itemIds = if (coupon && e.item_id != null) b.itemIds + e.item_id else b.itemIds,
          events = e.event_type :: b.events,
          vetoed = b.vetoed || e.event_type == vetoEvent)
      }

      override def merge(a: AlertBuf, b: AlertBuf): AlertBuf =
        AlertBuf(a.uids ++ b.uids, a.itemIds ++ b.itemIds,
          a.events ++ b.events, a.vetoed || b.vetoed)

      override def finish(b: AlertBuf): AlertResult =
        AlertResult(b.uids.toSeq.sorted, b.itemIds.toSeq.sorted,
          b.events.sorted, b.vetoed,
          fires = b.uids.size >= minUids && !b.vetoed)

      override def bufferEncoder: Encoder[AlertBuf] = Encoders.product[AlertBuf]
      override def outputEncoder: Encoder[AlertResult] = Encoders.product[AlertResult]
    }
}
