package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom arbitrary-state showcase (SURVEY §2.8 T3 fallback path):
  * `mapGroupsWithState` over a keyed stream — the API the engine reaches
  * for when windowed aggregates can't express the state machine (the
  * reference's hand-rolled Redis state, DauHandler.scala:61-73 /
  * SaleDetailApp.scala:53-139, generalized). The windowed-agg and
  * watermarked-join formulations in [[Pipelines]] remain the preferred
  * declarative paths; this exists for the genuinely-custom cases and to
  * pin the typed state API. */
object CustomState {

  case class Keyed(user_id: Long, n: Long)
  case class RunningTotal(user_id: Long, total: Long, batches: Long)

  /** Running per-user totals across micro-batches — state survives
    * between batches and each batch emits the updated total. */
  def runningTotals(events: Dataset[Keyed]): Dataset[RunningTotal] = {
    implicit val enc: org.apache.spark.sql.Encoder[RunningTotal] =
      Encoders.product[RunningTotal]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[RunningTotal, RunningTotal](GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Keyed], state: GroupState[RunningTotal]) =>
          val prev = state.getOption.getOrElse(RunningTotal(key, 0L, 0L))
          val add = rows.map(_.n).sum
          val next = RunningTotal(key, prev.total + add, prev.batches + 1)
          state.update(next)
          next
      }
  }

  case class FunnelEv(user_id: Long, ts_us: Long, event_type: String)
  case class FunnelState(view_us: Long, click_us: Long, purchase_us: Long)
  case class FunnelRow(user_id: Long, view_us: java.lang.Long,
                       click_us: java.lang.Long, purchase_us: java.lang.Long,
                       stage: Long)

  /** Streaming version of the ordered conversion funnel (q72,
    * [[graft.ops.Publisher.funnel]]): a per-user state machine advanced
    * incrementally by `flatMapGroupsWithState` — each batch folds its
    * events in timestamp order into (view, click, purchase) entry times
    * where each stage must be STRICTLY AFTER the previous one, and emits
    * the user's row only when the state advanced. State is three longs
    * per user (bounded, mergeable-by-replay); identical to the batch
    * operator when events arrive in order across batches. Under
    * cross-batch disorder the state machine is greedy — a stage, once
    * entered, is never re-opened by a late earlier event (the same
    * tradeoff as the reference's processing-order Redis state machines;
    * the batch operator remains the exact retrospective form). */
  def funnelStream(events: Dataset[FunnelEv]): Dataset[FunnelRow] = {
    implicit val outEnc: org.apache.spark.sql.Encoder[FunnelRow] =
      Encoders.product[FunnelRow]
    implicit val stateEnc: org.apache.spark.sql.Encoder[FunnelState] =
      Encoders.product[FunnelState]
    val None_ = -1L
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[FunnelEv], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(None_, None_, None_))
          val before = s
          rows.toSeq.sortBy(e => (e.ts_us, e.event_type)).foreach { e =>
            e.event_type match {
              case "view" if s.view_us == None_ =>
                s = s.copy(view_us = e.ts_us)
              case "click" if s.view_us != None_ && s.click_us == None_ &&
                  e.ts_us > s.view_us =>
                s = s.copy(click_us = e.ts_us)
              case "purchase" if s.click_us != None_ && s.purchase_us == None_ &&
                  e.ts_us > s.click_us =>
                s = s.copy(purchase_us = e.ts_us)
              case _ => ()
            }
          }
          if (s == before) Iterator.empty
          else {
            state.update(s)
            def opt(v: Long): java.lang.Long = if (v == None_) null else v
            val stage = 1L + (if (s.click_us != None_) 1L else 0L) +
              (if (s.purchase_us != None_) 1L else 0L)
            Iterator.single(FunnelRow(key, opt(s.view_us), opt(s.click_us),
              opt(s.purchase_us), stage))
          }
      }
  }
}
