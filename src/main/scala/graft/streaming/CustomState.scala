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
  // Options, not a sentinel long: every Long is a legal epoch-micros
  // value (ts_us == -1 is 1969-12-31T23:59:59.999999Z), so an in-band
  // "unset" marker would silently swallow that user's funnel
  case class FunnelState(view_us: Option[Long], click_us: Option[Long],
                         purchase_us: Option[Long])
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
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[FunnelEv], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(None, None, None))
          val before = s
          rows.toSeq.sortBy(e => (e.ts_us, e.event_type)).foreach { e =>
            e.event_type match {
              case "view" if s.view_us.isEmpty =>
                s = s.copy(view_us = Some(e.ts_us))
              case "click" if s.click_us.isEmpty &&
                  s.view_us.exists(e.ts_us > _) =>
                s = s.copy(click_us = Some(e.ts_us))
              case "purchase" if s.purchase_us.isEmpty &&
                  s.click_us.exists(e.ts_us > _) =>
                s = s.copy(purchase_us = Some(e.ts_us))
              case _ => ()
            }
          }
          if (s == before) Iterator.empty
          else {
            state.update(s)
            def opt(v: Option[Long]): java.lang.Long =
              v.map(java.lang.Long.valueOf).orNull
            val stage = 1L + (if (s.click_us.isDefined) 1L else 0L) +
              (if (s.purchase_us.isDefined) 1L else 0L)
            Iterator.single(FunnelRow(key, opt(s.view_us), opt(s.click_us),
              opt(s.purchase_us), stage))
          }
      }
  }
}
