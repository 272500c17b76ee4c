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
}
