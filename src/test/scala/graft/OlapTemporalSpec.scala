package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.{AsOf, Olap}
import graft.dedup.DedupOps

/** Edge semantics of the round-2 operators: as-of join ('<=' tie rules),
  * bucketed range join (boundary inclusion both sides of a bucket edge),
  * connected components (transitivity, singletons), sequence packing
  * (bin spanning), rollup (hierarchy consistency on real data). */
class OlapTemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private val SF = "/root/testdata/sf0.001"

  test("as-of join: '<=' tie, max-event-id among equal-ts views, null when no prior view") {
    val events = Seq(
      // user 1: view strictly before, then purchase
      (10L, ts("2024-01-05 08:00:00"), 1L, "view", 1.0, "{}"),
      (11L, ts("2024-01-05 09:00:00"), 1L, "purchase", 1.0, "{}"),
      // user 2: TWO views at the exact purchase ts → included ('<='), max id wins
      (20L, ts("2024-01-05 09:00:00"), 2L, "view", 1.0, "{}"),
      (21L, ts("2024-01-05 09:00:00"), 2L, "view", 1.0, "{}"),
      (22L, ts("2024-01-05 09:00:00"), 2L, "purchase", 1.0, "{}"),
      // user 3: purchase first (no prior view), later view must NOT attach
      (30L, ts("2024-01-05 09:00:00"), 3L, "purchase", 1.0, "{}"),
      (31L, ts("2024-01-05 10:00:00"), 3L, "view", 1.0, "{}"),
      // clicks are ignored entirely
      (40L, ts("2024-01-05 08:30:00"), 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = AsOf.asofCore(events).collect()
      .map(r => (r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]))).toSet
    val us = (s: String) => ts(s).getTime * 1000L
    assert(out === Set(
      (11L, Some(us("2024-01-05 08:00:00")), Some(10L)),
      (22L, Some(us("2024-01-05 09:00:00")), Some(21L)),
      (30L, None, None)))
  }

  test("range join: window boundaries exact, matches across bucket edges") {
    val base = ts("2024-01-05 12:00:00").getTime
    def ev(id: Long, offSec: Long, user: Long, typ: String) =
      (id, new Timestamp(base + offSec * 1000L), user, typ, 1.0, "{}")
    val events = Seq(
      ev(1, -600, 1, "view"),  // exactly windowSec before → INCLUDED (>=)
      ev(2, -601, 1, "view"),  // just outside → excluded
      ev(3, 0, 1, "purchase"), // v_us == p_us → excluded ('<')
      ev(4, 0, 1, "view"),
      // user 2: view and purchase in DIFFERENT buckets but within window
      // (base is bucket-aligned: view lands in bucket k+1, purchase in k+2)
      ev(10, 602, 2, "view"),
      ev(11, 1201, 2, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = AsOf.attributionCore(events, 600L).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(out === Set((3L, 1L), (11L, 1L))) // each purchase: exactly 1 view
  }

  test("connected components: transitive chains merge, singletons self-label") {
    val docs = (0L to 6L).toDF("doc_id")
    // 1-2, 2-3 (chain), 5-6 (pair); 0 and 4 isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = DedupOps.connectedComponents(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(
      (0L, 0L, 1L), (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 4L, 1L), (5L, 5L, 2L), (6L, 5L, 2L)))
  }

  test("connected components: long path needs multiple propagation rounds") {
    val docs = (0L to 5L).toDF("doc_id")
    val pairs = (0L until 5L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = DedupOps.connectedComponents(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === (0L to 5L).map(i => (i, 0L)).toSet)
  }

  test("rollup totals are consistent across hierarchy levels (sf0.001)") {
    val out = Olap.revenueRollup(spark, SF).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(2), r.getLong(3)))).toMap
    val grand = out(("ALL", "ALL"))
    // toSeq: mapping over the key SET would dedupe equal counts pre-sum
    val nations = out.keys.toSeq.filter(k => k._1 != "ALL" && k._2 == "ALL")
    assert(nations.nonEmpty)
    assert(nations.map(out(_)._2).sum === grand._2)
    val perNationGmv = nations.map(out(_)._1).sum
    assert(math.abs(perNationGmv - grand._1) < 1e-6)
    // leaf level sums to each nation subtotal (order counts are exact)
    nations.foreach { case (n, _) =>
      val leaves = out.keys.toSeq.filter(k => k._1 == n && k._2 != "ALL")
      assert(leaves.map(out(_)._2).sum === out((n, "ALL"))._2)
    }
  }

  test("sequence packing: bins advance by exclusive prefix sum within source") {
    import graft.text.TextOps
    val out = TextOps.packChunks(spark, SF, capacity = 100).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2)
      var prefix = 0L
      ordered.foreach { case (_, _, n, bin, off) =>
        assert(bin === prefix / 100)
        assert(off === prefix % 100)
        prefix += n
      }
    }
    // the tiny capacity guarantees docs span bins: offset + n_tokens > capacity somewhere
    assert(out.exists { case (_, _, n, _, off) => off + n > 100 })
  }

  test("moving average window: ma7 over present days only, delta vs previous row") {
    val out = Olap.dailyMovingAvg(spark, SF)
      .filter($"user_id" === 1L).orderBy("log_date").collect()
      .map(r => (r.getLong(2), r.getDouble(3), Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(out.nonEmpty)
    // recompute expected frame values on the driver
    val cts = out.map(_._1)
    cts.indices.foreach { i =>
      val frame = cts.slice(math.max(0, i - 6), i + 1)
      assert(out(i)._2 === frame.sum.toDouble / frame.size)
      val expDelta = if (i == 0) None else Some(cts(i) - cts(i - 1))
      assert(out(i)._3 === expDelta)
    }
  }
}
