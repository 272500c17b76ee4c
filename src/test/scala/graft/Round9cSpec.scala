package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.window.WindowExec

import graft.ops.{Graph, Layout, Maintenance, Sessions}

/** Round-9c additions: warehouse maintenance (snapshot CDC diff,
  * incremental MV refresh), multi-dimensional pruning (skyline via
  * bounded-domain dominance, Z-order layout audit), the interval-sweep
  * concurrency operator, and degree-oriented triangle enumeration. Each
  * test pins the equivalence its scale story rests on: merge ≡
  * recompute, banded ≡ global, oriented ≡ naive, broadcast-domain ≡
  * quadratic dominance. */
class Round9cSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p +: (p.children.flatMap(allNodes) ++ (p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case _ => Seq.empty
    }))

  test("snapshotDiff recovers exactly the planted insert/delete/update sets") {
    val got = Maintenance.ordersSnapshotDiff(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val keys = Tables.orders(spark, dir)
      .select("o_orderkey").collect().map(_.getLong(0))
    val expect = keys.flatMap { k =>
      val inOld = k % 97 != 0
      val inNew = k % 89 != 0
      if (!inOld && inNew) Some(k -> "insert")
      else if (inOld && !inNew) Some(k -> "delete")
      else if (inOld && inNew && k % 13 == 0) Some(k -> "update")
      else None
    }.toMap
    assert(got.nonEmpty && got === expect)
    assert(Set("insert", "delete", "update").subsetOf(got.values.toSet),
      "the planted snapshots must exercise all three op kinds")
  }

  test("snapshotDiff emits nothing for identical snapshots and handles nulls null-safely") {
    import spark.implicits._
    val a = Seq((1L, Option("x"), Option(1.0)), (2L, None, Option(2.0)),
      (3L, Option("z"), None)).toDF("k", "s", "v")
    assert(Maintenance.snapshotDiff(a, a, "k", Seq("s", "v")).count() === 0L)
    // a null→value transition is an update, not a silently-equal row
    val b = Seq((1L, Option("x"), Option(1.0)), (2L, Option("y"), Option(2.0)),
      (3L, Option("z"), None)).toDF("k", "s", "v")
    val diff = Maintenance.snapshotDiff(a, b, "k", Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff === Map(2L -> "update"))
  }

  test("incrementalMv merge equals the full recompute and is split-invariant") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq
    val inc = rows(Maintenance.incrementalMv(spark, dir))
    assert(inc.nonEmpty)
    // full recompute with the same decimal discipline, no split
    def dec(c: String) = col(c).cast("decimal(18,2)")
    val full = rows(Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(dec("l_quantity")).as("s_qty"),
        sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount"))).as("s_rev"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("s_qty").cast("double"), col("s_rev").cast("double"),
        (col("s_qty").cast("double") / col("n_rows")), col("n_rows"))
      .orderBy("l_returnflag", "l_linestatus"))
    assert(inc === full, "merge(partial(base), partial(delta)) must equal aggregate(all)")
    // a different split point must not change a single bit
    val otherSplit = rows(Maintenance.incrementalMv(spark, dir, split = "1995-06-15"))
    assert(inc === otherSplit)
  }

  test("paretoFront equals brute-force dominance and uses no sort-merge join") {
    val got = Layout.paretoFront(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    val parts = Tables.part(spark, dir)
      .select("p_partkey", "p_size", "p_retailprice")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val expect = parts.filter { case (_, s, p) =>
      !parts.exists { case (_, s2, p2) =>
        s2 >= s && p2 <= p && (s2 > s || p2 < p)
      }
    }.sortBy(t => (t._2, t._1)).toSeq
    assert(got.nonEmpty && got === expect)
    val smj = allNodes(Layout.paretoFront(spark, dir).queryExecution.executedPlan)
      .collect { case j: SortMergeJoinExec => j }
    assert(smj.isEmpty,
      "dominance must resolve via the broadcast bounded-domain frame, not a shuffle join")
  }

  test("peakConcurrency banded sweep equals the naive global cumsum and is band-invariant") {
    val got = Sessions.peakConcurrency(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    // naive: same sessions, ONE global unpartitioned running sum
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val sessions = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("ns",
        when(lag(col("ts"), 1).over(w).isNull
          || unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) >= 1800000000L,
          1L).otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(unix_micros(min(col("ts"))).as("s_us"),
        unix_micros(max(col("ts"))).as("e_us"))
    val naive = sessions.select(col("s_us").as("t"), lit(1L).as("d"))
      .unionByName(sessions.select(col("e_us").as("t"), lit(-1L).as("d")))
      .groupBy("t").agg(sum(col("d")).as("net"))
      .withColumn("conc", sum(col("net")).over(
        Window.orderBy(col("t").asc).rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(date_format(timestamp_micros(col("t")), "yyyy-MM-dd").as("d"))
      .agg(max(col("conc")).as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === naive)
    // an arbitrary odd band width must not change the answer
    val odd = Sessions.peakConcurrency(spark, dir, bandUs = 7777777L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === odd)
  }

  test("peakConcurrency plan: per-instant running sum is partitioned by band") {
    val windows = allNodes(Sessions.peakConcurrency(spark, dir)
      .queryExecution.executedPlan)
      .collect { case we: WindowExec => we }
    assert(windows.nonEmpty)
    // the per-instant frame (carrying `t`/`net`) must NEVER flow through
    // an unpartitioned window — only the bounded band-domain cumsum
    // (child = the |bands|-row aggregate) may be global
    windows.filter(_.partitionSpec.isEmpty).foreach { we =>
      assert(we.child.output.exists(_.name == "band_net") &&
        !we.child.output.exists(_.name == "t"),
        s"unpartitioned window over ${we.child.output.map(_.name)} — the " +
          "global single-partition sweep is exactly what the banded rewrite avoids")
    }
  }

  test("degree-oriented triangle enumeration equals the naive key-ordered triple join") {
    val got = Graph.coPurchaseTriangles(spark, dir, topK = 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    val op = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("p")).distinct()
    val e = op.as("a").join(op.as("b"), Seq("okey"))
      .filter(col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("u"), col("b.p").as("v"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2L)
      .select("u", "v")
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("n1"), col("e1.v").as("n2"), col("e2.v").as("n3"))
    val naive = tri.select(explode(array(col("n1"), col("n2"), col("n3"))).as("p"))
      .groupBy("p").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === naive)
  }

  test("zorderAudit spans match a direct recompute and z-order bounds BOTH dimensions") {
    val rows = Layout.zorderAudit(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(rows.keySet === Set("linear", "zorder"))
    val n = Tables.lineitem(spark, dir).count()
    assert(rows("linear")._3 === n && rows("zorder")._3 === n)
    // direct recompute of the zorder file spans from first principles
    val cells = Tables.lineitem(spark, dir)
      .select((col("l_partkey") % 64).as("px"), (col("l_suppkey") % 64).as("py"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def morton(x: Long, y: Long): Long =
      (0 until 6).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val zFiles = cells.groupBy { case (x, y) => morton(x, y) >> 8 }
    val zpx = zFiles.values.map(g => g.map(_._1).max - g.map(_._1).min).sum.toDouble / zFiles.size
    val zpy = zFiles.values.map(g => g.map(_._2).max - g.map(_._2).min).sum.toDouble / zFiles.size
    assert(math.abs(rows("zorder")._1 - zpx) < 1e-9)
    assert(math.abs(rows("zorder")._2 - zpy) < 1e-9)
    // on the real table z-order can never be WORSE on py (at sf0.001 the
    // supplier domain is 10 values, so both layouts see it fully)
    val (lpx, lpy, _) = rows("linear")
    assert(lpy >= rows("zorder")._2 && lpx <= rows("zorder")._1)
    assert(rows("zorder")._1 <= 15.0 + 1e-9 && rows("zorder")._2 <= 15.0 + 1e-9,
      "a 16-file z-packing of a 64x64 grid fixes 2 high bits per dimension: " +
        "per-file spans can never exceed 15")
  }

  test("zorderAudit on a dense grid: z-order strictly bounds BOTH dimensions, linear only one") {
    // full 64x64 grid — the regime the layout lever exists for
    val dense = spark.range(64L * 64L)
      .select((col("id") % 64).as("px"), (col("id") / 64).cast("long").as("py"))
    val rows = Layout.zorderAuditCore(dense).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // linear: px fixed to a 4-value band (span 3), py unconstrained (63)
    assert(rows("linear") === ((3.0, 63.0)))
    // z-order: both dimensions confined to a 16-wide quadrant strip
    assert(rows("zorder") === ((15.0, 15.0)))
  }
}
