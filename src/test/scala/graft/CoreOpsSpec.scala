package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Micro-fixtures pinning the reference's exact edge semantics
  * (FIXTURES.md §4, citations in the op modules). */
class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // FIXTURES §4.1 — dedup: min-ts wins within a day, one row per day
  test("dau dedup keeps earliest event per (user, day), one row per day") {
    val events = Seq(
      (1L, ts("2024-01-05 08:00:10"), 100L, "view", 1.0, "{}"),
      (2L, ts("2024-01-05 07:00:00"), 100L, "click", 1.0, "{}"), // earliest that day
      (3L, ts("2024-01-05 09:30:00"), 100L, "view", 1.0, "{}"),
      (4L, ts("2024-01-06 01:00:00"), 100L, "view", 1.0, "{}"), // next day → own row
      (5L, ts("2024-01-05 07:30:00"), 200L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dau = events
      .withColumn("log_date", date_format($"ts", "yyyy-MM-dd"))
      .groupBy("user_id", "log_date")
      .agg(min($"ts").as("first_ts"))
    val rows = dau.collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2))).toSet
    assert(rows === Set(
      (100L, "2024-01-05", ts("2024-01-05 07:00:00")),
      (100L, "2024-01-06", ts("2024-01-06 01:00:00")),
      (200L, "2024-01-05", ts("2024-01-05 07:30:00"))))
  }

  // FIXTURES §4.2 — alert: 3 uids + no veto → alert; veto kills; 2 uids no alert
  test("alert veto/threshold semantics with the reference's 5-min/3-uid parameters") {
    val base = ts("2024-01-05 12:00:00").getTime
    def ev(id: Long, offSec: Int, user: Long, typ: String, k: String) =
      (id, new Timestamp(base + offSec * 1000L), user, typ, 1.0, s"""{"k": $k}""")
    val events = Seq(
      // device 1: 3 distinct coupon uids, no click → alert
      ev(1, 0, 1, "purchase", "7"), ev(2, 10, 1, "purchase", "8"),
      ev(3, 20, 1, "purchase", "9"),
      // device 2: 3 uids but a click in window → vetoed
      ev(4, 0, 2, "purchase", "7"), ev(5, 10, 2, "purchase", "8"),
      ev(6, 20, 2, "purchase", "9"), ev(7, 30, 2, "click", "1"),
      // device 3: only 2 distinct uids → below threshold
      ev(8, 0, 3, "purchase", "7"), ev(9, 10, 3, "purchase", "8"),
      ev(10, 20, 3, "purchase", "7"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.streaming.Pipelines
      .alerts(events, windowDur = "5 minutes", slide = "5 minutes", minUids = 3)
      .collect()
    assert(out.map(_.getLong(1)).toSet === Set(1L))
    assert(out.head.getString(2) === "7,8,9")
  }

  test("typed CouponAlertAggregator matches the group-scan semantics") {
    import graft.functions.CouponAlertAggregator
    import CouponAlertAggregator.EventRow
    val rows = Seq(
      EventRow(1, "purchase", "a", "i1"), EventRow(1, "purchase", "b", "i2"),
      EventRow(1, "purchase", "c", "i1"), EventRow(1, "view", null, null),
      EventRow(2, "purchase", "a", "i1"), EventRow(2, "click", "x", "i9"),
      EventRow(2, "purchase", "b", "i2"), EventRow(2, "purchase", "c", "i3"))
    val agg = CouponAlertAggregator(minUids = 3).toColumn
    val res = rows.toDS().groupByKey(_.user_id).agg(agg).collect().toMap
    assert(res(1L).fires); assert(res(1L).uids === Seq("a", "b", "c"))
    assert(!res(2L).fires); assert(res(2L).vetoed)
  }

  // FIXTURES §4.4 — dim miss → null user fields (left outer)
  test("dim lookup miss yields null columns, not dropped rows") {
    val fact = Seq((1L, 10L), (2L, 99L)).toDF("order_id", "user_id")
    val dim = Seq((10L, "alice")).toDF("user_id", "name")
    val out = fact.join(broadcast(dim), Seq("user_id"), "left_outer")
      .orderBy("order_id").collect()
    assert(out.length === 2)
    assert(out(1).isNullAt(2))
  }

  // FIXTURES §4.5 — X6 ratio math: ×1000/÷10 with complement bucket
  test("band ratio uses Math.round(x*1000/total)/10 with complement bucket") {
    val df = Seq(19, 25, 31, 31).toDF("age")
    val out = df.agg(
        count(lit(1)).as("total"),
        sum(when($"age" < 20, 1).otherwise(0)).as("low"),
        sum(when($"age" >= 20 && $"age" < 30, 1).otherwise(0)).as("mid"))
      .select(
        (floor($"low" * 1000.0 / $"total" + 0.5) / 10.0).as("low_r"),
        (floor($"mid" * 1000.0 / $"total" + 0.5) / 10.0).as("mid_r"))
      .select($"low_r", $"mid_r", (lit(100.0) - $"low_r" - $"mid_r").as("high_r"))
      .collect().head
    assert((out.getDouble(0), out.getDouble(1), out.getDouble(2)) === ((25.0, 25.0, 50.0)))
  }

  // P8 — /365 age semantics (leap-ignorant, deliberately preserved)
  test("age derivation uses /365 days, not calendar years") {
    val df = Seq("1996-02-29").toDF("birthday") // 4 leap days to 2012-02-28
    val out = df.select(
      floor(datediff(to_date(lit("2012-02-28")), to_date($"birthday")) / 365)
        .cast("long").as("age")).collect().head.getLong(0)
    // 5843 days / 365 = 16.008… → floor 16 (calendar age would be 15)
    assert(out === 16L)
  }

  test("stratified sample is deterministic per seed and tracks fractions") {
    val dir = "/root/testdata/sf0.01"
    val a = graft.ops.Publisher.stratifiedSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val b = graft.ops.Publisher.stratifiedSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a === b) // same seed ⇒ identical sample
    val totals = Tables.events(spark, dir).groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // purchase keeps everything; 0.5-strata within ±15% of expectation
    assert(a("purchase") === totals("purchase"))
    for (t <- Seq("click", "view")) {
      val frac = a(t).toDouble / totals(t)
      assert(math.abs(frac - 0.5) < 0.15, s"$t sampled $frac")
    }
  }

  // T6 — per-minute throttle
  test("per-minute throttle keeps one row per (user, minute)") {
    val alerts = Seq(
      (1L, ts("2024-01-05 12:00:01")), (1L, ts("2024-01-05 12:00:59")),
      (1L, ts("2024-01-05 12:01:02")), (2L, ts("2024-01-05 12:00:30")))
      .toDF("user_id", "window_start")
    val out = graft.streaming.Pipelines.throttlePerMinute(alerts).collect()
    assert(out.length === 3)
  }

  // W2 — today-vs-yesterday pairing on a literal frame
  test("today-vs-yesterday pairs hours from one conditional scan") {
    val events = Seq(
      (1L, ts("2024-01-05 10:10:00")), (2L, ts("2024-01-05 10:20:00")),
      (3L, ts("2024-01-04 10:15:00")), (4L, ts("2024-01-04 23:00:00")))
      .toDF("event_id", "ts")
    val out = events
      .withColumn("log_date", date_format($"ts", "yyyy-MM-dd"))
      .groupBy(date_format($"ts", "HH").as("lh"))
      .agg(
        sum(when($"log_date" === "2024-01-05", 1).otherwise(0)).as("today_ct"),
        sum(when($"log_date" === "2024-01-04", 1).otherwise(0)).as("yesterday_ct"))
      .orderBy("lh").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("10", 2L, 1L), ("23", 0L, 1L)))
  }

  test("sketch percentiles track exact percentiles per group (±2%)") {
    val dir = "/root/testdata/sf0.01"
    val exact = graft.ops.Publisher.revenuePercentiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = graft.ops.Publisher.revenuePercentilesApprox(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (flag, (p50, p95)) =>
      assert(math.abs(approx(flag)._1 - p50) / p50 <= 0.02, s"$flag p50")
      assert(math.abs(approx(flag)._2 - p95) / p95 <= 0.02, s"$flag p95")
    }
  }

  test("weekly UV from merged daily HLL sketches tracks exact distinct (±5%)") {
    val dir = "/root/testdata/sf0.01"
    val est = graft.ops.Dau.uvSketchRollup(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, dir)
      .withColumn("week", date_format(date_trunc("week",
        to_date(date_format($"ts", "yyyy-MM-dd"))), "yyyy-MM-dd"))
      .groupBy("week").agg(countDistinct($"user_id").as("uv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (week, uv) =>
      assert(math.abs(est(week) - uv) <= math.max(1L, (uv * 0.05).toLong),
        s"week $week: est ${est(week)} vs exact $uv")
    }
  }

  // ES standard-analyzer parity: whole tokens only, case-insensitive,
  // AND across keyword tokens
  test("keyword match is token-boundary: 'widget' does not hit 'widgetry'") {
    val parts = Seq(
      (1L, "small red widget"),       // match
      (2L, "small widgetry kit"),     // NO: widgetry is not the token widget
      (3L, "Small WIDGET (deluxe)"),  // match: case-insensitive, punct boundary
      (4L, "smallish widget"),        // NO: smallish is not the token small
      (5L, "widget small"),           // match: order-free AND
      (6L, "small gadget"))           // NO: widget absent
      .toDF("id", "name")
    val got = parts
      .filter(graft.ops.Publisher.keywordPredicate(col("name"), "small widget"))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(1L, 3L, 5L))
    // all-punctuation keyword analyzes to zero tokens → matches nothing
    // (ES semantics), instead of throwing on an empty reduce
    val none = parts
      .filter(graft.ops.Publisher.keywordPredicate(col("name"), "!!! ??"))
      .count()
    assert(none === 0L)
  }

  test("scalable histogram percentiles equal the buffering exact percentiles") {
    val dir = "/root/testdata/sf0.01"
    def key(r: org.apache.spark.sql.Row) = r.getString(0)
    val exact = graft.ops.Publisher.revenuePercentilesBuffering(spark, dir).collect()
      .map(r => key(r) -> (r.getDouble(1), r.getDouble(2))).toMap
    val hist = graft.ops.Publisher.revenuePercentilesScalable(spark, dir).collect()
      .map(r => key(r) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(hist.keySet === exact.keySet)
    // both are EXACT lerp percentiles — agreement tolerance is float-noise
    // only (the two formulas may differ in the last bit on lerped values)
    exact.foreach { case (flag, (p50, p95)) =>
      assert(math.abs(hist(flag)._1 - p50) <= 1e-9 * math.abs(p50), s"$flag p50")
      assert(math.abs(hist(flag)._2 - p95) <= 1e-9 * math.abs(p95), s"$flag p95")
    }
    val exactLag = graft.ops.Warehouse.shipLagStatsBuffering(spark, dir).collect()
      .map(r => key(r) -> ((r.getDouble(2), r.getDouble(3)), (r.getLong(4), r.getLong(5)))).toMap
    val histLag = graft.ops.Warehouse.shipLagStatsScalable(spark, dir).collect()
      .map(r => key(r) -> ((r.getDouble(2), r.getDouble(3)), (r.getLong(4), r.getLong(5)))).toMap
    assert(histLag.keySet === exactLag.keySet)
    exactLag.foreach { case (flag, ((p50, p95), (mn, mx))) =>
      assert(math.abs(histLag(flag)._1._1 - p50) <= 1e-9 * math.max(1.0, math.abs(p50)), s"$flag p50_days")
      assert(math.abs(histLag(flag)._1._2 - p95) <= 1e-9 * math.max(1.0, math.abs(p95)), s"$flag p95_days")
      assert(histLag(flag)._2 === (mn, mx), s"$flag min/max")
    }
  }

  test("events data contract: ts normalizes to TimestampType from every known encoding, " +
    "and unknown encodings fail loudly at the choke point") {
    import org.apache.spark.sql.types._
    // the REAL testdata, whatever encoding this round's generator used,
    // must come out instant-typed — this is the guard that would have
    // caught the r7 TIMESTAMP_NTZ refresh before it shipped 15 dead queries
    val real = Tables.events(spark, "/root/testdata/sf0.001")
    assert(real.schema("ts").dataType === TimestampType)
    assert(real.limit(1).count() === 1L)
    // nanos-as-long branch: integer-µs conversion, lossless
    val asLong = spark.range(1).select(
      lit(1700000000123456789L).as("ts"))
    val fromLong = Tables.normalizeEventTs(asLong.toDF())
    assert(fromLong.schema("ts").dataType === TimestampType)
    assert(fromLong.select(unix_micros(col("ts"))).head.getLong(0) === 1700000000123456L)
    // NTZ branch: naive wall-clock reinterpreted in the UTC session TZ
    val asNtz = spark.sql("SELECT TIMESTAMP_NTZ '2024-01-02 03:04:05.123456' AS ts")
    val fromNtz = Tables.normalizeEventTs(asNtz)
    assert(fromNtz.schema("ts").dataType === TimestampType)
    assert(fromNtz.select(unix_micros(col("ts"))).head.getLong(0) === 1704164645123456L)
    // already-a-timestamp: pass-through
    assert(Tables.normalizeEventTs(fromNtz).schema("ts").dataType === TimestampType)
    // anything else: loud single-point failure, not 22 scattered crashes
    val bad = spark.range(1).select(lit("2024-01-02").as("ts"))
    val e = intercept[IllegalStateException] {
      Tables.normalizeEventTs(bad.toDF())
    }
    assert(e.getMessage.contains("unsupported type"))
  }
}
