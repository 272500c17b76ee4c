package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Changelog / dimension-materialization operators.
  *
  * Reference semantics reproduced (citations into /root/reference/):
  *  - T8 changelog-to-latest: user_info INSERT/UPDATE both upsert the dim,
  *    last write wins: gamll-canal/src/main/java/com/atguigu/app/CanalClient.java:106-118
  *    + gmall-realtime/src/main/scala/com/atguigu/app/UserInfoApp.scala:29-41
  *  - §2.10 union: the CDC router fans one binlog stream into three topics
  *    (CanalClient.java:74-118); the union of per-type substreams is the
  *    natural inverse workload.
  *
  * Scale note: latest-per-key compaction uses min/max-style aggregation on
  * a (ts, event_id)-packed struct rather than a global window sort — the
  * partial aggregate collapses map-side, one shuffle on the key.
  */
object Changelog {

  /** T8: latest event per user (the "dim snapshot"), last write wins with
    * (ts, event_id) as the total version order. */
  def latestPerUser(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"),
        col("event_type").as("last_event_type"),
        unix_micros(col("ts")).as("last_ts_us"),
        col("value").as("last_value"))
      .orderBy("user_id")
  }

  /** T8 generalized to FULL HISTORY (SCD type 2): every change event
    * becomes a validity interval [valid_from, valid_to) with valid_to =
    * the next change's timestamp (NULL = current version). The
    * warehouse-side materialization a changelog feeds when consumers
    * need as-of-time lookups, not just the latest snapshot. One shuffle
    * on the key + one per-key ordered pass (lead); at 100 TB the window
    * partitions by entity so it parallelizes per key group — no global
    * sort. Pairs with the as-of join (q48) as its consumer. */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame =
    scd2IntervalsCore(Tables.events(spark, dir))

  private[graft] def scd2IntervalsCore(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(
        col("user_id"),
        col("version"),
        unix_micros(col("ts")).as("valid_from_us"),
        unix_micros(col("valid_to_ts")).as("valid_to_us"), // null = current
        (col("valid_to_ts").isNull).cast("long").as("is_current"),
        col("event_type"),
        col("value"))
      .orderBy("user_id", "version")
  }

  /** q190: as-of-time snapshot reconstruction from the SCD2 intervals —
    * the consumer side of q71: "what did the dimension look like at T"
    * is a pure interval-containment filter (valid_from ≤ T < valid_to,
    * open current versions included), no window re-evaluation. The
    * DuckDB oracle answers the same question the DIRECT way (latest
    * event per user with ts ≤ T), so the hash match proves the interval
    * materialization is a faithful time-travel index.
    *
    * Scale: against a STORED interval table this is a partition-
    * prunable scan-filter (valid_from ≤ T pushes down; at 100 TB the
    * intervals live partitioned by valid_from date, so time travel
    * reads only history up to T) — versus re-running the per-entity
    * window over the full changelog, which is what the oracle does. */
  def asOfSnapshot(spark: SparkSession, dir: String,
                   cutoff: String = "2024-01-15"): DataFrame = {
    val cutUs = unix_micros(lit(cutoff).cast("timestamp"))
    scd2Intervals(spark, dir)
      .filter(col("valid_from_us") <= cutUs &&
        (col("valid_to_us").isNull || col("valid_to_us") > cutUs))
      .select(col("user_id"), col("event_type"), col("value"),
        col("valid_from_us"))
      .orderBy("user_id")
  }

  /** q191: fact enrichment against the SCD2 dimension AS OF each fact's
    * own timestamp — the canonical warehouse join ("which profile
    * version was live when this purchase happened"). The dimension is
    * the SCD2 history of the user's NON-purchase events; facts are the
    * purchases; each fact attaches the containing validity interval
    * (valid_from ≤ ts < valid_to, open current version included).
    * Facts BEFORE the user's first dim version survive with a null
    * version — the late-arriving/pre-history orphans an integrity
    * audit needs surfaced, never silently dropped.
    *
    * Scale design: an equi-join ON THE ENTITY KEY first (user_id — the
    * shuffle key), with interval containment as a post-join filter
    * evaluated inside the join — per-entity version chains are short,
    * so the per-key fan-out is bounded by history depth, not corpus
    * size; intervals are disjoint per user, so each fact matches at
    * most once (no dedup pass needed). This is the q48 as-of family
    * with the dimension side pre-materialized — the join a 100 TB fact
    * table runs against a dimension history thousands of times
    * smaller. */
  def enrichAsOf(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val dim = scd2IntervalsCore(ev.filter(col("event_type") =!= "purchase"))
      .select(col("user_id").as("d_user"), col("version"),
        col("valid_from_us"), col("valid_to_us"),
        col("event_type").as("dim_state"))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    facts.join(dim,
        col("user_id") === col("d_user") &&
          col("valid_from_us") <= col("ts_us") &&
          (col("valid_to_us").isNull || col("valid_to_us") > col("ts_us")),
        "left")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("version"), col("dim_state"))
      .orderBy("event_id")
  }

  /** q193: SCD2 compaction — collapse consecutive versions whose
    * tracked attribute did not change (the no-op-update runs a noisy
    * changelog writes; CDC sources emit them constantly and they bloat
    * the interval table without adding history). Runs of identical
    * `event_type` per user merge into one interval spanning first
    * valid_from → last valid_to, with the collapsed count kept for the
    * audit trail.
    *
    * Scale design: the islands trick on the already-per-user-windowed
    * interval frame — one lag compare + one running sum, both
    * partitioned by user; the merge is a per-(user, run) aggregate with
    * an argmax-by-version struct for the closing bound (never a
    * self-join). At 100 TB this is the periodic maintenance pass that
    * keeps q190/q191's read path proportional to TRUE history. */
  def scd2Compact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("version"))
    scd2Intervals(spark, dir)
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull
          || lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run",
        sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "run")
      .agg(
        min(col("valid_from_us")).as("valid_from_us"),
        // closing bound of the run = valid_to of its LAST version
        // (argmax by version; null = still current)
        max(struct(col("version"), col("valid_to_us"))).getField("valid_to_us")
          .as("valid_to_us"),
        // all members of a run share the type by construction; min keeps
        // the aggregate order-insensitive on principle
        min(col("event_type")).as("state"),
        count(lit(1)).as("n_collapsed"))
      .select(col("user_id"), col("run").as("version"),
        col("valid_from_us"), col("valid_to_us"), col("state"),
        col("n_collapsed"))
      .orderBy("user_id", "version")
  }

  /** P1: schema-on-read JSON parse with a declared target schema —
    * PERMISSIVE mode reproduces fastjson's null-on-missing semantics
    * (reference DauApp.scala:33: absent JSON fields become null/0
    * silently). `k` exists in the wire JSON; `missing` never does. */
  def jsonParse(spark: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("missing", org.apache.spark.sql.types.StringType)))
    Tables.events(spark, dir)
      .select(col("event_id"), from_json(col("props"), schema).as("p"))
      .select(col("event_id"),
        col("p.k").cast("long").as("k"),
        col("p.missing").as("missing"))
      .orderBy("event_id")
  }

  /** §2.10: union of two event substreams, re-aggregated (multi-topic
    * ingestion analog). */
  def unionStreams(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_type") === "click")
      .unionByName(ev.filter(col("event_type") === "view"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("ct"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .orderBy("event_type")
  }
}
