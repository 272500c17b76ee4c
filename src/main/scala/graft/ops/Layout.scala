package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multi-dimensional pruning operators: the skyline (pareto frontier)
  * query and a Z-order (Morton) clustering-layout audit. Both answer the
  * same 100 TB question from different ends: how do you avoid scanning
  * everything when the predicate involves MORE than one column?
  *
  * The skyline uses the bounded-domain trick the engine's banded rewrites
  * (q122/q174) are built on: dominance against a 50-value dimension
  * domain needs a 50-row broadcast, never a self-join. The Z-order audit
  * measures what an interleaved-bits sort key buys: per-file min/max
  * ranges that are tight in BOTH dimensions, so a two-column predicate
  * prunes files — the layout lever behind Delta/Iceberg OPTIMIZE ZORDER.
  */
object Layout {

  /** q182: pareto frontier of `part` — maximize p_size, minimize
    * p_retailprice. A part is dominated iff some other part has
    * size ≥ AND price ≤ with at least one strict; equal (size, price)
    * duplicates are NOT dominated by each other and all survive.
    *
    * Plan: p_size has a tiny domain (1..50), so dominance collapses to
    * two broadcast scalars per size: the min price AT each size and the
    * running min price over all STRICTLY LARGER sizes (a window over the
    * ≤50-row per-size frame). A row survives iff its price equals its
    * size's min and beats the strictly-larger-size running min. One
    * scan + one 50-row aggregate + one broadcast join — no self-join,
    * no global sort.
    *
    * 100 TB: the per-size frame stays |domain|-sized whatever the row
    * count; for a continuous dimension, band it first (q174's floor
    * trick) and the same two-scalar test applies per band with an exact
    * in-band refinement. The naive NOT EXISTS the oracle runs is the
    * O(n²) plan this operator exists to avoid. */
  /** q229 — rendezvous-hash resharding audit: assign every document to
    * a shard by highest-random-weight hashing (argmax over shards of
    * md5(doc:shard) — Thaler & Ravishankar 1996), then grow the fleet
    * 8 → 10 and measure churn. Rendezvous hashing is MONOTONE: a doc
    * either keeps its shard or moves to one of the NEW shards, so the
    * moved fraction is the theoretical minimum (≈ 2/10), where mod-
    * hashing (doc_id % S, the naive scheme) reshuffles ~80% of docs.
    * The audit quantifies exactly that — the reason a serving layer
    * reshards without a full re-index.
    *
    * Entirely IN-ROW (one argmax over a 10-element literal-generated
    * array per doc — no shuffle but the 1-row count aggregate);
    * deterministic via md5 + lexicographic (hkey, shard) struct max,
    * identical in both engines. */
  def reshardAudit(spark: SparkSession, dir: String,
                   oldShards: Int = 8, newShards: Int = 10): DataFrame = {
    def argmax(s: Int) = expr(
      s"""array_max(transform(sequence(0, ${s - 1}),
         |  x -> struct(md5(concat(cast(doc_id AS STRING), ':', cast(x AS STRING))) AS hkey,
         |              cast(x AS BIGINT) AS shard))).shard""".stripMargin)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        argmax(oldShards).as("s_old"), argmax(newShards).as("s_new"),
        expr(s"doc_id % $oldShards").as("m_old"),
        expr(s"doc_id % $newShards").as("m_new"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s_old") =!= col("s_new"), 1L).otherwise(0L)).as("moved_rendezvous"),
        sum(when(col("s_new") >= oldShards.toLong, 1L).otherwise(0L)).as("moved_to_new"),
        sum(when(col("m_old") =!= col("m_new"), 1L).otherwise(0L)).as("moved_mod"))
      .select(col("n_docs"), col("moved_rendezvous"), col("moved_to_new"), col("moved_mod"),
        expr("CAST(FLOOR(1000000.0 * moved_rendezvous / n_docs + 0.5) AS BIGINT)")
          .as("rendezvous_micro"),
        expr("CAST(FLOOR(1000000.0 * moved_mod / n_docs + 0.5) AS BIGINT)")
          .as("mod_micro"))
  }

  def paretoFront(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val part = Tables.part(spark, dir)
    val perSize = part.groupBy("p_size")
      .agg(min(col("p_retailprice")).as("min_at_size"))
      .withColumn("min_above",
        min(col("min_at_size")).over(
          Window.orderBy(col("p_size").desc)
            .rowsBetween(Window.unboundedPreceding, -1)))
    part.join(broadcast(perSize), Seq("p_size"))
      .filter(col("p_retailprice") === col("min_at_size") &&
        (col("min_above").isNull ||
          col("p_retailprice") < col("min_above")))
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      .orderBy(col("p_size").asc, col("p_partkey").asc)
  }

  /** Morton interleave of two `bits`-bit bucket ids: bit i of x lands at
    * position 2i, bit i of y at 2i+1. Pure integer arithmetic (shifts,
    * masks, adds) so DuckDB reproduces it with the identical formula. */
  private[graft] def morton(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftright(x, i) % 2) * lit(1L << (2 * i)) +
        (shiftright(y, i) % 2) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** q185: Z-order clustering-layout audit over lineitem's
    * (l_partkey, l_suppkey) — the two-column predicate pair a parts-
    * availability query filters on. Rows are hashed into a 64×64 grid
    * (6 bits per dimension), assigned their Morton code, and packed into
    * "files" of equal z-range (top 4 bits → 16 files); the same rows are
    * also packed into 16 files by the LINEAR layout (partkey bucket
    * order — what a single-column sort gives you). For each layout the
    * audit reports the mean per-file span of BOTH dimensions' bucket
    * ranges — the min/max width a file-skipping reader would see.
    *
    * The point the numbers make: linear layout gives perfect partkey
    * spans and useless (full-width) suppkey spans; Z-order gives ~√-
    * balanced spans in both, so a conjunctive two-column predicate
    * prunes most files. That trade IS the OPTIMIZE ZORDER story at
    * 100 TB, here measured rather than asserted.
    *
    * Plan shape: one scan computing bucket ids + codes (pure per-row
    * integer ops), one 16-key aggregate per layout scanning min/max of
    * each dimension — no shuffle beyond the two tiny aggregates. */
  def zorderAudit(spark: SparkSession, dir: String): DataFrame =
    zorderAuditCore(Tables.lineitem(spark, dir)
      .select(
        (pmod(col("l_partkey"), lit(64))).cast("long").as("px"),
        (pmod(col("l_suppkey"), lit(64))).cast("long").as("py")))

  /** [[zorderAudit]] over any (px, py) bucket frame (spec hook — the
    * strict "z-order beats linear on the second dimension" claim needs
    * a py domain that actually spans the grid). */
  private[graft] def zorderAuditCore(buckets: DataFrame): DataFrame = {
    val li = buckets.withColumn("z", morton(col("px"), col("py"), 6))
    def spans(df: DataFrame, fileCol: Column, layout: String): DataFrame = df
      .groupBy(fileCol.as("file_id"))
      .agg(
        (max(col("px")) - min(col("px"))).as("px_span"),
        (max(col("py")) - min(col("py"))).as("py_span"),
        count(lit(1)).as("n_rows"))
      .agg(
        avg(col("px_span")).as("mean_px_span"),
        avg(col("py_span")).as("mean_py_span"),
        sum(col("n_rows")).as("n_rows"))
      .select(lit(layout).as("layout"),
        col("mean_px_span"), col("mean_py_span"), col("n_rows"))
    spans(li, shiftright(col("z"), 8), "zorder")
      .unionByName(spans(li, shiftright(col("px"), 2), "linear"))
      .orderBy(col("layout").asc)
  }
}
