package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Warehouse-maintenance operators: snapshot diffing (the batch CDC the
  * reference's canal layer produces event-by-event, `gamll-canal`'s
  * row-level insert/update stream, re-expressed as a set operation over
  * two table states) and incremental materialized-view maintenance (the
  * "don't re-scan the warehouse to refresh the dashboard" discipline
  * behind the publisher's daily aggregates, DauMapper.xml:4-11 /
  * OrderMapper.xml:4-16, at 100 TB).
  *
  * Both are single key-shuffle plans: diff is one full-outer join on the
  * primary key; MV refresh is partial-aggregate merge, whose cost is
  * O(|delta| + |groups|) — never O(|base|).
  */
object Maintenance {

  /** Generic snapshot diff: given two states of a keyed table, emit one
    * row per changed key with `op` ∈ insert / delete / update. This is
    * the set-level equivalent of a CDC changelog between two snapshot
    * times (and the core of MERGE INTO / incremental replication).
    *
    * Implementation: both sides project (key, struct(compare-cols)) and
    * meet in ONE full-outer shuffle join on the key; change detection is
    * a null-safe struct comparison (`<=>`), so per-column nulls never
    * false-positive. Unchanged keys are filtered out post-join.
    *
    * 100 TB: the join shuffles each snapshot once on the primary key —
    * the minimum possible data movement for an unordered diff. With both
    * snapshots bucketed by key on disk (the layout a snapshot store
    * should use anyway), the exchange disappears entirely and the diff
    * is a zero-shuffle zip of co-located buckets. AQE handles size
    * asymmetry (a small "new" increment broadcasts).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   key: String, compareCols: Seq[String]): DataFrame =
    snapshotDiffFull(oldSnap, newSnap, key, compareCols)
      .select(col(key), col("op"))

  /** [[snapshotDiff]] carrying the new-side payload on insert/update
    * rows (null on delete) — the changelog a MERGE INTO / replication
    * apply consumes; [[applyDiff]] is its inverse. Same single
    * full-outer key join. */
  private[graft] def snapshotDiffFull(oldSnap: DataFrame, newSnap: DataFrame,
                                      key: String,
                                      compareCols: Seq[String]): DataFrame = {
    val oldS = oldSnap.select(col(key).as("k_old"),
      struct(compareCols.map(col): _*).as("v_old"))
    val newS = newSnap.select(col(key).as("k_new"),
      struct(compareCols.map(col): _*).as("v_new"))
    oldS.join(newS, col("k_old") === col("k_new"), "full_outer")
      .select(
        coalesce(col("k_old"), col("k_new")).as(key),
        when(col("k_old").isNull, lit("insert"))
          .when(col("k_new").isNull, lit("delete"))
          .when(!(col("v_old") <=> col("v_new")), lit("update"))
          .as("op"),
        col("v_new"))
      .filter(col("op").isNotNull)
  }

  /** Apply a payload-carrying snapshot diff to the old state — the
    * MERGE INTO: deletes and updates drop their old rows (one left-anti
    * key join), inserts and updates contribute their new payload. By
    * construction apply(old, diff(old, new)) ≡ new; q189 hash-verifies
    * exactly that round trip against the target state as the oracle.
    *
    * 100 TB: left-anti + union is one key-shuffle over the old snapshot
    * (bucketed layout removes even that) plus the — normally tiny —
    * changelog; the pattern never rewrites unchanged data rows. */
  def applyDiff(oldSnap: DataFrame, changes: DataFrame,
                key: String, compareCols: Seq[String]): DataFrame = {
    val touched = changes
      .filter(col("op").isin("delete", "update")).select(col(key))
    val incoming = changes.filter(col("op").isin("insert", "update"))
      .select(col(key) +: compareCols.map(c => col(s"v_new.$c").as(c)): _*)
    oldSnap.select(col(key) +: compareCols.map(col): _*)
      .join(touched, Seq(key), "left_anti")
      .unionByName(incoming)
  }

  /** q180: snapshot diff over two deterministic states of `orders`.
    * The "old" snapshot drops keys ≡ 0 (mod 97) (rows created since) and
    * perturbs o_totalprice by +1.00 for keys ≡ 0 (mod 13) (rows updated
    * since); the "new" snapshot drops keys ≡ 0 (mod 89) (rows deleted
    * since). The diff must recover exactly the planted insert / delete /
    * update sets — which the DuckDB oracle recomputes from the same
    * modular rules via its own full-outer join. */
  private val OrderCols = Seq("o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")

  private def orderSnaps(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val orders = Tables.orders(spark, dir)
    val oldSnap = orders
      .filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 0, col("o_totalprice") + lit(1.0d))
          .otherwise(col("o_totalprice")))
    val newSnap = orders.filter(col("o_orderkey") % 89 =!= 0)
    (oldSnap, newSnap)
  }

  def ordersSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val (oldSnap, newSnap) = orderSnaps(spark, dir)
    snapshotDiff(oldSnap, newSnap, "o_orderkey", OrderCols)
      .orderBy(col("o_orderkey").asc)
  }

  /** q189: the MERGE round trip — apply the payload-carrying diff back
    * onto the old snapshot and emit the reconstructed state. The DuckDB
    * oracle is simply the TARGET state (the new snapshot), so the hash
    * match proves apply ∘ diff = identity over every row and column —
    * the end-to-end correctness contract of a CDC replication pipeline. */
  def ordersMergeApply(spark: SparkSession, dir: String): DataFrame = {
    val (oldSnap, newSnap) = orderSnaps(spark, dir)
    val changes = snapshotDiffFull(oldSnap, newSnap, "o_orderkey", OrderCols)
    applyDiff(oldSnap, changes, "o_orderkey", OrderCols)
      .orderBy(col("o_orderkey").asc)
  }

  /** q192: per-partition content fingerprints — the cheap cross-replica
    * validation a replicated warehouse runs after every sync (and the
    * precursor that tells a 100 TB diff WHICH partitions to diff at all:
    * checksum-equal partitions skip q180's row-level join entirely).
    * Per orderdate month: row count and an order-insensitive modular
    * polynomial checksum over the row content (key, custkey, cents,
    * status) — pure integer arithmetic under an explicit modulus, so
    * both engines compute identical values with no overflow or
    * hash-function coupling, and the SUM commutes with any partitioning.
    *
    * One scan + one |months|-key partial aggregate; at scale the month
    * is the physical partition key, so the checksum table is a
    * metadata-sized artifact recomputed incrementally per partition. */
  def partitionChecksums(spark: SparkSession, dir: String): DataFrame = {
    val P = 1000000007L
    val term = (
      (col("o_orderkey") % P) * 1000003L % P +
        (col("o_custkey") % P) * 9176L % P +
        floor(col("o_totalprice") * 100d + 0.5d).cast("long") % P +
        ascii(col("o_orderstatus"))) % P
    Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(term) % P).as("checksum"))
      .orderBy("month")
  }

  private def dec(c: String): Column = col(c).cast("decimal(18,2)")

  /** Partial aggregate of the q181 MV over any lineitem slice: exact
    * DECIMAL sums + a count — the mergeable state. Averages are NOT in
    * the state (they don't merge); they derive after the final merge. */
  private def mvPartial(slice: DataFrame): DataFrame = slice
    .groupBy("l_returnflag", "l_linestatus")
    .agg(
      sum(col("l_quantity").cast("decimal(18,2)")).as("s_qty"),
      sum(dec("l_extendedprice") *
        (lit(1).cast("decimal(18,2)") - dec("l_discount"))).as("s_rev"),
      count(lit(1)).as("n"))

  /** q181: incremental materialized-view maintenance, verified against
    * full recompute. The MV is the (l_returnflag, l_linestatus) pricing
    * rollup; the "base" state covers l_shipdate < 1997-01-01 and the
    * "delta" is everything after. The refresh path aggregates ONLY the
    * delta and merges its partial state (exact decimal sums + counts)
    * into the base partials by re-aggregation; derived measures (avg)
    * are computed after the merge, never merged themselves.
    *
    * The DuckDB oracle is the FULL recompute over the unsplit table —
    * the hash match is the refresh-correctness proof: merge(partial(A),
    * partial(B)) ≡ aggregate(A ∪ B), exactly, because every merged
    * measure is a DECIMAL sum or a count (order- and
    * grouping-insensitive), and avg = exact-sum ÷ exact-count is one
    * IEEE division in both paths.
    *
    * 100 TB: refresh cost is O(|delta| + |groups|) — the base partials
    * are a tiny stored table (|groups| rows), the delta scan prunes to
    * the new partition(s), and the merge is a hash-agg over |groups|.
    * Re-scanning a 100 TB base per refresh is the anti-pattern this
    * operator exists to avoid. */
  def incrementalMv(spark: SparkSession, dir: String,
                    split: String = "1997-01-01"): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val cut = lit(split).cast("timestamp")
    val base  = mvPartial(li.filter(col("l_shipdate") <  cut))
    val delta = mvPartial(li.filter(col("l_shipdate") >= cut))
    base.unionByName(delta)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("s_qty")).as("s_qty"), sum(col("s_rev")).as("s_rev"),
        sum(col("n")).as("n_rows"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        col("s_qty").cast("double").as("sum_qty"),
        col("s_rev").cast("double").as("sum_disc_price"),
        (col("s_qty").cast("double") / col("n_rows")).as("avg_qty"),
        col("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")
  }
}
