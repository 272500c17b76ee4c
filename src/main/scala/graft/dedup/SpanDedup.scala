package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact duplicated-SPAN detection and removal at n-gram granularity —
  * the "exact substring dedup" layer of a training-data pipeline (Lee et
  * al. 2021, "Deduplicating Training Data Makes Language Models Better"),
  * re-expressed for Spark. The suffix-array formulation of the paper is a
  * single-machine algorithm; the distributed shape used here is the
  * standard n-gram-postings approximation: any duplicated token run of
  * length ≥ [[GramLen]] necessarily contains a duplicated [[GramLen]]-gram,
  * so marking every gram whose corpus-wide occurrence count is ≥ 2 finds
  * every such run (it can only over-mark, never miss — the two flanks of a
  * long shared run are covered gram by gram).
  *
  * Relationship to the neighbouring layers: q22/q23 hash WHOLE documents
  * (exact doc dedup), q25 minhash approximates whole-doc overlap, q155/
  * q156 winnow SAMPLED fingerprints for partial-overlap detection — this
  * layer is the exact, position-resolved one: it says which TOKENS of
  * which documents are duplicated text, and can rewrite the corpus.
  *
  * Scale shape (the 100 TB story):
  *  - postings are one narrow projection per document (tokens → per-
  *    position gram hashes), memoized so every consumer shares one
  *    materialization — the q156 lesson: a re-derived postings lineage
  *    re-evaluates the per-row hash chain once per consuming subtree;
  *  - duplicate grams come from ONE hash-partitioned groupBy on the gram
  *    hash (map-side partial counts; a boilerplate gram occurring 10^6
  *    times still aggregates to one row per partition before the
  *    shuffle), and flow back onto postings as a semi-join on the same
  *    key — AQE picks broadcast/shuffle and handles hot-gram skew;
  *  - everything after is per-document: windows partitioned by doc_id
  *    (span merging) and in-row higher-order filters (token removal) —
  *    embarrassingly parallel, bounded by document length.
  */
object SpanDedup {

  /** Gram length: a duplicated run of ≥ 8 tokens is detected exactly.
    * The paper uses 50 BPE tokens on real corpora; 8 fits the synthetic
    * 10–99-token documents while exercising the identical machinery. */
  val GramLen = 8

  /** (doc_id, pos, h) postings: pos is the 0-based token offset, h the
    * md5 of the space-joined [[GramLen]] tokens starting there. Docs
    * shorter than [[GramLen]] tokens contribute no postings. Memoized on
    * the documents fingerprint so q201/q202 (and both sides of any
    * downstream self-join) share one cached copy, and a same-JVM
    * testdata regeneration invalidates it. */
  private[graft] def gramPostings(spark: SparkSession, dir: String): DataFrame =
    Tables.memoCache(spark,
      s"span-postings/$GramLen/${Tables.pathFingerprint(spark, s"$dir/documents.parquet")}") {
      gramPostingsOf(
        Tables.documents(spark, dir)
          .repartition(spark.sparkContext.defaultParallelism))
    }

  private[graft] def gramPostingsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        expr(graft.text.TextOps.TokensExpr).as("toks"))
      .select(col("doc_id"),
        explode(expr(
          s"""CASE WHEN size(toks) >= $GramLen
             |THEN transform(sequence(0, size(toks) - $GramLen),
             |       i -> struct(i AS pos,
             |                   md5(concat_ws(' ', slice(toks, i + 1, $GramLen))) AS h))
             |ELSE array() END""".stripMargin)).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.h").as("h"))

  /** q201 — per-document duplicated-span audit: how much of each document
    * is text that occurs elsewhere in the corpus (or again in the same
    * document). Spans are maximal contiguous covered token runs: marked
    * intervals are [pos, pos+L-1], all the same length, so after sorting
    * by pos a new span starts exactly when `pos - lag(pos) > L` (the
    * previous interval ends at lag+L-1; contiguous coverage extends
    * through lag+L). One row per document, zero-filled for clean docs. */
  def dupSpans(spark: SparkSession, dir: String): DataFrame =
    // repartitioned like the postings: the docStats tokenize projection
    // must not run as one task over the single-row-group parquet
    dupSpansOf(Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism),
      gramPostings(spark, dir))

  private[graft] def dupSpansOf(docs: DataFrame, postings: DataFrame): DataFrame = {
    val docStats = docs
      .select(col("doc_id"),
        expr(s"size(${graft.text.TextOps.TokensExpr})").cast("long").as("n_tokens"))
      .withColumn("n_grams",
        greatest(col("n_tokens") - lit(GramLen - 1), lit(0L)))
    val dup = postings.groupBy("h").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
    val marked = postings.join(dup.select("h"), Seq("h"), "left_semi")
    docStats.join(spanStats(marked), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        expr("CAST(FLOOR(1000000.0 * coalesce(dup_tokens, 0L) / n_tokens + 0.5) AS BIGINT)")
          .as("dup_micro"))
      .orderBy("doc_id")
  }

  /** Per-doc maximal-contiguous-span aggregation over MARKED postings
    * (equal-length intervals sorted by start merge while successive
    * starts differ by ≤ L) — shared by the corpus audit (q201) and the
    * incremental variant (q220). */
  private[graft] def spanStats(marked: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy(col("pos").asc)
    marked
      .withColumn("new_span",
        when(col("pos") - lag(col("pos"), 1).over(w) > GramLen, 1L)
          .otherwise(when(lag(col("pos"), 1).over(w).isNull, 1L).otherwise(0L)))
      .withColumn("span_id",
        sum(col("new_span")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "span_id")
      .agg(count(lit(1)).as("n_marked"),
        (max(col("pos")) + lit(GramLen.toLong) - min(col("pos"))).as("span_len"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("n_marked")).as("n_dup_grams"),
        sum(col("span_len")).as("dup_tokens"))
  }

  /** q220 — incremental span dedup: audit a FRESH batch (doc_id ≥
    * `splitAt`) against the ALREADY-INGESTED corpus (doc_id < splitAt) —
    * the q38/q154 incremental-ingest pattern at span granularity. A
    * fresh doc's gram is marked iff it occurs ANYWHERE in the corpus;
    * within-batch repeats are deliberately NOT marked (they are the
    * NEXT batch's corpus problem — this operator answers "how much of
    * the new crawl is already-ingested text"). Fresh docs whose
    * duplicated coverage reaches half their tokens are flagged
    * rejected — the admission rule a crawler's dedup gate applies.
    *
    * Scale: the corpus side collapses to its DISTINCT gram set (one
    * partial-agg pass, or an incrementally-maintained gram index in
    * production — the q154 bloom layering applies verbatim in front of
    * this semi-join); the batch side is the same semi-join + per-doc
    * windows as q201. */
  def incrementalSpanDedup(spark: SparkSession, dir: String,
                           splitAt: Long = 250L): DataFrame = {
    val posts = gramPostings(spark, dir)
    val corpusGrams = posts.filter(col("doc_id") < splitAt)
      .select("h").distinct()
    val freshPosts = posts.filter(col("doc_id") >= splitAt)
    val freshStats = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .filter(col("doc_id") >= splitAt)
      .select(col("doc_id"),
        expr(s"size(${graft.text.TextOps.TokensExpr})").cast("long").as("n_tokens"))
      .withColumn("n_grams",
        greatest(col("n_tokens") - lit(GramLen - 1), lit(0L)))
    val marked = freshPosts.join(corpusGrams, Seq("h"), "left_semi")
    freshStats.join(spanStats(marked), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        expr("CAST(FLOOR(1000000.0 * coalesce(dup_tokens, 0L) / n_tokens + 0.5) AS BIGINT)")
          .as("dup_micro"))
      .withColumn("admitted",
        (col("dup_micro") < 500000L).cast("long"))
      .orderBy("doc_id")
  }

  /** q228 — near-dup pair EXPLANATION: for every q204 pair (exact
    * Jaccard ≥ 0.7), the evidence a human reviewer wants — how many
    * 8-grams the two documents share, and the length of their longest
    * shared token run. Matched gram positions (pa, pb) lie on DIAGONALS
    * (pa − pb constant); consecutive positions on one diagonal extend a
    * shared run one token at a time, so the longest run is
    * max(island length) + L − 1 over per-(pair, diagonal) islands.
    * A pair can legitimately share NO 8-gram (high 3-gram Jaccard from
    * scattered overlap) — reported with zeros, not dropped.
    *
    * Scale: pairs join onto the memoized postings twice (each join
    * keyed by a doc id — AQE-owned), the gram-hash equijoin bounds the
    * position fan-out to true matches, and the island windows partition
    * by (pair, diagonal). */
  def sharedRunExplain(spark: SparkSession, dir: String): DataFrame = {
    val pairs = PrefixJoin.ppjoinPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val posts = gramPostings(spark, dir)
    val matched = pairs
      .join(posts.select(col("doc_id").as("doc_a"), col("pos").as("pa"), col("h")), "doc_a")
      .join(posts.select(col("doc_id").as("doc_b"), col("pos").as("pb"), col("h")), Seq("doc_b", "h"))
      .select(col("doc_a"), col("doc_b"), col("pa"), col("pb"),
        (col("pa") - col("pb")).as("diag"))
    val w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy(col("pa").asc)
    val runs = matched
      .withColumn("nr",
        when(col("pa") - lag(col("pa"), 1).over(w) > 1, 1L)
          .otherwise(when(lag(col("pa"), 1).over(w).isNull, 1L).otherwise(0L)))
      .withColumn("run_id",
        sum(col("nr")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_a", "doc_b", "diag", "run_id")
      .agg(count(lit(1)).as("run_grams"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(col("run_grams")).as("n_matched_grams"),
        countDistinct(col("diag")).as("n_diags"),
        (max(col("run_grams")) + lit(GramLen.toLong) - 1L).as("longest_run_tokens"))
    pairs.join(runs, Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"),
        coalesce(col("n_matched_grams"), lit(0L)).as("n_matched_grams"),
        coalesce(col("n_diags"), lit(0L)).as("n_diags"),
        coalesce(col("longest_run_tokens"), lit(0L)).as("longest_run_tokens"))
      .orderBy("doc_a", "doc_b")
  }

  /** q202 — keep-first substring-dedup rewrite: for every duplicated
    * gram, its globally FIRST occurrence (min (doc_id, pos)) stays; every
    * other occurrence marks its [pos, pos+L-1] token interval for
    * removal. A document's cleaned text is its kept tokens in order.
    * Interval-union coverage needs no merge step — a token is removed
    * iff ANY removal interval of its document covers it, tested in-row
    * against the per-document removal-start array (array order is
    * irrelevant to `exists`, so the unsorted collect_list is
    * deterministic here). Returns one row per document with exact
    * token counts and the md5 of the cleaned text — the fingerprint
    * pins the entire rewrite byte-for-byte against the oracle. */
  def substringDedup(spark: SparkSession, dir: String): DataFrame =
    substringDedupOf(Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism),
      gramPostings(spark, dir))

  private[graft] def substringDedupOf(docs: DataFrame, postings: DataFrame): DataFrame = {
    // min-struct argmin: the lexicographically first (doc_id, pos) per
    // duplicated gram — same one-shuffle shape as q168's argmin.
    val firstOcc = postings
      .groupBy("h")
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("first"))
      .filter(col("cnt") >= 2)
      .select(col("h"), col("first.doc_id").as("f_doc"), col("first.pos").as("f_pos"))
    val removals = postings.join(firstOcc, "h")
      .filter(!(col("doc_id") === col("f_doc") && col("pos") === col("f_pos")))
      .groupBy("doc_id")
      .agg(collect_list(col("pos")).as("rm_starts"))
    docs
      .select(col("doc_id"), expr(graft.text.TextOps.TokensExpr).as("toks"))
      .join(removals, Seq("doc_id"), "left")
      .withColumn("rm_starts", coalesce(col("rm_starts"), expr("array()")))
      .withColumn("kept", expr(
        s"""filter(transform(toks, (t, i) -> struct(t AS t, i AS i)),
           |       x -> NOT exists(rm_starts,
           |                       s -> x.i >= s AND x.i <= s + ${GramLen - 1}))""".stripMargin))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"),
        size(col("kept")).cast("long").as("n_kept"),
        md5(expr("concat_ws(' ', transform(kept, x -> x.t))")).as("cleaned_fp"))
      .orderBy("doc_id")
  }
}
