package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Percentiles

/** Corpus-curation funnel operators — the acceptance/rejection reports a
  * training-data pipeline produces after the per-doc signals (TextOps)
  * are computed: which rule rejected how much of each source, and the
  * per-language length bands that adaptive filtering keeps.
  *
  * The reference has no corpus layer (its documents are order/event
  * JSON); these extend the builder-prompt LLM-pipeline surface the same
  * way q19–q25 did, reusing the determinism machinery already proven:
  * integer cross-multiplied ratio thresholds (no float compares at rule
  * boundaries) and the mirrored-lerp histogram percentiles of
  * [[graft.ops.Percentiles]] (q122/q123).
  */
object Curation {

  /** Quality filter cascade: classify every document by its FIRST
    * failing rule — the funnel report (per source × verdict: doc count
    * and token mass) a corpus builder reads to see where data is lost.
    * Rule priority mirrors production cascades: hard length gate first,
    * then the cheap stopword signal, then lexical diversity.
    *
    * Determinism: the diversity threshold is evaluated as
    * `n_distinct·100 < n_tokens·35` — integer cross-multiplication, so
    * no engine ever compares a rounded ratio at the rule boundary.
    * Scale: one narrow map per doc (two one-pass expressions), then a
    * partial-agg shuffle keyed by (source, verdict) — a bounded domain.
    */
  def filterCascade(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    filterCascadeCore(
      Tables.documents(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism))
  }

  /** [[filterCascade]] over any (source, text) frame (spec hook). */
  private[graft] def filterCascadeCore(docs: DataFrame): DataFrame =
    docs
      // struct projected ONCE, fields extracted in a second select: the
      // multi-referenced alias blocks CollapseProject from inlining the
      // interpreted expression into every field access (q20's idiom)
      .select(col("source"), expr("graft_text_stats(text)").as("st"),
        expr("cast(size(graft_token_counts(text)) as bigint)").as("n_distinct"))
      .select(col("source"),
        col("st.n_tokens").as("n_tokens"),
        col("st.stop_ct").as("stop_ct"),
        col("n_distinct"))
      .withColumn("verdict",
        when(col("n_tokens") < 20, "too_short")
          .when(col("stop_ct") === 0, "no_stopwords")
          .when(col("n_distinct") * 100 < col("n_tokens") * 35, "low_diversity")
          .otherwise("kept"))
      .groupBy("source", "verdict")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("token_sum"))
      .orderBy("source", "verdict")

  /** Per-language adaptive length filter: keep documents whose token
    * count sits inside the language's OWN [p05, p95] band — the
    * length-outlier filter that a fixed global threshold gets wrong for
    * verbose vs terse languages. Percentiles come from
    * [[Percentiles.fromHistogram]] — the shuffle carries one row per
    * distinct (lang, token-count), never a fact-scale buffer — and the
    * |langs|-row band table broadcasts back onto the doc stats for one
    * more map-side partial aggregate. Band values are the exact lerp
    * percentiles, mirrored op-for-op in the oracle SQL (q122's idiom).
    */
  def lengthBandFilter(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    lengthBandCore(
      Tables.documents(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("lang"), expr("graft_text_stats(text).n_tokens").as("n_tokens")))
  }

  /** [[lengthBandFilter]] over any (lang, n_tokens) frame (spec hook +
    * ScaleProbe). */
  private[graft] def lengthBandCore(toks: DataFrame): DataFrame = {
    val hist = toks
      .groupBy(col("lang"), col("n_tokens").cast("double").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val bands = Percentiles.fromHistogram(hist, "lang",
        Seq("p05_tokens" -> 0.05, "p95_tokens" -> 0.95))
      .select(col("lang"), col("p05_tokens"), col("p95_tokens"))
    val keep = col("n_tokens") >= col("p05_tokens") &&
      col("n_tokens") <= col("p95_tokens")
    toks.join(broadcast(bands), "lang")
      .groupBy("lang")
      .agg(
        min(col("p05_tokens")).as("p05_tokens"),
        min(col("p95_tokens")).as("p95_tokens"),
        sum(when(keep, lit(1L)).otherwise(lit(0L))).as("n_kept"),
        sum(when(keep, lit(0L)).otherwise(lit(1L))).as("n_dropped"),
        sum(when(keep, col("n_tokens")).otherwise(lit(0L))).as("tokens_kept"))
      .orderBy("lang")
  }
}
