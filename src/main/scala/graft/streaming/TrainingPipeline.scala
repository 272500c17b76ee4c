package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** The LLM training-data ingestion pipeline as ONE streaming transform:
  * quality gate → exact content dedup → token-window chunking. Batch and
  * stream share the identical DataFrame code (the Structured Streaming
  * contract), so everything the batch oracles verified (q20 gate, q23
  * dedup keys, q40 chunk boundaries) holds for the stream.
  *
  * Scale design:
  *  - gate + fingerprint are a single narrow projection (one-pass
  *    `graft_text_stats` expression, md5 of the normalized text);
  *  - the dedup is streaming `dropDuplicates` on the content fingerprint
  *    — Spark keeps one state entry per DISTINCT fingerprint (bytes per
  *    doc, not the doc), backed by the RocksDB state store at real scale
  *    (ScaleLeversSpec pins the provider wiring); a crawl re-ingesting
  *    the same page emits it exactly once across micro-batches;
  *  - chunking is a stateless explode; downstream sinks append
  *    partitioned by source/date ([[Sinks.appendDailyPartitioned]]).
  */
object TrainingPipeline {

  /** documents(doc_id, source, lang, text) → deduped chunks
    * (doc_id, source, chunk_idx, chunk_text, chunk_tokens). */
  def corpusIngest(docs: DataFrame,
                   chunkLen: Int = 100, stride: Int = 50,
                   minTokens: Int = 10,
                   stopRatioMin: Double = 0.02,
                   stopRatioMax: Double = 0.6): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val gated = docs
      .withColumn("st", expr("graft_text_stats(text)"))
      .filter(col("st.n_tokens") >= minTokens &&
        (col("st.stop_ct") / col("st.n_tokens")).between(stopRatioMin, stopRatioMax))
      .withColumn("fp", md5(TextOps.normText(col("text"))))
      .dropDuplicates("fp")
    TextOps.chunkCore(
      gated.withColumn("tokens", expr(TextOps.TokensExpr)),
      chunkLen, stride, carry = Seq("source"))
  }
}
