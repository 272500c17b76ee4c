package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point — the deployment-grade registration
  * path for the engine's custom expressions (the runtime
  * [[GraftFunctions.register]] covers ad-hoc sessions):
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * makes `graft_dot`, `graft_minhash_sig`, `graft_shingle_hashes`,
  * `graft_text_stats`, `graft_simhash64` available to SQL/expr in every
  * session of the application, including ones the engine didn't build. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - sequential-left-fold dot product of two double arrays"),
      (exprs: Seq[Expression]) => ArrayDotProduct(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "graft_minhash_sig(hashes, n) - n minhash signatures of a long-array"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs.head,
        exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", "graft_shingle_hashes(text, n) - distinct n-gram word shingle hashes"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs.head,
        exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("graft_text_stats"),
      info("graft_text_stats", "graft_text_stats(text) - struct(n_tokens, stop_ct, alpha_chars)"),
      (exprs: Seq[Expression]) => TextStats(exprs.head, graft.text.TextOps.Stopwords)))
    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(text) - struct(bits: 64-char string, word: packed long)"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_token_counts"),
      info("graft_token_counts", "graft_token_counts(text) - array<struct(term, tf)> of per-term frequencies"),
      (exprs: Seq[Expression]) => TokenCounts(exprs.head)))
  }
}
