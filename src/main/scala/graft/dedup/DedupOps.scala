package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextOps

/** Deduplication suite for the large-scale training-data pipeline:
  * exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design notes (the 100 TB story):
  *  - exact dedup is one hash aggregate on md5(text) — partial-aggregates
  *    map-side, shuffles only (hash, min_id, count) triples;
  *  - the exact-Jaccard pair join is quadratic in shingle collisions and
  *    exists as the small-scale oracle / verifier; the scale path is
  *    MinHash+LSH ([[minhashLshPairs]]): signatures are one narrow
  *    projection per doc, the only shuffle is the band-bucket join whose
  *    fan-out is bounded by bucket sizes, and exact Jaccard is computed
  *    only for LSH candidates;
  *  - SimHash is a single projection per document (no shuffle at all);
  *    near-dup search on it is a Hamming band join (future work).
  */
object DedupOps {

  /** Exact dedup: one representative (min doc_id) per distinct content
    * hash, with the copy count. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .orderBy("doc_id")

  /** doc_id → distinct 3-gram word shingles (exploded). */
  private def shingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("tokens", expr(TextOps.TokensExpr))
      .select(col("doc_id"),
        expr("""CASE WHEN size(tokens) >= 3
                THEN transform(sequence(0, size(tokens) - 3),
                               i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))
                ELSE array() END""").as("shingle_arr"))
      .select(col("doc_id"), explode(col("shingle_arr")).as("s"))
      .distinct()

  /** Exact n-gram Jaccard near-dup pairs: explode shingles, self-join on
    * shingle, |A∩B| / |A∪B| ≥ threshold. Quadratic in shingle collisions —
    * this is the ground-truth/oracle path; see [[minhashLshPairs]] for the
    * plan that scales. */
  def ngramJaccardPairs(spark: SparkSession, dir: String,
                        threshold: Double = 0.7): DataFrame = {
    val sh = shingles(spark, dir).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.as("a"); val b = sh.as("b")
    val inter = a.join(b, col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash parameters: 64 hashes banded 32×2 — P[candidate] for
    * J = 0.9 pairs is 1 − (1 − 0.81)^32 ≈ 1 − 6e−24; for the J ≥ 0.7
    * registered threshold, 1 − (1 − 0.49)^32 ≈ 1 − 4e−10. */
  private val NumHashes = 64
  private val BandRows = 2
  private val MersennePrime = 2147483647L // 2^31 − 1

  /** MinHash + LSH near-dup pairs, exact-Jaccard-verified: LSH proposes
    * candidate pairs (band-bucket join), then exact Jaccard is computed
    * for candidates only. With the banding above the output equals
    * [[ngramJaccardPairs]] with overwhelming probability — the driver
    * oracle holds both to the same SQL. */
  def minhashLshPairs(spark: SparkSession, dir: String,
                      threshold: Double = 0.7): DataFrame = {
    val sh = shingles(spark, dir)
    // per-doc distinct shingle-hash set; xxhash64 → [0, p) via pmod
    val docHashes = sh
      .select(col("doc_id"), col("s"), pmod(xxhash64(col("s")), lit(MersennePrime)).as("h"))
      .groupBy("doc_id")
      .agg(collect_set(col("h")).as("hs"), collect_set(col("s")).as("shingle_set"))
    // 64 minhash signatures via the universal family (a_i·h + b_i) mod p,
    // then 32 band keys of 2 rows each — all one projection, no shuffle
    val sigExpr =
      s"""transform(sequence(0, ${NumHashes - 1}),
         |  i -> array_min(transform(hs,
         |    h -> pmod((1000000007L + 2L * i) * h + 998244353L * (i + 1), ${MersennePrime}L))))""".stripMargin
    val banded = docHashes
      .withColumn("sig", expr(sigExpr))
      .withColumn("band", explode(expr(
        s"""transform(sequence(0, ${NumHashes / BandRows - 1}),
           |  b -> struct(b as band_idx,
           |              concat_ws('_', sig[2*b], sig[2*b+1]) as band_key))""".stripMargin)))
      .select(col("doc_id"), col("shingle_set"),
        col("band.band_idx"), col("band.band_key"))
    // candidate pairs: same (band_idx, band_key)
    val l = banded.as("l"); val r = banded.as("r")
    val candidates = l.join(r,
        col("l.band_idx") === col("r.band_idx") &&
        col("l.band_key") === col("r.band_key") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        col("l.shingle_set").as("sa"), col("r.shingle_set").as("sb"))
      .dropDuplicates("doc_a", "doc_b")
    // exact verification on candidates only
    candidates
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sa"), col("sb"))) /
          size(array_union(col("sa"), col("sb")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash: 64-bit fingerprint per document from per-token md5 bits,
    * token-frequency weighted, emitted as a 64-char bit string (bit 0
    * first). One projection per doc — no shuffle. */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("tokens", expr(TextOps.TokensExpr))
      .withColumn("md5s", expr("transform(tokens, t -> md5(t))"))
      .select(
        col("doc_id"),
        expr("""concat_ws('', transform(sequence(0, 63), i ->
                  CASE WHEN aggregate(md5s, 0L, (acc, m) ->
                         acc + 2L * ((cast(conv(substring(m, i div 4 + 1, 1), 16, 10) as int) >> (3 - i % 4)) & 1) - 1L
                       ) > 0L THEN '1' ELSE '0' END))""").as("simhash"))
      .orderBy("doc_id")
}
