package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the big-join path (SCALE.md: "skewed
  * keys → salting or AQE skew-join"). AQE's runtime skew splitting is
  * the first line of defense; explicit salting is the deterministic
  * fallback when a handful of keys dominate (e.g., a viral item id in
  * the order-detail join) or when AQE is unavailable mid-pipeline. */
object SkewJoin {

  /** Inner equi-join with the left (large, skewed) side salted into
    * `saltFactor` sub-keys and the right side replicated `saltFactor`
    * times — each hot key's rows spread over saltFactor reducers.
    * Semantics are exactly `left.join(right, key)` (inner). */
  def saltedInnerJoin(left: DataFrame, right: DataFrame,
                      key: String, saltFactor: Int): DataFrame = {
    // salt must be DETERMINISTIC under task recomputation (a stage retry
    // re-deriving different salts while reducers keep fetched blocks
    // loses/duplicates rows — the SPARK-23207 class of bug), so it is a
    // pure function of the row's content, never of partition/row position
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val replicated = right
      .withColumn("__salt", explode(expr(s"sequence(0, ${saltFactor - 1})")))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
