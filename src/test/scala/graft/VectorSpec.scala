package graft

import org.apache.spark.sql.functions._
import graft.vector.VectorOps

/** Similarity-search behavior on the real sf0.001 embeddings. */
class VectorSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("cosine of a vector with itself is 1 within one ulp") {
    val df = Seq((Seq(0.3, -1.2, 2.5), Seq(0.3, -1.2, 2.5))).toDF("va", "vb")
    val c = df.select(VectorOps.cosine("va", "vb")).collect().head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-15)
  }

  test("brute-force top-k is descending with deterministic tie-break") {
    val rows = VectorOps.cosineTopK(spark, dir).collect()
    assert(rows.length === 10)
    val cs = rows.map(_.getDouble(1))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    assert(cs.forall(c => c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12))
  }

  test("LSH and IVF ANN overlap the exact top-k and never exceed its best score") {
    val exact = VectorOps.cosineTopK(spark, dir).collect()
    val exactIds = exact.map(_.getLong(0)).toSet
    val bestCos = exact.head.getDouble(1)
    for ((name, approx) <- Seq(
        "lsh" -> VectorOps.annLshTopK(spark, dir).collect(),
        "ivf" -> VectorOps.annIvfTopK(spark, dir).collect(),
        "ivf-ml" -> VectorOps.annIvfTopKMl(spark, dir).collect())) {
      assert(approx.nonEmpty, name)
      assert(approx.forall(_.getDouble(1) <= bestCos + 1e-12), name)
      val overlap = approx.map(_.getLong(0)).count(exactIds)
      info(s"$name recall@10 = ${overlap}/10")
      assert(overlap >= 1, name) // random corpus: structural floor, reported above
    }
  }
}
