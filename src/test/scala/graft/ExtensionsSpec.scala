package graft

/** The SparkSessionExtensions registration path: functions resolve in a
  * FRESH session state (newSession drops temp functions), proving they
  * come from the injected extension, not a runtime register call. */
class ExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions injects graft functions into a fresh session state") {
    val fresh = spark.newSession()
    val row = fresh.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       graft_simhash64('spark table row').bits AS sh,
        |       graft_text_stats('the cat').n_tokens AS nt""".stripMargin)
      .collect().head
    assert(row.getDouble(0) === 11.0)
    assert(row.getString(1).length === 64)
    assert(row.getLong(2) === 2L)
  }

  test("extensions inject the GroupTopK rewrite into a fresh session state") {
    val fresh = spark.newSession()
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("g").orderBy(col("v").desc)
    import fresh.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "v")
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 1)
    assert(df.queryExecution.optimizedPlan.collect {
      case g: plans.GroupTopKPlan => g
    }.nonEmpty, "rule must come from the extension, not a runtime install")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("a", 2L), ("b", 3L)))
  }
}
