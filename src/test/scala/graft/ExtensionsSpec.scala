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
}
