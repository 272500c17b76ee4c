package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every operator in the engine takes `(SparkSession, sfDir)` and reads
  * through these helpers so the scan always starts from the raw parquet —
  * Catalyst then gets a full view for column pruning / filter pushdown
  * (verified via `.explain`: `PushedFilters` + minimal `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Session configs every graft session needs. `nanosAsLong` is required
    * because `events.parquet` stores TIMESTAMP(NANOS) which Spark has no
    * native type for; [[events]] converts the long back to a microsecond
    * timestamp (the data is µs-aligned, so this is lossless). */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** Session-scoped cache memoizer: repeated query invocations (Verify,
    * Bench warm-up + timed pass) reuse ONE cached copy per (session,
    * key) instead of stacking a new InMemoryRelation per call.
    *
    * Eviction: entries of STOPPED sessions are swept on every access.
    * (A WeakHashMap cannot do this job: the cached DataFrame value
    * strongly references its SparkSession key, which per WeakHashMap's
    * own javadoc pins the entry forever — review finding. Keying on the
    * session object still prevents a new session ever seeing another
    * session's plans; the sweep bounds growth to sessions stopped since
    * the last call. Multiple live sessions sharing one SparkContext
    * accumulate until their context stops — acceptable for this
    * engine's one-session-per-app mains and suites.) */
  /** Single-evaluation holder: `lazy val` gives per-INSTANCE
    * synchronization, so the winning holder's build runs under its own
    * monitor — losers of the putIfAbsent race never evaluate (no orphaned
    * InMemoryRelation), and a build that runs Spark jobs (the LSH band
    * index derives the embedding dim with a head()) blocks only callers
    * of the SAME key, never the process-global memo lock. */
  private final class LazyDf(build: () => DataFrame) {
    lazy val df: DataFrame = build().cache()
  }
  private val memo =
    new java.util.IdentityHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, LazyDf]]()
  def memoCache(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val perSession = memo.synchronized {
      memo.keySet.removeIf(s => s.sparkContext.isStopped)
      var m = memo.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, LazyDf]
        memo.put(spark, m)
      }
      m
    }
    val holder = perSession.get(key) match {
      case Some(h) => h
      case None =>
        val h = new LazyDf(() => build)
        perSession.putIfAbsent(key, h).getOrElse(h)
    }
    holder.df
  }

  /** Drop every memoized artifact of `spark` and unpersist its cached
    * data. Used by the bench harness between the sf0.001 warm-up and the
    * timed passes: without it the warm-up's cached tables sit in the
    * timed JVM's old gen for the whole run, and with ~100 queries of
    * stacked memo state the resulting GC pressure inflated measured
    * times up to 7× (observed: q69 3.4 s standalone vs 23.7 s mid-bench
    * before this hook). */
  def clearMemo(spark: SparkSession): Unit = {
    memo.synchronized {
      val m = memo.remove(spark)
      if (m != null) m.values.foreach { h =>
        try h.df.unpersist(blocking = false) catch { case _: Throwable => () }
      }
    }
    try spark.catalog.clearCache() catch { case _: Throwable => () }
  }

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** Normalize a nanos-as-long `ts` column back to a µs timestamp; no-op
    * if `ts` is already a timestamp. Integer div only (ns values exceed
    * double's 2^53 exact range, so no floating-point path allowed). */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(table(spark, dir, "events"))
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
