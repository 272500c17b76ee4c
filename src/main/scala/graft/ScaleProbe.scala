package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling probe: times representative operators on 1× and N×
  * unions of sf0.1 (keys shifted per copy so join/dedup semantics stay
  * clean — copies are new entities, not duplicates). Near-linear wall
  * time ratios back SCALE.md's claims that the plans are shuffle-minimal
  * and partial-aggregating. Usage: runMain graft.ScaleProbe [N] */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 10
    val dir = "/root/testdata/sf0.1"
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def amplified(df: DataFrame, keyCols: Seq[String], copies: Int): DataFrame =
      (0 until copies).map { i =>
        keyCols.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(i.toLong * 1000000000L)))
      }.reduce(_ unionByName _)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[scale-probe] $label: $rows%,d rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    for (copies <- Seq(1, n)) {
      val orders = amplified(Tables.orders(spark, dir), Seq("o_orderkey", "o_custkey"), copies)
      val lineitem = amplified(Tables.lineitem(spark, dir), Seq("l_orderkey"), copies)
      val events = amplified(Tables.events(spark, dir), Seq("user_id", "event_id"), copies)
      val docs = amplified(Tables.documents(spark, dir), Seq("doc_id"), copies)

      time(s"${copies}x fact-fact join + agg") {
        lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
          .groupBy("o_orderstatus")
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("rev"))
          .count()
      }
      time(s"${copies}x dau dedup + count") {
        events.withColumn("log_date", date_format(col("ts"), "yyyy-MM-dd"))
          .groupBy("user_id", "log_date").agg(min(col("ts")))
          .groupBy("log_date").count().count()
      }
      time(s"${copies}x minhash band join") {
        val withArr = docs.select(col("doc_id"), expr("graft_shingle_hashes(text, 3)").as("arr"))
        val banded = withArr
          .withColumn("sig", expr("graft_minhash_sig(arr, 64)"))
          .select(col("doc_id"), explode(expr(
            """transform(sequence(0, 15), b -> struct(b as band_idx,
              |  concat_ws('_', sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3]) as band_key))""".stripMargin)).as("band"))
          .select(col("doc_id"), col("band.band_idx"), col("band.band_key"))
        banded.as("l").join(banded.as("r"),
            col("l.band_idx") === col("r.band_idx") &&
            col("l.band_key") === col("r.band_key") &&
            col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id"), col("r.doc_id")).distinct().count()
      }
      time(s"${copies}x text quality projection") {
        docs.select(col("doc_id"), expr("graft_text_stats(text)").as("st"))
          .filter(col("st.n_tokens") >= 10).count()
      }
      time(s"${copies}x as-of union+window") {
        graft.ops.AsOf.asofCore(events).count()
      }
      time(s"${copies}x bucketed range join") {
        graft.ops.AsOf.attributionCore(events, 600L).count()
      }
      time(s"${copies}x tf-idf inverted index") {
        val tf = docs
          .select(col("doc_id"), explode(expr("graft_token_counts(text)")).as("tc"))
          .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        tf.join(broadcast(df), "term").count()
      }
      time(s"${copies}x custom grouped top-k (bounded heaps)") {
        graft.plans.GroupTopK.install(spark)
        graft.plans.GroupTopK(
          lineitem.select(col("l_returnflag").as("g"), col("l_orderkey").as("id"),
            col("l_extendedprice").as("v")),
          Seq("g"), Seq(col("v").desc, col("id").asc), 10).count()
      }
      time(s"${copies}x window-function top-k (Spark group-limit plan)") {
        // UNINSTALL the rewrite rule for the baseline — it must run
        // Spark's own best plan (Window + InferWindowGroupLimit), not the
        // operator it is being compared against. (A cast on the rank
        // doesn't protect it: UnwrapCastInBinaryComparison removes the
        // cast before user rules run.)
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations
            .filterNot(_ == graft.plans.RankLimitToGroupTopK)
        try {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("g").orderBy(col("v").desc, col("id").asc)
          lineitem.select(col("l_returnflag").as("g"), col("l_orderkey").as("id"),
              col("l_extendedprice").as("v"))
            .withColumn("rk", row_number().over(w))
            .filter(col("rk") <= 10).count()
        } finally graft.plans.GroupTopK.install(spark)
      }
      // the three probes below call the OPERATORS' own cores on amplified
      // inputs (like asofCore/attributionCore above) — an inline copy of
      // the operator body drifts silently and stops measuring the real
      // plan shape
      time(s"${copies}x knn join (broadcast queries + bounded heaps)") {
        // queries stay FIXED (10) while the corpus amplifies — the
        // realistic shape: per-query state is k rows per partition
        // regardless of corpus size
        val vecsAmp = amplified(Tables.embeddings(spark, dir), Seq("vec_id"), copies)
          .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
        graft.vector.VectorOps.knnJoinCore(vecsAmp, nQueries = 10L, k = 3).count()
      }
      time(s"${copies}x dim profile (posexplode + partial agg)") {
        graft.vector.VectorOps.dimProfileCore(
          amplified(Tables.embeddings(spark, dir), Seq("vec_id"), copies)).count()
      }
      time(s"${copies}x corpus n-gram counts (one-pass expr + agg)") {
        graft.text.TextOps.topBigramsCore(docs).count()
      }
      time(s"${copies}x pareto prefix sum (range-repartition + offsets)") {
        graft.ops.Olap.concentrationCore(orders).count()
      }
      time(s"${copies}x rolling 7-day uv (dedup-then-explode)") {
        graft.ops.Dau.rollingUvCore(events).count()
      }
      time(s"${copies}x edit-distance pairs (blocked, broadcast probe)") {
        // amplification multiplies same-lang block sizes, so candidate
        // pairs grow ~copies² — the probe shows the blocking bound, not
        // linear scaling; the band filter keeps the constant small
        graft.dedup.DedupOps.editDistanceCore(docs).count()
      }
      time(s"${copies}x assoc rules (distinct self-join + broadcast marginals)") {
        graft.ops.Publisher.assocRulesCore(events).count()
      }
      time(s"${copies}x cohort retention (map-side user-week dedup)") {
        graft.ops.Dau.cohortRetentionCore(events).count()
      }
      time(s"${copies}x event transitions (per-user lag windows)") {
        graft.ops.Publisher.transitionsCore(events).count()
      }
      time(s"${copies}x twap (lead window + exact integer accumulator)") {
        graft.ops.Olap.twapCore(events).count()
      }
      time(s"${copies}x inverted index (per-doc distinct + capped postings)") {
        graft.text.TextOps.invertedIndexCore(docs).count()
      }
      time(s"${copies}x label centroids (posexplode + partial agg)") {
        graft.vector.VectorOps.labelCentroidsCore(
          amplified(Tables.embeddings(spark, dir), Seq("vec_id"), copies)).count()
      }
      time(s"${copies}x sequence packing (per-source window)") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        docs.select(col("doc_id"), col("source"),
            expr("graft_text_stats(text).n_tokens").as("n_tokens"))
          .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
          .filter(col("start_tok") >= 0L).count()
      }
    }
    spark.stop()
  }
}
