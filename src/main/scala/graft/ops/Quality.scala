package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality / audit operators: referential-integrity checks, column
  * profiling, and contingency (chi-square) surprise analysis — the
  * validation layer a warehouse or training-data pipeline runs before it
  * trusts a load (reference analog: the gmall star schema assumes fact →
  * dim integrity that HBase/Phoenix never enforced; here the checks are
  * first-class queries).
  *
  * Scale design: every check is anti-join- or aggregate-shaped — no
  * collect, no driver-side loops. The profile's multi-count(distinct)
  * plans as ONE Expand + two-phase aggregate (one pass over the fact
  * table regardless of how many columns are profiled); the integrity
  * audit's anti-joins broadcast the dim side when small and each emit a
  * single count row.
  */
object Quality {

  /** q215 — two-proportion experiment readout (A/B z-test): users split
    * into arms by the low bit of user_id (the deterministic hash-split
    * stand-in for an assignment service), conversion = at least one
    * purchase event of value >= 100 (an all-users-convert corpus makes
    * the pooled variance zero; the value bar restores a real rate). Emits per-arm counts, integer-micro conversion
    * rates, the absolute lift, the pooled-variance z statistic, and the
    * |z| > 1.96 significance verdict.
    *
    * Determinism: counts are exact integers; the z computation is pure
    * IEEE arithmetic whose ONLY non-algebraic op is sqrt — which IEEE
    * 754 requires to be CORRECTLY ROUNDED, so unlike ln/exp the double
    * is bit-identical across engines by spec; it is still micro-rounded
    * on output. Scale: one per-user aggregate (purchase flag), one
    * 2-row arm aggregate, one 1-row readout — nothing after the first
    * shuffle exceeds two rows. */
  def abTestReadout(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") >= 100.0, 1L)
        .otherwise(0L)).as("converted"))
      .withColumn("arm", expr("user_id % 2"))
    val arms = perUser.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("c"))
    arms.agg(
        sum(when(col("arm") === 0, col("n"))).as("n_a"),
        sum(when(col("arm") === 0, col("c"))).as("c_a"),
        sum(when(col("arm") === 1, col("n"))).as("n_b"),
        sum(when(col("arm") === 1, col("c"))).as("c_b"))
      .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        expr("CAST(FLOOR(1000000.0 * c_a / n_a + 0.5) AS BIGINT)").as("p_a_micro"),
        expr("CAST(FLOOR(1000000.0 * c_b / n_b + 0.5) AS BIGINT)").as("p_b_micro"),
        expr(
          """CAST(FLOOR(1000000.0 * (CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
            |  / SQRT((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
            |         * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
            |         * (1.0 / n_a + 1.0 / n_b)) + 0.5) AS BIGINT)""".stripMargin
            .replace("\n", "")).as("z_micro"))
      .withColumn("significant",
        (abs(col("z_micro")) > 1960000L).cast("long"))
  }

  /** q223 — two-sample Kolmogorov–Smirnov drift test: does the purchase-
    * value distribution of the month's second half differ from the
    * first's? KS = max |F₁(v) − F₂(v)| over the merged value domain —
    * the standard nonparametric drift monitor for a metric whose shape
    * (not just mean) matters. Everything is integer until the end:
    * values are exact cents, the sup statistic is
    * max |cum₁·n₂ − cum₂·n₁| (cross-multiplied, BIGINT), and the only
    * doubles are the final micro division and the α = 0.05 critical
    * value c·√((n₁+n₂)/(n₁·n₂)) with c = 1.358 — whose √ is IEEE-
    * correctly-rounded and therefore engine-identical.
    *
    * Scale: one partial-agg pass to per-(value, side) counts; the
    * cumulative pass runs over the DISTINCT-CENTS domain (bounded by
    * the price grid, not the row count — the q196 value-domain
    * discipline; band it q122-style if the grid ever grows unbounded). */
  def ksDrift(spark: SparkSession, dir: String,
              splitAt: String = "2024-01-16"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").as("cents"),
        when(col("ts") < lit(splitAt).cast("timestamp"), 1L).otherwise(0L).as("first_half"))
      .groupBy("cents")
      .agg(sum(col("first_half")).as("c1"),
        sum(lit(1L) - col("first_half")).as("c2"))
    val totals = counts.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val w = Window.orderBy(col("cents").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    counts
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("cum2", sum(col("c2")).over(w))
      .crossJoin(broadcast(totals))
      .select(abs(col("cum1") * col("n2") - col("cum2") * col("n1")).as("diff"),
        col("n1"), col("n2"))
      .agg(max(col("diff")).as("sup_num"),
        max(col("n1")).as("n1"), max(col("n2")).as("n2"))
      .select(col("n1"), col("n2"),
        expr("CAST(FLOOR(1000000.0 * sup_num / (n1 * n2) + 0.5) AS BIGINT)").as("ks_micro"),
        expr("""CAST(FLOOR(1000000.0 * 1.358
               | * SQRT(CAST(n1 + n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
               | + 0.5) AS BIGINT)""".stripMargin.replace("\n", "")).as("crit_micro"))
      .withColumn("drift", (col("ks_micro") > col("crit_micro")).cast("long"))
  }

  /** q226 — Population Stability Index: the banded companion of the
    * q223 KS test (KS answers "is there drift", PSI tells WHICH value
    * bands carry it and by how much — the score monitoring dashboards
    * band). Purchase cents band into 10 equal-width bins over the
    * REFERENCE half's range (values outside clamp to the edge bins, the
    * standard convention); per band the contribution is
    * (p − q)·ln(p/q) with Laplace-smoothed shares p = (ref+1)/(nRef+10)
    * — the zero-count guard PSI needs — micro-rounded PER BAND before
    * any consumer sums them (10 integers, order-free).
    *
    * Scale: one pass to per-(band, side) counts (bounded 10-key
    * domain) after a 1-row min/max broadcast of the reference range. */
  def psiDrift(spark: SparkSession, dir: String,
               splitAt: String = "2024-01-16"): DataFrame = {
    val v = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").as("cents"),
        when(col("ts") < lit(splitAt).cast("timestamp"), 1L).otherwise(0L).as("is_ref"))
    val range = v.filter(col("is_ref") === 1L)
      .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
    val banded = v.crossJoin(broadcast(range))
      .withColumn("band",
        greatest(lit(0L), least(lit(9L),
          expr("((cents - lo) * 10) div (hi - lo + 1)"))))
      .groupBy("band")
      .agg(sum(col("is_ref")).as("ref_ct"),
        sum(lit(1L) - col("is_ref")).as("cur_ct"))
    val totals = banded.agg(sum(col("ref_ct")).as("n_ref"),
      sum(col("cur_ct")).as("n_cur"))
    banded.crossJoin(broadcast(totals))
      .select(col("band"), col("ref_ct"), col("cur_ct"),
        expr("""CAST(FLOOR(1000000.0
               | * ((CAST(ref_ct + 1 AS DOUBLE) / (n_ref + 10) - CAST(cur_ct + 1 AS DOUBLE) / (n_cur + 10))
               |    * LN((CAST(ref_ct + 1 AS DOUBLE) / (n_ref + 10)) / (CAST(cur_ct + 1 AS DOUBLE) / (n_cur + 10))))
               | + 0.5) AS BIGINT)""".stripMargin.replace("\n", "")).as("psi_term_micro"))
      .orderBy("band")
  }

  /** q251 — WINDOWED PSI drift: every day's purchase-value distribution
    * scored against the whole-corpus reference by the Population
    * Stability Index over the q226 reference-range bands — the shape a
    * drift MONITOR has (one score + flag per time window, alert at the
    * classic 0.2), where q226 is the one-shot before/after audit. The
    * identical banding + per-band term feeds [[graft.streaming
    * .Pipelines.psiStream]], whose output must match this frame
    * day-for-day on in-order data (StreamingSpec parity).
    *
    * Determinism: band counts are exact integers (missing bands count
    * 0 via the conditional-sum formulation — their Laplace term still
    * contributes); each of the 10 per-band terms is micro-rounded
    * BEFORE the fixed-order integer add ([[psiTermsExpr]], shared
    * verbatim with the oracle).
    *
    * Scale: one narrow band map (after a 1-row range broadcast), ONE
    * partial-agg pass keyed by day producing 11 conditional sums, a
    * 1-row reference broadcast, in-row PSI — no shuffle beyond the
    * day agg. */
  def windowedPsi(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val range = v.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
    val banded = v.crossJoin(broadcast(range))
      .withColumn("band",
        greatest(lit(0L), least(lit(9L),
          expr("((cents - lo) * 10) div (hi - lo + 1)"))))
    def bandSums(prefix: String) = (0 to 9).map(b =>
      sum(when(col("band") === b.toLong, 1L).otherwise(0L)).as(s"$prefix$b"))
    val ref = banded.agg(count(lit(1)).as("n_ref"), bandSums("r"): _*)
    banded.groupBy("day")
      .agg(count(lit(1)).as("n_events"), bandSums("c"): _*)
      .crossJoin(broadcast(ref))
      .select(col("day"), col("n_events"),
        expr(psiTermsExpr).as("psi_micro"))
      .withColumn("drifted",
        when(col("psi_micro") > 200000L, 1L).otherwise(0L))
      .orderBy("day")
  }

  /** The 10-band PSI sum — each band's Laplace-smoothed
    * (p_ref − p_day)·ln(p_ref/p_day) term micro-rounded BEFORE the
    * fixed-order integer add; shared verbatim (column names included:
    * c0..c9/n_events vs r0..r9/n_ref) with the q251 oracle and the
    * streaming face. */
  private[graft] def psiTermsExpr: String =
    (0 to 9).map { b =>
      s"""CAST(FLOOR(1000000.0
         | * ((CAST(r$b + 1 AS DOUBLE) / (n_ref + 10) - CAST(c$b + 1 AS DOUBLE) / (n_events + 10))
         |    * LN((CAST(r$b + 1 AS DOUBLE) / (n_ref + 10)) / (CAST(c$b + 1 AS DOUBLE) / (n_events + 10))))
         | + 0.5) AS BIGINT)""".stripMargin.replace("\n", "")
    }.mkString(" + ")

  /** q227 — per-user behavioral entropy: Shannon entropy of each user's
    * event-type mix, banded into concentrated / balanced / uniform —
    * the "is this account a bot or a browser" behavioral signature
    * (q163's Simpson index measures corpus token diversity; this is
    * the same family over user behavior, with entropy's finer tail
    * sensitivity). Per-term −p·ln(p) is micro-rounded per (user, type)
    * BEFORE the per-user sum (order-free BIGINT aggregation), and the
    * band thresholds compare against ln(5)·10⁶ thirds as integer
    * literals. Scale: one (user, type) partial-agg pass, one bounded
    * per-user sum, one banded rollup. */
  def behaviorEntropy(spark: SparkSession, dir: String): DataFrame = {
    val byType = Tables.events(spark, dir)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("ct"))
    val byUser = byType
      .withColumn("n_ev", sum(col("ct")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
      .select(col("user_id"), col("n_ev"),
        expr("""CAST(FLOOR(1000000.0
               | * (-(CAST(ct AS DOUBLE) / n_ev) * LN(CAST(ct AS DOUBLE) / n_ev))
               | + 0.5) AS BIGINT)""".stripMargin.replace("\n", "")).as("term_micro"))
      .groupBy("user_id")
      .agg(max(col("n_ev")).as("n_events"),
        sum(col("term_micro")).as("entropy_micro"))
    // 0.97·ln(5) and 0.99·ln(5) as integer micros: with 5 event types
    // real populations sit NEAR the ln(5) maximum, so the discriminating
    // cuts live in the top few percent of the range
    byUser
      .withColumn("band",
        when(col("entropy_micro") < 1561155L, "concentrated")
          .when(col("entropy_micro") < 1593345L, "balanced")
          .otherwise("uniform"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_events")).as("n_events"),
        min(col("entropy_micro")).as("min_entropy_micro"),
        max(col("entropy_micro")).as("max_entropy_micro"))
      .orderBy("band")
  }

  /** Referential-integrity audit over the star schema: for every
    * fact → dim edge, how many child rows have no parent (orphans).
    * Each edge is one left-anti join reduced to a count — the dim side
    * broadcasts, so at 100 TB each check is a map-side probe over the
    * fact scan, and the four 1-row results union into the report. */
  def integrityAudit(spark: SparkSession, dir: String): DataFrame =
    integrityAuditCore(
      Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.nation(spark, dir),
      Tables.region(spark, dir))

  private[graft] def integrityAuditCore(lineitem: DataFrame, orders: DataFrame,
                                        customer: DataFrame, nation: DataFrame,
                                        region: DataFrame): DataFrame = {
    def orphans(name: String, child: DataFrame, childKey: String,
                parent: DataFrame, parentKey: String): DataFrame =
      child.join(parent, child(childKey) === parent(parentKey), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check"), col("violations"))
    orphans("customer->nation", customer, "c_nationkey", nation, "n_nationkey")
      .unionByName(orphans("lineitem->orders", lineitem, "l_orderkey", orders, "o_orderkey"))
      .unionByName(orphans("nation->region", nation, "n_regionkey", region, "r_regionkey"))
      .unionByName(orphans("orders->customer", orders, "o_custkey", customer, "c_custkey"))
      .orderBy("check")
  }

  /** Columns profiled by [[columnProfile]] — the full events schema. */
  val ProfiledCols: Seq[String] =
    Seq("event_id", "user_id", "event_type", "value", "props")

  /** Column profile (null + exact distinct counts per column) in ONE scan:
    * Spark plans the N count(distinct)s as a single Expand (each input row
    * fans to N tagged rows) + two-phase hash aggregate — one pass over the
    * table however many columns are profiled, vs N separate scans. The
    * wide 1-row aggregate is then unpivoted with `stack` into the
    * (column, metric) report. At 100 TB swap the exact distincts for
    * approx_count_distinct (same plan, no Expand dedup state) — exact is
    * kept here because it is the oracle-verifiable contract. */
  def columnProfile(spark: SparkSession, dir: String): DataFrame =
    columnProfileCore(Tables.events(spark, dir))

  private[graft] def columnProfileCore(events: DataFrame): DataFrame = {
    val metricCols = ProfiledCols.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(s"nulls_$c"),
        countDistinct(col(c)).as(s"dist_$c"))
    }
    val wide = events.agg(count(lit(1)).as("n_rows"), metricCols: _*)
    val stackArgs = ProfiledCols
      .map(c => s"'$c', nulls_$c, dist_$c").mkString(", ")
    wide.selectExpr("n_rows",
        s"stack(${ProfiledCols.size}, $stackArgs) as (column, n_nulls, n_distinct)")
      .select(col("column"), col("n_nulls"), col("n_distinct"), col("n_rows"))
      .orderBy("column")
  }

  /** Per-cell chi-square contributions for the event_type × hour-of-day
    * contingency table: observed count, expected count under independence
    * (row_total × col_total / N), and the (O−E)²/E surprise term — the
    * cells a data-drift monitor ranks. The TOTAL statistic is a sum of
    * doubles (order-dependent), so the engine emits the per-cell terms —
    * deterministic: E is one integer-ratio division, the contribution is
    * (O−E)·(O−E)/E with a fixed op order, each a single IEEE op.
    *
    * Shape: one hash aggregate over (type, hour), two tiny marginal
    * aggregates of THAT result (never a second fact scan), broadcast back
    * over the ≤|types|·24 cells. */
  def chisqCells(spark: SparkSession, dir: String): DataFrame =
    chisqCellsCore(Tables.events(spark, dir))

  private[graft] def chisqCellsCore(events: DataFrame): DataFrame = {
    val cells = events
      .groupBy(col("event_type"), date_format(col("ts"), "HH").as("hour"))
      .agg(count(lit(1)).as("observed"))
    val rowTot = cells.groupBy("event_type").agg(sum(col("observed")).as("row_total"))
    val colTot = cells.groupBy("hour").agg(sum(col("observed")).as("col_total"))
    val n = cells.agg(sum(col("observed")).as("n_total"))
    val d = col("observed").cast("double") - col("expected")
    cells
      .join(broadcast(rowTot), Seq("event_type"))
      .join(broadcast(colTot), Seq("hour"))
      .crossJoin(broadcast(n))
      .withColumn("expected",
        (col("row_total") * col("col_total")).cast("double") / col("n_total"))
      .select(col("event_type"), col("hour"), col("observed"),
        col("expected"), (d * d / col("expected")).as("contribution"))
      .orderBy("event_type", "hour")
  }

  /** Childless-parent audit — the reverse direction of
    * [[integrityAudit]]: parents with NO child rows (orders that never
    * shipped a line item, customers who never ordered, parts and
    * suppliers never referenced). Orphans break joins; childless parents
    * break revenue/coverage assumptions — both belong in a load gate.
    *
    * Scale design: the probe side here is the BIG table (does any
    * lineitem reference this order?), so unlike the orphan checks the
    * child side cannot broadcast — each check collapses the child table
    * to its distinct keys with a partial-agg first (shuffle carries keys,
    * not rows), then left-antis the parent against that key set. */
  def childlessParents(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = Tables.lineitem(spark, dir)
    val orders = Tables.orders(spark, dir)
    def childless(name: String, parent: DataFrame, parentKey: String,
                  child: DataFrame, childKey: String): DataFrame = {
      val childKeys = child.select(col(childKey)).distinct()
      parent.join(childKeys, parent(parentKey) === childKeys(childKey), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check"), col("violations"))
    }
    childless("customer-no-orders", Tables.customer(spark, dir), "c_custkey",
        orders, "o_custkey")
      .unionByName(childless("orders-no-lineitem", orders, "o_orderkey",
        lineitem, "l_orderkey"))
      .unionByName(childless("part-no-lineitem", Tables.part(spark, dir), "p_partkey",
        lineitem, "l_partkey"))
      .unionByName(childless("supplier-no-lineitem", Tables.supplier(spark, dir),
        "s_suppkey", lineitem, "l_suppkey"))
      .orderBy("check")
  }

  /** Join-key skew profile — the diagnosis you run BEFORE pointing a
    * 100 TB shuffle join at a key: per candidate join key, the key-group
    * size distribution (mean in exact micro-units, p99 via the
    * integer-domain histogram lerp, max) plus the share of rows carried
    * by the single heaviest key in ppm. A max ≫ p99 or a fat top-key
    * share says salt this key or lean on AQE skew splitting; roughly
    * uniform says a plain shuffle join is fine (SCALE.md levers).
    *
    * Shape: one partial-agg pass per key column (shuffle carries one
    * row per distinct key), then the size-distribution stats aggregate
    * over the (distinct-key)-sized frame — the same two-level
    * aggregation discipline as the q122 histogram percentiles; nothing
    * buffers a group. */
  def joinKeySkew(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = Tables.lineitem(spark, dir)
    val events = Tables.events(spark, dir)
    def profile(table: String, key: String, df: DataFrame): DataFrame = {
      val sizes = df.groupBy(col(key).cast("long").as("k"))
        .agg(count(lit(1)).as("key_rows"))
      // p99 over the SIZE DOMAIN (distinct group sizes — tiny): the q122
      // histogram-lerp machinery, never a sorted row list
      val hist = sizes.groupBy(col("key_rows").cast("double").as("v"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("g", lit(s"$table/$key"))
      val pct = graft.ops.Percentiles
        .fromHistogram(hist, "g", Seq(("p99", 0.99)))
      val totals = sizes.agg(sum(col("key_rows")).as("n_rows"))
      pct.crossJoin(broadcast(totals))
        .select(
          lit(table).as("table"), lit(key).as("join_key"),
          col("n").as("n_keys"), col("n_rows"),
          expr("cast(floor(1000000.0d * n_rows / n + 0.5d) as bigint)")
            .as("mean_micro"),
          expr("cast(floor(p99 * 1000000.0d + 0.5d) as bigint)").as("p99_micro"),
          col("vmax").cast("long").as("max_key_rows"),
          expr("cast(floor(1000000.0d * vmax / n_rows + 0.5d) as bigint)")
            .as("top_key_ppm"))
    }
    profile("lineitem", "l_orderkey", lineitem)
      .unionByName(profile("lineitem", "l_partkey", lineitem))
      .unionByName(profile("lineitem", "l_suppkey", lineitem))
      .unionByName(profile("events", "user_id", events))
      .orderBy("table", "join_key")
  }

  /** q197: k-anonymity audit over a quasi-identifier tuple — the privacy
    * gate a training-data release runs before shipping: every
    * (mktsegment, nationkey) combination carried by fewer than `k`
    * customers is re-identification risk (an attacker joining on those
    * two public attributes isolates < k individuals). Output: each
    * violating combination with its group size — the worklist for
    * generalization or suppression.
    *
    * One partial-agg shuffle over the quasi-identifier domain (tiny by
    * definition — the audit only makes sense for low-cardinality public
    * attributes), then a size filter; at 100 TB the aggregate is the
    * only pass over the data. */
  def kAnonymity(spark: SparkSession, dir: String, k: Long = 8L): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment"), col("c_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)
      .orderBy("c_mktsegment", "nationkey")

  /** q281 — l-DIVERSITY audit, the second classical privacy gate on top
    * of q197/q248's k-anonymity strata: a quasi-identifier group can be
    * large (k-anonymous) yet still leak if everyone in it shares the
    * SAME sensitive value — an attacker who pins a target to the group
    * learns the attribute without identifying the row. Per
    * (mktsegment, nationkey) equivalence class: member count, distinct
    * sensitive values (order priority of the members' orders), and the
    * pass/fail flag at `l`. All groups ship (not only violations) so
    * the table doubles as the release-review worksheet.
    *
    * Scale: one custkey-keyed join (fact-sized, AQE-planned) into a
    * two-distinct aggregate on the bounded quasi-identifier domain —
    * Spark plans the multi-distinct as a single Expand pass (the q235
    * columnProfile shape); nothing else touches the data. */
  /** Default diversity threshold — interpolated into q281's oracle SQL
    * (advisor r13: shared constant, not a twice-written literal). */
  private[graft] val LDiversityDefault = 3L

  def lDiversity(spark: SparkSession, dir: String,
                 l: Long = LDiversityDefault): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        col("c_nationkey").cast("long").as("nationkey"))
      .join(Tables.orders(spark, dir)
          .select(col("o_custkey").as("c_custkey"), col("o_orderpriority")),
        Seq("c_custkey"))
      .groupBy(col("c_mktsegment"), col("nationkey"))
      .agg(countDistinct(col("c_custkey")).as("group_size"),
        countDistinct(col("o_orderpriority")).as("n_sensitive"))
      .select(col("c_mktsegment"), col("nationkey"), col("group_size"),
        col("n_sensitive"),
        (col("n_sensitive") >= l).cast("long").as("diverse"))
      .orderBy("c_mktsegment", "nationkey")

  /** t-closeness threshold (q286), micro — interpolated into the
    * oracle SQL (the shared-constant discipline). */
  private[graft] val TClosenessMicro = 200000L

  /** q286 — t-CLOSENESS over the q281 strata: the third classical
    * privacy gate. k-anonymity bounds re-identification, l-diversity
    * bounds attribute disclosure by COUNT of sensitive values; this
    * bounds it by DISTRIBUTION — a stratum whose order-priority mix
    * diverges from the global mix leaks the attribute even with l
    * distinct values present. Per (mktsegment, nationkey) equivalence
    * class: member/order counts and the Earth-Mover's Distance between
    * the stratum's and the global sensitive-value distribution, with
    * the pass flag at `tMicro`.
    *
    * EMD on an ORDINAL attribute (priorities order lexicographically =
    * numerically: 1-URGENT..5-LOW) is the mean |cumulative difference|:
    * EMD = Σ_i |Σ_{j<=i} (P_j − Q_j)| / (m−1). Determinism: P and Q are
    * micro-rounded FIRST, the cumulative sums run over exact integers
    * in priority order, and only the final mean divides — both engines
    * walk identical integers (the q231 discipline applied to a window
    * cumsum).
    *
    * Scale: one fact-sized keyed join (shared shape with q281), a
    * partial agg on the bounded (class × priority) domain, a 5-row
    * window cumsum per class, and a broadcast 5-row global
    * distribution. */
  def tCloseness(spark: SparkSession, dir: String,
                 tMicro: Long = TClosenessMicro): DataFrame = {
    val fact = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        col("c_nationkey").cast("long").as("nationkey"))
      .join(Tables.orders(spark, dir)
          .select(col("o_custkey").as("c_custkey"), col("o_orderpriority")),
        Seq("c_custkey"))
    val perClassPri = fact
      .groupBy(col("c_mktsegment"), col("nationkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val classStats = fact.groupBy(col("c_mktsegment"), col("nationkey"))
      .agg(countDistinct(col("c_custkey")).as("group_size"),
        count(lit(1)).as("n_orders"))
    val globalPri = fact.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("g"))
    val globalTot = fact.agg(count(lit(1)).as("gt"))
    val q = globalPri.crossJoin(broadcast(globalTot))
      .select(col("o_orderpriority"),
        expr("CAST(FLOOR(1000000.0d * g / gt + 0.5d) AS BIGINT)").as("q_micro"))
    // the m-1 EMD divisor stays IN the plan (a 1-row broadcast off the
    // bounded priority domain, the oracle's np CTE) — a driver-side
    // .count() here would run an extra fact-scan job at every
    // plan-construction (advisor r14, the eager-action-in-builder
    // pattern parquetRowCount exists to avoid)
    val nPriRow = globalPri.agg(count(lit(1)).as("npri"))
    // dense (class x priority) grid: absent combinations are P_i = 0,
    // which still pull EMD mass — they cannot be dropped
    val dense = classStats
      .crossJoin(broadcast(q))
      .join(perClassPri,
        Seq("c_mktsegment", "nationkey", "o_orderpriority"), "left_outer")
      .select(col("c_mktsegment"), col("nationkey"), col("group_size"),
        col("n_orders"), col("o_orderpriority"), col("q_micro"),
        expr("CAST(FLOOR(1000000.0d * COALESCE(n, 0L) / n_orders + 0.5d) AS BIGINT)")
          .as("p_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_mktsegment", "nationkey")
      .orderBy("o_orderpriority")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    dense
      .withColumn("r", sum(col("p_micro") - col("q_micro")).over(w))
      .groupBy(col("c_mktsegment"), col("nationkey"))
      .agg(max(col("group_size")).as("group_size"),
        max(col("n_orders")).as("n_orders"),
        sum(abs(col("r"))).as("sum_abs_r"))
      .crossJoin(broadcast(nPriRow))
      .select(col("c_mktsegment"), col("nationkey"), col("group_size"),
        col("n_orders"),
        expr("CAST(FLOOR(1.0d * sum_abs_r / (npri - 1) + 0.5d) AS BIGINT)")
          .as("emd_micro"))
      .withColumn("close", (col("emd_micro") <= lit(tMicro)).cast("long"))
      .orderBy("c_mktsegment", "nationkey")
  }

  /** Benford expected first-digit shares in ppm — log10(1 + 1/d)
    * hardcoded as integer literals so BOTH engines carry identical
    * constants (no libm transcendentals anywhere near the oracle
    * compare; the q83 rounding discipline taken to its logical end). */
  private[graft] val BenfordPpm: Seq[(Long, Long)] = Seq(
    1L -> 301030L, 2L -> 176091L, 3L -> 124939L, 4L -> 96910L,
    5L -> 79181L, 6L -> 66947L, 7L -> 57992L, 8L -> 51153L, 9L -> 45757L)

  /** q198: Benford's-law first-digit audit on order totals — the
    * reference-free fraud/fabrication screen: naturally-occurring
    * multi-scale amounts follow log10(1+1/d); invented numbers don't.
    * First digits come from the INTEGER cents (first character of a
    * BIGINT's decimal rendering — engine-identical, unlike float
    * formatting or log10 tricks), and the expected shares are shared
    * literal constants. Output per digit: count, observed ppm,
    * expected ppm and absolute deviation ppm — the audit table a
    * controls team reads.
    *
    * One scan + a 9-key aggregate + a broadcast of the 9-row constant
    * frame: nothing here changes shape at 100 TB. */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val expected = BenfordPpm.toDF("digit", "expected_ppm")
    val digits = Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") * 100d + 0.5d).cast("long").as("cents"))
      .filter(col("cents") > 0L)
      .select(substring(col("cents").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("ct"))
    val total = digits.agg(sum(col("ct")).as("total"))
    digits.crossJoin(broadcast(total))
      .join(broadcast(expected), Seq("digit"))
      .select(col("digit"), col("ct"),
        expr("cast(floor(1000000.0d * ct / total + 0.5d) as bigint)").as("obs_ppm"),
        col("expected_ppm"))
      .withColumn("abs_dev_ppm", abs(col("obs_ppm") - col("expected_ppm")))
      .orderBy("digit")
  }

  /** q199: functional-dependency discovery over candidate column pairs —
    * the schema-profiling primitive behind key inference, normalization
    * advice and join-safety checks ("is this column a function of
    * that?"). For each candidate lhs → rhs: the number of lhs values,
    * how many of them map to MORE than one distinct rhs (violations),
    * and the verdict.
    *
    * Shape: per candidate one (lhs, rhs)-distinct partial-agg + one
    * lhs-keyed count — the shuffle carries the distinct pair domain,
    * never raw rows twice; candidates evaluate independently (a real
    * profiler fans them out in one pass per table, same plan per
    * candidate). */
  def fdDiscovery(spark: SparkSession, dir: String): DataFrame = {
    def check(table: String, lhs: String, rhs: String): DataFrame = {
      val pairs = Tables.table(spark, dir, table)
        .select(col(lhs).cast("string").as("l"), col(rhs).cast("string").as("r"))
        .distinct()
      pairs.groupBy("l").agg(count(lit(1)).as("nr"))
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("nr") > 1L, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(table).as("table"), lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          col("n_lhs"), col("n_violating"),
          (col("n_violating") === 0L).cast("long").as("holds"))
    }
    check("nation", "n_nationkey", "n_regionkey")
      .unionByName(check("customer", "c_custkey", "c_nationkey"))
      .unionByName(check("customer", "c_nationkey", "c_mktsegment"))
      .unionByName(check("part", "p_partkey", "p_brand"))
      .unionByName(check("part", "p_brand", "p_type"))
      .unionByName(check("lineitem", "l_orderkey", "l_suppkey"))
      .orderBy("table", "lhs", "rhs")
  }
}
