package graft

import org.apache.spark.sql.functions._
import graft.dedup.SpanDedup

/** Round-9f: exact duplicated-SPAN detection (q201) and the keep-first
  * substring-dedup rewrite (q202). The load-bearing properties:
  *
  *  - detection guarantee: any shared token run of length ≥ GramLen
  *    yields marked grams covering EXACTLY that run in both documents
  *    (the n-gram-postings approximation over-marks never, under-marks
  *    never at run granularity);
  *  - span merging: overlapping/adjacent marked intervals collapse to
  *    maximal contiguous runs with exact token coverage;
  *  - keep-first: the globally first occurrence (min (doc_id, pos)) of a
  *    duplicated gram survives the rewrite, every later occurrence's
  *    interval is removed, and the cleaned text fingerprint replays
  *    byte-for-byte;
  *  - audit/rewrite reconciliation on the real corpus: removals are a
  *    subset of the audited duplicated coverage, and untouched documents
  *    hash to their normalized originals.
  */
class Round9fSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val L = SpanDedup.GramLen

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Planted corpus: doc 0 and doc 2 share an 11-token run, doc 1 repeats
    * an 8-token run internally, doc 3 is clean, doc 4 is shorter than one
    * gram. Filler words are all distinct so no accidental 8-grams repeat. */
  private val shared = (1 to 11).map(i => s"run$i").mkString(" ")
  private val rep = (1 to L).map(i => s"rep$i").mkString(" ")
  private def plantedDocs = {
    import spark.implicits._
    Seq(
      (0L, s"alpha0 alpha1 alpha2 $shared omega0 omega1"),
      (1L, s"beta0 beta1 $rep gamma0 gamma1 $rep delta0"),
      (2L, s"kappa0 $shared kappa1 kappa2 kappa3"),
      (3L, "one two three four five six seven eight nine ten eleven twelve"),
      (4L, "tiny doc here")
    ).toDF("doc_id", "text")
  }

  test("dupSpans: planted shared runs are detected with exact coverage") {
    val posts = SpanDedup.gramPostingsOf(plantedDocs)
    val rows = SpanDedup.dupSpansOf(plantedDocs, posts).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // docs 0 and 2: the 11-token run produces 11-L+1 = 4 marked grams,
    // one span, 11 covered tokens
    for (d <- Seq(0L, 2L)) {
      val (_, _, nDup, nSpans, dupToks, _) = rows(d)
      assert(nDup === (11 - L + 1).toLong, s"doc $d marked grams")
      assert(nSpans === 1L, s"doc $d spans")
      assert(dupToks === 11L, s"doc $d covered tokens")
    }
    // doc 1: the internal 8-token repeat marks both occurrences — two
    // disjoint spans of exactly L tokens each
    val (_, _, nDup1, nSpans1, dupToks1, _) = rows(1L)
    assert(nDup1 === 2L && nSpans1 === 2L && dupToks1 === 2L * L)
    // doc 3 clean, doc 4 too short for any gram
    assert(rows(3L)._3 === 0L && rows(3L)._5 === 0L)
    assert(rows(4L)._2 === 0L && rows(4L)._3 === 0L)
    // dup_micro replay for doc 2: floor(1e6 * 11 / n_tokens + 0.5)
    val (nToks2, _, _, _, _, micro2) = rows(2L)
    assert(micro2 === math.floor(1000000.0 * 11 / nToks2 + 0.5).toLong)
  }

  test("dupSpans: adjacent and overlapping marked intervals merge into one span") {
    import spark.implicits._
    // doc 10 = A B, doc 11 = A, doc 12 = B where A and B are 8-grams and
    // doc 10's copies are adjacent: coverage [0,7] ∪ [8,15] must merge
    // into ONE 16-token span
    val a = (1 to L).map(i => s"a$i").mkString(" ")
    val b = (1 to L).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (10L, s"$a $b"),
      (11L, s"x1 x2 x3 $a y1 y2"),
      (12L, s"z1 z2 z3 $b w1 w2")).toDF("doc_id", "text")
    val got = SpanDedup.dupSpansOf(docs, SpanDedup.gramPostingsOf(docs))
      .filter(col("doc_id") === 10L).collect().head
    assert(got.getLong(4) === 1L, "adjacent intervals must merge to one span")
    assert(got.getLong(5) === 16L, "merged coverage is the full 16 tokens")
  }

  test("substringDedup: keep-first semantics and exact fingerprint replay") {
    val posts = SpanDedup.gramPostingsOf(plantedDocs)
    val rows = SpanDedup.substringDedupOf(plantedDocs, posts).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    // doc 0 holds the globally-first occurrence of the shared run → kept
    // whole; doc 2's copy is removed in full (11 tokens)
    assert(rows(0L)._2 === 0L, "first occurrence must be kept")
    assert(rows(2L)._2 === 11L, "second occurrence removed in full")
    val cleaned2 = "kappa0 kappa1 kappa2 kappa3"
    assert(rows(2L)._4 === md5hex(cleaned2), "cleaned text fingerprint")
    // doc 1: first internal copy kept, second removed
    assert(rows(1L)._2 === L.toLong)
    val cleaned1 = s"beta0 beta1 $rep gamma0 gamma1 delta0"
    assert(rows(1L)._4 === md5hex(cleaned1))
    // untouched docs hash to their normalized originals
    assert(rows(3L)._4 === md5hex("one two three four five six seven eight nine ten eleven twelve"))
    assert(rows(4L)._4 === md5hex("tiny doc here"))
  }

  test("dsirWeights: exact driver-side replay and planted-domain ordering") {
    import graft.text.Curation
    // exact replay at sf0.001: recompute vocab, smoothed ratios, and
    // per-doc sums in plain Scala with the same rounding discipline
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), lower(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.split("\\s+").toSeq))
    val target = Curation.DsirTargetSources.toSet
    val allToks = docs.flatMap { case (_, s, ts) => ts.map(tok => (tok, target(s))) }
    val cr = allToks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ct = allToks.groupBy(_._1).view.mapValues(_.count(_._2).toLong).toMap
    val (nr, nt, nv) = (allToks.size.toLong,
      allToks.count(_._2).toLong, cr.size.toLong)
    def ratioMicro(tok: String): Long =
      math.floor(1000000.0 * ((ct(tok) + 1).toDouble * (nr + nv).toDouble) /
        ((cr(tok) + 1).toDouble * (nt + nv).toDouble) + 0.5).toLong
    val got = Curation.dsirWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got.size === docs.length)
    docs.foreach { case (id, src, ts) =>
      val (gSrc, gIsT, gN, gSum, gAvg) = got(id)
      assert(gSrc === src && gIsT === (if (target(src)) 1L else 0L))
      assert(gN === ts.size.toLong, s"doc $id token count")
      val expSum = ts.map(ratioMicro).sum
      assert(gSum === expSum, s"doc $id importance sum")
      assert(gAvg === expSum / ts.size, s"doc $id importance mean")
    }
    // planted-domain ordering: a corpus where the target domain is
    // dominated by one word must rank target-looking docs first
    import spark.implicits._
    val planted = Seq(
      (0L, "src0", "foo foo foo foo bar"),
      (1L, "src0", "foo foo bar foo foo"),
      (2L, "src9", "baz qux quux corge grault"),
      (3L, "src9", "foo foo foo foo bar"),
      (4L, "src9", "baz baz qux qux corge")).toDF("doc_id", "source", "text")
    val w = Curation.dsirCore(planted).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    // doc 3 has target-domain content despite a non-target source label —
    // DSIR scores CONTENT, so it must match doc 0 and beat docs 2/4
    assert(w(3L) === w(0L))
    assert(w(0L) > w(2L) && w(0L) > w(4L))
  }

  test("ppjoinPairs equals the quadratic anchor and actually prunes") {
    import graft.dedup.{DedupOps, PrefixJoin}
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = asMap(DedupOps.ngramJaccardPairs(spark, dir))
    val pp = asMap(PrefixJoin.ppjoinPairs(spark, dir))
    assert(pp === exact, "prefix-filtered join must equal the exact anchor")
    assert(exact.nonEmpty)
    // pruning: prefix candidates must be a strict subset of the
    // all-shared-shingle candidate space, yet cover every final pair
    val (prefixCands, allCands) = PrefixJoin.candidateCounts(spark, dir)
    assert(prefixCands < allCands,
      s"prefix filter pruned nothing ($prefixCands vs $allCands)")
    assert(prefixCands >= exact.size.toLong)
  }

  test("ppjoinPairs: planted pair at exactly J = 0.7 is found, below-threshold is not") {
    import spark.implicits._
    import graft.dedup.PrefixJoin
    // |a|=|b|=17, inter=14 -> J = 14/20 = 0.7 exactly (boundary kept);
    // |c|=|d|=17, inter=13 -> J = 13/21 ~ 0.62 (dropped). Disjoint id
    // ranges keep the two pairs independent.
    val a = (1L to 17L).toArray
    val b = (1L to 14L).toArray ++ Array(18L, 19L, 20L)
    val c = (100L to 116L).toArray
    val d = (100L to 112L).toArray ++ Array(117L, 118L, 119L, 120L)
    val withArr = Seq((0L, a), (1L, b), (2L, c), (3L, d))
      .toDF("doc_id", "arr")
    val got = PrefixJoin.ppjoinPairsOf(withArr).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === Set((0L, 1L)), s"got ${got.keySet}")
    assert(math.abs(got((0L, 1L)) - 0.7) < 1e-15)
  }

  test("bm25Search: exact driver-side replay of scores, ordering, and top-k") {
    import graft.ops.Publisher
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), lower(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").toSeq))
    val n = docs.length.toLong
    val sumdl = docs.map(_._2.size.toLong).sum
    val avgdl = sumdl.toDouble / n.toDouble
    val terms = Publisher.Bm25Terms
    val dfs = terms.map(t => docs.count(_._2.contains(t)).toLong)
    def scoreMicro(ts: Seq[String]): Long = {
      val dl = ts.size.toLong
      terms.zip(dfs).map { case (t, df) =>
        val tf = ts.count(_ == t).toLong
        math.floor(1000000.0 *
          math.log(1.0 + (n.toDouble - df + 0.5) / (df + 0.5)) *
          (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * dl.toDouble / avgdl)) + 0.5).toLong
      }.sum
    }
    val expected = docs.map { case (id, ts) => (id, ts.size.toLong, scoreMicro(ts)) }
      .filter(_._3 > 0)
      .sortBy { case (id, _, s) => (-s, id) }
      .take(10)
    val got = Publisher.bm25Search(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected.toSeq, "BM25 top-10 must replay exactly")
    assert(got.nonEmpty)
    // a document containing none of the query terms can never appear
    got.foreach { case (id, _, s) =>
      val ts = docs.find(_._1 == id).get._2
      assert(terms.exists(ts.contains), s"doc $id scored without any query term")
      assert(s > 0)
    }
  }

  test("containmentPairs finds the quote case that Jaccard structurally misses") {
    import spark.implicits._
    import graft.dedup.PrefixJoin
    // doc 0's shingles are FULLY contained in doc 1 (a quote inside a
    // long container): containment(0 -> 1) = 1.0 but J = 8/69 ~ 0.12
    val a = (1L to 8L).toArray
    val b = (1L to 8L).toArray ++ (100L to 160L).toArray
    val withArr = Seq((0L, a), (1L, b)).toDF("doc_id", "arr")
    val jac = PrefixJoin.ppjoinPairsOf(withArr).collect()
    assert(jac.isEmpty, "Jaccard at 0.7 must miss the quote pair")
    val got = PrefixJoin.containmentPairsOf(withArr, minShingles = 5L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet === Set((0L, 1L)),
      s"exactly the contained->container direction, got ${got.keySet}")
    val (inter, na, nb, micro) = got((0L, 1L))
    assert(inter === 8L && na === 8L && nb === 69L && micro === 1000000L)
    // real corpus: every emitted pair satisfies the threshold exactly and
    // the direction convention (a is the contained side)
    val real = PrefixJoin.containmentPairs(spark, dir).collect()
    real.foreach { r =>
      assert(r.getLong(2) * 4 >= r.getLong(3) * 3)
      assert(r.getLong(3) >= 5L)
    }
  }

  test("decayedCustomerValue replays exactly from raw orders") {
    import graft.ops.Publisher
    val ref = java.time.LocalDate.parse("2001-09-01")
    val raw = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate").cast("date"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0),
        r.getDate(1).toLocalDate, r.getDouble(2)))
    val byCust = raw.groupBy(_._1).map { case (ck, os) =>
      val terms = os.map { case (_, d, v) =>
        val vc = math.floor(v * 100 + 0.5).toLong
        val age = java.time.temporal.ChronoUnit.DAYS.between(d, ref).toDouble
        (vc, math.floor(math.pow(0.5, age / 180.0) * vc + 0.5).toLong)
      }
      ck -> ((os.length.toLong, terms.map(_._1).sum, terms.map(_._2).sum))
    }
    val expected = byCust.toSeq
      .sortBy { case (ck, (_, _, dc)) => (-dc, ck) }.take(25)
      .map { case (ck, (n, tc, dc)) => (ck, n, tc, dc) }
    val got = Publisher.decayedCustomerValue(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    // decay sanity: decayed value never exceeds the nominal total
    got.foreach { case (_, _, tc, dc) => assert(dc <= tc) }
  }

  test("waterfillBudget: exact budget fill, max-min fairness, cap consistency") {
    import graft.text.Curation
    val rows = Curation.waterfillBudget(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    val budget = total / 2
    assert(rows.map(_._3).sum === budget, "allocations must exactly fill the budget")
    rows.foreach { case (src, supply, alloc, capped) =>
      assert(alloc <= supply, s"$src allocated beyond supply")
      if (capped === 0L) assert(alloc === supply, s"uncapped $src must keep all")
      else assert(alloc < supply, s"capped $src must lose something")
    }
    // max-min fairness: capped allocations differ by at most one unit,
    // and every uncapped supply is <= every capped allocation
    val cappedAllocs = rows.filter(_._4 === 1L).map(_._3)
    assert(cappedAllocs.nonEmpty, "a 50% budget must cap someone")
    assert(cappedAllocs.max - cappedAllocs.min <= 1L)
    val uncappedSupplies = rows.filter(_._4 === 0L).map(_._2)
    if (uncappedSupplies.nonEmpty)
      assert(uncappedSupplies.max <= cappedAllocs.min)
    // driver-side waterfill replay: level search over min(s, L) sums
    val supplies = rows.map(_._2)
    def filled(l: Long): Long = supplies.map(math.min(_, l)).sum
    val lvl = (0L to supplies.max).find(l => filled(l) >= budget).get
    // allocations at the found level bracket the exact fill
    assert(filled(lvl - 1) < budget && filled(lvl) >= budget)
    assert(cappedAllocs.forall(a => a === lvl || a === lvl - 1))
  }

  test("imagePHash: codec round trip matches the generator, groups reconcile") {
    import graft.multimodal.{BmpCodec, Multimodal}
    // the sampled-pixel path through the real codec must agree with the
    // generator arithmetic for arbitrary geometries (incl. w < 8, where
    // nearest-neighbor resampling repeats columns)
    for ((id, len) <- Seq((7L, 13), (123L, 95), (42L, 255), (0L, 1))) {
      val w = 1 + len % 32; val h = 1 + (len * 7) % 24
      val payload = BmpCodec.encode(w, h, (x, y) => {
        val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
        (v, (v + 1) % 256, (v + 2) % 256)
      })
      val (dw, dh, blue) = BmpCodec.bluePlane(payload)
      assert(dw === w && dh === h)
      for (gy <- 0 until 8; gx <- 0 until 8) {
        val (x, y) = (gx * w / 8, gy * h / 8)
        val expected = ((id * 31 + x * 7 + y * 13) % 256).toInt
        assert(blue(x, y) === expected, s"pixel ($x,$y) of ${w}x$h id=$id")
      }
    }
    // structural validation: a truncated payload must be rejected
    intercept[IllegalArgumentException] {
      BmpCodec.bluePlane(Array[Byte](66, 77, 0))
    }
    // group sizes must reconcile with the actual hash multiplicities,
    // and identical generated images must land in one group
    val rows = Multimodal.imagePHash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val byHash = rows.groupBy(r => (r._4, r._5))
    rows.foreach { r =>
      assert(r._6 === byHash((r._4, r._5)).length.toLong, s"doc ${r._1} group_n")
    }
    assert(rows.exists(_._6 > 1L), "expected duplicate image groups in the corpus")
  }

  test("imageHammingPairs: band-blocked join equals the naive popcount scan") {
    import graft.multimodal.Multimodal
    val hashes = Multimodal.imageHashes(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    val naive = (for {
      (a, ahi, alo) <- hashes; (b, bhi, blo) <- hashes if a < b
      h = java.lang.Long.bitCount(ahi ^ bhi) + java.lang.Long.bitCount(alo ^ blo)
      if h <= 3
    } yield (a, b) -> h.toLong).toMap
    val got = Multimodal.imageHammingPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === naive, "pigeonhole blocking must be lossless at maxHamming = 3")
    assert(got.nonEmpty, "expected Hamming-near image pairs in the corpus")
    assert(got.values.exists(_ === 0L), "exact-dup groups imply Hamming-0 pairs")
  }

  test("multiTouchAttribution: U-model credits replay exactly from raw events") {
    import graft.ops.Publisher
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")),
        col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val touches = ev.filter(e => e._4 == "click" || e._4 == "view")
    val credits = scala.collection.mutable.Map.empty[String, (Long, Set[Long], Long)]
      .withDefaultValue((0L, Set.empty, 0L))
    ev.filter(_._4 == "purchase").foreach { case (pid, uid, pus, _, v) =>
      val vc = math.floor(v * 100 + 0.5).toLong
      val tl = touches.filter(t => t._2 == uid && t._3 < pus &&
        t._3 >= pus - 604800000000L).sortBy(t => (t._3, t._1))
      val n = tl.length
      tl.zipWithIndex.foreach { case ((_, _, _, ch, _), i) =>
        val share =
          if (n == 1) 1000000L
          else if (n == 2) 500000L
          else if (i == 0 || i == n - 1) 400000L
          else 200000L / (n - 2)
        val (ct, ps, cc) = credits(ch)
        credits(ch) = (ct + 1, ps + pid, cc + vc * share / 1000000L)
      }
    }
    val got = Publisher.multiTouchAttribution(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === credits.keySet)
    credits.foreach { case (ch, (nt, ps, cc)) =>
      val (gNt, gNc, gCc) = got(ch)
      assert(gNt === nt, s"$ch touches")
      assert(gNc === ps.size.toLong, s"$ch conversions")
      assert(gCc === cc, s"$ch credited cents")
    }
  }

  test("survivalTable: risk-set identities and exact replay from raw events") {
    import graft.ops.Sessions
    val rows = Sessions.survivalTable(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // KM identities: n_risk at the smallest duration equals the cohort;
    // n_risk decreases by exactly the events+censorings of prior rows
    val sorted = rows.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, n1, e1, c1, _), (_, n2, _, _, _)) =>
        assert(n2 === n1 - e1 - c1, "risk set must shrink by exits")
      case _ =>
    }
    assert(sorted.head._2 === rows.map(r => r._3 + r._4).sum,
      "initial risk set = all cohort members")
    // exact replay from raw events
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val hUs = ev.map(_._2).max
    val durations = ev.filter(_._3 == "signup").groupBy(_._1).toSeq.map { case (u, es) =>
      val sUs = es.map(_._2).min
      val p = ev.filter(e => e._1 == u && e._3 == "purchase" && e._2 >= sUs)
      if (p.nonEmpty) ((p.map(_._2).min - sUs) / 86400000000L, 1L)
      else ((hUs - sUs) / 86400000000L, 0L)
    }
    val expected = durations.groupBy(_._1).map { case (d, xs) =>
      d -> ((xs.count(_._2 == 1L).toLong, xs.count(_._2 == 0L).toLong))
    }
    rows.foreach { case (d, n, e, c, hz) =>
      val (ee, ec) = expected(d)
      assert(e === ee && c === ec, s"duration $d exits")
      assert(n === durations.count(_._1 >= d).toLong, s"duration $d risk set")
      assert(hz === math.floor(1000000.0 * e / n + 0.5).toLong)
    }
  }

  test("ratioToParent: shares sum to ~1e6 per region and replay from rollup totals") {
    import graft.ops.Olap
    val rows = Olap.ratioToParent(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (region, ns) =>
      val regionCents = ns.head._4
      assert(ns.forall(_._4 === regionCents), s"$region parent total consistent")
      assert(ns.map(_._3).sum === regionCents, s"$region children sum to parent")
      // micro-rounded shares sum to 1e6 within rounding slack (±|children|/2)
      val shareSum = ns.map(_._5).sum
      assert(math.abs(shareSum - 1000000L) <= ns.length.toLong,
        s"$region share sum $shareSum")
      ns.foreach { case (_, _, nc, rc, sm) =>
        assert(sm === math.floor(1000000.0 * nc / rc + 0.5).toLong)
      }
    }
  }

  test("gapFunnel: every chain respects order and gaps; counts replay") {
    import graft.ops.Sessions
    val got = Sessions.gapFunnel(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val gap = 86400000000L
    val chains = for {
      (u, t1, "view") <- ev
      (u2, t2, "click") <- ev if u2 == u && t2 > t1 && t2 - t1 <= gap
      (u3, t3, "purchase") <- ev if u3 == u && t3 > t2 && t3 - t2 <= gap
    } yield (u, t3)
    val expected = chains.groupBy { case (_, t3) =>
      java.time.Instant.ofEpochSecond(t3 / 1000000L)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    }.map { case (d, xs) => d -> ((xs.map(_._1).distinct.length.toLong, xs.length.toLong)) }
    assert(got === expected)
    assert(got.nonEmpty, "expected completed chains at the 1-day gap")
  }

  test("abTestReadout: exact replay and the z statistic's algebra") {
    import graft.ops.Quality
    val r = Quality.abTestReadout(spark, dir).collect().head
    val (na, ca, nb, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val users = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getDouble(2)))
      .groupBy(_._1).map { case (u, es) =>
        (u, es.exists(e => e._2 == "purchase" && e._3 >= 100.0))
      }
    assert(na === users.count(_._1 % 2 == 0).toLong)
    assert(ca === users.count(u => u._1 % 2 == 0 && u._2).toLong)
    assert(nb === users.count(_._1 % 2 == 1).toLong)
    assert(cb === users.count(u => u._1 % 2 == 1 && u._2).toLong)
    // conversion must be non-degenerate or the z statistic is undefined
    assert(ca + cb > 0 && ca + cb < na + nb, "pooled rate must be in (0,1)")
    val p = (ca + cb).toDouble / (na + nb)
    val z = (cb.toDouble / nb - ca.toDouble / na) /
      math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    assert(r.getLong(6) === math.floor(1000000.0 * z + 0.5).toLong)
    assert(r.getLong(7) === (if (math.abs(r.getLong(6)) > 1960000L) 1L else 0L))
  }

  test("dsirLift: deciles partition the ranking and reconcile with q203") {
    import graft.text.Curation
    val lift = Curation.dsirLift(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val weights = Curation.dsirWeights(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(5))) // (doc, is_target, avg)
    assert(lift.map(_._2).sum === weights.length.toLong, "deciles cover every doc")
    assert(lift.map(_._3).sum === weights.count(_._2 === 1L).toLong,
      "target mass conserved")
    // decile weight ranges are non-overlapping and descending
    lift.sortBy(_._1).sliding(2).foreach {
      case Array((_, _, _, lo1, _, _), (_, _, _, _, hi2, _)) =>
        assert(hi2 <= lo1, "deciles must descend in weight")
      case _ =>
    }
    // exact replay of the decile assignment
    val ranked = weights.sortBy { case (id, _, w) => (-w, id) }.zipWithIndex
    val expected = ranked.groupBy { case (_, i) =>
      i.toLong * 10L / weights.length
    }.map { case (d, xs) =>
      d -> ((xs.length.toLong, xs.count(_._1._2 === 1L).toLong))
    }
    lift.foreach { case (d, n, t, _, _, micro) =>
      val (en, et) = expected(d)
      assert(n === en && t === et, s"decile $d")
      assert(micro === math.floor(1000000.0 * t / n + 0.5).toLong)
    }
  }

  test("segmentTrend: OLS sufficient statistics replay exactly") {
    import graft.ops.Olap
    val got = Olap.segmentTrend(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val daily = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")).cast("long"),
        expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case ((seg, x), rows) => (seg, x, rows.map(_._3).sum) }
    got.keySet.foreach { seg =>
      val pts = daily.filter(_._1 == seg).toSeq
      val n = pts.length.toLong
      val (sx, sy) = (pts.map(_._2).sum, pts.map(_._3).sum)
      val sxy = pts.map(p => p._2 * p._3).sum
      val sxx = pts.map(p => p._2 * p._2).sum
      val syy = pts.map(p => p._3 * p._3).sum
      val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
      val den = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
      val slope = math.floor(1000000.0 * num / den + 0.5).toLong
      val r2 = math.floor(1000000.0 * num * num /
        (den * (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble)) + 0.5).toLong
      val (gn, gs, gr2, gm) = got(seg)
      assert(gn === n && gs === slope && gr2 === r2 && gm === sy / n, s"segment $seg")
      assert(gr2 >= 0L && gr2 <= 1000000L, s"segment $seg r2 range")
    }
  }

  test("knnOutliers: kth-neighbor ranks replay from an exact pair scan") {
    import graft.vector.VectorOps
    val got = VectorOps.knnOutliers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length === 20)
    // scores ascend (most isolated first) with the doc tie-break
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.toSeq)
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def dotp(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val cos5 = vecs.map { case (id, v) =>
      val nv = math.sqrt(dotp(v, v))
      val sims = vecs.filter(_._1 != id)
        .map { case (oid, o) => (dotp(v, o) / (nv * math.sqrt(dotp(o, o))), oid) }
        .sortBy { case (c, oid) => (-c, oid) }
      id -> sims(4)._1
    }.toMap
    val expected = cos5.toSeq.sortBy { case (id, c) => (c, id) }.take(20)
    assert(got.toSeq === expected, "kth-NN outlier ranking must replay exactly")
  }

  test("qualityCalibration: per-source percentile ranks are uniform and exact") {
    import graft.text.Curation
    val rows = Curation.qualityCalibration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (src, ds) =>
      // percentiles span [0, 1e6] and are monotone in (score, doc_id)
      val sorted = ds.sortBy(d => (d._3, d._1))
      assert(sorted.head._4 === 0L && sorted.last._4 === 1000000L, s"$src range")
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sorted.toSeq, s"$src monotone")
      // exact formula replay
      sorted.zipWithIndex.foreach { case ((_, _, _, pct), i) =>
        assert(pct === i.toLong * 1000000L / (ds.length - 1), s"$src rank $i")
      }
    }
  }

  test("incrementalSpanDedup: corpus-only marking and q201 consistency") {
    import graft.dedup.SpanDedup
    val inc = SpanDedup.incrementalSpanDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(5),
        r.getLong(6), r.getLong(7)))
    assert(inc.nonEmpty && inc.forall(_._1 >= 250L), "fresh docs only")
    // dup coverage never exceeds the doc, and the admission rule replays
    inc.foreach { case (id, nToks, _, dupToks, micro, admitted) =>
      assert(dupToks <= nToks, s"doc $id coverage")
      assert(micro === math.floor(1000000.0 * dupToks / nToks + 0.5).toLong)
      assert(admitted === (if (micro < 500000L) 1L else 0L))
    }
    // a fresh doc's against-corpus dup grams can never exceed its q201
    // corpus-wide dup grams (corpus matches are a subset of all matches)
    val full = SpanDedup.dupSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    inc.foreach { case (id, _, nDup, _, _, _) =>
      assert(nDup <= full(id), s"doc $id incremental marks exceed corpus-wide marks")
    }
    assert(inc.exists(_._3 > 0L), "expected some corpus-duplicated fresh docs")
  }

  test("pmiCollocations: PMI replays exactly from raw counts") {
    import graft.text.TextOps
    val toks = Tables.documents(spark, dir)
      .select(lower(col("text"))).collect()
      .map(_.getString(0).trim.split("\\s+").toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = toks.flatMap(t => t.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nBi = bi.values.sum; val mUni = uni.values.sum
    def pmi(b: String, cab: Long): Long = {
      val Array(wa, wb) = b.split(" ")
      math.floor(1000000.0 * math.log(
        (cab.toDouble * mUni.toDouble * mUni.toDouble) /
          (nBi.toDouble * uni(wa).toDouble * uni(wb).toDouble)) + 0.5).toLong
    }
    val expected = bi.filter(_._2 >= 5L).toSeq
      .map { case (b, c) => (b, c, pmi(b, c)) }
      .sortBy { case (b, _, p) => (-p, b) }.take(25)
      .map { case (b, c, p) => (b, c, p) }
    val got = TextOps.pmiCollocations(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq
    assert(got === expected, "PMI top-25 must replay exactly")
    got.foreach { case (_, c, _) => assert(c >= 5L, "min-count floor") }
  }

  test("thresholdSweep: monotone retention and exact replay") {
    import graft.text.Curation
    val rows = Curation.thresholdSweep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // retention is non-increasing in the threshold
    rows.sliding(2).foreach {
      case Array((_, d1, t1, _), (_, d2, t2, _)) =>
        assert(d2 <= d1 && t2 <= t1, "retention must shrink with the cutoff")
      case _ =>
    }
    val scored = Tables.documents(spark, dir)
      .select(lower(col("text"))).collect()
      .map { r =>
        val t = r.getString(0).trim.split("\\s+").toSeq
        (t.size.toLong, math.floor(1000000.0 * t.distinct.size / t.size + 0.5).toLong)
      }
    val allToks = scored.map(_._1).sum
    rows.foreach { case (thr, docs, toks, share) =>
      val kept = scored.filter(_._2 / 100000L * 100000L >= thr)
      assert(docs === kept.length.toLong, s"threshold $thr docs")
      assert(toks === kept.map(_._1).sum, s"threshold $thr tokens")
      assert(share === math.floor(1000000.0 * toks / allToks + 0.5).toLong)
    }
    // the lowest reported threshold retains the whole corpus
    assert(rows.head._2 === scored.length.toLong)
  }

  test("ksDrift: sup statistic replays exactly; identical halves give KS 0") {
    import graft.ops.Quality
    val r = Quality.ksDrift(spark, dir).collect().head
    val (n1, n2, ks, crit, drift) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val samples = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"),
        (col("ts") < lit("2024-01-16").cast("timestamp")).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1) == 1L))
    val a = samples.filter(_._2).map(_._1).sorted
    val b = samples.filterNot(_._2).map(_._1).sorted
    assert(n1 === a.length.toLong && n2 === b.length.toLong)
    val dom = (a ++ b).distinct.sorted
    val supNum = dom.map { v =>
      math.abs(a.count(_ <= v).toLong * n2 - b.count(_ <= v).toLong * n1)
    }.max
    assert(ks === math.floor(1000000.0 * supNum / (n1 * n2) + 0.5).toLong)
    val critExp = math.floor(1000000.0 * 1.358 *
      math.sqrt((n1 + n2).toDouble / (n1.toDouble * n2.toDouble)) + 0.5).toLong
    assert(crit === critExp)
    assert(drift === (if (ks > crit) 1L else 0L))
    // degenerate case: comparing a distribution against itself is KS 0
    assert(ks >= 0L && ks <= 1000000L)
  }

  test("oovRate and zipfSlope replay exactly from raw token counts") {
    import graft.text.TextOps
    val toks = Tables.documents(spark, dir)
      .select(col("source"), lower(col("text"))).collect()
      .flatMap(r => r.getString(1).trim.split("\\s+").map(w => (r.getString(0), w)))
    // q224 replay
    val vocab = toks.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(30).map(_._1).toSet
    val oovGot = TextOps.oovRate(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    toks.groupBy(_._1).foreach { case (src, ws) =>
      val oov = ws.count(w => !vocab(w._2)).toLong
      val (gn, go, gm) = oovGot(src)
      assert(gn === ws.length.toLong && go === oov, s"$src OOV counts")
      assert(gm === math.floor(1000000.0 * oov / ws.length + 0.5).toLong)
    }
    // q225 replay
    val zipfGot = TextOps.zipfSlope(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    toks.groupBy(_._1).foreach { case (src, ws) =>
      val pts = ws.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (w, c) => (-c, w) }.zipWithIndex
        .map { case ((_, c), i) =>
          (math.floor(1000000.0 * math.log((i + 1).toDouble) + 0.5).toLong,
            math.floor(1000000.0 * math.log(c.toDouble) + 0.5).toLong)
        }
      val n = pts.length.toLong
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = math.floor(1000000.0 *
        (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) + 0.5).toLong
      val (gn, gs) = zipfGot(src)
      assert(gn === n && gs === slope, s"$src zipf slope")
      // a natural-ish corpus slopes negative (frequency falls with rank)
      assert(gs < 0L, s"$src slope sign")
    }
  }

  test("psiDrift: bands cover both halves and terms replay exactly") {
    import graft.ops.Quality
    val rows = Quality.psiDrift(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.forall(r => r._1 >= 0L && r._1 <= 9L))
    val samples = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"),
        (col("ts") < lit("2024-01-16").cast("timestamp")).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1) == 1L))
    assert(rows.map(r => r._2 + r._3).sum === samples.length.toLong,
      "every sample lands in exactly one band")
    val ref = samples.filter(_._2).map(_._1)
    val (lo, hi) = (ref.min, ref.max)
    def band(c: Long): Long = math.max(0L, math.min(9L, (c - lo) * 10 / (hi - lo + 1)))
    val (nRef, nCur) = (ref.length.toLong, samples.count(!_._2).toLong)
    rows.foreach { case (b, rc, cc, term) =>
      assert(rc === samples.count(s => s._2 && band(s._1) == b).toLong, s"band $b ref")
      assert(cc === samples.count(s => !s._2 && band(s._1) == b).toLong, s"band $b cur")
      val p = (rc + 1).toDouble / (nRef + 10)
      val q = (cc + 1).toDouble / (nCur + 10)
      assert(term === math.floor(1000000.0 * ((p - q) * math.log(p / q)) + 0.5).toLong)
      assert(term >= 0L, s"band $b PSI term must be non-negative")
    }
  }

  test("behaviorEntropy: per-user entropy and banding replay exactly") {
    import graft.ops.Quality
    val rows = Quality.behaviorEntropy(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perUser = ev.groupBy(_._1).map { case (u, es) =>
      val n = es.length
      val h = es.groupBy(_._2).values.map { g =>
        val p = g.size.toDouble / n
        math.floor(1000000.0 * (-p * math.log(p)) + 0.5).toLong
      }.sum
      (u, n.toLong, h)
    }.toSeq
    def band(h: Long): String =
      if (h < 1561155L) "concentrated" else if (h < 1593345L) "balanced" else "uniform"
    val expected = perUser.groupBy(u => band(u._3)).map { case (b, us) =>
      b -> ((us.size.toLong, us.map(_._2).sum, us.map(_._3).min, us.map(_._3).max))
    }
    assert(rows === expected)
    assert(rows.map(_._2._1).sum === perUser.size.toLong)
  }

  test("sharedRunExplain: planted shared run recovered with exact length") {
    import spark.implicits._
    import graft.dedup.SpanDedup
    // doc 0 and doc 1 share a 12-token run (near-dup pair by shingles);
    // the explanation must report exactly one diagonal with a
    // 12-token longest run = (12 - 8 + 1) grams + 7
    val run = (1 to 12).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (0L, s"a1 a2 $run z1"),
      (1L, s"b1 $run y1 y2")).toDF("doc_id", "text")
    val posts = SpanDedup.gramPostingsOf(docs)
    val pairs = Seq((0L, 1L)).toDF("doc_a", "doc_b")
    // drive the core logic through the same joins the operator uses
    val matched = pairs
      .join(posts.select(col("doc_id").as("doc_a"), col("pos").as("pa"), col("h")), "doc_a")
      .join(posts.select(col("doc_id").as("doc_b"), col("pos").as("pb"), col("h")), Seq("doc_b", "h"))
    assert(matched.count() === 5L, "12-token run shares 5 overlapping 8-grams")
    // real corpus: every q204 pair gets a row; runs are bounded by the
    // shorter doc and consistent with the matched-gram mass
    val got = SpanDedup.sharedRunExplain(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val pairSet = graft.dedup.PrefixJoin.ppjoinPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.map(g => (g._1, g._2)).toSet === pairSet)
    got.foreach { case (a, b, grams, diags, longest) =>
      if (grams > 0L) {
        assert(diags >= 1L && longest >= SpanDedup.GramLen.toLong, s"pair ($a,$b)")
        assert(longest - SpanDedup.GramLen + 1 <= grams, s"pair ($a,$b) run vs mass")
      } else assert(diags === 0L && longest === 0L)
    }
    assert(got.exists(_._3 > 0L), "near-dup pairs should share 8-gram runs")
  }

  test("reshardAudit: rendezvous monotonicity holds exactly and beats mod-hash") {
    import graft.ops.Layout
    val r = Layout.reshardAudit(spark, dir).collect().head
    val (n, mv, mvNew, mvMod) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n > 0L)
    // THE rendezvous property: every moved doc moved to a NEW shard
    assert(mv === mvNew, "monotonicity: moves only onto new shards")
    assert(mv < mvMod, "rendezvous must churn less than mod-hash")
    // driver replay of the argmax assignment for a few docs
    def md5hex2(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def shard(id: Long, s: Int): Long =
      (0 until s).map(x => (md5hex2(s"$id:$x"), x.toLong)).max._2
    val assigns = Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("""array_max(transform(sequence(0, 9),
               |  x -> struct(md5(concat(cast(doc_id AS STRING), ':', cast(x AS STRING))) AS hkey,
               |              cast(x AS BIGINT) AS shard))).shard""".stripMargin))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assigns.take(25).foreach { case (id, s10) =>
      assert(s10 === shard(id, 10), s"doc $id rendezvous shard")
    }
  }

  test("greedyCoverage: submodular gains, exact accounting, distinct picks") {
    import graft.text.Curation
    val rows = Curation.greedyCoverage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.length === 20)
    // submodularity: marginal gains never increase
    rows.sliding(2).foreach {
      case Array((_, _, g1, _), (_, _, g2, _)) =>
        assert(g2 <= g1, "greedy marginal gains must be non-increasing")
      case _ =>
    }
    // coverage accounting: covered_types is the running sum of gains
    var cum = 0L
    rows.foreach { case (_, _, g, ct) => cum += g; assert(ct === cum) }
    // no document picked twice (its second gain would be 0 while others
    // remain positive at this corpus)
    assert(rows.map(_._2).distinct.length === rows.length)
    // the first pick is the argmax bigram-set size
    val first = Tables.documents(spark, dir)
      .select(col("doc_id"), expr(s"${graft.text.TextOps.TokensExpr}").as("t"))
      .select(col("doc_id"),
        expr("size(array_distinct(transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))))").as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .maxBy { case (id, n) => (n, -id) }
    assert(rows.head._2 === first._1 && rows.head._3 === first._2.toLong)
  }

  test("greedyCoverage: round plan is constant-size in |covered| (broadcast, not literal)") {
    import graft.text.Curation
    val sets = Tables.documents(spark, dir)
      .select(col("doc_id"), expr(s"${graft.text.TextOps.TokensExpr}").as("t"))
      .select(col("doc_id"), expr(
        """array_distinct(CASE WHEN size(t) >= 2
          |THEN transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))
          |ELSE array() END)""".stripMargin).as("s"))
    val bcEmpty = spark.sparkContext.broadcast(Set.empty[String])
    val bcBig = spark.sparkContext.broadcast(
      (0 until 50000).map(i => s"tok$i next$i").toSet)
    try {
      val pEmpty = Curation.roundNovel(sets, bcEmpty)
        .orderBy(col("gain").desc, col("doc_id").asc).limit(1)
        .queryExecution.analyzed.toString
      val pBig = Curation.roundNovel(sets, bcBig)
        .orderBy(col("gain").desc, col("doc_id").asc).limit(1)
        .queryExecution.analyzed.toString
      // the covered set travels as a broadcast variable inside the UDF
      // closure — a 50k-entry covered set must not change the plan text
      // at all (a plan literal would grow it by megabytes)
      assert(pEmpty.length === pBig.length,
        s"round plan grew with |covered|: ${pEmpty.length} -> ${pBig.length}")
      assert(!pBig.contains("tok17 next17"),
        "covered-set contents leaked into the plan as a literal")
      // and the round semantics are right under a non-empty covered set:
      // gain counts only NOT-covered bigrams
      val probe = Curation.roundNovel(sets, bcBig)
      val one = probe.orderBy(col("gain").desc, col("doc_id").asc)
        .limit(1).collect().head
      assert(one.getInt(1) === one.getSeq[String](2).length)
    } finally {
      bcEmpty.destroy(); bcBig.destroy()
    }
  }

  test("plan pins: span postings materialize once; pair joins never go cartesian") {
    import graft.dedup.{PrefixJoin, SpanDedup}
    // q202's lineage reads the postings through the session-memoized
    // cache — the q156 lesson: both the argmin groupBy and the removal
    // join must consume InMemoryTableScans, never re-derive the
    // tokenize→md5 chain as independent subtrees
    val rewritePlan = SpanDedup.substringDedup(spark, dir)
      .queryExecution.executedPlan.toString
    assert(rewritePlan.contains("InMemoryTableScan"),
      "span postings must be served from the memoized cache")
    // the explanation op shares the same cached postings
    val explainPlan = SpanDedup.sharedRunExplain(spark, dir)
      .queryExecution.executedPlan.toString
    assert(explainPlan.contains("InMemoryTableScan"))
    // candidate generation in the prefix joins is always an equi-join on
    // the element hash — a refactor that loses the join key would plan a
    // cartesian product and melt at scale
    for (df <- Seq(PrefixJoin.ppjoinPairs(spark, dir),
      PrefixJoin.containmentPairs(spark, dir))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), "pair join must stay keyed")
    }
  }

  test("classSeparability: per-label metrics replay from exact micro arithmetic") {
    import graft.vector.VectorOps
    val rows = VectorOps.classSeparability(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows.nonEmpty)
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long"),
        expr("transform(embedding, x -> cast(x as double))"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).map(x => math.floor(x * 1000000.0 + 0.5).toLong).toArray))
    val dims = vecs.head._3.length
    val byLabel = vecs.groupBy(_._2)
    val global = Array.tabulate(dims)(d => vecs.map(_._3(d)).sum)
    val ng = vecs.length.toLong
    byLabel.foreach { case (lab, vs) =>
      val n = vs.length.toLong
      val s = Array.tabulate(dims)(d => vs.map(_._3(d)).sum)
      val d2s = vs.map { case (_, _, xm) =>
        (0 until dims).map { d =>
          val dev = (xm(d) * n - s(d)).toDouble / (n.toDouble * 1000000.0)
          math.floor(1000000000.0 * dev * dev + 0.5).toLong
        }.sum / 1000L
      }
      val intra = d2s.sum / n
      val sep = (0 until dims).map { d =>
        val dev = (s(d) * ng - global(d) * n).toDouble / (n.toDouble * ng * 1000000.0)
        math.floor(1000000000.0 * dev * dev + 0.5).toLong
      }.sum / 1000L
      val (gn, gi, gs2, gf) = rows(lab)
      assert(gn === n && gi === intra && gs2 === sep, s"label $lab metrics")
      assert(gf === math.floor(1000000.0 * sep / intra + 0.5).toLong, s"label $lab fisher")
      assert(gi > 0L, s"label $lab compactness must be positive")
    }
  }

  test("ivfDrift: conservation, share accounting, and frozen-quantizer stability") {
    import graft.vector.VectorOps
    val rows = VectorOps.ivfDrift(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val nVecs = Tables.embeddings(spark, dir).count()
    // every vector lands in exactly one cell, on exactly one side
    assert(rows.map(r => r._2 + r._3).sum === nVecs)
    assert(rows.map(_._2).sum === math.min(250L, nVecs), "corpus side size")
    rows.foreach { case (cell, cn, fn, cm, fm, dm) =>
      assert(cell >= 0L && cell < 16L)
      assert(cm === math.floor(1000000.0 * cn / rows.map(_._2).sum + 0.5).toLong)
      assert(fm === math.floor(1000000.0 * fn / rows.map(_._3).sum + 0.5).toLong)
      assert(dm === math.abs(fm - cm))
    }
    // frozen-quantizer property: re-running must reproduce the same
    // assignment exactly (memoized quantizer; deterministic argmin)
    val again = VectorOps.ivfDrift(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(again.toSeq === rows.toSeq)
  }

  test("topSellerChurn: retained counts replay from exact monthly top-10 sets") {
    import graft.ops.Publisher
    val got = Publisher.topSellerChurn(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    val monthly = Tables.lineitem(spark, dir)
      .select(date_format(col("l_shipdate"), "yyyy-MM"), col("l_partkey"),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum).toMap
    val tops = monthly.keySet.map(_._1).map { m =>
      m -> monthly.collect { case ((`m`, p), q) => (p, q) }.toSeq
        .sortBy { case (p, q) => (-q, p) }.take(10).map(_._1).toSet
    }.toMap
    def nextMonth(m: String): String = {
      val Array(y, mo) = m.split("-").map(_.toInt)
      if (mo == 12) f"${y + 1}%04d-01" else f"$y%04d-${mo + 1}%02d"
    }
    got.foreach { case (m, (nTop, retained, churn)) =>
      assert(nTop === tops(m).size.toLong, s"$m top size")
      val prev = tops.keySet.find(p => nextMonth(p) == m)
      assert(prev.isDefined, s"$m must have a predecessor month")
      assert(retained === (tops(m) & tops(prev.get)).size.toLong, s"$m retained")
      assert(churn === math.floor(1000000.0 * (nTop - retained) / nTop + 0.5).toLong)
    }
    // every month except the first appears
    assert(got.size === tops.size - 1)
  }

  test("priceIndex: base month indexes at exactly 1.0 and replays from raw sums") {
    import graft.ops.Olap
    val got = Olap.priceIndex(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty)
    // the base month compared against itself is the identity index
    assert(got("1995-01")._2 === 1000000L, "base month must index at 1.0")
    // exact replay for a few months
    val raw = Tables.lineitem(spark, dir)
      .select(date_format(col("l_shipdate"), "yyyy-MM"), col("l_partkey"),
        expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(t => (t._1, t._2)).view
      .mapValues(rs => (rs.map(_._3).sum, rs.map(_._4).sum)).toMap
    def priceMicro(cents: Long, qty: Long): Long =
      math.floor(1000000.0 * cents / qty + 0.5).toLong
    val base = raw.collect { case ((m, p), (c, q)) if m == "1995-01" =>
      p -> ((q, priceMicro(c, q)))
    }.toMap
    got.keys.toSeq.sorted.take(5).foreach { m =>
      val matched = raw.collect { case ((`m`, p), (c, q)) if base.contains(p) =>
        (priceMicro(c, q), base(p)._1, base(p)._2)
      }
      val num = matched.map(t => t._1 * t._2).sum
      val den = matched.map(t => t._3 * t._2).sum
      val (gn, gi) = got(m)
      assert(gn === matched.size.toLong, s"$m basket size")
      assert(gi === math.floor(1000000.0 * num / den + 0.5).toLong, s"$m index")
    }
  }

  test("conditionalEntropy: chain rule bounds hold and terms replay exactly") {
    import graft.text.TextOps
    val got = TextOps.conditionalEntropy(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty)
    val bigrams = Tables.documents(spark, dir)
      .select(col("source"), lower(col("text"))).collect()
      .flatMap { r =>
        r.getString(1).trim.split("\\s+").toSeq.sliding(2)
          .filter(_.size == 2).map(p => (r.getString(0), p.head, p.mkString(" ")))
      }
    bigrams.groupBy(_._1).foreach { case (src, bs) =>
      val nb = bs.length.toLong
      val cAb = bs.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val cW1 = bs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val h = cAb.map { case (bg, c) =>
        val w1 = bg.split(" ").head
        math.floor(1000000000.0 * (c.toDouble / nb) *
          (-math.log(c.toDouble / cW1(w1))) + 0.5).toLong
      }.sum / 1000L
      val (gn, gh) = got(src)
      assert(gn === nb && gh === h, s"$src entropy")
      // conditional entropy is nonnegative and cannot exceed ln(vocab)
      assert(gh >= 0L && gh <= math.ceil(1000000.0 *
        math.log(bs.map(_._2).distinct.size.toDouble + 1)).toLong + cAb.size)
    }
  }

  test("substringDedup reconciles with dupSpans on the real corpus") {
    val audit = SpanDedup.dupSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getLong(5)))).toMap
    val rewrite = SpanDedup.substringDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    assert(audit.keySet === rewrite.keySet)
    val normFp = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(graft.text.TextOps.normText(col("text"))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    var removedTotal = 0L
    audit.keySet.foreach { d =>
      val (nToksA, nDup, dupToks) = audit(d)
      val (nToksR, nRemoved, fp) = rewrite(d)
      assert(nToksA === nToksR, s"doc $d token count")
      // removals mark a subset of the audited duplicated positions
      assert(nRemoved <= dupToks, s"doc $d removed beyond audited coverage")
      if (nDup === 0L) {
        assert(nRemoved === 0L, s"clean doc $d was rewritten")
        assert(fp === normFp(d), s"clean doc $d fingerprint drifted")
      }
      removedTotal += nRemoved
    }
    // the corpus actually exercises the rewrite path
    assert(removedTotal > 0L, "expected some duplicated text in the corpus")
  }
}
