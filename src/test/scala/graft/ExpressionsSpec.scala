package graft

import org.apache.spark.sql.functions._

/** Unit tests for the custom Catalyst expressions. */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot equals the sequential-left-fold HOF formulation bitwise") {
    val df = Seq(
      (Seq(1.5, -2.25, 3.125), Seq(0.5, 4.0, -1.75)),
      (Seq(0.1, 0.2, 0.3), Seq(0.7, 0.8, 0.9)))
      .toDF("a", "b")
    val out = df.select(
      expr("graft_dot(a, b)").as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)").as("hof"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("graft_dot handles empty arrays and nulls") {
    val out = spark.sql(
      "SELECT graft_dot(array(), array()), graft_dot(cast(null as array<double>), array(1.0d))")
      .collect().head
    assert(out.getDouble(0) === 0.0)
    assert(out.isNullAt(1))
  }

  test("graft_shingle_hashes returns distinct 3-gram hashes matching xxhash64 of the strings") {
    val df = Seq("The quick  brown fox jumps").toDF("text")
    val fast = df.select(expr("graft_shingle_hashes(text, 3)")).collect()
      .head.getSeq[Long](0).toSet
    // expected: xxhash64 (seed 42) of the lowercased space-joined 3-grams
    val slow = df.select(
      expr("""transform(sequence(0, size(split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' ')) - 3),
              i -> xxhash64(concat_ws(' ',
                     split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' ')[i],
                     split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' ')[i+1],
                     split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' ')[i+2]))
             )""")).collect().head.getSeq[Long](0).toSet
    assert(fast === slow)
    assert(fast.size === 3)
  }

  test("graft_shingle_hashes on short text returns empty array") {
    val out = Seq("one two").toDF("text")
      .select(expr("graft_shingle_hashes(text, 3)")).collect().head.getSeq[Long](0)
    assert(out.isEmpty)
  }

  test("graft_minhash_sig is deterministic, element-wise minimal, and sized") {
    val df = Seq(Seq(5L, 17L, 23L), Seq(5L)).toDF("hs")
    val sigs = df.select(expr("graft_minhash_sig(hs, 16)")).collect()
      .map(_.getSeq[Long](0))
    assert(sigs.forall(_.length === 16))
    // signature of a superset is element-wise <= the subset's
    sigs(0).zip(sigs(1)).foreach { case (sup, sub) => assert(sup <= sub) }
  }

  test("graft_minhash_sig identical sets -> identical signatures; jaccard-similar sets agree often") {
    val a = (1L to 100L).toSeq
    val b = (1L to 90L) ++ (200L to 209L) // J = 90/110 ≈ 0.82
    val df = Seq((a, b)).toDF("a", "b")
    val r = df.select(expr("graft_minhash_sig(a, 64)").as("sa"),
      expr("graft_minhash_sig(b, 64)").as("sb")).collect().head
    val sa = r.getSeq[Long](0); val sb = r.getSeq[Long](1)
    val agree = sa.zip(sb).count { case (x, y) => x == y }
    assert(agree >= 64 * 6 / 10) // E[agree] = 64·J ≈ 52
  }

  test("graft_simhash64 word bits equal the bit string, and match the declarative md5 formulation") {
    val df = Seq("spark table row join the a scan").toDF("text")
    val r = df.select(expr("graft_simhash64(text)").as("sh")).select("sh.*").collect().head
    val bits = r.getString(0); val word = r.getLong(1)
    assert(bits.length === 64)
    (0 until 64).foreach { i =>
      assert(((word >> i) & 1L) === (if (bits(i) == '1') 1L else 0L))
    }
    // cross-check against the declarative conv/md5 formulation (the
    // oracle's semantics) for the same text
    val slow = df.select(expr(
      """concat_ws('', transform(sequence(0, 63), i ->
           CASE WHEN aggregate(transform(split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' '), t -> md5(t)), 0L,
                  (acc, m) -> acc + 2L * ((cast(conv(substring(m, i div 4 + 1, 1), 16, 10) as int) >> (3 - i % 4)) & 1) - 1L
                ) > 0L THEN '1' ELSE '0' END))""")).collect().head.getString(0)
    assert(bits === slow)
  }

  test("graft_text_stats matches the HOF token statistics") {
    val df = Seq("The cat and  the dog", "").toDF("text")
    val out = df.select(expr("graft_text_stats(text)").as("st")).select("st.*").collect()
    assert(out(0).getLong(0) === 5L) // n_tokens
    assert(out(0).getLong(1) === 3L) // 'the' ×2 + 'and'
    assert(out(0).getLong(2) === 15L) // sum of token lengths (5 × 3)
  }

  test("graft_token_counts aggregates per-term frequencies exactly") {
    val df = Seq("The cat AND  the dog the").toDF("text")
    val out = df.select(explode(expr("graft_token_counts(text)")).as("tc"))
      .select("tc.term", "tc.tf").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("the" -> 3L, "cat" -> 1L, "and" -> 1L, "dog" -> 1L))
    // totals agree with graft_text_stats' token count on the same text
    val n = df.select(expr("graft_text_stats(text).n_tokens")).collect().head.getLong(0)
    assert(out.values.sum === n)
  }

  test("frame sampling covers offsets exactly and signatures match slices") {
    // text of length 33 -> frames = 1 + 33 % 16 = 2, frame_len = 16;
    // stride 1 samples both frames (the production default stride 4
    // samples only frame 0 of short payloads)
    val text = "abcdefghijklmnopqrstuvwxyz0123456" // 33 ascii chars
    val rows = graft.multimodal.Multimodal
      .frameSampleCore(Seq((7L, text)).toDF("doc_id", "text"), stride = 1)
      .orderBy("frame_idx").collect()
    def md5Of(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.length === 2)
    // (doc_id, frame_idx, frames, frame_off, frame_sig)
    assert(rows(0).getLong(1) === 0L && rows(0).getLong(3) === 0L)
    assert(rows(0).getString(4) === md5Of(text.substring(0, 16)))
    assert(rows(1).getLong(1) === 1L && rows(1).getLong(3) === 16L)
    assert(rows(1).getString(4) === md5Of(text.substring(16, 32)))
  }
}
