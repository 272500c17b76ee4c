package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, plus a decode/feature-extract stage.
  *
  * Decode is REAL in both image tiers. Uncompressed: [[bmpFeatures]]
  * builds standard 24-bpp BMP payloads and parses them back byte-by-byte
  * with [[BmpCodec]] (little-endian headers, BGR channel order,
  * bottom-up rows, 4-byte row padding), oracle-verified end to end.
  * Compressed: [[pngFeatures]] (lossless → oracle-exact) and
  * [[jpegDrift]] (lossy → bound-gated) round-trip through the JDK's own
  * `javax.imageio` codecs via [[ImageIoCodec]] — the round-12 probe
  * showed JPEG/PNG/TIFF/GIF/BMP readers ship with this JRE, retiring the
  * old fake-decode stub. Only compressed AUDIO/VIDEO (MP3/AAC/H.264)
  * remain genuinely absent from the JVM (javax.sound.sampled speaks
  * WAV/AU/AIFF only — probe in COVERAGE.md); those formats keep the
  * typed-metadata tier ([[binaryMeta]]) without pixel/sample decode.
  *
  * Scale design: payload bytes travel as a single binary column next to
  * columnar metadata, so metadata-only queries never touch the payload
  * (parquet column pruning); decode runs as a narrow per-partition stage
  * (mapPartitions — the Scala analog of arrow-batched mapInPandas),
  * which is where a real codec (JNI/library) would be invoked batch-wise.
  */
object Multimodal {

  /** Typed metadata + payload over binary content (here: utf8 bytes of
    * `documents.text` standing in for an image payload). Deterministic
    * "media" attributes are derived arithmetically so the oracle can
    * verify the full plumbing. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("text"),
        col("text").cast("binary").as("payload"),
        col("source"))
      .select(
        col("doc_id"),
        col("source"),
        octet_length(col("payload")).cast("long").as("byte_len"),
        md5(col("payload")).as("content_md5"),
        // substring the TEXT (characters) then encode — matches the
        // oracle's hex(encode(substring(text,1,8))) even for multi-byte
        // UTF-8; substring on the BINARY payload would slice 8 BYTES and
        // could split a codepoint
        hex(substring(col("text"), 1, 8).cast("binary")).as("head_hex"),
        (lit(64) + octet_length(col("payload")) % 512).cast("long").as("width"),
        (lit(64) + (octet_length(col("payload")) * 7) % 512).cast("long").as("height"),
        (lit(1) + octet_length(col("payload")) % 16).cast("long").as("frames"))
      .orderBy("doc_id")

  /** Frame sampling over the binary payload: the video-pipeline step
    * that materializes every `stride`-th frame as (index, byte offset,
    * content signature) rows. Frame count/geometry come from the typed
    * metadata ([[binaryMeta]]'s deterministic fake decode); the sampled
    * slice is fingerprinted so downstream dedup/embedding stages key on
    * frame content. One explode per payload — narrow, no shuffle; a real
    * decoder would emit pixel tensors from the same per-frame offsets.
    * Slices are taken on the text (the corpus is pure ASCII, so char
    * offsets == byte offsets — asserted by the oracle compare, whose
    * `byte_len` is octet-based while slicing is char-based). */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 4): DataFrame =
    frameSampleCore(Tables.documents(spark, dir), stride)
      .orderBy("doc_id", "frame_idx")

  /** Core of [[frameSample]] over any (doc_id, text) frame — split out so
    * tests drive the PRODUCTION expressions on literal rows. */
  def frameSampleCore(docs: DataFrame, stride: Int): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        octet_length(col("text").cast("binary")).cast("long").as("byte_len"))
      .withColumn("frames", (lit(1) + col("byte_len") % 16).cast("long"))
      .withColumn("frame_len", expr("byte_len div frames"))
      .select(col("doc_id"), col("text"), col("frames"), col("frame_len"),
        explode(expr(s"sequence(0L, frames - 1L, ${stride}L)")).as("frame_idx"))
      .select(
        col("doc_id"),
        col("frame_idx"),
        col("frames"),
        (col("frame_idx") * col("frame_len")).as("frame_off"),
        md5(expr("substring(text, cast(frame_idx * frame_len + 1 as int), cast(frame_len as int))"))
          .as("frame_sig"))

  case class BmpDoc(doc_id: Long, payload: Array[Byte])
  case class BmpFeatureRow(doc_id: Long, width: Long, height: Long,
                           bpp: Long, n_pixels: Long, px_sum: Long,
                           corner_px: Long)

  /** REAL image decode over a binary column: each document gets a
    * genuine 24-bpp BMP payload (geometry and pixel content derived
    * deterministically from doc attributes, since the corpus ships no
    * native images), which [[BmpCodec.decode]] then parses back from the
    * raw bytes — magic, little-endian header fields, padded bottom-up
    * BGR rows. The features are integers the DuckDB oracle recomputes
    * from the same generation arithmetic, so a decoder bug anywhere
    * (channel order, row order, padding, header offsets) breaks the
    * hash: `px_sum` is the blue-channel sum and `corner_px` the image
    * top-left blue value, which bottom-up storage places in the LAST
    * file row. Both codec halves run inside `mapPartitions` — the
    * batch-per-task shape a JNI codec would use; nothing on the driver.
    */
  def bmpFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val params = Tables.documents(spark, dir)
      .select(col("doc_id"), octet_length(col("text")).cast("int").as("len"))
      // spread the tiny (id, len) frame across every core BEFORE the
      // codec pass: the sf parquet is one input split, and decode is
      // embarrassingly parallel CPU — the shuffle moves ~12 bytes/row
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)]
    val encoded = params.mapPartitions { it =>
      it.map { case (id, len) =>
        val w = 1 + len % 32
        val h = 1 + (len * 7) % 24
        BmpDoc(id, BmpCodec.encode(w, h, (x, y) => {
          val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
          (v, (v + 1) % 256, (v + 2) % 256) // distinct channels: BGR
        }))                                 // order bugs shift px_sum
      }
    }
    encoded.mapPartitions { it =>
      it.map { d =>
        val dec = BmpCodec.decode(d.payload)
        BmpFeatureRow(d.doc_id, dec.width.toLong, dec.height.toLong,
          dec.bpp.toLong, dec.nPixels, dec.pxSum, dec.cornerPx.toLong)
      }
    }.toDF().orderBy("doc_id")
  }

  case class AHashRow(doc_id: Long, width: Long, height: Long,
                      ahash_hi: Long, ahash_lo: Long)

  /** q209 — perceptual image hash (aHash family) over the REAL BMP
    * decode path + exact-duplicate grouping: each document's 24-bpp BMP
    * (the q128 generator) round-trips through [[BmpCodec]], the decoded
    * blue plane is nearest-neighbor resampled to an 8×8 grid, and each
    * cell thresholds against the integer mean of the 64 samples —
    * a 64-bit perceptual fingerprint, split hi/lo into two BIGINTs so
    * neither engine touches the 2⁶³ sign bit. Identical-hash groups are
    * the image-level duplicate clusters (the multimodal analog of q23's
    * exact text dedup; Hamming-near pairs would reuse the q26/q34
    * pigeonhole blocking on the same fingerprints).
    *
    * The oracle recomputes the grid from the GENERATOR arithmetic while
    * this path reads pixels through the codec round trip — any decoder
    * bug (channel order, bottom-up rows, padding, header offsets) makes
    * the sampled values, and therefore the hash, diverge.
    *
    * Scale: hashing is per-row inside `mapPartitions` (batch-per-task,
    * nothing on the driver); the duplicate grouping is one partial-agg
    * shuffle on the 64-bit hash plus a same-key join back. */
  /** Memoized per-doc aHash fingerprints (doc_id, width, height,
    * ahash_hi, ahash_lo) — shared by the dup-grouping (q209) and the
    * Hamming-near pair join (q210). */
  private[graft] def imageHashes(spark: SparkSession, dir: String): DataFrame =
    Tables.memoCache(spark,
      s"image-ahash/${Tables.pathFingerprint(spark, s"$dir/documents.parquet")}") {
      import spark.implicits._
      val params = Tables.documents(spark, dir)
        .select(col("doc_id"), octet_length(col("text")).cast("int").as("len"))
        .repartition(spark.sparkContext.defaultParallelism)
        .as[(Long, Int)]
      params.mapPartitions { it =>
        it.map { case (id, len) =>
          val w = 1 + len % 32
          val h = 1 + (len * 7) % 24
          val payload = BmpCodec.encode(w, h, (x, y) => {
            val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
            (v, (v + 1) % 256, (v + 2) % 256)
          })
          val (dw, dh, blue) = BmpCodec.bluePlane(payload)
          val cells = for (gy <- 0 until 8; gx <- 0 until 8)
            yield blue(gx * dw / 8, gy * dh / 8)
          val mean = cells.map(_.toLong).sum / 64
          var hi = 0L; var lo = 0L
          cells.zipWithIndex.foreach { case (v, i) =>
            if (v >= mean) {
              if (i >= 32) hi |= 1L << (i - 32) else lo |= 1L << i
            }
          }
          AHashRow(id, dw.toLong, dh.toLong, hi, lo)
        }
      }.toDF()
    }

  def imagePHash(spark: SparkSession, dir: String): DataFrame = {
    val hashed = imageHashes(spark, dir)
    val grp = hashed.groupBy("ahash_hi", "ahash_lo")
      .agg(count(lit(1)).as("group_n"))
    hashed.join(grp, Seq("ahash_hi", "ahash_lo"))
      .select(col("doc_id"), col("width"), col("height"),
        col("ahash_hi"), col("ahash_lo"), col("group_n"))
      .orderBy("doc_id")
  }

  /** q210 — Hamming-near image pairs over the q209 fingerprints: pairs
    * whose 64-bit aHashes differ in ≤ 3 bits (re-encoded/resized
    * variants of one image land a few bits apart; exact dups are
    * Hamming 0). Same pigeonhole blocking as q34's simhash pairs: the
    * hash splits into 4 disjoint 16-bit bands, and a ≤ 3-bit difference
    * leaves at least one band untouched, so the band-bucket self-join
    * proposes every qualifying pair; popcount-verify on candidates. The
    * hash never travels as a packed 64-bit word — hi/lo stay separate
    * so neither engine's signed BIGINT sees the 2⁶³ bit. */
  def imageHammingPairs(spark: SparkSession, dir: String,
                        maxHamming: Int = 3): DataFrame = {
    val banded = imageHashes(spark, dir)
      .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"),
        explode(expr(
          """transform(sequence(0, 3),
            |  b -> struct(b AS band_idx,
            |              CASE WHEN b < 2 THEN shiftright(ahash_lo, b * 16) & 65535
            |                   ELSE shiftright(ahash_hi, (b - 2) * 16) & 65535
            |              END AS band_key))""".stripMargin)).as("band"))
      .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"),
        col("band.band_idx"), col("band.band_key"))
    val l = banded.as("l"); val r = banded.as("r")
    l.join(r,
        col("l.band_idx") === col("r.band_idx") &&
          col("l.band_key") === col("r.band_key") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        expr("""CAST(bit_count(l.ahash_hi ^ r.ahash_hi)
               |   + bit_count(l.ahash_lo ^ r.ahash_lo) AS BIGINT)""".stripMargin
          .replace("\n", "")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("doc_a", "doc_b")
      .orderBy("doc_a", "doc_b")
  }

  case class WavDoc(doc_id: Long, payload: Array[Byte])
  case class WavWindowRow(doc_id: Long, win_idx: Long, win_n: Long,
                          win_sumsq: Long, win_peak: Long, rms_milli: Long)

  /** Audio tier of the REAL (codec-less-parseable) decode path: each
    * doc's characters synthesize a mono 16-bit PCM WAV payload
    * (sample = (charCode − 96)·256 — the corpus is pure ASCII, the same
    * char≡byte premise [[frameSample]]'s oracle already pins), which is
    * then parsed back byte-by-byte by [[WavCodec]] (RIFF headers,
    * little-endian int16 samples) and reduced to per-window energy
    * features: sum-of-squares, peak, RMS — the VAD/loudness profile an
    * audio ingest pipeline computes before segmenting. Both codec
    * halves run inside `mapPartitions` (the batch-per-task shape a JNI
    * codec would use); the window explode is narrow, nothing shuffles
    * until the display sort.
    *
    * Determinism: `win_sumsq`/`win_peak` are EXACT integer sums of
    * int16 squares (≤ 2³⁰ per sample, ≤ 2³⁶ per window — no overflow,
    * no float accumulation); `rms_milli` is one sqrt over exact
    * operands, identically rounded in both engines. */
  def wavEnergy(spark: SparkSession, dir: String,
                winSize: Int = 64, sampleRate: Int = 44100): DataFrame = {
    import spark.implicits._
    val encoded = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val samples = new Array[Short](text.length)
          var i = 0
          while (i < text.length) {
            samples(i) = ((text.charAt(i).toInt - 96) * 256).toShort
            i += 1
          }
          WavDoc(id, WavCodec.encode(sampleRate, samples))
        }
      }
    encoded.mapPartitions { it =>
      it.flatMap { d =>
        val dec = WavCodec.decode(d.payload)
        dec.samples.grouped(winSize).zipWithIndex.map { case (win, wi) =>
          var sumsq = 0L
          var peak = 0L
          win.foreach { s =>
            sumsq += s.toLong * s.toLong
            if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
          }
          WavWindowRow(d.doc_id, wi.toLong, win.length.toLong, sumsq, peak,
            math.floor(1000.0 * math.sqrt(sumsq.toDouble / win.length) + 0.5).toLong)
        }
      }
    }.toDF().orderBy("doc_id", "win_idx")
  }

  case class WavSpectralRow(doc_id: Long, win_idx: Long, win_n: Long,
                            dc_pow: Long, quarter_pow: Long, nyq_pow: Long,
                            hf_ratio_micro: Long)

  /** q237 — windowed SPECTRAL features on the WAV path (the r9 stretch:
    * q179's time-domain energy extended to frequency bins, feeding the
    * vector stack): per 64-sample window, the exact DFT-bin energies at
    * the three frequencies whose twiddle factors are INTEGERS — DC
    * (k = 0), fs/4 (k = N/4) and Nyquist (k = N/2):
    *
    *   - k = 0:   X = Σ xₙ                    → dc_pow   = X²
    *   - k = N/4: e^{−iπn/2} cycles {1,−i,−1,i}, so
    *              re = Σ_{n≡0(4)} xₙ − Σ_{n≡2(4)} xₙ,
    *              im = Σ_{n≡3(4)} xₙ − Σ_{n≡1(4)} xₙ → quarter_pow = re² + im²
    *   - k = N/2: X = Σ (−1)ⁿ xₙ              → nyq_pow  = X²
    *
    * This is Goertzel evaluated exactly: at these bins cos(2πk/N) ∈
    * {0, ±1}, so the recurrence's state stays integral and no float ever
    * enters the accumulation — the determinism contract the exact-hash
    * oracle needs (a general-k Goertzel would accumulate rounded
    * cosines and could differ between engines in the last bit).
    * `hf_ratio_micro` (the high-frequency share — quarter + Nyquist
    * over total binned power, micro-rounded) is the one derived float,
    * rounded identically in both engines; it is the voiced/unvoiced-
    * style balance feature an audio curation pipeline thresholds on.
    *
    * Bounds: |sample| ≤ 2¹⁵, window = 64 → each bin sum |X| ≤ 2²¹,
    * each power ≤ 2⁴², their sum ≤ 2⁴⁴ — exact in BIGINT everywhere.
    * Scale: same shape as [[wavEnergy]] — both codec halves inside
    * `mapPartitions`, the window flatMap narrow, nothing shuffles until
    * the display sort. */
  def wavSpectral(spark: SparkSession, dir: String,
                  winSize: Int = 64, sampleRate: Int = 44100): DataFrame = {
    import spark.implicits._
    val encoded = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val samples = new Array[Short](text.length)
          var i = 0
          while (i < text.length) {
            samples(i) = ((text.charAt(i).toInt - 96) * 256).toShort
            i += 1
          }
          WavDoc(id, WavCodec.encode(sampleRate, samples))
        }
      }
    spectralCore(encoded, winSize).orderBy("doc_id", "win_idx")
  }

  /** The decode + exact-bin reduction over any WAV payload set (spec
    * hook: synthetic pure tones pin the bin algebra — a DC ramp, an
    * fs/4 tone and a Nyquist square each land ALL their binned energy
    * in exactly their own bin). */
  private[graft] def spectralCore(
      encoded: org.apache.spark.sql.Dataset[WavDoc], winSize: Int): DataFrame = {
    import encoded.sparkSession.implicits._
    encoded.mapPartitions { it =>
      it.flatMap { d =>
        val dec = WavCodec.decode(d.payload)
        dec.samples.grouped(winSize).zipWithIndex.map { case (win, wi) =>
          var dc = 0L; var nyq = 0L; var reQ = 0L; var imQ = 0L
          var n = 0
          while (n < win.length) {
            val s = win(n).toLong
            dc += s
            nyq += (if ((n & 1) == 0) s else -s)
            (n & 3) match {
              case 0 => reQ += s
              case 2 => reQ -= s
              case 1 => imQ -= s
              case _ => imQ += s
            }
            n += 1
          }
          val dcPow = dc * dc
          val qPow = reQ * reQ + imQ * imQ
          val nyqPow = nyq * nyq
          val tot = dcPow + qPow + nyqPow
          val hf = if (tot == 0L) 0L
            else math.floor(1000000.0 * (qPow + nyqPow).toDouble / tot + 0.5).toLong
          WavSpectralRow(d.doc_id, wi.toLong, win.length.toLong,
            dcPow, qPow, nyqPow, hf)
        }
      }
    }.toDF()
  }

  /** q238 — spectral k-NN: the vector-stack hookup the WAV path was
    * built toward (documents → PCM → exact DFT bins → per-doc feature →
    * nearest neighbors). Each doc's windows fold into a 3-dim SPECTRAL
    * SHAPE vector — the micro-rounded shares of total binned power in
    * the DC / fs-4 / Nyquist bins — and the query doc's top-k cosine
    * neighbors are returned, exactly the [[graft.vector.VectorOps
    * .cosineTopK]] (q27) contract on audio-derived features.
    *
    * Determinism: shares are exact BIGINT (power sums ≤ 2⁴⁹ convert to
    * double exactly; multiply-then-divide in the same order as the
    * oracle before the micro round), so every cosine's numerator is an
    * EXACT integer ≤ 3·10¹² and the denominator a product of sqrts
    * over exact operands — both engines produce bit-identical doubles,
    * no epsilon anywhere. Zero-power docs (no binned energy) are
    * excluded on both sides rather than dividing by zero.
    *
    * Scale: feature extraction is the q237 narrow map + one partial-agg
    * shuffle keyed by doc; the search is a broadcast-query linear scan
    * (one pass, no shuffle) — at corpus scale the same 3-dim feature
    * drops into the IVF path (q35/q232) unchanged. */
  def spectralKnn(spark: SparkSession, dir: String,
                  queryId: Long = 0L, k: Int = 10): DataFrame = {
    val t = col("sd") + col("sq") + col("sn")
    def share(c: org.apache.spark.sql.Column) =
      when(t === 0L, 0L)
        .otherwise(floor(lit(1000000.0) * c / t + lit(0.5)).cast("long"))
    val feats = wavSpectral(spark, dir)
      .groupBy("doc_id")
      .agg(sum("dc_pow").as("sd"), sum("quarter_pow").as("sq"),
        sum("nyq_pow").as("sn"))
      .select(col("doc_id"), share(col("sd")).as("f_dc"),
        share(col("sq")).as("f_q"), share(col("sn")).as("f_ny"))
      .filter(col("f_dc") * col("f_dc") + col("f_q") * col("f_q")
        + col("f_ny") * col("f_ny") > 0L)
    val q = feats.filter(col("doc_id") === queryId)
      .select(col("f_dc").as("q_dc"), col("f_q").as("q_q"),
        col("f_ny").as("q_ny"))
    feats.filter(col("doc_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("doc_id"),
        ((col("f_dc") * col("q_dc") + col("f_q") * col("q_q")
          + col("f_ny") * col("q_ny")) /
          (sqrt(col("f_dc") * col("f_dc") + col("f_q") * col("f_q")
            + col("f_ny") * col("f_ny")) *
            sqrt(col("q_dc") * col("q_dc") + col("q_q") * col("q_q")
              + col("q_ny") * col("q_ny")))).as("cos"))
      .orderBy(col("cos").desc, col("doc_id").asc)
      .limit(k)
  }

  case class ImgDoc(doc_id: Long, payload: Array[Byte])
  case class PngFeatureRow(doc_id: Long, width: Long, height: Long,
                           n_pixels: Long, r_sum: Long, g_sum: Long,
                           b_sum: Long, corner_r: Long)

  /** q259 — REAL compressed-image decode (PNG via the JDK's own
    * `javax.imageio` codec — the round that retired the old fake-decode
    * stub): each document gets a genuine PNG payload (geometry and pixel
    * content derived deterministically from doc attributes, the q128 BMP
    * generator's pattern), which [[ImageIoCodec.decode]] then parses
    * back from the compressed bytes — signature, IDAT inflate, filter
    * reconstruction, all inside the codec. PNG is LOSSLESS, so the
    * per-channel pixel sums and the top-left red value are oracle-EXACT:
    * DuckDB recomputes them from the generator arithmetic while this
    * path reads them through a real zlib/PNG decode; any codec-plumbing
    * bug (channel order, row orientation, color-model mismatch) breaks
    * the hash.
    *
    * Scale: both codec halves run inside `mapPartitions` (batch-per-task,
    * nothing on the driver, one image in flight per task thread); the
    * payload bytes never shuffle — only the k-column feature row does. */
  def pngFeatures(spark: SparkSession, dir: String): DataFrame =
    losslessFeatures(spark, dir, "png")

  /** q274 — the SAME lossless decode contract through the TIFF byte
    * path: identical generator, identical features, a different codec
    * on the wire (TIFF directory structures + strip layout vs PNG's
    * zlib filters). Registered against the SAME oracle SQL as q259 —
    * lossless means format choice must be output-invariant, and the
    * shared oracle makes that an executable statement. */
  def tiffFeatures(spark: SparkSession, dir: String): DataFrame =
    losslessFeatures(spark, dir, "tiff")

  /** q276 — the lossless decode contract through the GIF byte path
    * (palette-indexed LZW on the wire), completing the format-invariance
    * statement for every still-image codec this JRE ships. Lossless
    * holds under two conditions this path pins: (a) ≤256 distinct
    * colors — guaranteed because the generator derives all three
    * channels from one byte-valued parameter — and (b) NON-INTERLACED
    * output, because the JDK GIF writer's interlaced default corrupts
    * rows at heights 2–4 ([[ImageIoCodec.encodeLossless]]'s probe
    * note). Shares q259's oracle: same generator, same features, third
    * codec. */
  def gifFeatures(spark: SparkSession, dir: String): DataFrame =
    losslessFeatures(spark, dir, "gif")

  private def losslessFeatures(spark: SparkSession, dir: String,
                               format: String): DataFrame = {
    import spark.implicits._
    val params = Tables.documents(spark, dir)
      .select(col("doc_id"), octet_length(col("text")).cast("int").as("len"))
      // spread the tiny (id, len) frame across every core BEFORE the
      // codec pass: the sf parquet is one input split, and decode is
      // embarrassingly parallel CPU — the shuffle moves ~12 bytes/row
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)]
    val encoded = params.mapPartitions { it =>
      it.map { case (id, len) =>
        val w = 1 + len % 32
        val h = 1 + (len * 7) % 24
        ImgDoc(id, ImageIoCodec.encodeLossless(format, w, h, (x, y) => {
          val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
          (v, (v + 1) % 256, (v + 2) % 256) // distinct channels: RGB
        }))                                 // order bugs shift the sums
      }
    }
    encoded.mapPartitions { it =>
      it.map { d =>
        val dec = ImageIoCodec.decode(d.payload)
        var rs = 0L; var gs = 0L; var bs = 0L
        var y = 0
        while (y < dec.height) {
          var x = 0
          while (x < dec.width) {
            rs += dec.r(x, y); gs += dec.g(x, y); bs += dec.b(x, y)
            x += 1
          }
          y += 1
        }
        PngFeatureRow(d.doc_id, dec.width.toLong, dec.height.toLong,
          dec.width.toLong * dec.height, rs, gs, bs, dec.r(0, 0).toLong)
      }
    }.toDF().orderBy("doc_id")
  }

  case class FrameRow(doc_id: Long, frame_idx: Long, width: Long,
                      height: Long, r_sum: Long, g_sum: Long, b_sum: Long)

  /** q279 — REAL multi-frame decode + frame SAMPLING: each document
    * gets an ANIMATED GIF (2–10 full frames, per-frame pixels from the
    * generator with a frame term) and only every `stride`-th frame is
    * decoded and featurized — the video-tier shape (decode frame k of
    * n, skip the rest) through the one multi-frame codec this JRE
    * ships, upgrading q58's synthetic frame sampler to real compressed
    * bytes. Per-frame round trips are pixel-exact (the q276
    * non-interlaced contract), so the sampled features are
    * oracle-EXACT: DuckDB replays the generator over the sampled
    * (frame, x, y) lattice while this path reads them through the
    * codec's LZW frame sequence — a frame-indexing bug (off-by-one,
    * disposal compositing, wrong frame count) breaks the hash.
    *
    * Same `mapPartitions` batch shape as [[pngFeatures]]; unsampled
    * frames are never pixel-decoded. */
  /** Default frame-sampling stride — interpolated into q279's oracle
    * SQL (advisor r13: shared constant, not a twice-written literal). */
  private[graft] val GifDefaultStride = 3

  def gifFrameSample(spark: SparkSession, dir: String,
                     stride: Int = GifDefaultStride): DataFrame = {
    import spark.implicits._
    val params = Tables.documents(spark, dir)
      .select(col("doc_id"), octet_length(col("text")).cast("int").as("len"))
      // spread the tiny (id, len) frame across every core BEFORE the
      // codec pass: the sf parquet is one input split, and decode is
      // embarrassingly parallel CPU — the shuffle moves ~12 bytes/row
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)]
    params.mapPartitions { it =>
      it.flatMap { case (id, len) =>
        val w = 1 + len % 16
        val h = 1 + (len * 5) % 12
        val nFrames = 2 + len % 9
        val bytes = ImageIoCodec.encodeGifFrames(w, h, nFrames, (f, x, y) => {
          val v = ((id * 31 + f * 17 + x * 7 + y * 13) % 256).toInt
          (v, (v + 1) % 256, (v + 2) % 256)
        })
        val sampled = (0 until nFrames).filter(_ % stride == 0)
        ImageIoCodec.decodeGifFrames(bytes, sampled).map { case (f, dec) =>
          var rs = 0L; var gs = 0L; var bs = 0L
          var y = 0
          while (y < dec.height) {
            var x = 0
            while (x < dec.width) {
              rs += dec.r(x, y); gs += dec.g(x, y); bs += dec.b(x, y)
              x += 1
            }
            y += 1
          }
          FrameRow(id, f.toLong, dec.width.toLong, dec.height.toLong,
            rs, gs, bs)
        }
      }
    }.toDF().orderBy("doc_id", "frame_idx")
  }

  case class ResizeRow(doc_id: Long, width: Long, height: Long,
                       r_sum: Long, g_sum: Long, b_sum: Long)

  /** q280 — REAL decode + nearest-neighbor RESIZE to a fixed (16×12)
    * feature geometry: the preprocessing step every image pipeline
    * runs before batching tensors (uniform shape), here through a real
    * PNG round trip (q259's payloads) followed by the deterministic
    * integer-mapped NN kernel ([[ImageIoCodec.resizeNearest]]). The
    * oracle replays the source-index arithmetic (sx = x·w div 16,
    * sy = y·h div 12 — floor division on non-negatives, identical in
    * both engines) against the generator, so a kernel bug (rounding
    * mode, axis swap, row-major confusion) breaks the hash. */
  def resizedFeatures(spark: SparkSession, dir: String,
                      outW: Int = 16, outH: Int = 12): DataFrame = {
    import spark.implicits._
    val params = Tables.documents(spark, dir)
      .select(col("doc_id"), octet_length(col("text")).cast("int").as("len"))
      // spread the tiny (id, len) frame across every core BEFORE the
      // codec pass: the sf parquet is one input split, and decode is
      // embarrassingly parallel CPU — the shuffle moves ~12 bytes/row
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)]
    params.mapPartitions { it =>
      it.map { case (id, len) =>
        val w = 1 + len % 32
        val h = 1 + (len * 7) % 24
        val bytes = ImageIoCodec.encodePng(w, h, (x, y) => {
          val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
          (v, (v + 1) % 256, (v + 2) % 256)
        })
        val dec = ImageIoCodec.resizeNearest(ImageIoCodec.decode(bytes),
          outW, outH)
        var rs = 0L; var gs = 0L; var bs = 0L
        var y = 0
        while (y < dec.height) {
          var x = 0
          while (x < dec.width) {
            rs += dec.r(x, y); gs += dec.g(x, y); bs += dec.b(x, y)
            x += 1
          }
          y += 1
        }
        ResizeRow(id, dec.width.toLong, dec.height.toLong, rs, gs, bs)
      }
    }.toDF().orderBy("doc_id")
  }

  case class QuarantineRow(doc_id: Long, status: String, reason: String,
                           width: Option[Long], height: Option[Long],
                           r_sum: Option[Long], g_sum: Option[Long],
                           b_sum: Option[Long])

  /** q275 — decode-or-QUARANTINE over a payload set with planted
    * corruption: the ingest-hardening face of the compressed tier. At
    * 100 TB corrupt payloads are a certainty, and q259's throw-on-bad-
    * bytes contract (right for generated fixtures) would kill the job;
    * this operator routes every payload through
    * [[ImageIoCodec.decodeOrReason]] and emits (status, reason) plus
    * the decoded features for the healthy rows — the row shape a
    * quarantine sink and a retry queue both consume.
    *
    * Corruption is PLANTED deterministically so the whole table is
    * hash-verifiable: docs with id % 11 == 3 get their 8 signature
    * bytes zeroed (no reader claims them → 'unrecognized'); id % 11
    * == 7 get truncated to half (the PNG reader claims the payload,
    * then dies mid-IDAT → 'decode_error'); everything else decodes to
    * the exact q259 feature row. The oracle replays the id rule and
    * the generator arithmetic — a misrouted reason, a swallowed
    * failure, or a feature drift all break the hash.
    *
    * Same `mapPartitions` batch shape as [[pngFeatures]]; quarantined
    * rows carry NULL features, never zero-fills (a zero-filled sum is
    * indistinguishable from a black image downstream). */
  def decodeOrQuarantine(spark: SparkSession, dir: String): DataFrame =
    decodeGate(corruptedPayloads(spark, dir)).orderBy("doc_id")

  /** The q275 fixture set: q259's PNG payloads with corruption planted
    * by the id rule (zeroed signature / half truncation). */
  private[graft] def corruptedPayloads(spark: SparkSession,
                                       dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), octet_length(col("text")).cast("int").as("len"))
      // spread the tiny (id, len) frame across every core BEFORE the
      // codec pass: the sf parquet is one input split, and decode is
      // embarrassingly parallel CPU — the shuffle moves ~12 bytes/row
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)]
      .mapPartitions { it =>
        it.map { case (id, len) =>
          val w = 1 + len % 32
          val h = 1 + (len * 7) % 24
          val good = ImageIoCodec.encodeLossless("png", w, h, (x, y) => {
            val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
            (v, (v + 1) % 256, (v + 2) % 256)
          })
          val payload = (id % 11) match {
            case 3 =>
              val b = good.clone(); java.util.Arrays.fill(b, 0, 8, 0.toByte); b
            case 7 => java.util.Arrays.copyOf(good, good.length / 2)
            case _ => good
          }
          (id, payload)
        }
      }.toDF("doc_id", "payload")
  }

  /** Decode-or-route core over ANY (doc_id, payload binary) frame —
    * a STATELESS narrow map, so the identical code is the q275 batch
    * query and the streaming ingest stage (StreamingSpec drives it
    * over a MemoryStream and pins row-for-row agreement with this
    * batch face): the third ingest gate beside the text near-dup gate
    * and the vector ANN gate, guarding the PAYLOAD store. */
  def decodeGate(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          ImageIoCodec.decodeOrReason(payload) match {
            case Left(reason) =>
              QuarantineRow(id, "quarantined", reason,
                None, None, None, None, None)
            case Right(dec) =>
              var rs = 0L; var gs = 0L; var bs = 0L
              var y = 0
              while (y < dec.height) {
                var x = 0
                while (x < dec.width) {
                  rs += dec.r(x, y); gs += dec.g(x, y); bs += dec.b(x, y)
                  x += 1
                }
                y += 1
              }
              QuarantineRow(id, "decoded", "ok", Some(dec.width.toLong),
                Some(dec.height.toLong), Some(rs), Some(gs), Some(bs))
          }
        }
      }.toDF()
  }

  case class JpegDriftRow(doc_id: Long, width: Long, height: Long,
                          geom_ok: Boolean, mae_milli: Long, max_err: Long)

  /** q260 — JPEG decode-drift audit: the LOSSY half of the compressed
    * tier. Each doc's smooth-gradient image (no mod-256 wraps — the
    * generator keeps every channel strictly inside [32, 211], so there
    * are no synthetic sharp edges for the DCT to ring on) encodes to
    * JPEG at quality 0.9 and decodes back through the same
    * `javax.imageio` codec; the row reports the decoded geometry and the
    * mean/max absolute per-channel error against the generated pixels —
    * the "how much did compression move my pixels" audit an image
    * curation pipeline runs before trusting JPEG-derived features.
    *
    * JPEG pixel values are codec-defined (IDCT variant, rounding), so
    * this query is bound-gated, not hash-compared: SketchBounds holds
    * geometry drift to ZERO and the worst per-image MAE / single-channel
    * error to the smooth-gradient envelope measured for this codec.
    * Same `mapPartitions` batch shape as [[pngFeatures]]. */
  def jpegDrift(spark: SparkSession, dir: String,
                quality: Float = 0.9f): DataFrame = {
    import spark.implicits._
    val params = Tables.documents(spark, dir)
      .select(col("doc_id"), octet_length(col("text")).cast("int").as("len"))
      // spread the tiny (id, len) frame across every core BEFORE the
      // codec pass: the sf parquet is one input split, and decode is
      // embarrassingly parallel CPU — the shuffle moves ~12 bytes/row
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int)]
    params.mapPartitions { it =>
      it.map { case (id, len) =>
        val w = 1 + len % 32
        val h = 1 + (len * 7) % 24
        def px(x: Int, y: Int): (Int, Int, Int) = {
          val base = (32 + id % 64).toInt
          (base + 2 * x + y, base + x + 2 * y, base + x + y)
        }
        val bytes = ImageIoCodec.encodeJpeg(w, h, px, quality)
        val dec = ImageIoCodec.decode(bytes)
        val geomOk = dec.width == w && dec.height == h
        var absErr = 0L; var maxErr = 0L
        if (geomOk) {
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val (er, eg, eb) = px(x, y)
              val dr = math.abs(dec.r(x, y) - er).toLong
              val dg = math.abs(dec.g(x, y) - eg).toLong
              val db = math.abs(dec.b(x, y) - eb).toLong
              absErr += dr + dg + db
              maxErr = math.max(maxErr, math.max(dr, math.max(dg, db)))
              x += 1
            }
            y += 1
          }
        }
        val n = 3L * w * h
        JpegDriftRow(id, dec.width.toLong, dec.height.toLong, geomOk,
          if (n == 0) 0L else math.floor(1000.0 * absErr / n + 0.5).toLong,
          maxErr)
      }
    }.toDF().orderBy("doc_id")
  }
}
