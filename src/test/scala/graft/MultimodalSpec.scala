package graft

import graft.multimodal.BmpCodec

/** The real-decode tier of the multimodal pipeline: BmpCodec against
  * GOLDEN BYTES assembled by hand from the BMP spec (not by the encoder
  * under test), plus round-trip and malformed-input behavior. The
  * Spark-side q128 pipeline is covered by the DuckDB oracle. */
class MultimodalSpec extends SparkSpec {

  /** 2×2 24-bpp bottom-up BMP, hand-assembled: image pixels (BGR)
    *   (0,0)=(10,11,12)  (1,0)=(20,21,22)      <- top row, LAST in file
    *   (0,1)=(30,31,32)  (1,1)=(40,41,42)      <- bottom row, FIRST in file
    * row stride = 2·3 = 6 bytes + 2 pad = 8. */
  private val golden: Array[Byte] = {
    val header = Array[Int](
      'B', 'M', 70, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // file header
      40, 0, 0, 0, 2, 0, 0, 0, 2, 0, 0, 0,            // DIB, w=2, h=2
      1, 0, 24, 0, 0, 0, 0, 0, 16, 0, 0, 0,           // planes, bpp, BI_RGB
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) // res + palette
    val bottomRow = Array[Int](30, 31, 32, 40, 41, 42, 0, 0)
    val topRow = Array[Int](10, 11, 12, 20, 21, 22, 0, 0)
    (header ++ bottomRow ++ topRow).map(_.toByte)
  }

  test("decode golden bytes: geometry, channel order, bottom-up rows, padding") {
    val d = BmpCodec.decode(golden)
    assert(d.width === 2)
    assert(d.height === 2)
    assert(d.bpp === 24)
    assert(d.nPixels === 4L)
    // blue channel only: 10 + 20 + 30 + 40 (green/red would give 11+21+…)
    assert(d.pxSum === 100L)
    // image top-left is the LAST file row's first pixel (bottom-up)
    assert(d.cornerPx === 10)
  }

  test("encode produces the golden layout byte-for-byte") {
    val px = Map((0, 0) -> (10, 11, 12), (1, 0) -> (20, 21, 22),
      (0, 1) -> (30, 31, 32), (1, 1) -> (40, 41, 42))
    val enc = BmpCodec.encode(2, 2, (x, y) => px((x, y)))
    assert(enc.toSeq === golden.toSeq)
  }

  test("round-trip across padded and unpadded widths, including >127 bytes") {
    // width 4 → 0 pad, 5 → 1, 6 → 2, 7 → 3; values >127 exercise the
    // signed-byte & 0xff reads
    for (w <- 4 to 7; h <- Seq(1, 3)) {
      val d = BmpCodec.decode(BmpCodec.encode(w, h,
        (x, y) => (200 + x % 56, x, y)))
      assert((d.width, d.height, d.nPixels) === ((w, h, w.toLong * h)))
      val expected = (for (x <- 0 until w; y <- 0 until h)
        yield (200 + x % 56).toLong).sum
      assert(d.pxSum === expected, s"w=$w h=$h")
      assert(d.cornerPx === 200)
    }
  }

  test("top-down BMP (negative height) decodes with corner in the FIRST row") {
    // take the golden image, flip to top-down: height = -2, rows reordered
    val b = golden.clone()
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -2)
    // swap the two 8-byte rows so the image content is unchanged
    val r0 = b.slice(54, 62); val r1 = b.slice(62, 70)
    System.arraycopy(r1, 0, b, 54, 8); System.arraycopy(r0, 0, b, 62, 8)
    val d = BmpCodec.decode(b)
    assert(d.height === 2)
    assert(d.pxSum === 100L)
    assert(d.cornerPx === 10)
  }

  test("malformed inputs are rejected loudly") {
    intercept[IllegalArgumentException](BmpCodec.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException] { // bad magic
      val b = golden.clone(); b(0) = 'X'.toByte; BmpCodec.decode(b)
    }
    intercept[IllegalArgumentException] { // truncated pixel array
      BmpCodec.decode(golden.take(60))
    }
    intercept[IllegalArgumentException] { // unsupported bpp
      val b = golden.clone(); b(28) = 8.toByte; BmpCodec.decode(b)
    }
  }

  test("q128 pipeline: decoded features match the generator arithmetic on real docs") {
    val out = graft.multimodal.Multimodal
      .bmpFeatures(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val lens = Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id", "octet_length(text) AS len").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      val id = r.getLong(0); val len = lens(id)
      val (w, h) = (1 + len % 32, 1 + (len * 7) % 24)
      assert(r.getAs[Long]("width") === w.toLong)
      assert(r.getAs[Long]("height") === h.toLong)
      assert(r.getAs[Long]("n_pixels") === w.toLong * h)
      val expected = (for (x <- 0 until w; y <- 0 until h)
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(r.getAs[Long]("px_sum") === expected)
      assert(r.getAs[Long]("corner_px") === id * 31 % 256)
    }
  }

  test("WavCodec round-trip is lossless across the int16 domain") {
    import graft.multimodal.WavCodec
    val cases = Seq(
      Array.empty[Short],
      Array[Short](0),
      Array[Short](Short.MinValue, Short.MaxValue, -1, 1, 0, 12345, -12345))
    cases.foreach { samples =>
      val dec = WavCodec.decode(WavCodec.encode(8000, samples))
      assert(dec.sampleRate === 8000 && dec.bitsPerSample === 16 &&
        dec.channels === 1)
      assert(dec.samples.toSeq === samples.toSeq)
    }
  }

  test("WavCodec rejects malformed payloads instead of yielding garbage") {
    import graft.multimodal.WavCodec
    val good = WavCodec.encode(8000, Array[Short](1, 2, 3))
    intercept[IllegalArgumentException](WavCodec.decode(good.take(10)))
    val notRiff = good.clone(); notRiff(0) = 'X'
    intercept[IllegalArgumentException](WavCodec.decode(notRiff))
    val overrun = good.clone()
    overrun(40) = (overrun(40) + 64).toByte // data length > payload
    intercept[IllegalArgumentException](WavCodec.decode(overrun))
  }

  // ——— ImageIoCodec: the compressed tier (JPEG/PNG via javax.imageio) ———

  /** 2×1 truecolor PNG hand-assembled from the PNG spec (NOT by the
    * encoder under test): signature, IHDR, one IDAT whose zlib stream is
    * a single STORED (uncompressed) deflate block — filter byte 0 then
    * the six RGB bytes — and IEND. CRC32/Adler32 come from java.util.zip
    * (the spec's checksums, independent of ImageIO). Pixels:
    * (0,0)=(10,20,30), (1,0)=(200,150,100) — values >127 exercise the
    * signed-byte path. */
  private val goldenPng: Array[Byte] = {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(tag.getBytes("US-ASCII")); crc.update(body)
      be32(body.length.toLong) ++ tag.getBytes("US-ASCII") ++ body ++
        be32(crc.getValue)
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = be32(2L) ++ be32(1L) ++
      Array[Byte](8, 2, 0, 0, 0) // depth 8, truecolor, no interlace
    val raw = Array(0, 10, 20, 30, 200, 150, 100).map(_.toByte) // filter 0 + px
    val adler = new java.util.zip.Adler32(); adler.update(raw)
    val zlib = Array[Byte](0x78, 0x01,               // zlib header
      0x01,                                          // final stored block
      raw.length.toByte, 0, (~raw.length & 0xff).toByte, 0xff.toByte) ++
      raw ++ be32(adler.getValue)
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", zlib) ++
      chunk("IEND", Array.empty[Byte])
  }

  test("ImageIoCodec decodes a spec-assembled golden PNG exactly") {
    import graft.multimodal.ImageIoCodec
    val d = ImageIoCodec.decode(goldenPng)
    assert((d.width, d.height) === ((2, 1)))
    assert((d.r(0, 0), d.g(0, 0), d.b(0, 0)) === ((10, 20, 30)))
    assert((d.r(1, 0), d.g(1, 0), d.b(1, 0)) === ((200, 150, 100)))
  }

  test("PNG round-trip is pixel-exact (lossless contract behind q259)") {
    import graft.multimodal.ImageIoCodec
    def px(x: Int, y: Int) = ((x * 53 + y * 11) % 256, (x + 3 * y) % 256, 255 - x % 256)
    val d = ImageIoCodec.decode(ImageIoCodec.encodePng(33, 17, px))
    assert((d.width, d.height) === ((33, 17)))
    for (y <- 0 until 17; x <- 0 until 33)
      assert((d.r(x, y), d.g(x, y), d.b(x, y)) === px(x, y), s"($x,$y)")
  }

  test("JPEG decode: exact geometry, bounded drift, deterministic encode") {
    import graft.multimodal.ImageIoCodec
    def px(x: Int, y: Int) = (40 + 2 * x + y, 40 + x + 2 * y, 40 + x + y)
    val b1 = ImageIoCodec.encodeJpeg(31, 23, px)
    val b2 = ImageIoCodec.encodeJpeg(31, 23, px)
    assert(b1.toSeq === b2.toSeq) // deterministic bytes for fixed input
    val d = ImageIoCodec.decode(b1)
    assert((d.width, d.height) === ((31, 23)))
    var absErr = 0L; var maxErr = 0
    for (y <- 0 until 23; x <- 0 until 31) {
      val (er, eg, eb) = px(x, y)
      val errs = Seq(d.r(x, y) - er, d.g(x, y) - eg, d.b(x, y) - eb).map(math.abs)
      absErr += errs.sum; maxErr = math.max(maxErr, errs.max)
    }
    val mae = absErr.toDouble / (3 * 31 * 23)
    assert(mae <= 3.0, s"smooth-gradient MAE $mae blew the q260 envelope")
    assert(maxErr <= 12, s"single-channel error $maxErr blew the q260 envelope")
  }

  test("TIFF lossless round-trip is pixel-exact, and q274's frame equals q259's row-for-row") {
    import graft.multimodal.ImageIoCodec
    def px(x: Int, y: Int) = ((x * 29 + y * 3) % 256, (y * 41) % 256, (x + y * 7) % 256)
    val d = ImageIoCodec.decode(ImageIoCodec.encodeLossless("tiff", 19, 11, px))
    assert((d.width, d.height) === ((19, 11)))
    for (y <- 0 until 11; x <- 0 until 19)
      assert((d.r(x, y), d.g(x, y), d.b(x, y)) === px(x, y), s"($x,$y)")
    // format invariance on real docs: identical generator through two
    // different codecs must produce identical feature frames
    val png = graft.multimodal.Multimodal.pngFeatures(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    val tif = graft.multimodal.Multimodal.tiffFeatures(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    assert(tif === png)
  }

  test("ImageIoCodec rejects undecodable payloads loudly") {
    import graft.multimodal.ImageIoCodec
    intercept[IllegalArgumentException](
      ImageIoCodec.decode("not an image".getBytes("UTF-8")))
  }

  test("q259 channel sums match a direct recompute of the generator (real docs)") {
    val out = graft.multimodal.Multimodal
      .pngFeatures(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val lens = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8").length).toMap
    out.foreach { r =>
      val id = r.getLong(0); val len = lens(id)
      val w = 1 + len % 32; val h = 1 + (len * 7) % 24
      val vs = for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + x * 7 + y * 13) % 256
      assert(r.getAs[Long]("width") === w.toLong)
      assert(r.getAs[Long]("height") === h.toLong)
      assert(r.getAs[Long]("r_sum") === vs.sum)
      assert(r.getAs[Long]("g_sum") === vs.map(v => (v + 1) % 256).sum)
      assert(r.getAs[Long]("b_sum") === vs.map(v => (v + 2) % 256).sum)
      assert(r.getAs[Long]("corner_r") === id * 31 % 256)
    }
  }

  test("GIF lossless round-trip is pixel-exact INCLUDING the interlace-bug heights 2-4, and q276 equals q259 row-for-row") {
    import graft.multimodal.ImageIoCodec
    // regression pin for the JDK GIFImageWriter interlace bug: with the
    // writer's default (interlaced) mode every 32x2..32x4 image came
    // back with corrupted rows (r13 probe); the non-interlaced encode
    // must round-trip these shapes exactly
    def px(id: Long)(x: Int, y: Int) = {
      val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
      (v, (v + 1) % 256, (v + 2) % 256)
    }
    for (h <- 1 to 6; id <- Seq(0L, 7L, 201L)) {
      val d = ImageIoCodec.decode(ImageIoCodec.encodeLossless("gif", 32, h, px(id)))
      assert((d.width, d.height) === ((32, h)))
      for (y <- 0 until h; x <- 0 until 32)
        assert((d.r(x, y), d.g(x, y), d.b(x, y)) === px(id)(x, y),
          s"id=$id h=$h ($x,$y)")
    }
    val png = graft.multimodal.Multimodal.pngFeatures(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    val gif = graft.multimodal.Multimodal.gifFeatures(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    assert(gif === png)
  }

  test("decodeOrReason classifies corruption deterministically: unrecognized vs decode_error vs decoded") {
    import graft.multimodal.ImageIoCodec
    def px(x: Int, y: Int) = ((x * 3 + y) % 256, (y * 5) % 256, (x + y) % 256)
    val good = ImageIoCodec.encodePng(17, 11, px)
    assert(ImageIoCodec.decodeOrReason(good).isRight)
    val zeroSig = good.clone(); java.util.Arrays.fill(zeroSig, 0, 8, 0.toByte)
    assert(ImageIoCodec.decodeOrReason(zeroSig) === Left("unrecognized"))
    assert(ImageIoCodec.decodeOrReason(
      java.util.Arrays.copyOf(good, good.length / 2)) === Left("decode_error"))
    assert(ImageIoCodec.decodeOrReason(Array.emptyByteArray) ===
      Left("unrecognized"))
    // determinism: same bytes, same verdict on repeat
    assert(ImageIoCodec.decodeOrReason(
      java.util.Arrays.copyOf(good, good.length / 2)) === Left("decode_error"))
  }

  test("q275 quarantine: planted corruption routes by the id rule, healthy rows equal q259's features") {
    val out = graft.multimodal.Multimodal
      .decodeOrQuarantine(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val png = graft.multimodal.Multimodal
      .pngFeatures(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> r).toMap
    out.foreach { r =>
      val id = r.getLong(0)
      (id % 11) match {
        case 3 =>
          assert(r.getString(1) === "quarantined" && r.getString(2) === "unrecognized")
          assert(r.isNullAt(3) && r.isNullAt(5), s"doc $id leaked features")
        case 7 =>
          assert(r.getString(1) === "quarantined" && r.getString(2) === "decode_error")
          assert(r.isNullAt(3) && r.isNullAt(5), s"doc $id leaked features")
        case _ =>
          assert(r.getString(1) === "decoded" && r.getString(2) === "ok")
          val p = png(id)
          assert(r.getAs[Long]("width") === p.getAs[Long]("width"))
          assert(r.getAs[Long]("r_sum") === p.getAs[Long]("r_sum"))
          assert(r.getAs[Long]("g_sum") === p.getAs[Long]("g_sum"))
          assert(r.getAs[Long]("b_sum") === p.getAs[Long]("b_sum"))
      }
    }
    // both corruption classes actually occur in the fixture set
    assert(out.count(_.getString(2) == "unrecognized") > 0)
    assert(out.count(_.getString(2) == "decode_error") > 0)
  }

  test("animated GIF: per-frame round trip is pixel-exact and sampling decodes exactly the requested frames") {
    import graft.multimodal.ImageIoCodec
    def px(f: Int, x: Int, y: Int) =
      (((f * 17 + x * 7 + y * 13) % 256, (f * 17 + x * 7 + y * 13 + 1) % 256,
        (f * 17 + x * 7 + y * 13 + 2) % 256))
    val bytes = ImageIoCodec.encodeGifFrames(9, 3, 7, px) // h=3: interlace-bug shape
    val got = ImageIoCodec.decodeGifFrames(bytes, Seq(0, 3, 6))
    assert(got.map(_._1) === Seq(0, 3, 6))
    got.foreach { case (f, d) =>
      assert((d.width, d.height) === ((9, 3)))
      for (y <- 0 until 3; x <- 0 until 9)
        assert((d.r(x, y), d.g(x, y), d.b(x, y)) === px(f, x, y), s"f=$f ($x,$y)")
    }
    intercept[Exception](ImageIoCodec.decodeGifFrames(bytes, Seq(7)))
  }

  test("q279 sampled-frame features match a direct recompute of the generator (real docs)") {
    val out = graft.multimodal.Multimodal
      .gifFrameSample(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val lens = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8").length).toMap
    // every sampled (doc, frame) present, nothing else, sums exact
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.foreach { case (id, rows) =>
      val len = lens(id)
      val nf = 2 + len % 9
      assert(rows.map(_.getLong(1)).sorted.toSeq ===
        (0 until nf).filter(_ % 3 == 0).map(_.toLong))
      val w = 1 + len % 16; val h = 1 + (len * 5) % 12
      rows.foreach { r =>
        val f = r.getLong(1).toInt
        val vs = for (y <- 0 until h; x <- 0 until w)
          yield (id * 31 + f * 17 + x * 7 + y * 13) % 256
        assert(r.getAs[Long]("r_sum") === vs.sum, s"doc $id frame $f")
        assert(r.getAs[Long]("g_sum") === vs.map(v => (v + 1) % 256).sum)
      }
    }
  }

  test("resizeNearest: hand-worked index mapping, downscale and upscale") {
    import graft.multimodal.ImageIoCodec.{Decoded, resizeNearest}
    // 4x2 source, pixel value encodes its coordinates
    val src = Decoded(4, 2, Array.tabulate(8)(i => i))
    val down = resizeNearest(src, 2, 1)
    // out(x,y) = in(x*4/2, y*2/1) = in(2x, 2y): indices 0 and 2, row 0
    assert(down.argb.toSeq === Seq(0, 2))
    val up = resizeNearest(Decoded(1, 1, Array(42)), 3, 2)
    assert(up.argb.toSeq === Seq.fill(6)(42), "upscale replicates the pixel")
    // non-integral ratio: 3 -> 2 maps x2=0->0, x2=1->1 (floor(1*3/2))
    val odd = resizeNearest(Decoded(3, 1, Array(10, 20, 30)), 2, 1)
    assert(odd.argb.toSeq === Seq(10, 20))
  }

  test("q280 resized features match a direct recompute through the index mapping (real docs)") {
    val out = graft.multimodal.Multimodal
      .resizedFeatures(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val lens = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8").length).toMap
    out.foreach { r =>
      val id = r.getLong(0); val len = lens(id)
      val w = 1 + len % 32; val h = 1 + (len * 7) % 24
      val vs = for (y2 <- 0 until 12; x2 <- 0 until 16) yield {
        val sx = x2 * w / 16; val sy = y2 * h / 12
        (id * 31 + sx * 7 + sy * 13) % 256
      }
      assert(r.getAs[Long]("width") === 16L)
      assert(r.getAs[Long]("r_sum") === vs.sum, s"doc $id")
      assert(r.getAs[Long]("b_sum") === vs.map(v => (v + 2) % 256).sum)
    }
  }

  test("q179 window energy matches a direct recompute from the text (real docs)") {
    val out = graft.multimodal.Multimodal
      .wavEnergy(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val texts = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val id = r.getLong(0); val wi = r.getAs[Long]("win_idx").toInt
      val win = texts(id).map(c => ((c.toInt - 96) * 256).toLong)
        .grouped(64).toSeq(wi)
      assert(r.getAs[Long]("win_n") === win.length.toLong)
      assert(r.getAs[Long]("win_sumsq") === win.map(s => s * s).sum)
      assert(r.getAs[Long]("win_peak") === win.map(math.abs).max)
    }
  }
}
