package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** COMPRESSED-image tier of the multimodal decode path, on the JDK's own
  * `javax.imageio` codecs (JPEG/PNG/TIFF/GIF/BMP readers ship with this
  * JRE — probe re-verified this round; the old "no codecs in this
  * container" claim was wrong for images and held only for MP3/H.264).
  * Reference analog: the payload-decode step a media ingest pipeline
  * runs before feature extraction (the contract
  * `gmall-realtime/src/main/scala/com/atguigu/app/DauApp.scala:30-41`
  * models for JSON payloads — parse the opaque bytes, then operate on
  * typed columns).
  *
  * Both halves are driver-free: encode/decode run inside executor tasks
  * (`mapPartitions`), one `BufferedImage` at a time — the batch-per-task
  * shape a JNI codec would use. Headless mode is forced before any AWT
  * class loads so no display is ever required.
  *
  * Determinism contract (probe-verified): PNG is LOSSLESS — a round trip
  * returns the exact pixels, so PNG-decoded features are oracle-exact.
  * JPEG is LOSSY — the decode is deterministic for a fixed payload but
  * its pixel values are codec-defined, so JPEG-decoded features are
  * bound-gated (SketchBounds) rather than hash-compared.
  */
object ImageIoCodec {
  // set BEFORE ImageIO/AWT initialize anywhere in the executor JVM;
  // referenced by the encode/decode entry points so the property is
  // guaranteed set on whichever executor thread touches images first
  private lazy val headless: Unit =
    System.setProperty("java.awt.headless", "true")

  /** Decoded pixels in image (top-down) orientation, packed 0xRRGGBB. */
  final case class Decoded(width: Int, height: Int, argb: Array[Int]) {
    @inline def r(x: Int, y: Int): Int = (argb(y * width + x) >> 16) & 0xff
    @inline def g(x: Int, y: Int): Int = (argb(y * width + x) >> 8) & 0xff
    @inline def b(x: Int, y: Int): Int = argb(y * width + x) & 0xff
  }

  /** Lossless PNG encode of a generated RGB image. */
  def encodePng(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] =
    encodeLossless("png", w, h, px)

  /** Lossless encode in any ImageIO format whose round trip is
    * pixel-exact (png, tiff, bmp, and non-interlaced gif in this JRE —
    * probe-verified). The format string is the only difference between
    * the q259 / q274 / q276 byte paths; the decode side is
    * format-agnostic.
    *
    * GIF is special-cased to NON-INTERLACED output: the JDK's
    * GIFImageWriter defaults to interlaced frames and its interlace
    * pass logic corrupts rows for image heights 2–4 (r13 probe: the
    * second row of every 32×2 image decodes as palette slot 0;
    * heights 1 and ≥5 are unaffected). With progressive mode disabled
    * the round trip is pixel-exact over the full generator shape
    * space (15,360-image probe, zero diffs). GIF's palette holds 256
    * entries, so losslessness additionally requires ≤256 distinct
    * colors — guaranteed here because the q259 generator derives all
    * three channels from one byte-valued parameter. */
  def encodeLossless(format: String, w: Int, h: Int,
                     px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    headless
    val img = render(w, h, px)
    val bos = new ByteArrayOutputStream()
    if (format == "gif") {
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(ImageWriteParam.MODE_DISABLED)
      val ios = ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), param)
      } finally {
        ios.close()
        writer.dispose()
      }
    } else require(ImageIO.write(img, format, bos),
      s"no ImageIO writer for format '$format'")
    bos.toByteArray
  }

  /** Multi-frame ANIMATED-GIF encode — the one multi-frame format this
    * JRE can both write and read, used as the real-codec stand-in for
    * the video tier's frame plumbing (q279): each frame is written
    * full-frame (no delta/disposal compositing) and NON-INTERLACED
    * (the same height-2–4 writer bug as the still tier), which the r13
    * probe verified round-trips pixel-exact per frame (120 payloads ×
    * up to 7 frames, zero diffs). `px(frame, x, y)`. */
  def encodeGifFrames(w: Int, h: Int, frames: Int,
                      px: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] = {
    headless
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(ImageWriteParam.MODE_DISABLED)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        writer.writeToSequence(
          new IIOImage(render(w, h, (x, y) => px(f, x, y)), null, null), param)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      ios.close()
      writer.dispose()
    }
    bos.toByteArray
  }

  /** Decode ONLY the requested frames of a multi-frame GIF payload —
    * the frame-SAMPLING shape: a video pipeline never decodes the
    * frames it won't featurize. Returns (frame_idx, Decoded) in the
    * requested order; throws on an absent frame index (generated
    * fixtures) — an ingest path would quarantine instead. */
  def decodeGifFrames(bytes: Array[Byte],
                      frames: Seq[Int]): Seq[(Int, Decoded)] = {
    headless
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      frames.map { f =>
        val img = reader.read(f)
        val w = img.getWidth
        val h = img.getHeight
        val arr = new Array[Int](w * h)
        img.getRGB(0, 0, w, h, arr, 0, w)
        (f, Decoded(w, h, arr))
      }
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** Nearest-neighbor resize on DECODED pixels — deterministic integer
    * source mapping (sx = x·wIn div wOut, floor on non-negatives), so
    * a resize over a real codec round trip stays oracle-replayable;
    * the hand-rolled kernel is exactly what a production GPU resize
    * does, where Graphics2D-style smoothing would be implementation-
    * defined. */
  def resizeNearest(d: Decoded, outW: Int, outH: Int): Decoded = {
    val arr = new Array[Int](outW * outH)
    var y = 0
    while (y < outH) {
      val sy = y * d.height / outH
      var x = 0
      while (x < outW) {
        val sx = x * d.width / outW
        arr(y * outW + x) = d.argb(sy * d.width + sx)
        x += 1
      }
      y += 1
    }
    Decoded(outW, outH, arr)
  }

  /** JPEG encode at an explicit quality (default 0.9). Encoding is
    * deterministic for fixed input in this JVM (probe-verified), but the
    * round trip is lossy by design. */
  def encodeJpeg(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int),
                 quality: Float = 0.9f): Array[Byte] = {
    headless
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(render(w, h, px), null, null), param)
    } finally {
      ios.close()
      writer.dispose()
    }
    bos.toByteArray
  }

  /** Decode any ImageIO-supported payload (JPEG/PNG/TIFF/GIF/BMP) to
    * packed RGB. Throws on undecodable bytes — fixture paths (q259/
    * q274/q276/q260) use this form because their payloads are
    * generated and a decode failure IS a codec-plumbing bug. Ingest
    * paths use [[decodeOrReason]] instead. */
  def decode(bytes: Array[Byte]): Decoded = {
    headless
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image payload (${bytes.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    val arr = new Array[Int](w * h)
    img.getRGB(0, 0, w, h, arr, 0, w)
    Decoded(w, h, arr)
  }

  /** Decode-or-quarantine form for INGEST paths, where corrupt payloads
    * are a certainty at 100 TB and must be routed, not fatal. Returns
    * `Left(reason)` with a COARSE deterministic reason code:
    * "unrecognized" when no installed reader claims the bytes
    * (`ImageIO.read` returns null — zeroed/foreign signature), or
    * "decode_error" when a reader claimed the payload but failed mid
    * parse (truncation, stream corruption). The planted fixtures only
    * surface the `IOException` family, but `javax.imageio` readers are
    * known to throw RuntimeExceptions (IndexOutOfBounds, NegativeArray
    * Size, IllegalArgument) on adversarially malformed headers — the
    * quarantine contract is "routed, never fatal", so ANY NonFatal
    * maps to the same coarse code. Coarse on purpose: exception
    * MESSAGES and types are codec-version-specific, the two-way
    * classification is stable. */
  def decodeOrReason(bytes: Array[Byte]): Either[String, Decoded] = {
    headless
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) Left("unrecognized")
      else {
        val w = img.getWidth
        val h = img.getHeight
        val arr = new Array[Int](w * h)
        img.getRGB(0, 0, w, h, arr, 0, w)
        Right(Decoded(w, h, arr))
      }
    } catch {
      case scala.util.control.NonFatal(_) => Left("decode_error")
    }
  }

  private def render(w: Int, h: Int,
                     px: (Int, Int) => (Int, Int, Int)): BufferedImage = {
    headless
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }
}
