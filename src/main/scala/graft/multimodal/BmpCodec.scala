package graft.multimodal

/** Pure-JVM BMP (Windows bitmap) codec — the REAL decode path of the
  * multimodal pipeline (closing the round-3 "decode is a stub" gap for
  * the one uncompressed format a codec-less container can still parse).
  *
  * Writes and reads the standard uncompressed 24-bpp BITMAPINFOHEADER
  * layout: 14-byte file header ('BM', file size, pixel-data offset),
  * 40-byte DIB header (little-endian width/height/planes/bpp/
  * compression), then pixel rows stored BOTTOM-UP in BGR byte order,
  * each row zero-padded to a 4-byte boundary. The decoder validates the
  * magic, bpp and compression fields, honours the header's data offset
  * (extra header bytes are legal), and supports both bottom-up
  * (height > 0) and top-down (height < 0) row order — all the parts a
  * naive "w·h·3 bytes" reader gets wrong, each pinned by
  * MultimodalSpec's golden-bytes test.
  *
  * Scale shape: encode/decode run inside `mapPartitions` over a binary
  * column (one in-memory image at a time per task), exactly where a
  * JNI/library codec would sit; nothing here touches the driver.
  */
object BmpCodec {

  val HeaderSize = 54 // 14 file header + 40 BITMAPINFOHEADER

  private def padOf(width: Int): Int = (4 - (width * 3) % 4) % 4

  /** 24-bpp bottom-up BMP. `pixel(x, y)` gives the (blue, green, red)
    * channels for IMAGE coordinates — (0,0) is top-left. */
  def encode(width: Int, height: Int,
             pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad geometry ${width}x$height")
    val pad = padOf(width)
    val rowBytes = width * 3 + pad
    val size = HeaderSize + rowBytes * height
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0)
    b.putInt(HeaderSize)                  // pixel data offset
    b.putInt(40).putInt(width).putInt(height)
    b.putShort(1).putShort(24)            // planes, bpp
    b.putInt(0).putInt(rowBytes * height) // BI_RGB, image size
    b.putInt(0).putInt(0).putInt(0).putInt(0) // ppm res, palette counts
    var fy = 0                            // file row: bottom-up
    while (fy < height) {
      val y = height - 1 - fy             // image row
      var x = 0
      while (x < width) {
        val (bl, g, r) = pixel(x, y)
        b.put(bl.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var p = 0
      while (p < pad) { b.put(0.toByte); p += 1 }
      fy += 1
    }
    b.array()
  }

  /** Decoded geometry + order-sensitive content features. `pxSum` is the
    * sum of the BLUE channel over all pixels (channel order matters: a
    * decoder reading RGB instead of BGR fails it); `cornerPx` is the
    * blue value at IMAGE top-left, which for bottom-up storage lives in
    * the LAST file row (row-order bugs fail it). */
  final case class Decoded(width: Int, height: Int, bpp: Int,
                           nPixels: Long, pxSum: Long, cornerPx: Int)

  /** Blue-channel random access in IMAGE coordinates ((0,0) top-left),
    * with the same structural validation as [[decode]] — the resampling
    * consumer (perceptual hashing, q209) reads single pixels rather than
    * folding the whole plane. Returns (width, height, blueAt(x, y)). */
  def bluePlane(bytes: Array[Byte]): (Int, Int, (Int, Int) => Int) = {
    require(bytes.length >= HeaderSize, s"truncated BMP: ${bytes.length} bytes")
    require(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte, "bad BMP magic")
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOff = b.getInt(10)
    val width = b.getInt(18)
    val rawHeight = b.getInt(22)
    val bpp = b.getShort(28).toInt
    require(bpp == 24, s"unsupported bpp $bpp (only uncompressed 24-bpp)")
    require(b.getInt(30) == 0, "unsupported compression")
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0, s"bad geometry ${width}x$rawHeight")
    val rowBytes = width * 3 + padOf(width)
    require(bytes.length >= dataOff + rowBytes.toLong * height, "pixel array truncated")
    val at = (x: Int, y: Int) => {
      require(x >= 0 && x < width && y >= 0 && y < height, s"pixel ($x,$y) out of range")
      val fy = if (topDown) y else height - 1 - y
      bytes(dataOff + fy * rowBytes + x * 3) & 0xff
    }
    (width, height, at)
  }

  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= HeaderSize, s"truncated BMP: ${bytes.length} bytes")
    require(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte, "bad BMP magic")
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOff = b.getInt(10)
    val width = b.getInt(18)
    val rawHeight = b.getInt(22)
    val bpp = b.getShort(28).toInt
    val compression = b.getInt(30)
    require(bpp == 24, s"unsupported bpp $bpp (only uncompressed 24-bpp)")
    require(compression == 0, s"unsupported compression $compression")
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0, s"bad geometry ${width}x$rawHeight")
    val pad = padOf(width)
    val rowBytes = width * 3 + pad
    require(bytes.length >= dataOff + rowBytes.toLong * height,
      s"pixel array truncated: need ${dataOff + rowBytes.toLong * height}, have ${bytes.length}")
    var pxSum = 0L
    var fy = 0
    while (fy < height) {
      val base = dataOff + fy * rowBytes
      var x = 0
      while (x < width) {
        pxSum += bytes(base + x * 3) & 0xff // blue channel
        x += 1
      }
      fy += 1
    }
    // image top-left: first file row if top-down, last if bottom-up
    val cornerRow = if (topDown) 0 else height - 1
    val cornerPx = bytes(dataOff + cornerRow * rowBytes) & 0xff
    Decoded(width, height, bpp, width.toLong * height, pxSum, cornerPx)
  }
}
