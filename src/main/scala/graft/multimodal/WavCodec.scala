package graft.multimodal

/** Minimal RIFF/WAVE PCM codec — the audio analog of [[BmpCodec]]: an
  * uncompressed container a codec-less environment can produce and parse
  * for real (little-endian headers, mono 16-bit PCM), so the
  * audio-pipeline plumbing is exercised end-to-end instead of stubbed.
  * Compressed audio (MP3/AAC) stays metadata-only ([[Multimodal
  * .binaryMeta]] tier): javax.sound.sampled in this JRE speaks only
  * WAV/AU/AIFF (probe in COVERAGE.md) — unlike images, where
  * javax.imageio provides real JPEG/PNG decode ([[ImageIoCodec]]). */
object WavCodec {

  private def putLE32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >> 8) & 0xFF).toByte
    b(off + 2) = ((v >> 16) & 0xFF).toByte
    b(off + 3) = ((v >> 24) & 0xFF).toByte
  }

  private def putLE16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >> 8) & 0xFF).toByte
  }

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** Standard 44-byte-header mono 16-bit PCM WAV. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    // RIFF chunk
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLE32(out, 4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    // fmt subchunk: PCM, mono, 16-bit
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLE32(out, 16, 16)           // subchunk size
    putLE16(out, 20, 1)            // audio format = PCM
    putLE16(out, 22, 1)            // channels = 1
    putLE32(out, 24, sampleRate)
    putLE32(out, 28, sampleRate * 2) // byte rate = sr * ch * 2
    putLE16(out, 32, 2)            // block align
    putLE16(out, 34, 16)           // bits per sample
    // data subchunk
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLE32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      putLE16(out, 44 + 2 * i, samples(i) & 0xFFFF)
      i += 1
    }
    out
  }

  final case class Decoded(sampleRate: Int, bitsPerSample: Int,
                           channels: Int, samples: Array[Short])

  /** Byte-level parse with structural checks — a malformed payload
    * throws rather than yielding garbage features. */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 44, s"truncated WAV: ${bytes.length} bytes")
    require(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
      bytes(10) == 'V' && bytes(11) == 'E', "not a RIFF/WAVE payload")
    require(le16(bytes, 20) == 1, "not PCM")
    val channels = le16(bytes, 22)
    val sampleRate = le32(bytes, 24)
    val bits = le16(bytes, 34)
    require(bits == 16, s"unsupported bit depth $bits")
    val dataLen = le32(bytes, 40)
    require(44 + dataLen <= bytes.length, "data subchunk overruns payload")
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = le16(bytes, 44 + 2 * i).toShort
      i += 1
    }
    Decoded(sampleRate, bits, channels, samples)
  }
}
