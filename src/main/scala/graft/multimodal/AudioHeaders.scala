package graft.multimodal

/**
 * Pure-JVM audio container header parsing: PCM facts from a RIFF/WAVE
 * payload's chunk list, no audio libraries, no sample decode — the audio
 * counterpart of [[ImageHeaders]] (same cost model: metadata over 100 TB of
 * media must be bounded by scan I/O, not codec CPU).
 */
object AudioHeaders extends Serializable {

  /** Decoded WAV facts: fmt-chunk fields plus the frame count implied by the
    * data chunk (`dataBytes / blockAlign`; -1 if no data chunk was found). */
  final case class WavInfo(channels: Int, sampleRate: Int, bitsPerSample: Int, nFrames: Long)

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse `bytes` as RIFF/WAVE; None if unrecognized/truncated. Walks the
    * chunk list (chunks are word-aligned) for `fmt ` and `data`. */
  def wavInfo(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes == null || bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var channels = -1
    var sampleRate = -1
    var bits = -1
    var blockAlign = -1
    var dataBytes = -1L
    var i = 12
    while (i + 8 <= bytes.length) {
      val id = tag(bytes, i)
      val size = u32(bytes, i + 4)
      if (size > Int.MaxValue - 16) return None // corrupt/oversized chunk
      if (id == "fmt " && i + 8 + 16 <= bytes.length) {
        channels = u16(bytes, i + 10)
        sampleRate = u32(bytes, i + 12).toInt
        blockAlign = u16(bytes, i + 20)
        bits = u16(bytes, i + 22)
      } else if (id == "data") {
        dataBytes = size
      }
      // chunks are 2-byte aligned: odd sizes carry a pad byte
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (channels <= 0 || sampleRate <= 0 || bits <= 0) None
    else {
      val frames =
        if (dataBytes >= 0 && blockAlign > 0) dataBytes / blockAlign else -1L
      Some(WavInfo(channels, sampleRate, bits, frames))
    }
  }
}
