package graft.multimodal

/**
 * Pure-JVM video container header parsing: display dimensions, duration and
 * (where the container states it) frame count from the first structural boxes
 * of a payload — no codecs, no frame decode. Completes the media triad next
 * to [[ImageHeaders]] and [[AudioHeaders]] with the same cost model: metadata
 * over 100 TB of video must be bounded by scan I/O, not decoder CPU.
 *
 * Containers: ISO-BMFF (MP4/MOV — `moov/mvhd` for duration, first visual
 * `trak/tkhd` for dimensions, 32- and 64-bit box sizes, version 0/1 full
 * boxes) and RIFF/AVI (`hdrl/avih` main header). Anything else -> None.
 */
object VideoHeaders extends Serializable {

  /** Decoded container facts. `nFrames` is -1 when the container does not
    * carry a frame count (ISO-BMFF puts it per-track in `stts`, far deeper
    * than a header scan should go). */
  final case class VideoInfo(format: String, width: Int, height: Int,
                             durationMs: Long, nFrames: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse `bytes` as any supported container; None if unrecognized/truncated. */
  def videoInfo(bytes: Array[Byte]): Option[VideoInfo] = {
    if (bytes == null || bytes.length < 16) return None
    if (tag(bytes, 4) == "ftyp") parseMp4(bytes)
    else if (tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "AVI ") parseAvi(bytes)
    else None
  }

  /** Visit each box in `[start, end)`: f(type, payloadStart, boxEnd). Stops at
    * the first structurally impossible box (undersized or out of range). */
  private def walkBoxes(b: Array[Byte], start: Int, end: Int)
                       (f: (String, Int, Int) => Unit): Unit = {
    var i = start
    while (i + 8 <= end) {
      val size32 = be32(b, i)
      val (size, header) =
        if (size32 == 1 && i + 16 <= end) (be64(b, i + 8), 16)
        else if (size32 == 0) ((end - i).toLong, 8) // last box: extends to end
        else (size32, 8)
      if (size < header || i + size > end) return // corrupt: stop walking
      f(tag(b, i + 4), i + header, i + size.toInt)
      i += size.toInt
    }
  }

  /** ISO-BMFF: duration from `moov/mvhd` (version 0: 32-bit times at payload
    * +12/+16; version 1: 64-bit, timescale at +20, duration at +24), display
    * size from the first `trak/tkhd` with non-zero 16.16 fixed-point width
    * and height (audio tracks carry zeros). */
  private def parseMp4(b: Array[Byte]): Option[VideoInfo] = {
    var timescale = 0L
    var duration = -1L
    var width = 0
    var height = 0
    walkBoxes(b, 0, b.length) { (t, ps, pe) =>
      if (t == "moov") {
        walkBoxes(b, ps, pe) { (mt, mps, mpe) =>
          if (mt == "mvhd" && mpe - mps >= 24) {
            val v = u8(b, mps)
            if (v == 1 && mpe - mps >= 32) {
              timescale = be32(b, mps + 20)
              duration = be64(b, mps + 24)
            } else if (v == 0) {
              timescale = be32(b, mps + 12)
              duration = be32(b, mps + 16)
            }
          } else if (mt == "trak" && width == 0) {
            walkBoxes(b, mps, mpe) { (tt, tps, tpe) =>
              if (tt == "tkhd" && width == 0) {
                val v = u8(b, tps)
                val dimOff = if (v == 1) 88 else 76
                if (tpe - tps >= dimOff + 8) {
                  val w = (be32(b, tps + dimOff) >> 16).toInt
                  val h = (be32(b, tps + dimOff + 4) >> 16).toInt
                  if (w > 0 && h > 0) { width = w; height = h }
                }
              }
            }
          }
        }
      }
    }
    if (duration < 0 || timescale <= 0) None
    else Some(VideoInfo("mp4", width, height, duration * 1000L / timescale, -1L))
  }

  /** RIFF/AVI: the mandatory `avih` main header inside `LIST hdrl` —
    * microseconds/frame at payload +0, total frames at +16, pixel dimensions
    * at +32/+36. Duration = frames * usPerFrame / 1000 (floor). */
  private def parseAvi(b: Array[Byte]): Option[VideoInfo] = {
    var found: Option[VideoInfo] = None
    var i = 12
    while (i + 8 <= b.length && found.isEmpty) {
      val id = tag(b, i)
      val size = le32(b, i + 4)
      if (size > Int.MaxValue - 16 || i + 8 + size > b.length) return found
      if (id == "LIST" && size >= 4 && tag(b, i + 8) == "hdrl") {
        var j = i + 12
        val end = i + 8 + size.toInt
        while (j + 8 <= end && found.isEmpty) {
          val cid = tag(b, j)
          val csize = le32(b, j + 4)
          if (csize > Int.MaxValue - 16 || j + 8 + csize > b.length) return found
          if (cid == "avih" && csize >= 40) {
            val usPerFrame = le32(b, j + 8)
            val frames = le32(b, j + 24)
            val w = le32(b, j + 40).toInt
            val h = le32(b, j + 44).toInt
            if (w > 0 && h > 0)
              found = Some(VideoInfo("avi", w, h, frames * usPerFrame / 1000L, frames))
          }
          j += 8 + csize.toInt + (csize.toInt & 1)
        }
      }
      i += 8 + size.toInt + (size.toInt & 1)
    }
    found
  }
}
