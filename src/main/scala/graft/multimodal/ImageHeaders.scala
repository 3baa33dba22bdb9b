package graft.multimodal

/**
 * Pure-JVM image container header parsing: format + pixel dimensions from the
 * first bytes of a payload, no image libraries, no full decode. This is the
 * right scale design for metadata extraction over binary columns — reading
 * 4 container fields must not cost a pixel decode (the reference pipelines
 * treat media as opaque bytes plus typed metadata for the same reason).
 *
 * Formats: PNG (IHDR), JPEG (SOFn scan), GIF (logical screen descriptor),
 * BMP (BITMAPINFOHEADER / BITMAPCOREHEADER). Anything else -> None.
 */
object ImageHeaders extends Serializable {

  /** Decoded container facts: format tag and pixel dimensions. */
  final case class ImageDims(format: String, width: Int, height: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** Parse `bytes` as any supported container; None if unrecognized/truncated. */
  def imageDimensions(bytes: Array[Byte]): Option[ImageDims] = {
    if (bytes == null || bytes.length < 2) return None
    if (isPng(bytes)) parsePng(bytes)
    else if (u8(bytes, 0) == 0xff && u8(bytes, 1) == 0xd8) parseJpeg(bytes)
    else if (isGif(bytes)) parseGif(bytes)
    else if (bytes.length >= 26 && bytes(0) == 'B' && bytes(1) == 'M') parseBmp(bytes)
    else None
  }

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 &&
      u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a

  /** PNG: the IHDR chunk is mandatory and first; width/height are its first
    * two big-endian 32-bit fields (offsets 16 and 20). */
  private def parsePng(b: Array[Byte]): Option[ImageDims] = {
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(ImageDims("png", w.toInt, h.toInt))
  }

  /**
   * JPEG: walk the marker segments from SOI until a start-of-frame marker
   * (SOF0-SOF15 minus the DHT/JPG/DAC exceptions C4/C8/CC); its payload is
   * [precision u8][height u16be][width u16be]. Fill bytes (FF FF ...) and
   * standalone markers (RSTn, TEM) carry no length field and are skipped.
   */
  private def parseJpeg(b: Array[Byte]): Option[ImageDims] = {
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None // lost marker sync: corrupt stream
      // skip fill bytes
      var j = i + 1
      while (j < b.length && u8(b, j) == 0xff) j += 1
      if (j + 2 >= b.length) return None
      val marker = u8(b, j)
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
        i = j + 1 // standalone marker: no length
      } else if (marker == 0xd9) {
        return None // EOI before any SOF
      } else {
        val len = be16(b, j + 1)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (j + 8 >= b.length) return None
          val h = be16(b, j + 4)
          val w = be16(b, j + 6)
          return if (w > 0 && h > 0) Some(ImageDims("jpeg", w, h)) else None
        }
        i = j + 1 + len
      }
    }
    None
  }

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** GIF: logical screen width/height, little-endian u16 at offsets 6/8. */
  private def parseGif(b: Array[Byte]): Option[ImageDims] = {
    val w = le16(b, 6)
    val h = le16(b, 8)
    if (w > 0 && h > 0) Some(ImageDims("gif", w, h)) else None
  }

  /** BMP: DIB header size at offset 14 selects the layout — BITMAPCOREHEADER
    * (12; u16 dims) or BITMAPINFOHEADER+ (>=40; i32 dims, height may be
    * negative for top-down rows). */
  private def parseBmp(b: Array[Byte]): Option[ImageDims] = {
    val dib = le32(b, 14)
    if (dib == 12) {
      val w = le16(b, 18)
      val h = le16(b, 20)
      if (w > 0 && h > 0) Some(ImageDims("bmp", w, h)) else None
    } else if (dib >= 40 && b.length >= 30) {
      val w = le32(b, 18)
      val h = math.abs(le32(b, 22))
      if (w > 0 && h > 0) Some(ImageDims("bmp", w, h)) else None
    } else None
  }
}
