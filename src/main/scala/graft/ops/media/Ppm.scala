package graft.ops.media

/** Minimal binary-PPM (P6) parser — a REAL byte-level image decode in
  * pure JVM code, no native libs. This upgrades the multimodal decode
  * story from "deterministic stub" to "real parser for uncompressed
  * raster images"; compressed codecs (JPEG/PNG/BMP/GIF) decode through
  * [[RasterCodec]] (JDK ImageIO, q89) behind the same
  * [[graft.operators.Alignment.decodeMediaBatched]] mapPartitions
  * surface; only video remains a deploy-time plug-in (reference:
  * `Week#6_assignment.ipynb:221-499` decodes with PIL).
  *
  * Format: `P6` <ws> width <ws> height <ws> maxval <one ws byte>
  * followed by exactly width × height RGB byte triplets. Anything
  * malformed — wrong magic, non-255 maxval, truncated or oversized
  * payload — decodes to None, never a partial row: corrupt inputs are
  * a first-class output of q82, not an exception path.
  */
object Ppm {

  /** Decoded image with exact integer channel sums (floats appear only
    * when a caller divides — keeps the oracle comparison exact).
    */
  case class Image(width: Int, height: Int, sumR: Long, sumG: Long,
      sumB: Long)

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r'

  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 9) return None
    if (bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def readInt(): Int = { // -1 = malformed
      while (pos < bytes.length && isWs(bytes(pos))) pos += 1
      val st = pos
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9')
        pos += 1
      if (pos == st || pos - st > 9) -1
      else new String(bytes, st, pos - st, "US-ASCII").toInt
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    if (w <= 0 || h <= 0 || maxv != 255) return None
    // exactly ONE whitespace byte separates the header from the raster
    if (pos >= bytes.length || !isWs(bytes(pos))) return None
    pos += 1
    // size check in Long: 9-digit dims overflow Int (w*h*3 can wrap to
    // a small positive that matches a crafted payload, re-entering the
    // raster loop with bogus dims — or off a 3-byte stride, indexing
    // past the array in violation of the never-throw contract)
    if ((bytes.length - pos).toLong != w.toLong * h * 3L) return None
    var (sr, sg, sb) = (0L, 0L, 0L)
    var p = pos
    while (p < bytes.length) {
      sr += bytes(p) & 0xff
      sg += bytes(p + 1) & 0xff
      sb += bytes(p + 2) & 0xff
      p += 3
    }
    Some(Image(w, h, sr, sg, sb))
  }
}
