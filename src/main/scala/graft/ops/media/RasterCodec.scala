package graft.ops.media

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Compressed-raster codec over the JDK's built-in `javax.imageio`
  * readers — REAL JPEG/PNG/BMP/GIF decode with no dependency beyond
  * the JVM (ImageIO ships in `java.desktop` and runs headless). This
  * closes the compressed-codec gap the PPM parser ([[Ppm]]) left
  * open: q82 proved the byte-level decode plumbing on an uncompressed
  * format; real corpora hold JPEG/PNG (reference decodes JPEG with
  * PIL: `Week#6_assignment.ipynb:221-499`,
  * `samoyed_puppy_dog_pictures.jpg`), and this decodes those through
  * the same mapPartitions surface.
  *
  * Contract matches [[Ppm]]: corrupt, truncated, or unrecognized
  * bytes decode to None — corrupt input is a data row, never an
  * exception (`ImageIO.read` returns null when no reader claims the
  * magic; a reader that claims it but hits a truncated/invalid stream
  * throws, which maps to None here).
  */
object RasterCodec {

  // ImageIO defaults to useCache=true, which spools EVERY read/write
  // through a temp FILE — per-row disk I/O (and a hard failure on an
  // unwritable tmpdir) for byte arrays already in memory. Disable
  // once: these images stream through executors in-heap.
  //
  // CAVEAT: setUseCache flips PROCESS-GLOBAL ImageIO state as a
  // class-load side effect — any other ImageIO user in the same JVM
  // (executor) loses file-backed spooling too. Deliberate here: an
  // in-memory byte[] codec is the only ImageIO use this library has,
  // and executors that embed it are Spark workers, not image servers.
  // Embedders that need spooling back can call setUseCache(true)
  // after first touching this object; per-call isolation would need
  // the lower-level ImageReader + MemoryCacheImageInputStream API,
  // which ImageIO.read's convenience path does not expose.
  ImageIO.setUseCache(false)

  /** Decoded image with exact integer channel sums — same shape as
    * [[Ppm.Image]], so callers swap codecs without changing the plan
    * (floats appear only when a caller divides; keeps oracle
    * comparison exact).
    */
  case class Image(width: Int, height: Int, sumR: Long, sumG: Long,
      sumB: Long)

  /** Decode any ImageIO-recognized format (PNG/JPEG/BMP/GIF/WBMP). */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            // getRGB converts whatever raster layout the reader chose
            // (3BYTE_BGR for PNG, YCbCr-decoded RGB for JPEG) to packed
            // sRGB — exact for 8-bit truecolor sources
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        Some(Image(w, h, sr, sg, sb))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode, then nearest-neighbor DOWNSAMPLE by integer `factor`:
    * target pixel (x, y) takes source pixel (x·factor, y·factor) — an
    * explicit index map, NOT Graphics2D scaling (whose filter kernels
    * are implementation-defined), so the output raster is exactly
    * replicable from the source pixels and an oracle can compose it in
    * closed form. Output dims are floor(w/factor) × floor(h/factor)
    * (trailing rows/columns that don't fill a full step are dropped,
    * the standard NN-decimation convention). None when the bytes don't
    * decode or the source is smaller than one step in either
    * dimension.
    */
  def decodeResizeNN(bytes: Array[Byte], factor: Int): Option[Image] = {
    if (bytes == null || bytes.isEmpty || factor <= 0) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val wOut = img.getWidth / factor
        val hOut = img.getHeight / factor
        if (wOut == 0 || hOut == 0) None
        else {
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < hOut) {
            var x = 0
            while (x < wOut) {
              val rgb = img.getRGB(x * factor, y * factor)
              sr += (rgb >> 16) & 0xff
              sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          Some(Image(wOut, hOut, sr, sg, sb))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encode an RGB raster — `pixel(p)` is the packed 0xRRGGBB value of
    * row-major pixel p — via the named ImageIO writer ("png", "bmp",
    * "jpg", "gif"). PNG and BMP are lossless: decode(encode(...))
    * recovers the exact raster, the property q89/q91's closed-form
    * oracles ride; JPEG is lossy (dims survive, channel sums
    * approximate). GIF through THIS truecolor entry point is
    * palette-quantized by the writer (lossless only when the raster's
    * colors happen to survive its quantizer — measured: half the q89
    * closed-form rasters shift) — use [[encodeIndexed]] for exact GIF.
    */
  def encode(format: String, width: Int, height: Int,
      pixel: Int => Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, pixel(y * width + x))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, format, out)
    out.toByteArray
  }

  /** Encode a PALETTE raster — `palette(k)` packed 0xRRGGBB entries,
    * `index(p)` the palette index of row-major pixel p — as
    * TYPE_BYTE_INDEXED with an EXPLICIT IndexColorModel. This is the
    * exact-GIF path: the truecolor [[encode]] hands the GIF writer a
    * raster it quantizes data-dependently, while an indexed source
    * round-trips bit-exact... with one measured JDK caveat: the GIF
    * codec CORRUPTS images of height <= 4 (rows come back shifted;
    * heights >= 5 are exact at any width tested — q93 keeps its dims
    * family at h >= 5 and MediaSpec pins the working region).
    */
  def encodeIndexed(format: String, width: Int, height: Int,
      palette: Array[Int], index: Int => Int): Array[Byte] = {
    val n = palette.length
    val rs = new Array[Byte](n); val gs = new Array[Byte](n)
    val bs = new Array[Byte](n)
    var k = 0
    while (k < n) {
      rs(k) = ((palette(k) >> 16) & 0xff).toByte
      gs(k) = ((palette(k) >> 8) & 0xff).toByte
      bs(k) = (palette(k) & 0xff).toByte
      k += 1
    }
    val icm = new java.awt.image.IndexColorModel(8, n, rs, gs, bs)
    val img = new BufferedImage(width, height,
      BufferedImage.TYPE_BYTE_INDEXED, icm)
    val raster = img.getRaster
    var p = 0
    while (p < width * height) {
      raster.setSample(p % width, p / width, 0, index(p))
      p += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, format, out)
    out.toByteArray
  }
}
