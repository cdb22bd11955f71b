package graft

import graft.ops.media.{Ppm, RasterCodec}
import graft.operators.Alignment

/** The real P6 decoder: known-answer parse, malformed-input rejection,
  * and q82's end-to-end parity between bytes actually decoded and the
  * closed-form raster the fixture was built from. Plus the compressed
  * twin: JDK-ImageIO PNG/JPEG/BMP decode through [[RasterCodec]] and
  * q89's end-to-end parity on real DEFLATE streams.
  */
class MediaSpec extends SparkTestBase {

  private def ppm(w: Int, h: Int, px: Array[Int]): Array[Byte] =
    (s"P6\n$w $h\n255\n".getBytes("US-ASCII").toSeq ++
      px.map(_.toByte)).toArray

  test("decode: known 2x1 image yields exact dims and channel sums") {
    val img = Ppm.decode(ppm(2, 1, Array(10, 20, 30, 40, 50, 60))).get
    assert(img.width == 2 && img.height == 1)
    assert(img.sumR == 50L && img.sumG == 70L && img.sumB == 90L)
    // high bytes must read unsigned
    val hi = Ppm.decode(ppm(1, 1, Array(255, 128, 200))).get
    assert(hi.sumR == 255L && hi.sumG == 128L && hi.sumB == 200L)
  }

  test("decode: malformed inputs reject, never throw") {
    val good = ppm(2, 2, Array.fill(12)(7))
    assert(Ppm.decode(good).isDefined)
    assert(Ppm.decode(null).isEmpty)
    assert(Ppm.decode(Array[Byte]()).isEmpty)
    assert(Ppm.decode("P5\n2 2\n255\n".getBytes ++ good.drop(10)).isEmpty)
    assert(Ppm.decode(good.dropRight(1)).isEmpty)          // truncated
    assert(Ppm.decode(good ++ Array(1.toByte)).isEmpty)    // oversized
    assert(Ppm.decode(ppm(2, 2, Array.fill(12)(7))
      .map(b => if (b == '2') '0'.toByte else b)).isEmpty) // zero dims
    assert(Ppm.decode("P6\n2 2\n254\nxxxxxxxxxxxx".getBytes).isEmpty)
    // crafted 9-digit dims whose w*h*3 overflows Int to a small
    // positive matching the payload length — must reject, not decode
    // garbage or index out of bounds
    val crafted = ("P6\n715827891 12\n255\n".getBytes("US-ASCII").toSeq ++
      Array.fill(300)(7.toByte)).toArray
    assert(Ppm.decode(crafted).isEmpty)
    // wrapped product equal to the payload length but NOT a multiple
    // of 3 (178956971*16*3 mod 2^32 = 16): pre-fix this passed the size
    // check AND ran the raster loop off its 3-byte stride past the
    // array end — the AIOOBE half of the overflow bug
    val crafted2 = ("P6\n178956971 16\n255\n".getBytes("US-ASCII").toSeq ++
      Array.fill(16)(7.toByte)).toArray
    assert(Ppm.decode(crafted2).isEmpty)
  }

  test("raster codec: PNG and BMP round-trip exact channel sums; " +
    "JPEG keeps dims and approximates sums") {
    val (w, h) = (13, 7)
    def pix(p: Int): Int = {
      val r = (p * 37 + 5) % 256; val g = (p * 53 + 11) % 256
      val b = (p * 71 + 23) % 256
      (r << 16) | (g << 8) | b
    }
    def sum(c: Int) = (0 until w * h)
      .map(p => (pix(p) >> (16 - 8 * c)) & 0xff).map(_.toLong).sum
    Seq("png", "bmp").foreach { fmt =>
      val img = RasterCodec.decode(RasterCodec.encode(fmt, w, h, pix)).get
      assert(img.width == w && img.height == h, fmt)
      assert(img.sumR == sum(0) && img.sumG == sum(1) && img.sumB == sum(2),
        fmt)
    }
    // GIF is palette-quantized: lossless ONLY under 256 distinct
    // colors — a 3-color raster must round-trip exactly
    def pix3(p: Int): Int =
      Array(0x102030, 0xa0b0c0, 0xff0000)(p % 3)
    val gi = RasterCodec.decode(RasterCodec.encode("gif", w, h, pix3)).get
    def sum3(c: Int) = (0 until w * h)
      .map(p => (pix3(p) >> (16 - 8 * c)) & 0xff).map(_.toLong).sum
    assert(gi.width == w && gi.height == h)
    assert(gi.sumR == sum3(0) && gi.sumG == sum3(1) && gi.sumB == sum3(2),
      "gif 3-color")
    // JPEG is lossy: dims exact, per-pixel mean within a coarse band
    val jb = RasterCodec.encode("jpg", w, h, pix)
    val j = RasterCodec.decode(jb).get
    assert(j.width == w && j.height == h)
    val n = (w * h).toDouble
    assert(math.abs(j.sumR / n - sum(0) / n) < 32.0, s"jpeg R ${j.sumR}")
    assert(math.abs(j.sumB / n - sum(2) / n) < 32.0, s"jpeg B ${j.sumB}")
  }

  test("resize: NN downsample picks the exact even-lattice pixels; " +
    "undersized and corrupt inputs reject") {
    val (w, h) = (5, 3) // odd dims: trailing col/row must drop
    def pix(p: Int): Int = {
      val r = (p * 37 + 5) % 256; val g = (p * 53 + 11) % 256
      val b = (p * 71 + 23) % 256
      (r << 16) | (g << 8) | b
    }
    val bytes = RasterCodec.encode("png", w, h, pix)
    val rz = RasterCodec.decodeResizeNN(bytes, 2).get
    // target (x, y) <- source (2x, 2y): src pixels p = 2y*w + 2x
    val srcs = for (y <- 0 until h / 2; x <- 0 until w / 2)
      yield 2 * y * w + 2 * x
    def sum(c: Int) = srcs.map(p => ((pix(p) >> (16 - 8 * c)) & 0xff).toLong).sum
    assert(rz.width == w / 2 && rz.height == h / 2)
    assert(rz.sumR == sum(0) && rz.sumG == sum(1) && rz.sumB == sum(2))
    // factor larger than a dimension: no output raster -> None
    assert(RasterCodec.decodeResizeNN(bytes, 4).isEmpty)
    // corrupt stream: same rejection contract as decode
    assert(RasterCodec.decodeResizeNN(bytes.take(bytes.length / 2), 2).isEmpty)
    assert(RasterCodec.decodeResizeNN(Array.emptyByteArray, 2).isEmpty)
  }

  test("avi codec: MJPEG container round-trips frame count, dims, and " +
    "in-band sums; truncation loses frames silently; garbage rejects") {
    import graft.ops.media.AviCodec
    val (w, h) = (8, 6)
    def pix(f: Int)(p: Int): Int = {
      val r = (f * 17 + p * 37 + 5) % 256; val g = (f * 17 + p * 53 + 11) % 256
      val b = (f * 17 + p * 71 + 23) % 256
      (r << 16) | (g << 8) | b
    }
    val frames = (0 until 3).map(f => RasterCodec.encode("jpg", w, h, pix(f)))
    val avi = AviCodec.encodeMjpeg(w, h, frames)
    val v = AviCodec.decode(avi).get
    assert(v.declaredFrames == 3 && v.frames.size == 3)
    v.frames.zipWithIndex.foreach { case (img, f) =>
      assert(img.width == w && img.height == h, s"frame $f dims")
      val n = (w * h).toDouble
      def exact(c: Int) = (0 until w * h)
        .map(p => ((pix(f)(p) >> (16 - 8 * c)) & 0xff).toLong).sum
      assert(math.abs(img.sumR / n - exact(0) / n) < 32.0, s"frame $f R")
      assert(math.abs(img.sumB / n - exact(2) / n) < 32.0, s"frame $f B")
    }
    // a cut stream reads FEWER complete frames without throwing — the
    // declared-vs-read comparison is the caller's validity check
    val cut = AviCodec.decode(avi.take(avi.length / 2)).get
    assert(cut.declaredFrames == 3 && cut.frames.size < 3)
    // not a RIFF / not an AVI / empty: None, never an exception
    assert(AviCodec.decode("not an avi at all".getBytes).isEmpty)
    assert(AviCodec.decode(Array.emptyByteArray).isEmpty)
    val wav = graft.ops.media.WavCodec.encodePcm16(8000, 32, _ => 7)
    assert(AviCodec.decode(wav).isEmpty, "RIFF but not AVI must reject")
  }

  test("raster codec: corrupt inputs reject, never throw") {
    val png = RasterCodec.encode("png", 6, 4, _ => 0x102030)
    assert(RasterCodec.decode(png).isDefined)
    assert(RasterCodec.decode(null).isEmpty)
    assert(RasterCodec.decode(Array[Byte]()).isEmpty)
    // wrong magic: no reader claims it -> ImageIO.read returns null
    assert(RasterCodec.decode("not an image at all".getBytes).isEmpty)
    // cut mid-IDAT: the PNG reader throws inside read -> None
    assert(RasterCodec.decode(png.take(png.length / 2)).isEmpty)
    // header-only prefix (signature + partial IHDR)
    assert(RasterCodec.decode(png.take(12)).isEmpty)
    // NOTE deliberately absent: a PNG truncated by just its IEND tail
    // still decodes (the JDK reader tolerates it) — q89 relies on
    // half-truncation precisely because tail truncation is NOT a
    // reliable corruption
    // the q91/q92 corruption contracts: a half-cut BMP hits the DIB
    // raster walk's EOF, a half-cut JPEG dies in the Huffman walk —
    // both throw inside read -> None, never escape
    Seq("bmp", "jpg").foreach { fmt =>
      val img = RasterCodec.encode(fmt, 6, 4, p => (p * 37) % 0xffffff)
      assert(RasterCodec.decode(img).isDefined, fmt)
      assert(RasterCodec.decode(img.take(img.length / 2)).isEmpty,
        s"$fmt half-cut")
      assert(RasterCodec.decode(img.take(12)).isEmpty, s"$fmt header-only")
    }
  }

  test("q89: metrics recovered from real PNG bytes match the closed " +
    "form; corrupt rows flagged") {
    val rows = Alignment.q89PngDecode(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id % 97 == 0) {
        assert(!r.getAs[Boolean]("valid"), s"doc $id must be rejected")
        assert(r.isNullAt(r.fieldIndex("mean_r")))
      } else {
        assert(r.getAs[Boolean]("valid"))
        val (w, h) = (4 + id % 5, 3 + id % 4)
        assert(r.getAs[Long]("width") == w && r.getAs[Long]("height") == h)
        val n = w * h
        val sg = (0L until n).map(p => (id * 31 + p * 7 + 11) % 256).sum
        val want = BigDecimal(sg) / n
        assert(math.abs(r.getAs[Double]("mean_g") -
          want.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
          s"doc $id mean_g")
      }
    }
  }

  test("q91: metrics recovered from real BMP bytes match the closed " +
    "form exactly; corrupt rows flagged") {
    val rows = Alignment.q91BmpDecode(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id % 97 == 0) {
        assert(!r.getAs[Boolean]("valid"), s"doc $id must be rejected")
        assert(r.isNullAt(r.fieldIndex("mean_r")))
      } else {
        assert(r.getAs[Boolean]("valid"))
        val (w, h) = (4 + id % 5, 3 + id % 4)
        assert(r.getAs[Long]("width") == w && r.getAs[Long]("height") == h)
        val n = w * h
        val sr = (0L until n).map(p => (id * 31 + p * 7) % 256).sum
        val want = BigDecimal(sr) / n
        assert(math.abs(r.getAs[Double]("mean_r") -
          want.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
          s"doc $id mean_r")
      }
    }
  }

  test("indexed GIF: explicit-palette encode round-trips bit-exact on " +
    "the q93 dims family (h >= 5); truncation rejects") {
    val palette = Array.tabulate(16) { k =>
      (((37 * k + 5) % 256) << 16) | (((53 * k + 11) % 256) << 8) |
        ((71 * k + 23) % 256)
    }
    // the q93 family: every (w, h) with h >= 5 — the JDK GIF codec
    // corrupts h <= 4 (rows shift), so the query's dims deliberately
    // stay inside this verified region; this spec IS that verification
    for (w <- 4 to 8; h <- 5 to 8) {
      def idx(p: Int): Int = (7 + 3 * p) % 16
      val gif = RasterCodec.encodeIndexed("gif", w, h, palette, idx)
      val img = RasterCodec.decode(gif).get
      assert(img.width == w && img.height == h, s"${w}x$h dims")
      def sum(shift: Int) = (0 until w * h)
        .map(p => (palette(idx(p)) >> shift) & 0xff).map(_.toLong).sum
      assert(img.sumR == sum(16) && img.sumG == sum(8) && img.sumB == sum(0),
        s"${w}x$h sums")
      assert(RasterCodec.decode(gif.take(gif.length / 2)).isEmpty,
        s"${w}x$h half-cut")
    }
  }

  test("q93: metrics recovered from real GIF/LZW bytes match the " +
    "palette closed form exactly; corrupt rows flagged") {
    val rows = Alignment.q93GifDecode(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id % 97 == 0) {
        assert(!r.getAs[Boolean]("valid"), s"doc $id must be rejected")
        assert(r.isNullAt(r.fieldIndex("mean_b")))
      } else {
        assert(r.getAs[Boolean]("valid"))
        val (w, h) = (4 + id % 5, 5 + id % 4)
        assert(r.getAs[Long]("width") == w && r.getAs[Long]("height") == h)
        val n = w * h
        val sb = (0L until n).map(p => (71 * ((id + 3 * p) % 16) + 23) % 256).sum
        val want = BigDecimal(sb) / n
        assert(math.abs(r.getAs[Double]("mean_b") -
          want.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
          s"doc $id mean_b")
      }
    }
  }

  test("q92: JPEG keeps exact dims, decoded sums stay in band, corrupt " +
    "rows flagged — a header-only 'decoder' cannot pass") {
    val rows = Alignment.q92JpegDecode(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id % 97 == 0) {
        assert(!r.getAs[Boolean]("valid"), s"doc $id must be rejected")
        assert(r.isNullAt(r.fieldIndex("sums_in_band")))
      } else {
        assert(r.getAs[Boolean]("valid"))
        assert(r.getAs[Long]("width") == 4 + id % 5, s"doc $id width")
        assert(r.getAs[Long]("height") == 3 + id % 4, s"doc $id height")
        assert(r.getAs[Boolean]("sums_in_band"), s"doc $id out of band")
      }
    }
  }

  test("wav codec: PCM16 round-trips exact sample aggregates; " +
    "truncated and corrupt inputs reject, never throw") {
    import graft.ops.media.WavCodec
    val n = 200
    def sample(i: Int): Short = (((i * 37 + 13) % 4096) - 2048).toShort
    val wav = WavCodec.encodePcm16(16000, n, sample)
    val a = WavCodec.decode(wav).get
    assert(a.channels == 1 && a.sampleRate == 16000 && a.nSamples == n)
    assert(a.sumPcm == (0 until n).map(sample(_).toLong).sum)
    assert(a.peakAbs == (0 until n).map(i => math.abs(sample(i).toLong)).max)
    // the WAV reader returns FEWER frames on a cut stream without
    // throwing — the declared-vs-read check must catch it
    assert(WavCodec.decode(wav.take(wav.length / 2)).isEmpty)
    assert(WavCodec.decode(wav.dropRight(2)).isEmpty)
    assert(WavCodec.decode(null).isEmpty)
    assert(WavCodec.decode(Array[Byte]()).isEmpty)
    assert(WavCodec.decode("definitely not a riff file".getBytes).isEmpty)
    // header-only prefix
    assert(WavCodec.decode(wav.take(20)).isEmpty)
    // stereo rejects: with channels > 1, nSamples (frames) and the
    // all-channel sample aggregates disagree by the channel factor —
    // mean_pcm would inflate x2 — so decode treats non-mono as
    // unsupported rather than returning quietly-wrong stats
    val pcmStereo = new Array[Byte](n * 4)
    (0 until n).foreach { i =>
      val s = sample(i)
      pcmStereo(4 * i) = (s & 0xff).toByte
      pcmStereo(4 * i + 1) = ((s >> 8) & 0xff).toByte
      pcmStereo(4 * i + 2) = (s & 0xff).toByte
      pcmStereo(4 * i + 3) = ((s >> 8) & 0xff).toByte
    }
    val stereoFmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val stereoIn = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcmStereo), stereoFmt, n.toLong)
    val stereoOut = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      stereoIn, javax.sound.sampled.AudioFileFormat.Type.WAVE, stereoOut)
    assert(WavCodec.decode(stereoOut.toByteArray).isEmpty)
  }

  test("q90: metrics recovered from real RIFF bytes match the closed " +
    "form; corrupt rows flagged") {
    val rows = Alignment.q90WavDecode(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id % 97 == 0) {
        assert(!r.getAs[Boolean]("valid"), s"doc $id must be rejected")
        assert(r.isNullAt(r.fieldIndex("sum_pcm")))
      } else {
        assert(r.getAs[Boolean]("valid"))
        val n = 64 + id % 64
        assert(r.getAs[Long]("n_samples") == n)
        val want = (0L until n).map(i => (id * 31 + i * 7) % 4096 - 2048).sum
        assert(r.getAs[Long]("sum_pcm") == want, s"doc $id sum_pcm")
      }
    }
  }

  test("q82: decoded metrics match the closed-form raster; corrupt rows flagged") {
    val rows = Alignment.q82ImageDecode(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id % 97 == 0) {
        assert(!r.getAs[Boolean]("valid"), s"doc $id must be rejected")
        assert(r.isNullAt(r.fieldIndex("mean_r")))
      } else {
        assert(r.getAs[Boolean]("valid"))
        val (w, h) = (4 + id % 5, 3 + id % 4)
        assert(r.getAs[Long]("width") == w && r.getAs[Long]("height") == h)
        // recompute the R mean from the same closed form the fixture
        // encoded — the decoder must have recovered it from raw bytes
        val n = w * h
        val sr = (0L until n).map(p => (id * 31 + p * 7) % 256).sum
        val want = BigDecimal(sr) / n
        assert(math.abs(r.getAs[Double]("mean_r") -
          want.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
          s"doc $id mean_r")
      }
    }
  }
}
