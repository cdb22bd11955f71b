package graft.ops.media

import java.io.ByteArrayOutputStream

/** Minimal MJPEG-in-AVI codec — REAL video decode with no dependency
  * beyond the JDK. AVI is a RIFF container (the same chunk grammar as
  * WAV, see [[WavCodec]]); MJPEG stores every frame as an ordinary
  * JPEG, which `javax.imageio` decodes. So a container walk (this
  * file) plus the existing [[RasterCodec]] frame decode gives an
  * end-to-end video path: container → frame chunks → per-frame raster
  * stats. This closes the "video decode is a deploy-time plug-in"
  * gap (WavCodec.scala's earlier note) for the one video family the
  * JVM can decode unaided; other codecs (H.264 etc.) still need a
  * native library and stay deploy-time.
  *
  * Contract matches the other codecs: corrupt/truncated bytes are a
  * data row, never an exception. Truncation semantics follow WAV, not
  * PNG: a cut stream yields FEWER complete frames without throwing,
  * so the header-declared frame count vs frames actually decoded is
  * the validity check (the `avih` totalFrames field survives in the
  * first bytes).
  */
object AviCodec {

  /** One decoded video: header-declared frame count and the per-frame
    * raster stats actually recovered ([[RasterCodec.Image]]).
    */
  case class Video(declaredFrames: Int, frames: Seq[RasterCodec.Image])

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Build a minimal, structurally valid MJPEG AVI: RIFF('AVI ') →
    * LIST('hdrl'){ avih, LIST('strl'){ strh('vids'/'MJPG'),
    * strf(BITMAPINFOHEADER) } } → LIST('movi'){ '00dc' <jpeg> ... }.
    * Odd-sized chunks get the RIFF pad byte. `frames` are complete
    * JPEG streams (e.g. [[RasterCodec.encode]]("jpg", ...)).
    */
  def encodeMjpeg(width: Int, height: Int,
      frames: Seq[Array[Byte]], fps: Int = 10): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(fourcc(id)); o.write(le32(body.length)); o.write(body)
      if (body.length % 2 == 1) o.write(0) // RIFF word alignment
      o.toByteArray
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(fourcc("LIST")); o.write(le32(body.length + 4))
      o.write(fourcc(kind)); o.write(body)
      o.toByteArray
    }
    val avih = { // MainAVIHeader: 14 LE u32 fields
      val o = new ByteArrayOutputStream()
      o.write(le32(1000000 / fps)) // µs per frame
      o.write(le32(0)); o.write(le32(0)); o.write(le32(0)) // rate/pad/flags
      o.write(le32(frames.length)) // totalFrames — the validity anchor
      o.write(le32(0)); o.write(le32(1)); o.write(le32(0)) // init/streams/buf
      o.write(le32(width)); o.write(le32(height))
      (0 until 4).foreach(_ => o.write(le32(0))) // reserved
      o.toByteArray
    }
    val strh = { // AVIStreamHeader for a 'vids'/'MJPG' stream
      val o = new ByteArrayOutputStream()
      o.write(fourcc("vids")); o.write(fourcc("MJPG"))
      o.write(le32(0)); o.write(le32(0)) // flags, prio/lang
      o.write(le32(0)) // initial frames
      o.write(le32(1)); o.write(le32(fps)) // scale, rate
      o.write(le32(0)); o.write(le32(frames.length)) // start, length
      o.write(le32(0)); o.write(le32(-1)); o.write(le32(0)) // buf/quality/ss
      o.write(le32(0)); o.write(le32((height << 16) | width)) // rcFrame
      o.toByteArray
    }
    val strf = { // BITMAPINFOHEADER with biCompression 'MJPG'
      val o = new ByteArrayOutputStream()
      o.write(le32(40)); o.write(le32(width)); o.write(le32(height))
      o.write(Array(1.toByte, 0.toByte, 24.toByte, 0.toByte)) // planes, bpp
      o.write(fourcc("MJPG"))
      o.write(le32(width * height * 3))
      (0 until 4).foreach(_ => o.write(le32(0)))
      o.toByteArray
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.map(f => chunk("00dc", f)).foldLeft(Array.empty[Byte])(_ ++ _))
    val body = fourcc("AVI ") ++ hdrl ++ movi
    val out = new ByteArrayOutputStream()
    out.write(fourcc("RIFF")); out.write(le32(body.length)); out.write(body)
    out.toByteArray
  }

  private def readLe32(b: Array[Byte], at: Int): Long =
    ((b(at) & 0xffL)) | ((b(at + 1) & 0xffL) << 8) |
      ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)

  private def cc(b: Array[Byte], at: Int): String =
    new String(b, at, 4, "US-ASCII")

  /** Walk the container and decode every complete video frame chunk
    * ('##dc'/'##db') through ImageIO. Declared size fields are treated
    * as untrusted: a chunk whose size runs past the available bytes
    * ends the walk (the WAV-style silent-truncation contract — the
    * caller compares frames.size against declaredFrames). None when
    * the bytes are not an AVI at all.
    */
  def decode(bytes: Array[Byte]): Option[Video] = {
    if (bytes == null || bytes.length < 24) return None
    if (cc(bytes, 0) != "RIFF" || cc(bytes, 8) != "AVI ") return None
    try {
      var declared = -1
      val frames = Seq.newBuilder[RasterCodec.Image]
      var bad = false
      def walk(from: Int, to: Int): Unit = {
        var at = from
        while (at + 8 <= to && !bad) {
          val id = cc(bytes, at)
          // bound-check in Long: a crafted sz near Int.MaxValue would
          // overflow `at + 8 + sz` in Int arithmetic and slip past the
          // truncation check (safety would then rest on copyOfRange
          // throwing into the NonFatal catch — right result, by accident)
          val szL = readLe32(bytes, at + 4)
          if (szL > Int.MaxValue || at.toLong + 8 + szL > to) { bad = true; return } // truncated
          val sz = szL.toInt
          if (id == "LIST") {
            walk(at + 12, at + 8 + sz) // recurse past the list kind
          } else if (id == "avih" && sz >= 24) {
            declared = readLe32(bytes, at + 8 + 16).toInt
          } else if (id.endsWith("dc") || id.endsWith("db")) {
            RasterCodec.decode(
              java.util.Arrays.copyOfRange(bytes, at + 8, at + 8 + sz)) match {
              case Some(img) => frames += img
              case None => bad = true // undecodable frame payload
            }
          }
          at += 8 + sz + (sz % 2) // skip the pad byte of odd chunks
        }
      }
      walk(12, bytes.length)
      if (declared < 0) None // no avih header — not a usable AVI
      else Some(Video(declared, frames.result()))
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
