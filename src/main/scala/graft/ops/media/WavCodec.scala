package graft.ops.media

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream,
  AudioSystem, UnsupportedAudioFileException}

/** Audio sibling of [[RasterCodec]]: REAL WAV (RIFF/PCM) decode through
  * the JDK's `javax.sound.sampled` (ships in `java.desktop`, runs
  * headless — no new dependency). Completes the multimodal decode
  * family: q82 uncompressed raster, q89 compressed raster, q90 audio —
  * all behind the same mapPartitions batch surface; only video remains
  * a deploy-time plug-in.
  *
  * Contract matches [[Ppm]]/[[RasterCodec]]: corrupt, truncated, or
  * unrecognized bytes decode to None — corrupt input is a data row,
  * never an exception. Truncation needs an explicit check: the WAV
  * header declares the data-chunk frame count, and a cut stream reads
  * FEWER frames without throwing (unlike the PNG reader), so a decode
  * is valid only when frames read == frames declared.
  */
object WavCodec {

  /** Decoded PCM-16 audio with EXACT integer aggregates (sum and peak
    * of samples) so the oracle comparison never touches floats. Mono
    * only (see [[decode]]), so nSamples is both the frame count and
    * the sample count — for multi-channel input the two diverge
    * (frames = samples / channels) and the aggregates would silently
    * mix channels, which is why decode rejects it.
    */
  case class Audio(channels: Int, sampleRate: Int, nSamples: Long,
      sumPcm: Long, peakAbs: Long)

  /** Decode a MONO 16-bit PCM WAV. None for: unrecognized bytes,
    * non-PCM16 encodings, channel counts other than 1, or a payload
    * shorter than the declared frame count. The mono gate keeps the
    * Audio contract exact: with channels > 1, nSamples (frame count)
    * and the per-sample aggregates (all channels interleaved) would
    * disagree by the channel factor — mean_pcm inflated x-channels —
    * so multi-channel input is "unsupported encoding", not a row with
    * quietly-wrong stats.
    */
  def decode(bytes: Array[Byte]): Option[Audio] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        if (f.getSampleSizeInBits != 16 || f.isBigEndian ||
          f.getChannels != 1 ||
          f.getEncoding != AudioFormat.Encoding.PCM_SIGNED) return None
        val declared = in.getFrameLength
        val buf = in.readAllBytes()
        val frameBytes = f.getFrameSize
        if (declared < 0 || buf.length != declared * frameBytes) return None
        var sum = 0L
        var peak = 0L
        var i = 0
        while (i + 1 < buf.length) {
          val s = ((buf(i) & 0xff) | (buf(i + 1) << 8)).toShort.toLong
          sum += s
          val a = math.abs(s)
          if (a > peak) peak = a
          i += 2
        }
        Some(Audio(f.getChannels, f.getSampleRate.toInt,
          buf.length / frameBytes, sum, peak))
      } finally in.close()
    } catch {
      case _: UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
  }

  /** Encode mono 16-bit little-endian PCM — `sample(i)` is the signed
    * sample value of frame i — as a standard WAV container. Lossless:
    * decode(encode(...)) recovers the exact samples.
    */
  def encodePcm16(sampleRate: Int, nSamples: Int,
      sample: Int => Short): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = sample(i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }
}
