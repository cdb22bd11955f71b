package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** MD5-prefix hashing for the dedup/fingerprint operators.
  *
  * The oracle-parity contract of those operators is "hash values are
  * md5-derived, identical in Spark and DuckDB" — the portable SQL
  * spelling is `conv(substring(md5(x), 1, 15), 16, 10)`: the first 60
  * bits of the digest as a non-negative BIGINT. This helper computes
  * the SAME value from the digest bytes directly, skipping the
  * hex-string render and `conv`'s base-10 string parse (which cost
  * ~30% of q42's hash stage at sf0.1).
  */
object HashUtil {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex digits (60 bits) of md5(utf8 bytes) as a long —
    * bit-identical to `conv(substring(md5(x), 1, 15), 16, 10)`.
    */
  def md5Prefix60(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    prefix60(d.digest(s.getBytes))
  }

  private def md5Prefix60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val d = md5.get()
    d.reset()
    d.update(bytes, off, len)
    prefix60(d.digest())
  }

  private def prefix60(b: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) >> 4) & 0xfL)
  }

  private val Xxh64Seed = 42L // Spark's xxhash64() seed

  /** xxhash64 of every `gramLen`-char gram of `s`, first-occurrence
    * deduped — value-identical to
    * `array_distinct(transform(sequence(1, length(s)-gramLen+1),
    *   g -> xxhash64(substring(s, g, gramLen))))`
    * but computed in one pass with zero per-gram allocation on ASCII
    * text (char index == byte index, hash in place).
    */
  def gramHashesDistinct(s: UTF8String,
      gramLen: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val nChars = s.numChars()
    val n = nChars - gramLen + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (n > 0) {
      if (s.numBytes() == nChars) {
        val base = s.getBaseObject
        val off = s.getBaseOffset
        var g = 0
        while (g < n) {
          seen.add(XXH64.hashUnsafeBytes(base, off + g, gramLen, Xxh64Seed))
          g += 1
        }
      } else {
        var g = 0
        while (g < n) {
          val sub = s.substringSQL(g + 1, gramLen)
          seen.add(XXH64.hashUnsafeBytes(
            sub.getBaseObject, sub.getBaseOffset, sub.numBytes, Xxh64Seed))
          g += 1
        }
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** md5Prefix60 of every `n`-token shingle (tokens = split on single
    * space, windows joined with the same space), first-occurrence
    * deduped. Because the separator is the split character, a joined
    * window IS the original substring between its first token's start
    * and its last token's end — so on ASCII text every shingle hashes
    * in place with zero string building. Value-identical to
    * md5Prefix60(array_join(slice(split(text,' '), i, n), ' ')).
    */
  def tokenShingleHashes(s: UTF8String,
      n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val ascii = s.numBytes() == s.numChars()
    // token start offsets in CHARS (split(' ') semantics: empty tokens
    // between consecutive separators are tokens too)
    val str = if (ascii) null else s.toString
    val bytes = if (ascii) s.getBytes else null
    val len = if (ascii) bytes.length else str.length
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    starts += 0
    var i = 0
    while (i < len) {
      val c = if (ascii) bytes(i).toChar else str.charAt(i)
      if (c == ' ') starts += i + 1
      i += 1
    }
    val t = starts.length
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var w = 0
    while (w <= t - n) {
      val from = starts(w)
      // end of token w+n-1: next start minus separator, or text end
      val to = if (w + n < t) starts(w + n) - 1 else len
      val h =
        if (ascii) md5Prefix60(bytes, from, to - from)
        else md5Prefix60(UTF8String.fromString(str.substring(from, to)))
      seen.add(h)
      w += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Winnowing fingerprint stats of the char-8-gram md5Prefix60 stream:
    * (distinct count, min, max) of the 8-wide trailing-truncated window
    * minima — value-identical to the q42 oracle's windowed form, one
    * pass, no per-gram string allocation on ASCII text.
    */
  def winnowStats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val nChars = s.numChars()
    val n = nChars - 7
    if (n <= 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, null, null))
    val hv = new Array[Long](n)
    if (s.numBytes() == nChars) {
      val bytes = s.getBytes // one copy per document
      var g = 0
      while (g < n) { hv(g) = md5Prefix60(bytes, g, 8); g += 1 }
    } else {
      var g = 0
      while (g < n) { hv(g) = md5Prefix60(s.substringSQL(g + 1, 8)); g += 1 }
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    var minFp = Long.MaxValue
    var maxFp = Long.MinValue
    var i = 0
    while (i < n) {
      var m = hv(i)
      var k = i + 1
      val end = math.min(i + 7, n - 1)
      while (k <= end) { if (hv(k) < m) m = hv(k); k += 1 }
      seen.add(m)
      if (m < minFp) minFp = m
      if (m > maxFp) maxFp = m
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](seen.size.toLong, minFp, maxFp))
  }
}
