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
    val b = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) >> 4) & 0xfL)
  }
}
