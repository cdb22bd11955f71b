package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64

/** Bloom-filter bit math shared by the aggregate (build side) and the
  * `might_contain` expression (probe side, called from generated code —
  * allocation-free: header ints and bit words read straight off the
  * byte array, no ByteBuffer per row).
  *
  * Serialized layout: [int32 numHashes][int32 numWords][numWords ×
  * int64 bits], big-endian. Double hashing (Kirsch–Mitzenmacher):
  * bit_i = (h1 + i·h2) mod m with two seeded XXH64 passes — i.i.d.
  * enough for the standard FP bound, one hash invocation pair per
  * value regardless of numHashes.
  */
object BloomUtil {

  private val Seed2 = 0x9e3779b97f4a7c15L // golden-ratio odd constant

  /** Build-side: set value's bits in the word array (in place). */
  def put(words: Array[Long], numHashes: Int, v: Long): Unit = {
    val m = words.length.toLong * 64L
    val h1 = XXH64.hashLong(v, 0L)
    val h2 = XXH64.hashLong(v, Seed2) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      words((bit >>> 6).toInt) |= (1L << (bit & 63L).toInt)
      i += 1
    }
  }

  def serialize(words: Array[Long], numHashes: Int): Array[Byte] = {
    val out = new Array[Byte](8 + words.length * 8)
    writeInt(out, 0, numHashes)
    writeInt(out, 4, words.length)
    var i = 0
    while (i < words.length) { writeLong(out, 8 + i * 8, words(i)); i += 1 }
    out
  }

  /** Returns (numHashes, words). */
  def deserialize(bytes: Array[Byte]): (Int, Array[Long]) = {
    val k = readInt(bytes, 0)
    val nw = readInt(bytes, 4)
    val words = new Array[Long](nw)
    var i = 0
    while (i < nw) { words(i) = readLong(bytes, 8 + i * 8); i += 1 }
    (k, words)
  }

  /** Probe-side membership test against the serialized form. */
  def contains(bytes: Array[Byte], v: Long): Boolean = {
    val k = readInt(bytes, 0)
    val m = readInt(bytes, 4).toLong * 64L
    val h1 = XXH64.hashLong(v, 0L)
    val h2 = XXH64.hashLong(v, Seed2) | 1L
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      val w = readLong(bytes, 8 + (bit >>> 6).toInt * 8)
      if ((w & (1L << (bit & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  private def writeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def writeLong(b: Array[Byte], off: Int, v: Long): Unit = {
    writeInt(b, off, (v >>> 32).toInt); writeInt(b, off + 4, v.toInt)
  }

  private def readLong(b: Array[Byte], off: Int): Long =
    ((readInt(b, off).toLong) << 32) | (readInt(b, off + 4).toLong & 0xffffffffL)
}
