package graft.functions

/** Morton (Z-order) curve encoding — the multi-dimensional data-layout
  * primitive behind Delta/Iceberg `Z-ORDER BY` clustering. Interleaving
  * the bits of two dimension keys makes rows that are close in BOTH
  * dimensions close on the curve, so a file written in z-value order
  * carries tight min/max ranges on *each* dimension and a scan filtered
  * on either (or both) prunes at the file level.
  *
  * Reference scope note: the reference pipeline partitions its geo index
  * by a single geohash prefix (one-dimensional locality); z-order is the
  * standard generalization when two independent columns both need
  * pruning (e.g. user x time, lat x lon already have geohash). Public
  * algorithm — "Morton order", Morton 1966; bit-spreading via the usual
  * magic-mask sequence.
  */
object Morton {

  /** Spread the low 16 bits of v so bit i lands at position 2i. */
  @inline def spread16(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** 32-bit z-value from the low 16 bits of x and y: x's bit i at
    * position 2i, y's bit i at position 2i+1. Total order over 16-bit
    * (x, y) tiles; `z >>> 2k` names the 2^k x 2^k tile containing
    * (x, y).
    */
  @inline def zOrder16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)
}
