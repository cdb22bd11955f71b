package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Vector kernels called from generated code (static methods, like
  * [[Geohash]]). Semantics replicate the declarative form they replace —
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`: a strict LEFT-TO-RIGHT
  * double accumulation (bit-identical to DuckDB's `list_dot_product`,
  * which the similarity oracles hash against), null when the arrays
  * differ in length or any element is null (zip_with pads/propagates
  * null the same way).
  */
object VectorMath {

  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}
