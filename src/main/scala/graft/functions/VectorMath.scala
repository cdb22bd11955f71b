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

  /** Nearest centroid of `v` among `cents` (array of struct(cl: long,
    * cvec: array<double>)): returns struct(d2, cl) minimizing
    * (d2 asc, cl asc) — the exact rule of the declarative
    * `array_min(transform(cents, c => struct(d2(c), cl(c))))` it
    * replaces (kmeansAssign's argmin), with d2 the same composed-dot
    * spelling `dot(v,v) − 2·dot(v,c) + dot(c,c)` in the same IEEE
    * operation order, so assignments stay bit-parity with the DuckDB
    * oracles. Null returns: empty/absent centroid array. A candidate
    * whose d2 is undefined (length-mismatched or null-element cvec)
    * ranks FIRST like the struct ordering it replaces (nulls-first
    * asc); null ELEMENTS of the cents array are skipped (array_min's
    * rule). One hoisted v·v; k tight primitive loops per row — no
    * per-candidate struct/array allocation.
    */
  def nearestCentroid(v: ArrayData, cents: ArrayData)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val k = cents.numElements()
    var bestD2: java.lang.Double = null
    var bestCl = 0L
    var found = false
    val dv = dot(v, v)
    var i = 0
    while (i < k) {
      if (!cents.isNullAt(i)) {
        val c = cents.getStruct(i, 2)
        val cl = c.getLong(0)
        val d2: java.lang.Double =
          if (c.isNullAt(1) || dv == null) null
          else {
            val cv = c.getArray(1)
            val dvc = dot(v, cv)
            val dcc = dot(cv, cv)
            if (dvc == null || dcc == null) null
            else java.lang.Double.valueOf(
              dv.doubleValue() - 2.0 * dvc.doubleValue() + dcc.doubleValue())
          }
        // (d2, cl) asc with nulls-first d2; Double.compare orders NaN
        // the way Spark's double ordering does (NaN > non-NaN)
        val wins =
          if (!found) true
          else {
            val cmp =
              if (d2 == null && bestD2 == null) 0
              else if (d2 == null) -1
              else if (bestD2 == null) 1
              else java.lang.Double.compare(d2.doubleValue(), bestD2.doubleValue())
            cmp < 0 || (cmp == 0 && cl < bestCl)
          }
        if (wins) { bestD2 = d2; bestCl = cl; found = true }
      }
      i += 1
    }
    if (!found) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD2, bestCl))
  }
}
