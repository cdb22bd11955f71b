package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow

/** Imperative kernels for the time-series expressions (called from
  * codegen — one static call per packed series row).
  */
object SeriesMath {

  /** The fixed-point Holt–Winters fold (α = β = γ = 1/2, all-BIGINT;
    * see graft.operators.Anomaly's exactness contract) over one packed
    * hourly series, season length `m`:
    *
    *   l₀ = floor(mean of the first m values), b₀ = 0,
    *   s  = first-m deviations;
    *   for t = m..n−1:  r = x − (l + b + s_head)
    *                    l' = (x − s_head + l + b) >> 1
    *                    b' = (l' − l + b) >> 1
    *                    s' = (x − l' + s_head) >> 1   (pop head, push s')
    *
    * Returns (l, b, ss, rs) with ss the final seasonal queue in order
    * and rs the FULL residual trajectory, written POSITIONALLY into a
    * pre-sized array — O(n + m) element ops total, replacing the
    * declarative fold's `concat(rs, array(r))` accumulation whose
    * growing-array copies were O(n²) (the single most reused kernel in
    * the engine: 7 batch queries + the q161 ensemble run through it).
    * Every arithmetic step is the same BIGINT op the old fold and the
    * DuckDB oracles execute (`>> 1` IS Spark's shiftright and the
    * oracle's floor-halving), so outputs are hash-identical.
    *
    * Returns null for series shorter than two seasons (callers filter
    * size ≥ 2m already; the guard keeps the expression total).
    */
  def holtFold(sv: ArrayData, m: Int): InternalRow = {
    val n = sv.numElements()
    if (n < 2 * m) return null
    var w = 0L
    var i = 0
    while (i < m) { w += sv.getLong(i); i += 1 }
    var l = Math.floorDiv(w, m)
    var b = 0L
    // seasonal ring buffer: head is always s_{t-m}
    val ss = new Array[Long](m)
    i = 0
    while (i < m) { ss(i) = sv.getLong(i) - l; i += 1 }
    var head = 0
    val rs = new Array[Long](n - m)
    var t = m
    while (t < n) {
      val x = sv.getLong(t)
      val sh = ss(head)
      rs(t - m) = x - (l + b + sh)
      val ln = (x - sh + l + b) >> 1
      val bn = (ln - l + b) >> 1
      ss(head) = (x - ln + sh) >> 1 // pop head, push s' (ring advance)
      head = (head + 1) % m
      l = ln
      b = bn
      t += 1
    }
    val ssOut = new Array[Long](m)
    i = 0
    while (i < m) { ssOut(i) = ss((head + i) % m); i += 1 }
    new GenericInternalRow(Array[Any](l, b,
      new GenericArrayData(ssOut), new GenericArrayData(rs)))
  }
}
