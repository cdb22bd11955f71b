package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: geohash precision pushdown.
  *
  * `substring(geohash_encode(lat, lon, p), 1, k)` with `k < p` encodes
  * `p`×5 bisection bits per row and throws away all but `k`×5. The
  * geohash prefix property (an n-char hash is exactly the n-char
  * truncation of any longer hash of the same point) makes the rewrite
  * to `geohash_encode(lat, lon, k)` semantics-preserving.
  *
  * This is the hot path of the geo-index build (3-char bucketing of a
  * 12-char encode, `Assignment_3.ipynb:640-647`) — at 100 TB the
  * rewrite removes 75% of the per-row bit work and the intermediate
  * 12-char string allocation.
  */
object GeohashPrecisionPushdown extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Substring(g @ GeohashEncodeExpr(lat, lon, Literal(p: Int, _)),
          Literal(1, _), Literal(k: Int, _)) if k > 0 && k < p =>
        GeohashEncodeExpr(lat, lon, Literal(k))
      case s @ Substring(Substring(
          g @ GeohashEncodeExpr(lat, lon, Literal(p: Int, _)),
          Literal(1, _), Literal(k1: Int, _)), Literal(1, _),
          Literal(k2: Int, _)) if k2 > 0 && math.min(k1, k2) < p =>
        GeohashEncodeExpr(lat, lon, Literal(math.min(k1, k2)))
    }
}
