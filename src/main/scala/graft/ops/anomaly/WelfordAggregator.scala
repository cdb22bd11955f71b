package graft.ops.anomaly

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass mean/variance via Welford's parallel-merge form — the
  * custom aggregate surface (SURVEY §2.13: one `Aggregator` for
  * streaming-friendly moments). Numerically stable where the naive
  * sum-of-squares cancels catastrophically (values with large mean,
  * small variance — exactly telemetry gauges), and mergeable, so it
  * runs as map-side partial aggregation at any scale.
  */
case class WelfordBuf(n: Long, mean: Double, m2: Double)

case class WelfordStats(n: Long, mean: Double, variance: Double,
    stddev: Double)

object WelfordAggregator
  extends Aggregator[Double, WelfordBuf, WelfordStats] {

  override def zero: WelfordBuf = WelfordBuf(0L, 0.0, 0.0)

  override def reduce(b: WelfordBuf, x: Double): WelfordBuf = {
    val n1 = b.n + 1
    val d = x - b.mean
    val mean1 = b.mean + d / n1
    WelfordBuf(n1, mean1, b.m2 + d * (x - mean1))
  }

  /** Chan et al. parallel merge — combines partial aggregates from
    * different partitions without revisiting rows.
    */
  override def merge(a: WelfordBuf, b: WelfordBuf): WelfordBuf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      WelfordBuf(n,
        a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n * b.n / n)
    }
  }

  override def finish(r: WelfordBuf): WelfordStats = {
    val v = if (r.n == 0) Double.NaN else r.m2 / r.n
    WelfordStats(r.n, r.mean, v, math.sqrt(v))
  }

  override def bufferEncoder: Encoder[WelfordBuf] = Encoders.product
  override def outputEncoder: Encoder[WelfordStats] = Encoders.product

  /** Typed-column form for Dataset aggregation. */
  def stats: TypedColumn[Double, WelfordStats] = toColumn
}
