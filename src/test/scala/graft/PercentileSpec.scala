package graft

import graft.core.Tables
import graft.operators.{Anomaly, Relational, TextAnalysis}
import org.apache.spark.sql.functions._

/** The approx-percentile scale path as spec-gated code: each approx
  * twin (q65/q35/q83) must land inside the Greenwald–Khanna rank-error
  * band of its exact sibling. Accuracy is set LOW (100 → ±1% rank) so
  * the sketch genuinely compresses at spec scale and the bound is a
  * real property, not a trivially-exact pass-through.
  */
class PercentileSpec extends SparkTestBase {

  private val Accuracy = 100

  // the graded scale: 5k docs / 100k events — big enough that a
  // 1%-rank GK sketch genuinely compresses (the spec-default sf0.001
  // would make accuracy=100 near-exact and the property vacuous)
  private val Sf = "/root/testdata/sf0.1"

  /** Value band for percentile p over sorted values under relative
    * rank error eps: anything between the elements at rank
    * floor((p-eps)·(n-1)) and ceil((p+eps)·(n-1)) (clamped) is within
    * spec. The exact aggregate interpolates, so the band edges extend
    * to neighboring elements.
    */
  private def band(sorted: Array[Double], p: Double,
      eps: Double): (Double, Double) = {
    val n = sorted.length
    val lo = math.max(0, math.floor((p - eps) * (n - 1)).toInt)
    val hi = math.min(n - 1, math.ceil((p + eps) * (n - 1)).toInt)
    (sorted(lo), sorted(hi))
  }

  test("q65 approx twin: every quantile lands in the rank-error band " +
    "of the exact per-language distribution") {
    val docs = Tables.documents(spark, Sf)
    val approx = TextAnalysis.lengthQuantilesApprox(docs, Accuracy)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    val exactVals = docs.select(col("lang"), col("n_chars").cast("double"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    val eps = 1.0 / Accuracy
    assert(approx.nonEmpty)
    approx.foreach { case (lang, row) =>
      val sorted = exactVals(lang)
      TextAnalysis.QuantilePs.foreach { p =>
        val v = row.getAs[Double](s"p${(p * 100).toInt}")
        val (lo, hi) = band(sorted, p, eps)
        assert(v >= lo && v <= hi,
          s"$lang p$p: $v outside rank band [$lo, $hi] (n=${sorted.length})")
      }
    }
  }

  test("q35 approx twin: median and MAD within the rank-error band " +
    "per event_type; schema matches the exact query") {
    val exact = Anomaly.q35RobustStats(spark, Sf)
    val approx = Anomaly.robustStatsApprox(spark, Sf, Accuracy)
    assert(approx.schema == exact.schema)
    val ev = Tables.events(spark, Sf)
      .select(col("event_type"),
        expr("CAST(ROUND(value * 10000) AS BIGINT)").as("v4"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1).toDouble).sorted).toMap
    val eps = 1.0 / Accuracy
    val rows = approx.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val sorted = ev(et)
      val med = r.getAs[Double]("median_value") * 10000.0
      val (lo, hi) = band(sorted, 0.5, eps)
      assert(med >= lo - 0.5 && med <= hi + 0.5,
        s"$et median $med outside [$lo, $hi]")
      // MAD band derives from deviations around the APPROX median —
      // the sketch error composes, so allow the band around both
      val devs = sorted.map(v => math.abs(v - med)).sorted
      val mad = r.getAs[Double]("mad") * 10000.0
      val (dlo, dhi) = band(devs, 0.5, eps)
      assert(mad >= dlo - 0.5 && mad <= dhi + 0.5,
        s"$et mad $mad outside [$dlo, $dhi]")
    }
  }

  test("q83 approx twin: user census conserved, segment counts shift " +
    "at most by the users inside the threshold rank bands") {
    val exact = Relational.q83RfmSegments(spark, Sf).collect()
    val approx = Relational.rfmSegmentsApprox(spark, Sf, Accuracy)
      .collect()
    val nExact = exact.map(_.getAs[Long]("n_users")).sum
    val nApprox = approx.map(_.getAs[Long]("n_users")).sum
    assert(nExact == nApprox, "every user must land in exactly one segment")
    // each metric's approx threshold is an ELEMENT within ±eps rank of
    // the exact median, so the users who can flip segment on metric m
    // are exactly those whose value falls between the exact median and
    // some in-band element — a DISTRIBUTION-dependent mass (duplicate
    // runs at the median can flip far more than eps·n users while the
    // sketch stays in-spec). Bound each metric by its actual worst
    // in-band flip mass, then sum across the three metrics.
    val eps = 1.0 / Accuracy
    import org.apache.spark.sql.types.DecimalType
    val perUser = Tables.events(spark, Sf)
      .groupBy(col("user_id"))
      .agg(max(expr("unix_micros(ts)")).as("recency_us"),
        count(lit(1)).as("frequency"),
        sum(when(col("event_type") === "purchase",
          col("value").cast(DecimalType(18, 4)))
          .otherwise(lit(0).cast(DecimalType(18, 4))))
          .cast("double").as("md"))
      .collect()
    def metricBound(vals: Array[Double]): Long = {
      val sorted = vals.sorted
      val n = sorted.length
      // exact interpolated median (Spark percentile definition)
      val em =
        if (n % 2 == 1) sorted(n / 2)
        else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
      val exceedEm = sorted.count(_ > em)
      val lo = math.max(0, math.floor((0.5 - eps) * (n - 1)).toInt)
      val hi = math.min(n - 1, math.ceil((0.5 + eps) * (n - 1)).toInt)
      (lo to hi).map { i =>
        math.abs(sorted.count(_ > sorted(i)) - exceedEm).toLong
      }.max
    }
    val maxShift =
      metricBound(perUser.map(_.getAs[Long]("recency_us").toDouble)) +
        metricBound(perUser.map(_.getAs[Long]("frequency").toDouble)) +
        metricBound(perUser.map(_.getAs[Double]("md")))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Boolean]("r_high"), r.getAs[Boolean]("f_high"),
        r.getAs[Boolean]("m_high"))
    val em = exact.map(r => key(r) -> r.getAs[Long]("n_users")).toMap
    val am = approx.map(r => key(r) -> r.getAs[Long]("n_users")).toMap
    (em.keySet ++ am.keySet).foreach { k =>
      val d = math.abs(em.getOrElse(k, 0L) - am.getOrElse(k, 0L))
      assert(d <= maxShift, s"segment $k shifted by $d > $maxShift users")
    }
  }
}
