package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.{Exact, QueryPack, Tables}

/** Statistical anomaly detection over the `events` stream table — the
  * engine's north-star capability (SURVEY §2.5/§2.11 M10: the
  * reference's VAE stands in for "anomaly detection"; the engine
  * contract is an anomaly-score/flag surface with pluggable scorers;
  * model-based scorers live in graft.ops.anomaly).
  *
  * Exactness design: `value` has 2-decimal precision, so it is scaled
  * to int `v4 = round(value*10^4)` and every z-score predicate is
  * evaluated in exact integer arithmetic —
  *   |v - mean| > k·sigma  ⟺  (v4·n − S)² > k²·(n·Q − S²)
  * with S=Σv4, Q=Σv4² (DECIMAL(38,0) on Spark, HUGEINT in DuckDB).
  * Float z-scores are display-only. This makes outlier sets
  * bit-reproducible across engines AND across partitionings — a
  * property double arithmetic cannot give at any scale.
  */
object Anomaly extends QueryPack {

  private def v4(c: Column): Column = round(c * 10000).cast("long")
  private val D38 = DecimalType(38, 0)

  // --- q32: global z-score outliers per event_type (|z| > 3) -------------
  def q32ZScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).withColumn("v4", v4($"value"))
    val stats = ev.groupBy($"event_type".as("et"))
      .agg(count(lit(1)).as("n"), sum($"v4").as("sv"),
        sum($"v4" * $"v4").as("q"))
    val j = ev.join(broadcast(stats), $"event_type" === $"et")
    val lhs = ($"v4" * $"n" - $"sv").cast(D38)
    val rhs = ($"n".cast(D38) * $"q".cast(D38) -
      $"sv".cast(D38) * $"sv".cast(D38))
    j.filter(lhs * lhs > rhs * lit(9))
      .select($"event_id", $"event_type", $"value",
        Exact.dround(lhs.cast("double") / sqrt(rhs.cast("double")), 4)
          .as("z"))
  }

  // --- q33: tumbling-window stats + in-window outlier counts --------------
  def q33WindowStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).withColumn("v4", v4($"value"))
      .withColumn("w", window($"ts", "10 minutes"))
    val stats = ev.groupBy($"w".as("win"), $"event_type".as("et"))
      .agg(count(lit(1)).as("n"), sum($"v4").as("sv"),
        sum($"v4" * $"v4").as("q"))
    // no broadcast hint: stats keys are (window × event_type), which
    // grows with the data's time span — unbounded at 100 TB, unlike the
    // domain-bounded per-type tables q32/q35/q47 broadcast. The shuffle
    // join co-partitions both sides on the same keys; AQE still picks
    // broadcast at small SFs.
    val j = ev.join(stats, $"w" === $"win" &&
      $"event_type" === $"et")
    val lhs = ($"v4" * $"n" - $"sv").cast(D38)
    val rhs = ($"n".cast(D38) * $"q".cast(D38) -
      $"sv".cast(D38) * $"sv".cast(D38))
    j.groupBy($"w", $"event_type")
      .agg(max($"n").as("n"),
        sum(when(lhs * lhs > rhs * lit(4), 1).otherwise(0))
          .as("n_outliers"),
        Exact.dround(max($"sv").cast("double") / 10000.0 / max($"n"), 4)
          .as("avg_value"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), $"event_type", $"n", $"n_outliers",
        $"avg_value")
  }

  // --- q34: rolling-frame z-score per user (streamable shape) -------------
  def q34Rolling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-10, -1)
    val ev = Tables.events(s, dir).withColumn("v4", v4($"value"))
      .withColumn("nf", count(lit(1)).over(w))
      .withColumn("sf", sum($"v4").over(w))
      .withColumn("qf", sum($"v4" * $"v4").over(w))
    val lhs = ($"v4" * $"nf" - $"sf").cast(D38)
    val rhs = ($"nf".cast(D38) * $"qf".cast(D38) -
      $"sf".cast(D38) * $"sf".cast(D38))
    ev.filter($"nf" >= 5 && lhs * lhs > rhs * lit(4))
      .select($"event_id", $"user_id", $"value",
        Exact.dround($"sf".cast("double") / 10000.0 / $"nf", 4)
          .as("rolling_avg"))
  }

  // --- q35: robust stats (median / MAD) per event_type --------------------
  /** Medians aggregate into a tiny per-type table that broadcast-joins
    * back for the deviation pass. An unframed
    * `percentile(...).over(partitionBy(event_type))` window would
    * materialize every row of an event_type on one reducer — with a
    * handful of types at 100× scale the hottest key lands entirely on
    * one task; the aggregate form ships percentile buffers instead of
    * rows, and the broadcast side is |event_type| rows.
    */
  private def robustStatsFrom(s: SparkSession, dir: String,
      med: String => org.apache.spark.sql.Column): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).withColumn("v4", v4($"value"))
    val m = ev.groupBy($"event_type".as("et"))
      .agg(med("v4").as("med4"))
    ev.join(broadcast(m), $"event_type" === $"et")
      .withColumn("dev", abs($"v4" - $"med4"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        Exact.dround(max($"med4") / 10000.0, 4).as("median_value"),
        Exact.dround(med("dev") / 10000.0, 4).as("mad"))
  }

  def q35RobustStats(s: SparkSession, dir: String): DataFrame =
    robustStatsFrom(s, dir, c => expr(s"percentile($c, 0.5)"))

  /** q35's 100 TB spelling AS CODE: medians and MADs from
    * `approx_percentile` sketches (fixed memory per group, relative
    * rank error ≤ 1/accuracy) instead of exact per-group percentile
    * buffers — the exact form is kept for oracle hash parity, this
    * form is what a hot event_type at 1000× group size needs.
    * Spec-gated on the rank-error band (PercentileSpec).
    */
  def robustStatsApprox(s: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame =
    robustStatsFrom(s, dir,
      c => expr(s"approx_percentile($c, 0.5, $accuracy)").cast("double"))

  // --- q152: exact quantiles via value-domain rollup --------------------------
  /** Exact p50/p90/p99 per event type through the THIRD quantile
    * spelling in the pack — and the one that scales furthest: roll the
    * stream up to (type, cents-value) COUNTS first, then select ranks
    * on the bounded count table. q35's percentile buffers ship every
    * row's value into one aggregation buffer per type (exact, but a
    * hot type's buffer is its row count); the approx twin bounds
    * memory but pays rank error; THIS form is exact AND bounded —
    * state is the VALUE DOMAIN (≤ ~50k distinct cents here), not the
    * row count, the same bounding trick the hourly spine uses for
    * time. The rank rule is the discrete quantile in pure integers:
    * p-quantile = smallest value whose cumulative count satisfies
    * 100·cum ≥ p100·total — no float rank, no ceil-of-double
    * boundary drift (0.9·n in doubles rounds UP across engines at
    * exact multiples; the integer form cannot).
    *
    * Scale shape: ONE map-combined data-sized rollup; the cumsum
    * window runs per type over the bounded value table; the final
    * aggregate is |type| rows. At 100 TB with a bounded-precision
    * metric this is how you get exact tail latencies — the cents map
    * is also [[graft.streaming.AnomalyStream.quantileStream]]'s state.
    */
  def q152ExactQuantiles(s: SparkSession, dir: String): DataFrame =
    exactQuantiles(Tables.events(s, dir))

  def exactQuantiles(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val counts = events
      .select($"event_type", round($"value" * 100).cast("long").as("c"))
      .groupBy($"event_type", $"c").agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy($"event_type").orderBy($"c")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.partitionBy($"event_type")
    val ranked = counts
      .withColumn("cum", sum($"n").over(wCum))
      .withColumn("tot", sum($"n").over(wTot))
    def q(p100: Int): Column =
      (min(when($"cum" * 100 >= $"tot" * p100, $"c"))
        .cast("double") / 100.0).as(s"p$p100")
    ranked.groupBy($"event_type")
      .agg(max($"tot").as("n"), q(50), q(90), q(99))
      .orderBy($"event_type".asc)
  }

  // --- q171: per-type quantiles over PACKED cents maps ------------------------
  /** q152's answer computed through the STREAM'S state shape — the
    * last batch↔stream asymmetry in the detector/sketch matrix:
    * [[graft.streaming.AnomalyStream.quantileStream]] keeps one
    * cents→count map per event type and selects ranks row-locally at
    * emission; this is the identical plan as a batch — the (type,
    * cents) rollup packs to ONE sorted-array row per type (the q148
    * packed-spine pattern applied to the value domain instead of the
    * time domain), and all three rank selections are a single
    * row-local fold over that array. No cumsum window at all: q152
    * pays two window passes over the bounded value table; here
    * everything after the rollup is row-local work on |type| rows,
    * which is the shape that shards freely at 100 TB (the key is the
    * shard, exactly like every other keyed detector).
    *
    * Output adds `n_state` (distinct cents values = the entries in
    * the stream's per-key map) — the operational state-size census a
    * deployment watches to know the bounded-domain contract still
    * holds before the map outgrows executor memory.
    *
    * Scale shape: ONE map-combined data-sized rollup (the only
    * data-sized stage), one bounded shuffle to pack, row-local
    * selection. Oracle: q152's integer rank rule verbatim + the
    * per-group entry count.
    */
  def q171QuantilesPacked(s: SparkSession, dir: String): DataFrame =
    quantilesPacked(Tables.events(s, dir))

  def quantilesPacked(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val packed = events
      .select($"event_type", round($"value" * 100).cast("long").as("c"))
      .groupBy($"event_type", $"c").agg(count(lit(1)).as("n"))
      .groupBy($"event_type")
      .agg(sort_array(collect_list(struct($"c", $"n"))).as("p"),
        sum($"n").as("tot"), count(lit(1)).as("n_state"))
    // one fold pass selects all three ranks: carry the running cum and
    // capture the FIRST value satisfying each rank rule (null until
    // hit — a sentinel value would collide with negative-cents
    // domains). Interpreted HOF, deliberately: the frame is |type|
    // rows here and |key| rows in general — never data-sized.
    val nul = lit(null).cast("long")
    val folded = aggregate($"p",
      struct(lit(0L).as("cum"), nul.as("a50"), nul.as("a90"),
        nul.as("a99")),
      (acc, x) => {
        val cum = acc.getField("cum") + x.getField("n")
        def pick(prev: Column, p100: Int): Column =
          when(prev.isNotNull, prev)
            .otherwise(when(cum * 100 >= $"tot" * p100, x.getField("c")))
        struct(cum.as("cum"),
          pick(acc.getField("a50"), 50).as("a50"),
          pick(acc.getField("a90"), 90).as("a90"),
          pick(acc.getField("a99"), 99).as("a99"))
      })
    packed.withColumn("f", folded)
      .select($"event_type", $"tot".as("n"), $"n_state",
        ($"f.a50".cast("double") / 100.0).as("p50"),
        ($"f.a90".cast("double") / 100.0).as("p90"),
        ($"f.a99".cast("double") / 100.0).as("p99"))
      .orderBy($"event_type".asc)
  }

  // --- q47: seasonal baseline (hour-of-day slot) outliers ------------------
  /** Telemetry seasonality: each event compares against the statistics
    * of its own (event_type, hour-of-day) slot — a spike at 3am is
    * anomalous even if normal for the 2pm slot. Same exact-integer
    * predicate machinery as q32.
    */
  def q47Seasonal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .withColumn("v4", v4($"value"))
      .withColumn("hod", hour($"ts"))
    val stats = ev.groupBy($"event_type".as("et"), $"hod".as("h"))
      .agg(count(lit(1)).as("n"), sum($"v4").as("sv"),
        sum($"v4" * $"v4").as("q"))
    val j = ev.join(broadcast(stats), $"event_type" === $"et" &&
      $"hod" === $"h")
    val lhs = ($"v4" * $"n" - $"sv").cast(D38)
    val rhs = ($"n".cast(D38) * $"q".cast(D38) -
      $"sv".cast(D38) * $"sv".cast(D38))
    j.filter($"n" >= 30 && lhs * lhs > rhs * lit(9))
      .groupBy($"event_type", $"hod")
      .agg(count(lit(1)).as("n_outliers"), max($"value").as("max_value"))
  }

  // --- q86: autocorrelation function per event type -------------------------
  /** ACF lags probed, in hours. */
  private[graft] val AcfLags = Seq(1, 2, 3, 6, 12, 24)

  /** Pearson autocorrelation of the hourly value-total series per
    * event_type at [[AcfLags]] — the diagnostic that reveals the
    * periodicity q47's hour-of-day baselines assume and sizes the
    * rolling detectors' windows.
    *
    * Exactness design (q32's rule extended to covariance): the hourly
    * series is exact cents-scaled integer totals; lag pairing is an
    * equi-join on hour-index − lag (exact integer arithmetic — a
    * row-offset lag() would silently misalign across missing hours);
    * all six moments (n, Σx, Σy, Σxy, Σx², Σy²) accumulate in
    * DECIMAL(38,0) (HUGEINT in the oracle). Each variance factor fits
    * 38 digits, so only their product and the final Pearson ratio run
    * in doubles — on bit-identical exact inputs in both engines.
    *
    * Scale: the series is time-span-bounded (hours × types) — the
    * self-join and moments are over a tiny frame at any event volume;
    * the only corpus-sized work is the first hourly rollup.
    */
  def q86Acf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // LAZY localCheckpoint (one-scan rule, q71's discipline): both
    // sides of the lag self-join read this frame, and without reuse
    // the raw-events rollup ran twice. localCheckpoint over cache():
    // blocks are reclaimed by the ContextCleaner once the frame is
    // unreferenced, so a long-lived session never pins them — cache()
    // entries live in the CacheManager until someone unpersists.
    val series = Tables.events(s, dir)
      .groupBy($"event_type",
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
          .as("hi"))
      .agg(sum(v4($"value")).as("x"))
      .localCheckpoint(false)
    val b = series.toDF("et2", "hj", "y")
    val pairs = series
      .select($"event_type", $"hi", $"x",
        explode(typedLit(AcfLags)).as("lag"))
      .join(b, $"et2" === $"event_type" && $"hj" === $"hi" - $"lag")
      .select($"event_type", $"lag",
        $"x".cast(D38).as("xd"), $"y".cast(D38).as("yd"))
    pearson(pairs, Seq("event_type", "lag"), "acf")
  }

  /** Pearson correlation from exact-decimal (xd, yd) pair rows, one
    * output row per key group: all six moments accumulate in
    * DECIMAL(38,0); doubles appear only in the final ratio, computed
    * from identical exact inputs in both engines. Shared by q86 (ACF)
    * and q88 (cross-correlation).
    */
  private def pearson(pairs: DataFrame, keys: Seq[String],
      out: String): DataFrame = {
    import pairs.sparkSession.implicits._
    pairs
      // DECIMAL(38,0)×DECIMAL(38,0) silently yields NULL on overflow
      // (non-ANSI) — and Sum SKIPS null inputs, so an overflowing
      // per-row product would undercount sxy/sxx/syy while sx/sy/n
      // stay complete: a silently wrong correlation, not even a
      // vanished row. The oracle's HUGEINT instead holds to ~1.7e38
      // or errors loudly. Guard at the ROW level, where the first
      // overflow can happen: inputs are DECIMAL(18,4)-snapped hourly
      // sums, so legitimate products fit 38 digits with room; at
      // extreme magnitudes both engines now fail loudly instead of
      // diverging. The frame is span-bounded, so the check is cheap.
      .filter(assert_true(
        ($"xd" * $"yd").isNotNull && ($"xd" * $"xd").isNotNull &&
          ($"yd" * $"yd").isNotNull,
        lit("pearson: DECIMAL(38,0) overflow in per-row moment product"))
        .isNull)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast(D38).as("n"),
        sum($"xd").as("sx"), sum($"yd").as("sy"),
        sum($"xd" * $"yd").as("sxy"),
        sum($"xd" * $"xd").as("sxx"), sum($"yd" * $"yd").as("syy"))
      .withColumn("dx", $"n" * $"sxx" - $"sx" * $"sx")
      .withColumn("dy", $"n" * $"syy" - $"sy" * $"sy")
      .withColumn("dxy", $"n" * $"sxy" - $"sx" * $"sy")
      // same guard one level up: the n·sxx − sx² cross products can
      // overflow even when every row-level moment fit
      .filter(assert_true(
        $"dx".isNotNull && $"dy".isNotNull && $"dxy".isNotNull,
        lit("pearson: DECIMAL(38,0) overflow in variance cross product"))
        .isNull)
      .filter($"dx" > 0 && $"dy" > 0)
      .select(keys.map(col) ++ Seq($"n".cast("long").as("n"),
        Exact.dround($"dxy".cast("double") /
          sqrt($"dx".cast("double") * $"dy".cast("double")), 4)
          .as(out)): _*)
  }

  // --- q88: lead-lag cross-correlation between two event series -------------
  /** CCF(error → purchase): correlation of the error series against
    * the purchase series shifted by each lag in ±{1,3,6,12,24} and 0 —
    * the lead-lag diagnostic (do error bursts PRECEDE purchase dips?)
    * behind root-cause timelines and alert ordering. Positive lag =
    * purchase series lagged behind error (error leads).
    *
    * Same exactness and scale shape as q86: exact integer hourly
    * totals, hour-index equi-join pairing, DECIMAL(38,0) moments over
    * a time-span-bounded frame.
    */
  private[graft] val CcfLags = Seq(-24, -12, -6, -3, -1, 0, 1, 3, 6, 12, 24)

  def q88CrossCorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def hourly(t: String) = Tables.events(s, dir)
      .filter($"event_type" === t)
      .groupBy(expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
        .as("hi"))
      .agg(sum(v4($"value")).as("x"))
    val a = hourly("error")
    val b = hourly("purchase").toDF("hj", "y")
    val pairs = a
      .select($"hi", $"x", explode(typedLit(CcfLags)).as("lag"))
      .join(b, $"hj" === $"hi" - $"lag")
      .select($"lag", $"x".cast(D38).as("xd"), $"y".cast(D38).as("yd"))
    pearson(pairs, Seq("lag"), "ccf")
  }

  // --- q87: trend / seasonal / residual decomposition -----------------------
  /** Classic additive decomposition of the hourly value series per
    * event_type: trend = centered 24 h moving average, seasonal =
    * hour-of-day mean of the detrended series, residual = the rest —
    * the decomposition whose residual the z-score detectors are
    * implicitly assuming when they flag "anomalies".
    *
    * Determinism design: the series is built on a DENSE hour spine
    * (missing hours fill 0) so the ROWS frame is positionally exact;
    * the trend double (exact-long frame sum / frame count) is snapped
    * to round(trend · 2^20) — integer-granularity rounding of an
    * identical double, safe cross-engine — so the seasonal means
    * aggregate EXACT integers (doubles summed across rows would be
    * partition-order-dependent). Residual composes from the rounded
    * surfaces, which is deterministic given both engines rounded the
    * same exact inputs.
    *
    * Scale: spine and all downstream frames are time-span-bounded;
    * only the first rollup touches raw events (q71's rule).
    */
  def q87Decompose(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val series = Tables.events(s, dir)
      .groupBy($"event_type",
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
          .as("hi"))
      .agg(sum(v4($"value")).as("x0"))
      // lazy localCheckpoint, not cache(): three consumers (bounds,
      // spine types, dense join) share one materialization, and the
      // blocks free with the frame instead of sitting in the
      // CacheManager for the session lifetime (q86's rule)
      .localCheckpoint(false)
    val bounds = series.agg(min($"hi").as("lo"), max($"hi").as("hi2"))
    val spine = series.select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type",
        explode(expr("sequence(lo, hi2)")).as("hi"))
    val w = Window.partitionBy($"event_type").orderBy($"hi")
      .rowsBetween(-12, 11)
    val dense = spine.join(series, Seq("event_type", "hi"), "left")
      .select($"event_type", $"hi", coalesce($"x0", lit(0L)).as("x"))
      .withColumn("tsum", sum($"x").over(w))
      .withColumn("tn", count(lit(1)).over(w))
      // trend snapped to an exact integer at 2^-20 granularity: the
      // seasonal aggregation below must sum EXACT values
      .withColumn("trendq",
        round(($"tsum".cast("double") / $"tn") * 1048576.0).cast("long"))
      .withColumn("detrq", $"x" * 1048576L - $"trendq")
    val seasonal = dense
      .groupBy($"event_type", ($"hi" % 24).as("hod"))
      .agg((sum($"detrq").cast("double") /
        (count(lit(1)) * 1048576.0)).as("seas"))
      .toDF("et2", "hod", "seas") // fresh names: both sides derive
                                  // from `series` (self-join rule)
    dense.join(broadcast(seasonal),
      $"et2" === $"event_type" && $"hi" % 24 === $"hod")
      .select($"event_type", $"hi",
        Exact.dround($"x" / 10000.0, 4).as("value_total"),
        Exact.dround($"trendq" / (10000.0 * 1048576.0), 4).as("trend"),
        Exact.dround($"seas" / 10000.0, 4).as("seasonal"),
        Exact.dround($"detrq" / (10000.0 * 1048576.0) - $"seas" / 10000.0,
          4).as("residual"))
  }

  // --- q137: matrix-profile discord census -----------------------------------
  /** Top-3 DISCORDS of the hourly value series — the subsequences
    * farthest from their nearest non-overlapping neighbor (the
    * matrix-profile reading of "most anomalous window", Yeh et al.
    * 2016, ICDM; the modern standard for exactly the reference's
    * problem). discord(s) = min over |t−s| ≥ W of
    * Σ_k (x[s+k] − x[t+k])² with W = 24 h: a window that resembles NO
    * other day is an anomaly even when no single point trips a
    * z-score — the subsequence-level complement of q32/q35's
    * point detectors and q47's seasonal bands.
    *
    * Exactness: the series is integer cents (round(value·100)) on the
    * q87 dense hour spine, so every pairwise distance is exact BIGINT
    * arithmetic end to end — an all-pairs O(H²) computation under the
    * hash gate.
    *
    * Scale shape: ONLY the first rollup touches raw events (q71's
    * rule); everything after lives on the TIME-SPAN-BOUNDED series
    * (720 hours for a 30-day corpus — one packed row), windows explode
    * from it, and the pair join is a broadcast of that bounded frame
    * against itself — the documented q40-class bounded
    * nested-loop, never a data-sized cartesian. H² pairs ≈ 486k rows
    * with an in-row 24-term integer fold; degenerate spans (< 2W
    * hours) yield an empty census rather than a wrong one.
    */
  def q137Discord(s: SparkSession, dir: String): DataFrame =
    discordCensus(Tables.events(s, dir))

  /** The census over ANY (ts, value) frame — q137 applies it to the
    * driver events; AnomalySpec feeds it a planted-discord series.
    */
  /** The DENSE hourly cents series packed into one (mn, sv) row — the
    * shared spine of the subsequence detectors (q137 discords, q140
    * CUSUM, q141 episodes): hourly integer-cents sums on a
    * zero-filled hour range. TIME-SPAN-bounded by construction (720
    * entries per 30-day corpus), so everything downstream is in-row
    * array work however large the event stream grows; only the first
    * rollup touches raw events (q71's rule).
    */
  /** The raw (hi, x0) hourly cents rollup — the ONLY stage of the
    * series-detector family that reads raw events. Split out so
    * PlanSpec can pin the one-scan contract mechanically: this frame
    * plans exactly one events scan, and [[packedHourlySeries]]
    * checkpoints it so nothing downstream ever plans a file scan.
    */
  private[graft] def hourlyRollup(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
        .as("hi"))
      .agg(sum(round($"value" * 100).cast("long")).as("x0"))
  }

  private[graft] def packedHourlySeries(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    // lazy localCheckpoint (q86's rule): the rollup is consumed TWICE
    // (span bounds + dense-spine join) — uncheckpointed, Catalyst
    // inlines the build at each reference and the bounds branch
    // re-scans raw events just for min/max (a second full corpus scan
    // at 100 TB, found by the round-12 plan audit). Checkpointed, the
    // TIME-SPAN-bounded rollup (≤720 rows/month) materializes once and
    // both consumers read it.
    val e = hourlyRollup(events).localCheckpoint(false)
    val b = e.agg(min($"hi").as("mn"), max($"hi").as("mx"))
    b.select(explode(sequence($"mn", $"mx")).as("hi"), $"mn")
      .join(e, Seq("hi"), "left").na.fill(0L, Seq("x0"))
      .groupBy($"mn")
      .agg(sort_array(collect_list(struct($"hi", $"x0"))).as("p"))
      .select($"mn", transform($"p", x => x.getField("x0")).as("sv"))
  }

  /** Σ_k (wa[k] − wb[k])² as an UNROLLED sum of element_at terms
    * instead of aggregate(zip_with(...)): higher-order functions run
    * interpreted with a fresh 24-element array per pair, and the pair
    * frames evaluate this millions of times — the unrolled expression
    * stays inside whole-stage codegen (straight-line long arithmetic,
    * zero allocation). Exact BIGINT either way.
    */
  private def pairD2(w: Int): Column =
    (1 to w).map { k =>
      val d = element_at(col("wa"), k) - element_at(col("wb"), k)
      d * d
    }.reduce(_ + _)

  def discordCensus(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val W = 24
    val ser = packedHourlySeries(events)
      .filter(size($"sv") >= 2 * W)
    val wins = ser
      .select($"mn", $"sv",
        explode(sequence(lit(0), size($"sv") - W)).as("s"))
      .select($"mn", $"s", slice($"sv", $"s" + 1, lit(W)).as("wa"))
    val other = broadcast(wins.select($"s".as("t"), $"wa".as("wb")))
    // spread the probe side: wins explodes from ONE packed row, so
    // without this the whole H²-pair fold runs on one task (q159's
    // keyed twin measured the same effect 8× worse) — the shuffle
    // moves only the bounded window frame
    wins.repartition($"s")
      .join(other, abs($"s" - $"t") >= W)
      .withColumn("d2", pairD2(W))
      .groupBy($"mn", $"s").agg(min($"d2").as("score"))
      .select(($"mn" + $"s").as("win_start_h"), $"score")
      .orderBy($"score".desc, $"win_start_h".asc).limit(3)
  }

  // --- q140: CUSUM changepoint census ----------------------------------------
  /** Top-5 CUSUM level-shift points of the hourly value series — the
    * classic Page (1954) changepoint statistic: C_t = max(0, C_{t−1} +
    * (x_t − μ)), large where the series has ACCUMULATED drift above
    * its global mean. The complement of q137's discords (a shape that
    * matches no other day) and q32/q35's point outliers: a sustained
    * small elevation trips CUSUM long before any single point trips a
    * z-score — the canonical "slow leak" detector.
    *
    * Exactness: the recurrence has the closed form C_t = P_t −
    * min_{0≤j≤t} P_j over prefix sums P of (x − μ); scaling by n
    * clears the rational mean (n·P_t = n·Σx_i − t·S with S = Σx), so
    * every value is exact BIGINT arithmetic and the census is under
    * the hash gate; only the display drift divides.
    *
    * Scale shape: q137's first half — one event-stream rollup onto
    * the TIME-SPAN-bounded packed series; the prefix sum and running
    * min are windows PARTITIONED BY the series key over that bounded
    * frame (≤720 rows per month per series — the q34/q85
    * bounded-frame class, and exactly how the DuckDB oracle spells
    * it; an earlier in-row O(H²) array spelling put the whole
    * quadratic fold on ONE core and measured 30 s flat at every
    * decade — rewritten to this, it is ~0.4 s). The top-5 rides
    * TakeOrdered. At 100 TB the series key is the shard: one bounded
    * window per metric series, never over the event stream.
    */
  def q140Cusum(s: SparkSession, dir: String): DataFrame =
    cusumCensus(Tables.events(s, dir))

  def cusumCensus(events: DataFrame): DataFrame =
    cusumCensusPacked(packedHourlySeries(events))

  /** The census over an ALREADY-PACKED (mn, sv) spine — q154 feeds all
    * four detector branches from ONE materialized spine through these
    * packed/fold variants, so the ensemble scans raw events once.
    */
  private[graft] def cusumCensusPacked(packed: DataFrame): DataFrame = {
    import packed.sparkSession.implicits._
    val w = Window.partitionBy($"mn").orderBy($"pos")
      .rowsBetween(Window.unboundedPreceding, 0)
    packed
      .select($"mn", size($"sv").cast("long").as("nh"),
        aggregate($"sv", lit(0L), _ + _).as("sx"),
        posexplode($"sv").as(Seq("pos", "x")))
      .withColumn("pf", sum($"x").over(w))
      .withColumn("tp", $"nh" * $"pf" - ($"pos" + 1).cast("long") * $"sx")
      .withColumn("cus", $"tp" - least(lit(0L), min($"tp").over(w)))
      .select(($"mn" + $"pos").as("hour_h"), $"cus".as("cusum_scaled"),
        Exact.dround($"cus".cast("double")
          / ($"nh".cast("double") * 100.0), 2).as("drift_dollars"))
      .orderBy($"cusum_scaled".desc, $"hour_h".asc).limit(5)
  }

  // --- q141: sustained-episode (gaps-and-islands) census ---------------------
  /** Top-5 SUSTAINED anomalous episodes: maximal runs of consecutive
    * hours whose total sits strictly above the global hourly mean,
    * ranked by run length (start-hour ties ascending) with the run's
    * accumulated excess mass — the "elevated for six hours straight"
    * product question that point detectors (q32), subsequence shapes
    * (q137) and drift accumulation (q140) all answer differently.
    * The gaps-and-islands pattern at value grain (q53 sessionization
    * is the same pattern at time-gap grain).
    *
    * Exactness: the above-mean flag is the integer comparison
    * n·x_t > S (no rational mean materialized); the island key for a
    * flagged hour t is t − |{flagged j ≤ t}| — constant exactly
    * within a consecutive run — and excess mass Σ(n·x_t − S) is
    * BIGINT end to end.
    *
    * Scale shape: q140's — flagged hours filter the bounded frame, a
    * row_number window partitioned by the series key assigns island
    * keys (the oracle's own gaps-and-islands spelling), ONE ≤H-row
    * aggregation by island, TakeOrdered for the top-5.
    */
  def q141Episodes(s: SparkSession, dir: String): DataFrame =
    episodeCensus(Tables.events(s, dir))

  def episodeCensus(events: DataFrame): DataFrame =
    episodeCensusPacked(packedHourlySeries(events))

  private[graft] def episodeCensusPacked(packed: DataFrame): DataFrame = {
    import packed.sparkSession.implicits._
    val w = Window.partitionBy($"mn").orderBy($"pos")
    packed
      .select($"mn", size($"sv").cast("long").as("nh"),
        aggregate($"sv", lit(0L), _ + _).as("sx"),
        posexplode($"sv").as(Seq("pos", "x")))
      .filter($"nh" * $"x" > $"sx")
      .withColumn("grp", $"pos" - row_number().over(w))
      .groupBy($"mn", $"nh", $"grp")
      .agg(min($"pos").as("p0"), count(lit(1)).as("len_h"),
        sum($"nh" * $"x" - $"sx").as("excess_scaled"))
      .select(($"mn" + $"p0").as("start_h"), $"len_h", $"excess_scaled",
        Exact.dround($"excess_scaled".cast("double")
          / ($"nh".cast("double") * 100.0), 2).as("excess_dollars"))
      .orderBy($"len_h".desc, $"start_h".asc).limit(5)
  }

  // --- q142: Holt–Winters forecast-residual anomaly census -------------------
  /** Top-5 FORECAST-RESIDUAL anomalies of the hourly value series under
    * an additive Holt–Winters model (Holt 1957 / Winters 1960) with
    * period m = 24 h: level + trend + daily seasonality are tracked by
    * the classic triple-exponential recurrences and each hour is
    * scored by how far the actual lands from its one-step-ahead
    * forecast l + b + s. The FORECASTING reading of "anomaly" —
    * the model says what this hour SHOULD have been — complementing
    * q47's static seasonal bands (no trend adaptation), q137's shape
    * discords, and q140's drift accumulation. This is the reference's
    * own problem statement (forecast-based time-series anomaly
    * detection) as a first-class operator.
    *
    * Exactness: the textbook recurrences mix by rational α; floats
    * would drift across engines over 700 steps. Instead the model runs
    * in FIXED-POINT integer cents with α = β = γ = 1/2 and every mix
    * an explicit floor-halving: floor(a/2) is shiftright(a, 1) on
    * Spark and (a − ((a%2)+2)%2)//2 in DuckDB — identical BIGINTs step
    * for step, so the whole trajectory (and the census) sits under the
    * hash gate. Warmup is the standard init: l₀ = floor(mean of the
    * first day), b₀ = 0, s = first-day deviations; residuals start at
    * hour m.
    *
    * Scale shape: q137's rule — ONLY the first rollup touches raw
    * events; the recurrence is inherently sequential (each state needs
    * the previous), so it runs IN-ROW over the TIME-SPAN-BOUNDED
    * packed series via one `aggregate` fold (≤720 steps × O(m) queue
    * work per month — ~17k element ops, nothing like the O(H²)
    * spelling q140's comment warns about). At 100 TB the series key
    * is the shard: one bounded in-row fold per metric series, the
    * event stream never shuffles twice. Degenerate spans (< 2m hours)
    * yield an empty census.
    */
  def q142HoltWinters(s: SparkSession, dir: String): DataFrame =
    holtWintersCensus(Tables.events(s, dir))

  /** The shared Holt–Winters fold: packs the hourly series, warms up on
    * the first day, steps the fixed-point recurrence in-row, and
    * returns one row (mn, nh, fin) where fin = (l, b, ss, rs) is the
    * final model state plus the full residual trajectory — q142 reads
    * `rs`, q145 reads the terminal (l, b, ss).
    */
  private def holtFold(events: DataFrame): DataFrame =
    holtFoldFromPacked(packedHourlySeries(events))

  private[graft] def holtFoldFromPacked(packed: DataFrame): DataFrame =
    holtFoldPacked(packed)
      .select(col("mn"), col("nh"), col("sv"), col("fin"))

  /** The fold over an ALREADY-PACKED (… , mn, sv) frame — one series
    * per row, any carried key columns preserved. This row-local shape
    * is the whole 100 TB argument: q142/q145/q146 run it on the global
    * series, q148/q157/q161 on one row PER EVENT TYPE — at cluster
    * scale the series key is the shard and each fold is one row's
    * in-row work.
    *
    * The recurrence runs as ONE codegen'd static call per series row
    * ([[graft.functions.SeriesMath.holtFold]], surfaced as the
    * `holt_fold` expression) — O(H + m) element ops with the residual
    * trajectory written positionally into a pre-sized array. (The
    * previous declarative `aggregate` fold accumulated residuals via
    * `concat(rs, array(r))`, copying the growing array every step:
    * O(H²) element copies, ~260k per 720-hour month, in the single
    * most reused kernel in the engine. Outputs are hash-identical —
    * the kernel executes the same BIGINT floor-halving steps.)
    */
  private def holtFoldPacked(packed: DataFrame): DataFrame = {
    import packed.sparkSession.implicits._
    val m = 24
    packed.filter(size($"sv") >= 2 * m)
      .withColumn("nh", size($"sv").cast("long"))
      .withColumn("fin", graft.functions.geo.holt_fold($"sv", m))
  }

  def holtWintersCensus(events: DataFrame): DataFrame =
    holtWintersCensusFold(holtFold(events))

  /** The census over an already-run fold frame — q154's q142 branch
    * reads the SHARED fold output instead of re-running the recurrence.
    */
  private[graft] def holtWintersCensusFold(fold: DataFrame): DataFrame = {
    import fold.sparkSession.implicits._
    val m = 24
    fold
      .select($"mn",
        posexplode($"fin.rs").as(Seq("p", "residual_scaled")))
      .select(($"mn" + m + $"p").as("hour_h"), $"residual_scaled",
        Exact.dround($"residual_scaled".cast("double") / 100.0, 2)
          .as("residual_dollars"))
      .orderBy(abs($"residual_scaled").desc, $"hour_h".asc).limit(5)
  }

  // --- q145: Holt–Winters next-day forecast -----------------------------------
  /** The FORECAST surface q142's model earns: the next 24 hours beyond
    * the series end, f(T+h) = l_T + h·b_T + s_{(T+h) mod 24} from the
    * terminal model state — the capacity-planning product question
    * ("what SHOULD tomorrow look like") that anomaly censuses answer
    * only retrospectively. After the fold consumed hour T = mn+nh−1,
    * the seasonal queue's h-th entry (1-based) is exactly the season of
    * slot T+h, so the projection is element_at(ss, h). Same exactness
    * contract as q142 (all-BIGINT state, display division only); same
    * scale shape (one in-row fold, then a 24-row explode — the
    * forecast itself is O(1) per series however large the history).
    */
  def q145HoltForecast(s: SparkSession, dir: String): DataFrame =
    holtForecast(Tables.events(s, dir))

  def holtForecast(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    holtFold(events)
      .select($"mn", $"nh", $"fin.l".as("l"), $"fin.b".as("b"),
        $"fin.ss".as("ss"),
        explode(sequence(lit(1L), lit(24L))).as("h"))
      .select(($"mn" + $"nh" - 1L + $"h").as("hour_h"),
        ($"l" + $"h" * $"b" + element_at($"ss", $"h".cast("int")))
          .as("forecast_scaled"))
      .select($"hour_h", $"forecast_scaled",
        Exact.dround($"forecast_scaled".cast("double") / 100.0, 2)
          .as("forecast_dollars"))
      .orderBy($"hour_h".asc)
  }

  // --- q153: seasonal-adjusted CUSUM (changepoints on forecast residuals) ----
  /** Page's CUSUM over q142's FORECAST RESIDUALS instead of raw
    * values — the composition production changepoint detection
    * actually deploys for seasonal series: q140 on raw values reads
    * every daily peak as drift and needs the global-mean correction;
    * on residuals the seasonal and trend structure is already
    * subtracted by the model, so C_t = max(0, C_{t−1} + r_t)
    * accumulates only UNEXPLAINED elevation — the slow leak the
    * seasonality would otherwise mask. Same closed form as q140
    * (prefix sum minus running min; residuals are model-centered, so
    * no mean term), exact BIGINT end to end.
    *
    * Scale shape: q142's one fold + q140's keyed windows over the
    * bounded exploded residuals; TakeOrdered top-5.
    */
  def q153ResidualCusum(s: SparkSession, dir: String): DataFrame =
    residualCusum(Tables.events(s, dir))

  def residualCusum(events: DataFrame): DataFrame =
    residualCusumFold(holtFold(events))

  private[graft] def residualCusumFold(fold: DataFrame): DataFrame = {
    import fold.sparkSession.implicits._
    val w = Window.partitionBy($"mn").orderBy($"p")
      .rowsBetween(Window.unboundedPreceding, 0)
    fold
      .select($"mn", posexplode($"fin.rs").as(Seq("p", "r")))
      .withColumn("pf", sum($"r").over(w))
      .withColumn("cus", $"pf" - least(lit(0L), min($"pf").over(w)))
      .select(($"mn" + 24 + $"p").as("hour_h"), $"cus".as("cusum_scaled"),
        Exact.dround($"cus".cast("double") / 100.0, 2).as("drift_dollars"))
      .orderBy($"cusum_scaled".desc, $"hour_h".asc).limit(5)
  }

  // --- q154: detector-ensemble census ------------------------------------------
  /** The dashboard query the detector family exists for: which hours
    * do the four complementary series detectors flag, and where do
    * they AGREE — CUSUM drift (q140), sustained episodes (q141),
    * forecast residuals (q142) and seasonal-adjusted residual CUSUM
    * (q153) each contribute their top-5 hours; the census groups by
    * hour with the detector roster. Corroborated hours (n ≥ 2) are
    * what an on-call pages on; single-detector hours are each
    * detector's unique signal (drift vs shape vs level — the reason
    * four detectors exist). Pure composition: every branch is an
    * already-oracle-checked census, so the ensemble is too.
    *
    * Scale shape: the four branches SHARE ONE materialized spine — the
    * packed hourly rollup is lazily localCheckpoint-ed (the q86/q149
    * lineage-truncation discipline) so raw events are scanned ONCE for
    * the whole ensemble, and the Holt fold output is checkpointed the
    * same way so the 700-step recurrence runs once for the q142 and
    * q153 branches instead of twice. (Round 11 rebuilt the spine
    * independently in all four branches — 4× the scan cost of the one
    * dashboard query the family exists for; PlanSpec now pins the
    * zero-direct-scan plan.) The union is ≤20 rows.
    */
  def q154DetectorEnsemble(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // lazy localCheckpoint, not cache(): blocks free with the frame via
    // the ContextCleaner instead of pinning in the CacheManager
    val packed = packedHourlySeries(Tables.events(s, dir))
      .localCheckpoint(false)
    val fold = holtFoldFromPacked(packed).localCheckpoint(false)
    Seq(
      cusumCensusPacked(packed).select($"hour_h", lit("cusum").as("det")),
      episodeCensusPacked(packed)
        .select($"start_h".as("hour_h"), lit("episode").as("det")),
      holtWintersCensusFold(fold)
        .select($"hour_h", lit("holt_residual").as("det")),
      residualCusumFold(fold)
        .select($"hour_h", lit("residual_cusum").as("det")))
      .reduce(_ unionByName _)
      .groupBy($"hour_h")
      .agg(count(lit(1)).as("n_detectors"),
        concat_ws(",", sort_array(collect_list($"det"))).as("detectors"))
      .orderBy($"n_detectors".desc, $"hour_h".asc)
  }

  // --- q148: per-series Holt–Winters (the sharded form) -----------------------
  /** q142 PER EVENT TYPE — the form a 100 TB deployment actually runs:
    * one packed series row per metric key, the fold as row-local work,
    * keys sharding freely across executors. Every scale claim the
    * global queries make ("the series key is the shard") is this query
    * executed: the ONLY data-sized stage is the (key, hour) rollup;
    * everything after lives on one bounded row per key, and the final
    * per-key top-1 is a window PARTITIONED BY the key (the q140 rule).
    * Output: each type's single largest forecast-residual hour.
    */
  def q148HoltByType(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type")
      .orderBy(abs($"residual_scaled").desc, $"hour_h".asc)
    holtFoldPacked(packedHourlySeriesBy(Tables.events(s, dir), "event_type"))
      .select($"event_type", $"mn",
        posexplode($"fin.rs").as(Seq("p", "residual_scaled")))
      .select($"event_type", ($"mn" + 24 + $"p").as("hour_h"),
        $"residual_scaled")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1).drop("rk")
      .withColumn("residual_dollars",
        Exact.dround($"residual_scaled".cast("double") / 100.0, 2))
      .orderBy($"event_type".asc)
  }

  /** [[packedHourlySeries]] with a series key: one (key, mn, sv) row
    * per key, each on the key's OWN dense hour spine.
    */
  private[graft] def packedHourlySeriesBy(events: DataFrame,
      key: String, checkpointDir: Option[String] = None): DataFrame = {
    import events.sparkSession.implicits._
    // same one-scan discipline as packedHourlySeries: the keyed rollup
    // is consumed twice (per-key bounds + dense join), so checkpoint it
    // (durably when the caller threads a reliable dir — Ckpt's rule)
    val e = graft.core.Ckpt.truncate(events
      .groupBy(col(key),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hi"))
      .agg(sum(round($"value" * 100).cast("long")).as("x0")),
      eager = false, checkpointDir)
    val b = e.groupBy(col(key)).agg(min($"hi").as("mn"), max($"hi").as("mx"))
    b.select(col(key), $"mn", explode(sequence($"mn", $"mx")).as("hi"))
      .join(e, Seq(key, "hi"), "left").na.fill(0L, Seq("x0"))
      .groupBy(col(key), $"mn")
      .agg(sort_array(collect_list(struct($"hi", $"x0"))).as("p"))
      .select(col(key), $"mn", transform($"p", x => x.getField("x0")).as("sv"))
  }

  // --- q155: per-series CUSUM (the sharded form of q140) ----------------------
  /** q140 PER EVENT TYPE — CUSUM drift detection in the form a
    * fleet-telemetry deployment runs (reference analogue: the
    * per-digit/per-class anomaly framing of the VAE,
    * Week#12_Assignment.ipynb:104-190): one packed series row per
    * metric key, the closed-form statistic as key-partitioned window
    * work, per-key top-1 via the q148 window rule. Output: each type's
    * single largest accumulated-drift hour. Same exactness as q140
    * (all-BIGINT, scaled by the key's own nh to clear the rational
    * mean); the ONLY data-sized stage is the (key, hour) rollup.
    */
  def q155CusumByType(s: SparkSession, dir: String): DataFrame =
    cusumByTypePacked(packedHourlySeriesBy(Tables.events(s, dir), "event_type"))

  /** q155's census over an ALREADY-PACKED keyed spine — q161 runs all
    * four keyed detectors off ONE shared spine, so each detector needs
    * the packed-input form (the q154 holtWintersCensusFold split).
    */
  private[graft] def cusumByTypePacked(packed: DataFrame): DataFrame = {
    import packed.sparkSession.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"pos")
      .rowsBetween(Window.unboundedPreceding, 0)
    val top = Window.partitionBy($"event_type")
      .orderBy($"cusum_scaled".desc, $"hour_h".asc)
    packed
      .select($"event_type", $"mn", size($"sv").cast("long").as("nh"),
        aggregate($"sv", lit(0L), _ + _).as("sx"),
        posexplode($"sv").as(Seq("pos", "x")))
      .withColumn("pf", sum($"x").over(w))
      .withColumn("tp", $"nh" * $"pf" - ($"pos" + 1).cast("long") * $"sx")
      .withColumn("cus", $"tp" - least(lit(0L), min($"tp").over(w)))
      .select($"event_type", ($"mn" + $"pos").as("hour_h"),
        $"cus".as("cusum_scaled"),
        Exact.dround($"cus".cast("double")
          / ($"nh".cast("double") * 100.0), 2).as("drift_dollars"))
      .withColumn("rk", row_number().over(top))
      .filter($"rk" === 1).drop("rk")
      .orderBy($"event_type".asc)
  }

  // --- q156: per-series sustained episodes (the sharded form of q141) --------
  /** q141 PER EVENT TYPE: each key's longest maximal run of consecutive
    * hours strictly above ITS OWN mean (n·x > S in the key's integers),
    * with exact accumulated excess mass — per-key top-1 by (length
    * desc, start asc). Same scale shape as q155: one (key, hour)
    * rollup, then key-partitioned windows over the bounded frame.
    */
  def q156EpisodesByType(s: SparkSession, dir: String): DataFrame =
    episodesByTypePacked(
      packedHourlySeriesBy(Tables.events(s, dir), "event_type"))

  /** q156 over an already-packed keyed spine (see [[cusumByTypePacked]]). */
  private[graft] def episodesByTypePacked(packed: DataFrame): DataFrame = {
    import packed.sparkSession.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"pos")
    val top = Window.partitionBy($"event_type")
      .orderBy($"len_h".desc, $"start_h".asc)
    packed
      .select($"event_type", $"mn", size($"sv").cast("long").as("nh"),
        aggregate($"sv", lit(0L), _ + _).as("sx"),
        posexplode($"sv").as(Seq("pos", "x")))
      .filter($"nh" * $"x" > $"sx")
      .withColumn("grp", $"pos" - row_number().over(w))
      .groupBy($"event_type", $"mn", $"nh", $"grp")
      .agg(min($"pos").as("p0"), count(lit(1)).as("len_h"),
        sum($"nh" * $"x" - $"sx").as("excess_scaled"))
      .select($"event_type", ($"mn" + $"p0").as("start_h"), $"len_h",
        $"excess_scaled",
        Exact.dround($"excess_scaled".cast("double")
          / ($"nh".cast("double") * 100.0), 2).as("excess_dollars"))
      .withColumn("rk", row_number().over(top))
      .filter($"rk" === 1).drop("rk")
      .orderBy($"event_type".asc)
  }

  // --- q157: per-series residual CUSUM (the sharded form of q153) ------------
  /** q153 PER EVENT TYPE: each key runs its own fixed-point
    * Holt–Winters fold (one in-row fold per packed key row — q148's
    * sharding argument verbatim) and CUSUMs its own forecast
    * residuals; per-key top-1 is the key's largest unexplained-drift
    * hour. Keys whose span is under two periods drop out (the fold's
    * own guard), exactly as a per-metric deployment would skip
    * series too young to model.
    */
  def q157ResidualCusumByType(s: SparkSession, dir: String): DataFrame =
    residualCusumByTypeFold(holtFoldPacked(
      packedHourlySeriesBy(Tables.events(s, dir), "event_type")))

  /** q157 over an already-run KEYED fold frame (see [[cusumByTypePacked]];
    * the fold half of the split is [[holtFoldPacked]] itself, which
    * q161 checkpoints once and shares).
    */
  private[graft] def residualCusumByTypeFold(fold: DataFrame): DataFrame = {
    import fold.sparkSession.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"p")
      .rowsBetween(Window.unboundedPreceding, 0)
    val top = Window.partitionBy($"event_type")
      .orderBy($"cusum_scaled".desc, $"hour_h".asc)
    fold
      .select($"event_type", $"mn", posexplode($"fin.rs").as(Seq("p", "r")))
      .withColumn("pf", sum($"r").over(w))
      .withColumn("cus", $"pf" - least(lit(0L), min($"pf").over(w)))
      .select($"event_type", ($"mn" + 24 + $"p").as("hour_h"),
        $"cus".as("cusum_scaled"),
        Exact.dround($"cus".cast("double") / 100.0, 2).as("drift_dollars"))
      .withColumn("rk", row_number().over(top))
      .filter($"rk" === 1).drop("rk")
      .orderBy($"event_type".asc)
  }

  // --- q159: per-series discord census (the sharded form of q137) ------------
  /** q137 PER EVENT TYPE — the last detector to get the keyed
    * spelling, completing the family (q148 Holt–Winters, q155 CUSUM,
    * q156 episodes, q157 residual CUSUM): each type's most anomalous
    * 24 h window by matrix-profile discord distance against ITS OWN
    * history, per-key top-1. Exactness as q137 (integer cents, exact
    * BIGINT distances).
    *
    * Scale shape: the pair frame is the TIME-SPAN × |types|-bounded
    * window set broadcast against itself WITH the key equality — the
    * documented q40-class bounded nested loop (~5 types × 697 windows
    * here; at a large type count the join keys on the type and
    * co-partitions instead of broadcasting — same plan class as q148's
    * sharding argument, one bounded quadratic per key).
    */
  def q159DiscordByType(s: SparkSession, dir: String): DataFrame =
    discordByTypePacked(
      packedHourlySeriesBy(Tables.events(s, dir), "event_type"))

  /** q159 over an already-packed keyed spine (see [[cusumByTypePacked]]). */
  private[graft] def discordByTypePacked(packed: DataFrame): DataFrame = {
    import packed.sparkSession.implicits._
    val W = 24
    val top = Window.partitionBy($"event_type")
      .orderBy($"score".desc, $"win_start_h".asc)
    val ser = packed.filter(size($"sv") >= 2 * W)
    val wins = ser
      .select($"event_type", $"mn", $"sv",
        explode(sequence(lit(0), size($"sv") - W)).as("s"))
      .select($"event_type", $"mn", $"s",
        slice($"sv", $"s" + 1, lit(W)).as("wa"))
    val other = broadcast(wins.select($"event_type".as("et2"),
      $"s".as("t"), $"wa".as("wb")))
    // spread the probe side BEFORE the pair join: wins explodes from
    // |types| packed rows, so without this the H²-pair × 24-term fold
    // lands on ≤|types| tasks (measured 16 s at sf0.1; ~2 s spread).
    // The shuffle moves only the bounded window frame.
    wins.repartition($"event_type", $"s")
      .join(other, $"et2" === $"event_type" && abs($"s" - $"t") >= W)
      .withColumn("d2", pairD2(W))
      .groupBy($"event_type", $"mn", $"s").agg(min($"d2").as("score"))
      .select($"event_type", ($"mn" + $"s").as("win_start_h"), $"score")
      .withColumn("rk", row_number().over(top))
      .filter($"rk" === 1).drop("rk")
      .orderBy($"event_type".asc)
  }

  // --- q167: per-type Holt–Winters forecast ------------------------------------
  /** q145's FORECAST surface PER EVENT TYPE — the last global↔keyed
    * asymmetry in the Holt family (q142↔q148 residuals, q153↔q157
    * residual CUSUM, q154↔q161 ensemble; the forecast side had only
    * the global form): each type's next 24 hours from ITS OWN terminal
    * model state, f(T+h) = l_T + h·b_T + ss[h] — the per-metric
    * capacity-planning table a fleet deployment actually serves. Same
    * exactness contract as q145 (all-BIGINT state, display division
    * only); same scale shape as q148 (one in-row fold per key row, the
    * 24-row explode is O(1) per series however large the history).
    * Keys under two periods drop out (the fold's own guard).
    */
  def q167HoltForecastByType(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    holtFoldPacked(packedHourlySeriesBy(Tables.events(s, dir), "event_type"))
      .select($"event_type", $"mn", $"nh", $"fin.l".as("l"),
        $"fin.b".as("b"), $"fin.ss".as("ss"),
        explode(sequence(lit(1L), lit(24L))).as("h"))
      .select($"event_type", ($"mn" + $"nh" - 1L + $"h").as("hour_h"),
        ($"l" + $"h" * $"b" + element_at($"ss", $"h".cast("int")))
          .as("forecast_scaled"))
      .select($"event_type", $"hour_h", $"forecast_scaled",
        Exact.dround($"forecast_scaled".cast("double") / 100.0, 2)
          .as("forecast_dollars"))
      .orderBy($"event_type".asc, $"hour_h".asc)
  }

  // --- q161: keyed detector-ensemble census -----------------------------------
  /** q154's corroboration census over the KEYED detector family — the
    * actual paging surface a fleet deployment runs: for each
    * (event_type, hour), which of the four per-type detectors flagged
    * it as that type's top anomaly — CUSUM drift (q155), sustained
    * episodes (q156), seasonal-adjusted residual CUSUM (q157) and
    * matrix-profile discord (q159). `n_detectors ≥ 2` is the page; a
    * single-detector row is that detector's unique signal for the
    * type. Pure composition: every branch is an already-oracle-checked
    * keyed census, so the ensemble is too. (The discord branch flags a
    * WINDOW start rather than a point hour — corroboration with a
    * point detector at the same hour means "the drift/level break
    * begins exactly where the shape anomaly does", the strongest page.)
    *
    * Scale shape, q154's discipline applied to the keyed family: ONE
    * (key, hour) rollup builds ONE packed keyed spine, lazily
    * localCheckpoint-ed so raw events are scanned ONCE for all four
    * branches; the keyed Holt fold runs ONCE (checkpointed) and feeds
    * the q157 branch; everything downstream lives on |types| bounded
    * rows. PlanSpec pins the one-scan plan. The union is ≤4·|types|
    * rows.
    */
  def q161KeyedEnsemble(s: SparkSession, dir: String): DataFrame =
    keyedEnsembleCensus(Tables.events(s, dir))

  /** q161 over any events frame, with the durable-checkpoint knob: the
    * shared packed spine and the one keyed Holt fold are each consumed
    * by multiple detector branches, so both are checkpointed —
    * localCheckpoint by default, reliable checkpoint(dir) when a
    * cluster caller passes `checkpointDir` (see [[graft.core.Ckpt]];
    * spec pins identical censuses through the durable path).
    */
  def keyedEnsembleCensus(events: DataFrame,
      checkpointDir: Option[String] = None): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    graft.core.Ckpt.init(events, checkpointDir)
    val packed = graft.core.Ckpt.truncate(
      packedHourlySeriesBy(events, "event_type", checkpointDir),
      eager = false, checkpointDir)
    val fold = graft.core.Ckpt.truncate(holtFoldPacked(packed),
      eager = false, checkpointDir)
    Seq(
      cusumByTypePacked(packed)
        .select($"event_type", $"hour_h", lit("cusum").as("det")),
      episodesByTypePacked(packed)
        .select($"event_type", $"start_h".as("hour_h"),
          lit("episode").as("det")),
      residualCusumByTypeFold(fold)
        .select($"event_type", $"hour_h", lit("residual_cusum").as("det")),
      discordByTypePacked(packed)
        .select($"event_type", $"win_start_h".as("hour_h"),
          lit("discord").as("det")))
      .reduce(_ unionByName _)
      .groupBy($"event_type", $"hour_h")
      .agg(count(lit(1)).as("n_detectors"),
        concat_ws(",", sort_array(collect_list($"det"))).as("detectors"))
      .orderBy($"n_detectors".desc, $"event_type".asc, $"hour_h".asc)
  }

  // --- q146: forecast backtest census (model selection) ----------------------
  /** One-step-ahead BACKTEST of three forecasters over the same scored
    * hours (t = m..H−1): Holt–Winters (q142's residual trajectory),
    * seasonal-naive (x[t−24] — "same hour yesterday", the baseline
    * every forecasting paper must beat), and naive (x[t−1]). SSE in
    * exact scaled integers picks `best_model` — the model-selection
    * census a deployment runs before trusting q145's forecasts, and
    * the honesty check on q142 itself: if seasonal-naive wins, the
    * model is not earning its state.
    *
    * Exactness: every residual is a BIGINT difference (HW's from the
    * fixed-point fold; the baselines are array-shift differences), so
    * the three SSEs are exact integer sums — the winner is decided by
    * integer comparison, never float accumulation order. Scale shape:
    * the same ONE fold + in-row zips; nothing new touches raw events.
    */
  def q146Backtest(s: SparkSession, dir: String): DataFrame =
    backtestCensus(Tables.events(s, dir))

  def backtestCensus(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    holtFold(events).select(
      (size($"sv") - 24).cast("long").as("n_scored"),
      aggregate(transform($"fin.rs", r => r * r), lit(0L), _ + _)
        .as("sse_hw"),
      aggregate(zip_with(slice($"sv", lit(25), size($"sv") - 24),
        slice($"sv", lit(1), size($"sv") - 24), (a, b) => (a - b) * (a - b)),
        lit(0L), _ + _).as("sse_snaive"),
      aggregate(zip_with(slice($"sv", lit(25), size($"sv") - 24),
        slice($"sv", lit(24), size($"sv") - 24), (a, b) => (a - b) * (a - b)),
        lit(0L), _ + _).as("sse_naive"))
      .withColumn("best_model",
        when($"sse_hw" <= $"sse_snaive" && $"sse_hw" <= $"sse_naive",
          "holt_winters")
          .when($"sse_snaive" <= $"sse_naive", "seasonal_naive")
          .otherwise("naive"))
  }

  // --- q170: per-type forecast backtest (model selection, keyed) -------------
  /** q146's model-selection census PER EVENT TYPE — the per-metric
    * honesty check a fleet deployment keeps next to q167's forecasts:
    * for each type, which of the three forecasters (Holt–Winters /
    * seasonal-naive / naive) wins the one-step-ahead backtest on ITS
    * OWN series, by exact integer SSE. If seasonal-naive wins a type,
    * that type's model is not earning its state and q167's forecast
    * for it should be read accordingly. Same exactness as q146 (every
    * residual a BIGINT difference, integer SSE comparison); same scale
    * shape as the keyed family (one rollup, one in-row fold + in-row
    * zips per key row).
    */
  def q170BacktestByType(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    holtFoldPacked(packedHourlySeriesBy(Tables.events(s, dir), "event_type"))
      .select($"event_type",
        (size($"sv") - 24).cast("long").as("n_scored"),
        aggregate(transform($"fin.rs", r => r * r), lit(0L), _ + _)
          .as("sse_hw"),
        aggregate(zip_with(slice($"sv", lit(25), size($"sv") - 24),
          slice($"sv", lit(1), size($"sv") - 24), (a, b) => (a - b) * (a - b)),
          lit(0L), _ + _).as("sse_snaive"),
        aggregate(zip_with(slice($"sv", lit(25), size($"sv") - 24),
          slice($"sv", lit(24), size($"sv") - 24), (a, b) => (a - b) * (a - b)),
          lit(0L), _ + _).as("sse_naive"))
      .withColumn("best_model",
        when($"sse_hw" <= $"sse_snaive" && $"sse_hw" <= $"sse_naive",
          "holt_winters")
          .when($"sse_snaive" <= $"sse_naive", "seasonal_naive")
          .otherwise("naive"))
      .orderBy($"event_type".asc)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q142_holt_winters"   -> (q142HoltWinters _),
    "q145_holt_forecast"  -> (q145HoltForecast _),
    "q146_backtest"       -> (q146Backtest _),
    "q148_holt_by_type"   -> (q148HoltByType _),
    "q152_exact_quantiles" -> (q152ExactQuantiles _),
    "q171_quantiles_packed" -> (q171QuantilesPacked _),
    "q153_residual_cusum"  -> (q153ResidualCusum _),
    "q154_detector_ensemble" -> (q154DetectorEnsemble _),
    "q155_cusum_by_type"   -> (q155CusumByType _),
    "q156_episodes_by_type" -> (q156EpisodesByType _),
    "q157_residual_cusum_by_type" -> (q157ResidualCusumByType _),
    "q159_discord_by_type" -> (q159DiscordByType _),
    "q161_keyed_ensemble"  -> (q161KeyedEnsemble _),
    "q167_holt_forecast_by_type" -> (q167HoltForecastByType _),
    "q170_backtest_by_type" -> (q170BacktestByType _),
    "q140_cusum"          -> (q140Cusum _),
    "q141_episodes"       -> (q141Episodes _),
    "q137_discord"        -> (q137Discord _),
    "q47_anomaly_seasonal" -> (q47Seasonal _),
    "q87_decompose"       -> (q87Decompose _),
    "q32_anomaly_zscore"  -> (q32ZScore _),
    "q33_anomaly_window"  -> (q33WindowStats _),
    "q34_anomaly_rolling" -> (q34Rolling _),
    "q35_anomaly_robust"  -> (q35RobustStats _),
    "q86_acf"             -> (q86Acf _),
    "q88_cross_corr"      -> (q88CrossCorr _),
  )

  private val v4Sql = "CAST(ROUND(value * 10000) AS BIGINT)"

  override def oracleSql: Map[String, String] = Map(
    "q142_holt_winters" ->
      // same cents series on the same dense spine; the fixed-point
      // Holt–Winters recurrence replayed step for step by a recursive
      // CTE — floor-halving spelled (a − ((a%2)+2)%2)//2, the seasonal
      // queue carried as a LIST (head = s_{t-m}, pop/push per step).
      // Exact BIGINT end to end; only the display division rounds.
      {
        def fd2(e: String) = s"((($e) - (((($e) % 2) + 2) % 2)) // 2)"
        val ln = fd2("ser.x - rec.ss[1] + rec.l + rec.b2")
        val bn = fd2(s"$ln - rec.l + rec.b2")
        val sn = fd2(s"ser.x - $ln + rec.ss[1]")
        s"""WITH RECURSIVE s AS (SELECT
          |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
          |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x0
          | FROM events GROUP BY 1),
          |b AS (SELECT MIN(hi) mn, MAX(hi) mx FROM s),
          |g AS (SELECT gs.hi FROM b, UNNEST(range(b.mn, b.mx + 1)) gs(hi)),
          |ser AS (SELECT g.hi - b.mn AS idx, COALESCE(s.x0, 0) AS x
          |  FROM g CROSS JOIN b LEFT JOIN s ON s.hi = g.hi),
          |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nh FROM ser),
          |w AS (SELECT CAST(SUM(x) AS BIGINT) AS s24 FROM ser WHERE idx < 24),
          |i AS (SELECT ((s24 - ((s24 % 24) + 24) % 24) // 24) AS l0 FROM w),
          |s0 AS (SELECT list(ser.x - i.l0 ORDER BY ser.idx) AS ss
          |  FROM ser, i WHERE ser.idx < 24),
          |rec AS (
          |  SELECT CAST(23 AS BIGINT) AS t, i.l0 AS l,
          |    CAST(0 AS BIGINT) AS b2, s0.ss AS ss, CAST(NULL AS BIGINT) AS r
          |  FROM i, s0
          |  UNION ALL
          |  SELECT ser.idx, CAST($ln AS BIGINT) AS l, CAST($bn AS BIGINT) AS b2,
          |    list_concat(rec.ss[2:24], [CAST($sn AS BIGINT)]) AS ss,
          |    CAST(ser.x - (rec.l + rec.b2 + rec.ss[1]) AS BIGINT) AS r
          |  FROM rec JOIN ser ON ser.idx = rec.t + 1)
          |SELECT CAST(b.mn + rec.t AS BIGINT) AS hour_h,
          | rec.r AS residual_scaled,
          | ${graft.core.Exact.sqlDround("CAST(rec.r AS DOUBLE) / 100.0", 2)}
          |   AS residual_dollars
          |FROM rec CROSS JOIN b CROSS JOIN n
          |WHERE rec.r IS NOT NULL AND n.nh >= 48
          |ORDER BY ABS(rec.r) DESC, hour_h ASC LIMIT 5""".stripMargin
      },
    "q145_holt_forecast" ->
      // q142's recursive CTE run to the terminal state row (t = nh−1),
      // then 24 projections l + h·b + ss[h] — the queue's h-th entry
      // IS the season of slot T+h
      {
        def fd2(e: String) = s"((($e) - (((($e) % 2) + 2) % 2)) // 2)"
        val ln = fd2("ser.x - rec.ss[1] + rec.l + rec.b2")
        val bn = fd2(s"$ln - rec.l + rec.b2")
        val sn = fd2(s"ser.x - $ln + rec.ss[1]")
        s"""WITH RECURSIVE s AS (SELECT
          |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
          |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x0
          | FROM events GROUP BY 1),
          |b AS (SELECT MIN(hi) mn, MAX(hi) mx FROM s),
          |g AS (SELECT gs.hi FROM b, UNNEST(range(b.mn, b.mx + 1)) gs(hi)),
          |ser AS (SELECT g.hi - b.mn AS idx, COALESCE(s.x0, 0) AS x
          |  FROM g CROSS JOIN b LEFT JOIN s ON s.hi = g.hi),
          |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nh FROM ser),
          |w AS (SELECT CAST(SUM(x) AS BIGINT) AS s24 FROM ser WHERE idx < 24),
          |i AS (SELECT ((s24 - ((s24 % 24) + 24) % 24) // 24) AS l0 FROM w),
          |s0 AS (SELECT list(ser.x - i.l0 ORDER BY ser.idx) AS ss
          |  FROM ser, i WHERE ser.idx < 24),
          |rec AS (
          |  SELECT CAST(23 AS BIGINT) AS t, i.l0 AS l,
          |    CAST(0 AS BIGINT) AS b2, s0.ss AS ss
          |  FROM i, s0
          |  UNION ALL
          |  SELECT ser.idx, CAST($ln AS BIGINT) AS l, CAST($bn AS BIGINT) AS b2,
          |    list_concat(rec.ss[2:24], [CAST($sn AS BIGINT)]) AS ss
          |  FROM rec JOIN ser ON ser.idx = rec.t + 1)
          |SELECT CAST(b.mn + rec.t + hs.h AS BIGINT) AS hour_h,
          | CAST(rec.l + hs.h * rec.b2 + rec.ss[CAST(hs.h AS INT)] AS BIGINT)
          |   AS forecast_scaled,
          | ${graft.core.Exact.sqlDround(
              "CAST(rec.l + hs.h * rec.b2 + rec.ss[CAST(hs.h AS INT)] " +
              "AS DOUBLE) / 100.0", 2)} AS forecast_dollars
          |FROM rec CROSS JOIN b CROSS JOIN n, UNNEST(range(1, 25)) hs(h)
          |WHERE rec.t = n.nh - 1 AND n.nh >= 48
          |ORDER BY hour_h ASC""".stripMargin
      },
    "q146_backtest" ->
      // q142's recursive CTE supplies the HW residuals; the baselines
      // are LAG differences over the same dense spine; integer SSEs,
      // identical CASE precedence for the winner
      {
        def fd2(e: String) = s"((($e) - (((($e) % 2) + 2) % 2)) // 2)"
        val ln = fd2("ser.x - rec.ss[1] + rec.l + rec.b2")
        val bn = fd2(s"$ln - rec.l + rec.b2")
        val sn = fd2(s"ser.x - $ln + rec.ss[1]")
        s"""WITH RECURSIVE s AS (SELECT
          |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
          |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x0
          | FROM events GROUP BY 1),
          |b AS (SELECT MIN(hi) mn, MAX(hi) mx FROM s),
          |g AS (SELECT gs.hi FROM b, UNNEST(range(b.mn, b.mx + 1)) gs(hi)),
          |ser AS (SELECT g.hi - b.mn AS idx, COALESCE(s.x0, 0) AS x
          |  FROM g CROSS JOIN b LEFT JOIN s ON s.hi = g.hi),
          |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nh FROM ser),
          |w AS (SELECT CAST(SUM(x) AS BIGINT) AS s24 FROM ser WHERE idx < 24),
          |i AS (SELECT ((s24 - ((s24 % 24) + 24) % 24) // 24) AS l0 FROM w),
          |s0 AS (SELECT list(ser.x - i.l0 ORDER BY ser.idx) AS ss
          |  FROM ser, i WHERE ser.idx < 24),
          |rec AS (
          |  SELECT CAST(23 AS BIGINT) AS t, i.l0 AS l,
          |    CAST(0 AS BIGINT) AS b2, s0.ss AS ss, CAST(NULL AS BIGINT) AS r
          |  FROM i, s0
          |  UNION ALL
          |  SELECT ser.idx, CAST($ln AS BIGINT) AS l, CAST($bn AS BIGINT) AS b2,
          |    list_concat(rec.ss[2:24], [CAST($sn AS BIGINT)]) AS ss,
          |    CAST(ser.x - (rec.l + rec.b2 + rec.ss[1]) AS BIGINT) AS r
          |  FROM rec JOIN ser ON ser.idx = rec.t + 1),
          |hw AS (SELECT CAST(SUM(r * r) AS BIGINT) AS sse_hw
          |  FROM rec WHERE r IS NOT NULL),
          |bl AS (SELECT
          |  CAST(SUM(CASE WHEN idx >= 24
          |    THEN (x - x24) * (x - x24) END) AS BIGINT) AS sse_snaive,
          |  CAST(SUM(CASE WHEN idx >= 24
          |    THEN (x - x1) * (x - x1) END) AS BIGINT) AS sse_naive
          | FROM (SELECT idx, x,
          |    LAG(x, 24) OVER (ORDER BY idx) AS x24,
          |    LAG(x, 1) OVER (ORDER BY idx) AS x1 FROM ser))
          |SELECT CAST(n.nh - 24 AS BIGINT) AS n_scored,
          | hw.sse_hw, bl.sse_snaive, bl.sse_naive,
          | CASE WHEN sse_hw <= sse_snaive AND sse_hw <= sse_naive
          |   THEN 'holt_winters'
          |  WHEN sse_snaive <= sse_naive THEN 'seasonal_naive'
          |  ELSE 'naive' END AS best_model
          |FROM hw CROSS JOIN bl CROSS JOIN n WHERE n.nh >= 48""".stripMargin
      },
    "q154_detector_ensemble" ->
      // all four detectors off ONE shared spine + recurrence: each
      // branch is its original oracle's final SELECT (top-5, identical
      // tie rules), unioned and grouped; STRING_AGG(det ORDER BY det)
      // mirrors concat_ws over sort_array
      {
        def fd2(e: String) = s"((($e) - (((($e) % 2) + 2) % 2)) // 2)"
        val ln = fd2("ser.x - rec.ss[1] + rec.l + rec.b2")
        val bn = fd2(s"$ln - rec.l + rec.b2")
        val sn = fd2(s"ser.x - $ln + rec.ss[1]")
        s"""WITH RECURSIVE s AS (SELECT
          |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
          |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x0
          | FROM events GROUP BY 1),
          |b AS (SELECT MIN(hi) mn, MAX(hi) mx FROM s),
          |g AS (SELECT gs.hi FROM b, UNNEST(range(b.mn, b.mx + 1)) gs(hi)),
          |ser AS (SELECT g.hi - b.mn AS idx, COALESCE(s.x0, 0) AS x
          |  FROM g CROSS JOIN b LEFT JOIN s ON s.hi = g.hi),
          |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nh,
          |  CAST(SUM(x) AS BIGINT) AS sx FROM ser),
          |w AS (SELECT CAST(SUM(x) AS BIGINT) AS s24 FROM ser WHERE idx < 24),
          |i AS (SELECT ((s24 - ((s24 % 24) + 24) % 24) // 24) AS l0 FROM w),
          |s0 AS (SELECT list(ser.x - i.l0 ORDER BY ser.idx) AS ss
          |  FROM ser, i WHERE ser.idx < 24),
          |rec AS (
          |  SELECT CAST(23 AS BIGINT) AS t, i.l0 AS l,
          |    CAST(0 AS BIGINT) AS b2, s0.ss AS ss, CAST(NULL AS BIGINT) AS r
          |  FROM i, s0
          |  UNION ALL
          |  SELECT ser.idx, CAST($ln AS BIGINT) AS l, CAST($bn AS BIGINT) AS b2,
          |    list_concat(rec.ss[2:24], [CAST($sn AS BIGINT)]) AS ss,
          |    CAST(ser.x - (rec.l + rec.b2 + rec.ss[1]) AS BIGINT) AS r
          |  FROM rec JOIN ser ON ser.idx = rec.t + 1),
          |p1 AS (SELECT idx, CAST(SUM(x) OVER (ORDER BY idx
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |  AS pf FROM ser),
          |t1 AS (SELECT idx, n.nh * pf - (idx + 1) * n.sx AS tp
          |  FROM p1 CROSS JOIN n),
          |c1 AS (SELECT idx, tp - LEAST(0, MIN(tp) OVER (ORDER BY idx
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cus
          |  FROM t1),
          |top_cusum AS (SELECT b.mn + c1.idx AS hour_h, 'cusum' AS det
          |  FROM c1 CROSS JOIN b
          |  ORDER BY c1.cus DESC, hour_h ASC LIMIT 5),
          |f1 AS (SELECT idx, x FROM ser CROSS JOIN n WHERE n.nh * x > n.sx),
          |i1 AS (SELECT idx,
          |  idx - ROW_NUMBER() OVER (ORDER BY idx) AS grp FROM f1),
          |r1 AS (SELECT grp, MIN(idx) AS p0, COUNT(*) AS len_h
          |  FROM i1 GROUP BY 1),
          |top_episode AS (SELECT b.mn + r1.p0 AS hour_h, 'episode' AS det
          |  FROM r1 CROSS JOIN b
          |  ORDER BY r1.len_h DESC, hour_h ASC LIMIT 5),
          |top_holt AS (SELECT b.mn + rec.t AS hour_h, 'holt_residual' AS det
          |  FROM rec CROSS JOIN b CROSS JOIN n
          |  WHERE rec.r IS NOT NULL AND n.nh >= 48
          |  ORDER BY ABS(rec.r) DESC, hour_h ASC LIMIT 5),
          |p2 AS (SELECT t, CAST(SUM(r) OVER (ORDER BY t
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |  AS pf FROM rec WHERE r IS NOT NULL),
          |c2 AS (SELECT t, pf - LEAST(0, MIN(pf) OVER (ORDER BY t
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cus
          |  FROM p2),
          |top_rc AS (SELECT b.mn + c2.t AS hour_h, 'residual_cusum' AS det
          |  FROM c2 CROSS JOIN b CROSS JOIN n WHERE n.nh >= 48
          |  ORDER BY c2.cus DESC, hour_h ASC LIMIT 5),
          |u AS (SELECT * FROM top_cusum UNION ALL
          |  SELECT * FROM top_episode UNION ALL
          |  SELECT * FROM top_holt UNION ALL SELECT * FROM top_rc)
          |SELECT CAST(hour_h AS BIGINT) AS hour_h,
          | CAST(COUNT(*) AS BIGINT) AS n_detectors,
          | STRING_AGG(det, ',' ORDER BY det) AS detectors
          |FROM u GROUP BY 1
          |ORDER BY n_detectors DESC, hour_h ASC""".stripMargin
      },
    "q153_residual_cusum" ->
      // q142's recursive CTE supplies the residual stream; the CUSUM
      // closed form (prefix sum minus running min, no mean term —
      // residuals are model-centered) replays with window functions
      {
        def fd2(e: String) = s"((($e) - (((($e) % 2) + 2) % 2)) // 2)"
        val ln = fd2("ser.x - rec.ss[1] + rec.l + rec.b2")
        val bn = fd2(s"$ln - rec.l + rec.b2")
        val sn = fd2(s"ser.x - $ln + rec.ss[1]")
        s"""WITH RECURSIVE s AS (SELECT
          |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
          |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x0
          | FROM events GROUP BY 1),
          |b AS (SELECT MIN(hi) mn, MAX(hi) mx FROM s),
          |g AS (SELECT gs.hi FROM b, UNNEST(range(b.mn, b.mx + 1)) gs(hi)),
          |ser AS (SELECT g.hi - b.mn AS idx, COALESCE(s.x0, 0) AS x
          |  FROM g CROSS JOIN b LEFT JOIN s ON s.hi = g.hi),
          |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nh FROM ser),
          |w AS (SELECT CAST(SUM(x) AS BIGINT) AS s24 FROM ser WHERE idx < 24),
          |i AS (SELECT ((s24 - ((s24 % 24) + 24) % 24) // 24) AS l0 FROM w),
          |s0 AS (SELECT list(ser.x - i.l0 ORDER BY ser.idx) AS ss
          |  FROM ser, i WHERE ser.idx < 24),
          |rec AS (
          |  SELECT CAST(23 AS BIGINT) AS t, i.l0 AS l,
          |    CAST(0 AS BIGINT) AS b2, s0.ss AS ss, CAST(NULL AS BIGINT) AS r
          |  FROM i, s0
          |  UNION ALL
          |  SELECT ser.idx, CAST($ln AS BIGINT) AS l, CAST($bn AS BIGINT) AS b2,
          |    list_concat(rec.ss[2:24], [CAST($sn AS BIGINT)]) AS ss,
          |    CAST(ser.x - (rec.l + rec.b2 + rec.ss[1]) AS BIGINT) AS r
          |  FROM rec JOIN ser ON ser.idx = rec.t + 1),
          |p AS (SELECT t, CAST(SUM(r) OVER (ORDER BY t
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |  AS pf FROM rec WHERE r IS NOT NULL),
          |c AS (SELECT t, pf - LEAST(0, MIN(pf) OVER (ORDER BY t
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cus FROM p)
          |SELECT CAST(b.mn + c.t AS BIGINT) AS hour_h,
          | CAST(cus AS BIGINT) AS cusum_scaled,
          | ${graft.core.Exact.sqlDround("CAST(cus AS DOUBLE) / 100.0", 2)}
          |   AS drift_dollars
          |FROM c CROSS JOIN b CROSS JOIN n WHERE n.nh >= 48
          |ORDER BY cusum_scaled DESC, hour_h ASC LIMIT 5""".stripMargin
      },
    "q152_exact_quantiles" ->
      // the identical integer rank rule over the identical cents
      // rollup — discrete quantile = smallest value with
      // 100·cum ≥ p·total
      """WITH c AS (SELECT event_type,
        |  CAST(ROUND(value * 100) AS BIGINT) AS c,
        |  CAST(COUNT(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, c, n,
        |  CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY c
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum,
        |  CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot
        | FROM c)
        |SELECT event_type, MAX(tot) AS n,
        | CAST(MIN(CASE WHEN cum * 100 >= tot * 50 THEN c END) AS DOUBLE)
        |   / 100.0 AS p50,
        | CAST(MIN(CASE WHEN cum * 100 >= tot * 90 THEN c END) AS DOUBLE)
        |   / 100.0 AS p90,
        | CAST(MIN(CASE WHEN cum * 100 >= tot * 99 THEN c END) AS DOUBLE)
        |   / 100.0 AS p99
        |FROM r GROUP BY 1 ORDER BY event_type ASC""".stripMargin,
    "q171_quantiles_packed" ->
      // q152's integer rank rule verbatim + the per-group entry count
      // (the stream's per-key map size) — the packed plan must land
      // the identical quantiles
      """WITH c AS (SELECT event_type,
        |  CAST(ROUND(value * 100) AS BIGINT) AS c,
        |  CAST(COUNT(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, c, n,
        |  CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY c
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum,
        |  CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot
        | FROM c)
        |SELECT event_type, MAX(tot) AS n,
        | CAST(COUNT(*) AS BIGINT) AS n_state,
        | CAST(MIN(CASE WHEN cum * 100 >= tot * 50 THEN c END) AS DOUBLE)
        |   / 100.0 AS p50,
        | CAST(MIN(CASE WHEN cum * 100 >= tot * 90 THEN c END) AS DOUBLE)
        |   / 100.0 AS p90,
        | CAST(MIN(CASE WHEN cum * 100 >= tot * 99 THEN c END) AS DOUBLE)
        |   / 100.0 AS p99
        |FROM r GROUP BY 1 ORDER BY event_type ASC""".stripMargin,
    "q148_holt_by_type" ->
      // the q142 recurrence with a series key threaded through every
      // CTE: all five series step in lockstep (one rec row per type
      // per hour), each on its own dense spine; per-type top-1 via
      // QUALIFY row_number
      {
        def fd2(e: String) = s"((($e) - (((($e) % 2) + 2) % 2)) // 2)"
        val ln = fd2("ser.x - rec.ss[1] + rec.l + rec.b2")
        val bn = fd2(s"$ln - rec.l + rec.b2")
        val sn = fd2(s"ser.x - $ln + rec.ss[1]")
        s"""WITH RECURSIVE s AS (SELECT event_type AS et,
          |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
          |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x0
          | FROM events GROUP BY 1, 2),
          |b AS (SELECT et, MIN(hi) mn, MAX(hi) mx FROM s GROUP BY 1),
          |g AS (SELECT b.et, gs.hi
          |  FROM b, UNNEST(range(b.mn, b.mx + 1)) gs(hi)),
          |ser AS (SELECT g.et, g.hi - b.mn AS idx, COALESCE(s.x0, 0) AS x
          |  FROM g JOIN b ON b.et = g.et
          |  LEFT JOIN s ON s.et = g.et AND s.hi = g.hi),
          |n AS (SELECT et, CAST(COUNT(*) AS BIGINT) AS nh
          |  FROM ser GROUP BY 1),
          |w AS (SELECT et, CAST(SUM(x) AS BIGINT) AS s24 FROM ser
          |  WHERE idx < 24 GROUP BY 1),
          |i AS (SELECT et,
          |  ((s24 - ((s24 % 24) + 24) % 24) // 24) AS l0 FROM w),
          |s0 AS (SELECT ser.et, list(ser.x - i.l0 ORDER BY ser.idx) AS ss
          |  FROM ser JOIN i USING (et) WHERE ser.idx < 24 GROUP BY ser.et),
          |rec AS (
          |  SELECT i.et, CAST(23 AS BIGINT) AS t, i.l0 AS l,
          |    CAST(0 AS BIGINT) AS b2, s0.ss AS ss, CAST(NULL AS BIGINT) AS r
          |  FROM i JOIN s0 USING (et)
          |  UNION ALL
          |  SELECT rec.et, ser.idx, CAST($ln AS BIGINT) AS l,
          |    CAST($bn AS BIGINT) AS b2,
          |    list_concat(rec.ss[2:24], [CAST($sn AS BIGINT)]) AS ss,
          |    CAST(ser.x - (rec.l + rec.b2 + rec.ss[1]) AS BIGINT) AS r
          |  FROM rec JOIN ser ON ser.et = rec.et AND ser.idx = rec.t + 1)
          |SELECT rec.et AS event_type,
          | CAST(b.mn + rec.t AS BIGINT) AS hour_h,
          | rec.r AS residual_scaled,
          | ${graft.core.Exact.sqlDround("CAST(rec.r AS DOUBLE) / 100.0", 2)}
          |   AS residual_dollars
          |FROM rec JOIN b ON b.et = rec.et JOIN n ON n.et = rec.et
          |WHERE rec.r IS NOT NULL AND n.nh >= 48
          |QUALIFY row_number() OVER (PARTITION BY rec.et
          |  ORDER BY ABS(rec.r) DESC, hour_h ASC) = 1
          |ORDER BY event_type ASC""".stripMargin
      },
    "q155_cusum_by_type" ->
      // q140's closed form with the series key threaded through every
      // CTE — each type's CUSUM over its own dense spine and mean,
      // per-type top-1 via QUALIFY row_number
      """WITH s AS (SELECT event_type AS et,
        |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x0
        | FROM events GROUP BY 1, 2),
        |b AS (SELECT et, MIN(hi) mn, MAX(hi) mx FROM s GROUP BY 1),
        |g AS (SELECT b.et, gs.hi
        |  FROM b, UNNEST(range(b.mn, b.mx + 1)) gs(hi)),
        |ser AS (SELECT g.et, g.hi - b.mn AS idx, COALESCE(s.x0, 0) AS x
        |  FROM g JOIN b ON b.et = g.et
        |  LEFT JOIN s ON s.et = g.et AND s.hi = g.hi),
        |n AS (SELECT et, CAST(COUNT(*) AS BIGINT) AS nh,
        |  CAST(SUM(x) AS BIGINT) AS sx FROM ser GROUP BY 1),
        |p AS (SELECT et, idx, CAST(SUM(x) OVER (PARTITION BY et
        |  ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS BIGINT) AS pf FROM ser),
        |t AS (SELECT p.et, idx, n.nh * pf - (idx + 1) * n.sx AS tp
        |  FROM p JOIN n ON n.et = p.et),
        |c AS (SELECT et, idx, tp - LEAST(0, MIN(tp) OVER (PARTITION BY et
        |  ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |  AS cus FROM t)
        |SELECT c.et AS event_type, CAST(b.mn + c.idx AS BIGINT) AS hour_h,
        | CAST(cus AS BIGINT) AS cusum_scaled,
        | CAST(ROUND(CAST(CAST(cus AS DOUBLE)
        |   / (CAST(n.nh AS DOUBLE) * 100.0) AS DECIMAL(28,10)), 2)
        |   AS DOUBLE) AS drift_dollars
        |FROM c JOIN b ON b.et = c.et JOIN n ON n.et = c.et
        |QUALIFY row_number() OVER (PARTITION BY c.et
        |  ORDER BY cus DESC, hour_h ASC) = 1
        |ORDER BY event_type ASC""".stripMargin,
    "q156_episodes_by_type" ->
      // q141's gaps-and-islands with the series key threaded through:
      // flagged = above the KEY's own scaled mean, island keys per
      // key, per-type top-1 via QUALIFY row_number
      """WITH s AS (SELECT event_type AS et,
        |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x0
        | FROM events GROUP BY 1, 2),
        |b AS (SELECT et, MIN(hi) mn, MAX(hi) mx FROM s GROUP BY 1),
        |g AS (SELECT b.et, gs.hi
        |  FROM b, UNNEST(range(b.mn, b.mx + 1)) gs(hi)),
        |ser AS (SELECT g.et, g.hi - b.mn AS idx, COALESCE(s.x0, 0) AS x
        |  FROM g JOIN b ON b.et = g.et
        |  LEFT JOIN s ON s.et = g.et AND s.hi = g.hi),
        |n AS (SELECT et, CAST(COUNT(*) AS BIGINT) AS nh,
        |  CAST(SUM(x) AS BIGINT) AS sx FROM ser GROUP BY 1),
        |f AS (SELECT ser.et, idx, x FROM ser JOIN n ON n.et = ser.et
        |  WHERE n.nh * x > n.sx),
        |i AS (SELECT et, idx, x,
        |  idx - ROW_NUMBER() OVER (PARTITION BY et ORDER BY idx) AS grp
        |  FROM f),
        |r AS (SELECT i.et, grp, MIN(idx) AS p0,
        |  CAST(COUNT(*) AS BIGINT) AS len_h,
        |  CAST(SUM(n.nh * x - n.sx) AS BIGINT) AS excess_scaled
        | FROM i JOIN n ON n.et = i.et GROUP BY 1, 2, n.nh, n.sx)
        |SELECT r.et AS event_type, CAST(b.mn + r.p0 AS BIGINT) AS start_h,
        | len_h, excess_scaled,
        | CAST(ROUND(CAST(CAST(excess_scaled AS DOUBLE)
        |   / (CAST(n.nh AS DOUBLE) * 100.0) AS DECIMAL(28,10)), 2)
        |   AS DOUBLE) AS excess_dollars
        |FROM r JOIN b ON b.et = r.et JOIN n ON n.et = r.et
        |QUALIFY row_number() OVER (PARTITION BY r.et
        |  ORDER BY len_h DESC, start_h ASC) = 1
        |ORDER BY event_type ASC""".stripMargin,
    "q157_residual_cusum_by_type" ->
      // q148's keyed recursive recurrence supplies each type's residual
      // stream; the CUSUM closed form runs PARTITIONED BY the key;
      // per-type top-1 via QUALIFY row_number
      {
        def fd2(e: String) = s"((($e) - (((($e) % 2) + 2) % 2)) // 2)"
        val ln = fd2("ser.x - rec.ss[1] + rec.l + rec.b2")
        val bn = fd2(s"$ln - rec.l + rec.b2")
        val sn = fd2(s"ser.x - $ln + rec.ss[1]")
        s"""WITH RECURSIVE s AS (SELECT event_type AS et,
          |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
          |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x0
          | FROM events GROUP BY 1, 2),
          |b AS (SELECT et, MIN(hi) mn, MAX(hi) mx FROM s GROUP BY 1),
          |g AS (SELECT b.et, gs.hi
          |  FROM b, UNNEST(range(b.mn, b.mx + 1)) gs(hi)),
          |ser AS (SELECT g.et, g.hi - b.mn AS idx, COALESCE(s.x0, 0) AS x
          |  FROM g JOIN b ON b.et = g.et
          |  LEFT JOIN s ON s.et = g.et AND s.hi = g.hi),
          |n AS (SELECT et, CAST(COUNT(*) AS BIGINT) AS nh
          |  FROM ser GROUP BY 1),
          |w AS (SELECT et, CAST(SUM(x) AS BIGINT) AS s24 FROM ser
          |  WHERE idx < 24 GROUP BY 1),
          |i AS (SELECT et,
          |  ((s24 - ((s24 % 24) + 24) % 24) // 24) AS l0 FROM w),
          |s0 AS (SELECT ser.et, list(ser.x - i.l0 ORDER BY ser.idx) AS ss
          |  FROM ser JOIN i USING (et) WHERE ser.idx < 24 GROUP BY ser.et),
          |rec AS (
          |  SELECT i.et, CAST(23 AS BIGINT) AS t, i.l0 AS l,
          |    CAST(0 AS BIGINT) AS b2, s0.ss AS ss, CAST(NULL AS BIGINT) AS r
          |  FROM i JOIN s0 USING (et)
          |  UNION ALL
          |  SELECT rec.et, ser.idx, CAST($ln AS BIGINT) AS l,
          |    CAST($bn AS BIGINT) AS b2,
          |    list_concat(rec.ss[2:24], [CAST($sn AS BIGINT)]) AS ss,
          |    CAST(ser.x - (rec.l + rec.b2 + rec.ss[1]) AS BIGINT) AS r
          |  FROM rec JOIN ser ON ser.et = rec.et AND ser.idx = rec.t + 1),
          |p AS (SELECT et, t, CAST(SUM(r) OVER (PARTITION BY et ORDER BY t
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |  AS pf FROM rec WHERE r IS NOT NULL),
          |c AS (SELECT et, t, pf - LEAST(0, MIN(pf) OVER (PARTITION BY et
          |  ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          |  AS cus FROM p)
          |SELECT c.et AS event_type, CAST(b.mn + c.t AS BIGINT) AS hour_h,
          | CAST(cus AS BIGINT) AS cusum_scaled,
          | ${graft.core.Exact.sqlDround("CAST(cus AS DOUBLE) / 100.0", 2)}
          |   AS drift_dollars
          |FROM c JOIN b ON b.et = c.et JOIN n ON n.et = c.et
          |WHERE n.nh >= 48
          |QUALIFY row_number() OVER (PARTITION BY c.et
          |  ORDER BY cus DESC, hour_h ASC) = 1
          |ORDER BY event_type ASC""".stripMargin
      },
    "q140_cusum" ->
      // same cents series on the same dense spine; the closed-form
      // CUSUM (prefix sum minus running min, scaled by n to clear the
      // rational mean) replayed with window functions — exact BIGINT
      // until the display division
      """WITH s AS (SELECT
        |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x0
        | FROM events GROUP BY 1),
        |b AS (SELECT MIN(hi) mn, MAX(hi) mx FROM s),
        |g AS (SELECT gs.hi FROM b, UNNEST(range(b.mn, b.mx + 1)) gs(hi)),
        |d AS (SELECT g.hi, COALESCE(s.x0, 0) AS x
        |  FROM g LEFT JOIN s USING (hi)),
        |ser AS (SELECT d.hi - b.mn AS idx, d.x FROM d CROSS JOIN b),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nh,
        |  CAST(SUM(x) AS BIGINT) AS sx FROM ser),
        |p AS (SELECT idx, CAST(SUM(x) OVER (ORDER BY idx
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  AS pf FROM ser),
        |t AS (SELECT idx, n.nh * pf - (idx + 1) * n.sx AS tp
        |  FROM p CROSS JOIN n),
        |c AS (SELECT idx, tp - LEAST(0, MIN(tp) OVER (ORDER BY idx
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cus
        |  FROM t)
        |SELECT CAST(b.mn + c.idx AS BIGINT) AS hour_h,
        | CAST(cus AS BIGINT) AS cusum_scaled,
        | CAST(ROUND(CAST(CAST(cus AS DOUBLE)
        |   / (CAST(n.nh AS DOUBLE) * 100.0) AS DECIMAL(28,10)), 2)
        |   AS DOUBLE) AS drift_dollars
        |FROM c CROSS JOIN b CROSS JOIN n
        |ORDER BY cusum_scaled DESC, hour_h ASC LIMIT 5""".stripMargin,
    "q141_episodes" ->
      // gaps-and-islands over the same spine: flagged = strictly above
      // the scaled mean (n*x > S), island key = idx - row_number over
      // flagged rows (the Spark side's t - prefix-flag-count, shifted
      // by a constant), excess mass in exact scaled integers
      """WITH s AS (SELECT
        |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x0
        | FROM events GROUP BY 1),
        |b AS (SELECT MIN(hi) mn, MAX(hi) mx FROM s),
        |g AS (SELECT gs.hi FROM b, UNNEST(range(b.mn, b.mx + 1)) gs(hi)),
        |d AS (SELECT g.hi, COALESCE(s.x0, 0) AS x
        |  FROM g LEFT JOIN s USING (hi)),
        |ser AS (SELECT d.hi - b.mn AS idx, d.x FROM d CROSS JOIN b),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nh,
        |  CAST(SUM(x) AS BIGINT) AS sx FROM ser),
        |f AS (SELECT idx, x FROM ser CROSS JOIN n WHERE n.nh * x > n.sx),
        |i AS (SELECT idx, x,
        |  idx - ROW_NUMBER() OVER (ORDER BY idx) AS grp FROM f),
        |r AS (SELECT grp, MIN(idx) AS p0,
        |  CAST(COUNT(*) AS BIGINT) AS len_h,
        |  CAST(SUM(n.nh * x - n.sx) AS BIGINT) AS excess_scaled
        | FROM i CROSS JOIN n GROUP BY 1, n.nh, n.sx)
        |SELECT CAST(b.mn + r.p0 AS BIGINT) AS start_h, len_h,
        | excess_scaled,
        | CAST(ROUND(CAST(CAST(excess_scaled AS DOUBLE)
        |   / (CAST(n.nh AS DOUBLE) * 100.0) AS DECIMAL(28,10)), 2)
        |   AS DOUBLE) AS excess_dollars
        |FROM r CROSS JOIN b CROSS JOIN n
        |ORDER BY len_h DESC, start_h ASC LIMIT 5""".stripMargin,
    "q159_discord_by_type" ->
      // q137's pair-distance rule with the series key threaded
      // through; distances computed by LIST INDEXING into per-window
      // arrays (mirroring Spark's slice/zip_with) rather than the
      // q137 oracle's k-unnest + double ser join — the join spelling
      // blew to 54M joined rows across 5 keys and ran minutes, the
      // list form runs ~3 s; per-type top-1 via QUALIFY row_number
      """WITH s AS (SELECT event_type AS et,
        |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x0
        | FROM events GROUP BY 1, 2),
        |b AS (SELECT et, MIN(hi) mn, MAX(hi) mx FROM s GROUP BY 1),
        |g AS (SELECT b.et, gs.hi
        |  FROM b, UNNEST(range(b.mn, b.mx + 1)) gs(hi)),
        |ser AS (SELECT g.et, g.hi - b.mn AS idx, COALESCE(s.x0, 0) AS x
        |  FROM g JOIN b ON b.et = g.et
        |  LEFT JOIN s ON s.et = g.et AND s.hi = g.hi),
        |n AS (SELECT et, CAST(MAX(idx) AS BIGINT) AS im
        |  FROM ser GROUP BY 1),
        |win AS (SELECT n.et, gs.s
        |  FROM n, UNNEST(range(0, n.im - 24 + 2)) gs(s)
        | WHERE n.im + 1 >= 48),
        |wl AS (SELECT w.et, w.s, list(ser.x ORDER BY ser.idx) AS wa
        |  FROM win w JOIN ser ON ser.et = w.et
        |    AND ser.idx BETWEEN w.s AND w.s + 23
        |  GROUP BY 1, 2),
        |pd AS (SELECT a.et, a.s AS sa,
        |  CAST(MIN(list_sum(list_transform(range(1, 25),
        |    k -> (a.wa[CAST(k AS INT)] - bb.wa[CAST(k AS INT)])
        |       * (a.wa[CAST(k AS INT)] - bb.wa[CAST(k AS INT)]))))
        |    AS BIGINT) AS score
        | FROM wl a JOIN wl bb ON bb.et = a.et AND abs(a.s - bb.s) >= 24
        | GROUP BY 1, 2)
        |SELECT pd.et AS event_type,
        | CAST(b.mn + pd.sa AS BIGINT) AS win_start_h, score
        |FROM pd JOIN b ON b.et = pd.et
        |QUALIFY row_number() OVER (PARTITION BY pd.et
        |  ORDER BY score DESC, win_start_h ASC) = 1
        |ORDER BY event_type ASC""".stripMargin,
    "q170_backtest_by_type" ->
      // q146's backtest with the series key threaded through: the
      // keyed recurrence supplies each type's HW residuals, the
      // baselines are keyed LAG differences, integer SSEs, identical
      // CASE precedence for the winner
      {
        def fd2(e: String) = s"((($e) - (((($e) % 2) + 2) % 2)) // 2)"
        val ln = fd2("ser.x - rec.ss[1] + rec.l + rec.b2")
        val bn = fd2(s"$ln - rec.l + rec.b2")
        val sn = fd2(s"ser.x - $ln + rec.ss[1]")
        s"""WITH RECURSIVE s AS (SELECT event_type AS et,
          |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
          |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x0
          | FROM events GROUP BY 1, 2),
          |b AS (SELECT et, MIN(hi) mn, MAX(hi) mx FROM s GROUP BY 1),
          |g AS (SELECT b.et, gs.hi
          |  FROM b, UNNEST(range(b.mn, b.mx + 1)) gs(hi)),
          |ser AS (SELECT g.et, g.hi - b.mn AS idx, COALESCE(s.x0, 0) AS x
          |  FROM g JOIN b ON b.et = g.et
          |  LEFT JOIN s ON s.et = g.et AND s.hi = g.hi),
          |n AS (SELECT et, CAST(COUNT(*) AS BIGINT) AS nh
          |  FROM ser GROUP BY 1),
          |w AS (SELECT et, CAST(SUM(x) AS BIGINT) AS s24 FROM ser
          |  WHERE idx < 24 GROUP BY 1),
          |i AS (SELECT et,
          |  ((s24 - ((s24 % 24) + 24) % 24) // 24) AS l0 FROM w),
          |s0 AS (SELECT ser.et, list(ser.x - i.l0 ORDER BY ser.idx) AS ss
          |  FROM ser JOIN i USING (et) WHERE ser.idx < 24 GROUP BY ser.et),
          |rec AS (
          |  SELECT i.et, CAST(23 AS BIGINT) AS t, i.l0 AS l,
          |    CAST(0 AS BIGINT) AS b2, s0.ss AS ss, CAST(NULL AS BIGINT) AS r
          |  FROM i JOIN s0 USING (et)
          |  UNION ALL
          |  SELECT rec.et, ser.idx, CAST($ln AS BIGINT) AS l,
          |    CAST($bn AS BIGINT) AS b2,
          |    list_concat(rec.ss[2:24], [CAST($sn AS BIGINT)]) AS ss,
          |    CAST(ser.x - (rec.l + rec.b2 + rec.ss[1]) AS BIGINT) AS r
          |  FROM rec JOIN ser ON ser.et = rec.et AND ser.idx = rec.t + 1),
          |hw AS (SELECT et, CAST(SUM(r * r) AS BIGINT) AS sse_hw
          |  FROM rec WHERE r IS NOT NULL GROUP BY 1),
          |bl AS (SELECT et,
          |  CAST(SUM(CASE WHEN idx >= 24
          |    THEN (x - x24) * (x - x24) END) AS BIGINT) AS sse_snaive,
          |  CAST(SUM(CASE WHEN idx >= 24
          |    THEN (x - x1) * (x - x1) END) AS BIGINT) AS sse_naive
          | FROM (SELECT et, idx, x,
          |    LAG(x, 24) OVER (PARTITION BY et ORDER BY idx) AS x24,
          |    LAG(x, 1) OVER (PARTITION BY et ORDER BY idx) AS x1 FROM ser)
          | GROUP BY 1)
          |SELECT hw.et AS event_type, CAST(n.nh - 24 AS BIGINT) AS n_scored,
          | hw.sse_hw, bl.sse_snaive, bl.sse_naive,
          | CASE WHEN sse_hw <= sse_snaive AND sse_hw <= sse_naive
          |   THEN 'holt_winters'
          |  WHEN sse_snaive <= sse_naive THEN 'seasonal_naive'
          |  ELSE 'naive' END AS best_model
          |FROM hw JOIN bl ON bl.et = hw.et JOIN n ON n.et = hw.et
          |WHERE n.nh >= 48
          |ORDER BY event_type ASC""".stripMargin
      },
    "q167_holt_forecast_by_type" ->
      // q157's keyed recursive recurrence run to each key's terminal
      // state row (t = nh−1), then 24 projections per key — the
      // queue's h-th entry IS the season of slot T+h (q145's device,
      // keyed)
      {
        def fd2(e: String) = s"((($e) - (((($e) % 2) + 2) % 2)) // 2)"
        val ln = fd2("ser.x - rec.ss[1] + rec.l + rec.b2")
        val bn = fd2(s"$ln - rec.l + rec.b2")
        val sn = fd2(s"ser.x - $ln + rec.ss[1]")
        s"""WITH RECURSIVE s AS (SELECT event_type AS et,
          |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
          |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x0
          | FROM events GROUP BY 1, 2),
          |b AS (SELECT et, MIN(hi) mn, MAX(hi) mx FROM s GROUP BY 1),
          |g AS (SELECT b.et, gs.hi
          |  FROM b, UNNEST(range(b.mn, b.mx + 1)) gs(hi)),
          |ser AS (SELECT g.et, g.hi - b.mn AS idx, COALESCE(s.x0, 0) AS x
          |  FROM g JOIN b ON b.et = g.et
          |  LEFT JOIN s ON s.et = g.et AND s.hi = g.hi),
          |n AS (SELECT et, CAST(COUNT(*) AS BIGINT) AS nh
          |  FROM ser GROUP BY 1),
          |w AS (SELECT et, CAST(SUM(x) AS BIGINT) AS s24 FROM ser
          |  WHERE idx < 24 GROUP BY 1),
          |i AS (SELECT et,
          |  ((s24 - ((s24 % 24) + 24) % 24) // 24) AS l0 FROM w),
          |s0 AS (SELECT ser.et, list(ser.x - i.l0 ORDER BY ser.idx) AS ss
          |  FROM ser JOIN i USING (et) WHERE ser.idx < 24 GROUP BY ser.et),
          |rec AS (
          |  SELECT i.et, CAST(23 AS BIGINT) AS t, i.l0 AS l,
          |    CAST(0 AS BIGINT) AS b2, s0.ss AS ss
          |  FROM i JOIN s0 USING (et)
          |  UNION ALL
          |  SELECT rec.et, ser.idx, CAST($ln AS BIGINT) AS l,
          |    CAST($bn AS BIGINT) AS b2,
          |    list_concat(rec.ss[2:24], [CAST($sn AS BIGINT)]) AS ss
          |  FROM rec JOIN ser ON ser.et = rec.et AND ser.idx = rec.t + 1)
          |SELECT rec.et AS event_type,
          | CAST(b.mn + rec.t + hs.h AS BIGINT) AS hour_h,
          | CAST(rec.l + hs.h * rec.b2 + rec.ss[CAST(hs.h AS INT)] AS BIGINT)
          |   AS forecast_scaled,
          | ${graft.core.Exact.sqlDround(
              "CAST(rec.l + hs.h * rec.b2 + rec.ss[CAST(hs.h AS INT)] " +
              "AS DOUBLE) / 100.0", 2)} AS forecast_dollars
          |FROM rec JOIN b ON b.et = rec.et JOIN n ON n.et = rec.et,
          | UNNEST(range(1, 25)) hs(h)
          |WHERE rec.t = n.nh - 1 AND n.nh >= 48
          |ORDER BY event_type ASC, hour_h ASC""".stripMargin
      },
    "q161_keyed_ensemble" ->
      // the four KEYED oracles off ONE shared keyed spine + keyed
      // recurrence: each branch is its original oracle's per-type
      // top-1 (identical tie rules), unioned and grouped;
      // STRING_AGG(det, ',' ORDER BY det) mirrors concat_ws over
      // sort_array
      {
        def fd2(e: String) = s"((($e) - (((($e) % 2) + 2) % 2)) // 2)"
        val ln = fd2("ser.x - rec.ss[1] + rec.l + rec.b2")
        val bn = fd2(s"$ln - rec.l + rec.b2")
        val sn = fd2(s"ser.x - $ln + rec.ss[1]")
        s"""WITH RECURSIVE s AS (SELECT event_type AS et,
          |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
          |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x0
          | FROM events GROUP BY 1, 2),
          |b AS (SELECT et, MIN(hi) mn, MAX(hi) mx FROM s GROUP BY 1),
          |g AS (SELECT b.et, gs.hi
          |  FROM b, UNNEST(range(b.mn, b.mx + 1)) gs(hi)),
          |ser AS (SELECT g.et, g.hi - b.mn AS idx, COALESCE(s.x0, 0) AS x
          |  FROM g JOIN b ON b.et = g.et
          |  LEFT JOIN s ON s.et = g.et AND s.hi = g.hi),
          |n AS (SELECT et, CAST(COUNT(*) AS BIGINT) AS nh,
          |  CAST(SUM(x) AS BIGINT) AS sx FROM ser GROUP BY 1),
          |p1 AS (SELECT et, idx, CAST(SUM(x) OVER (PARTITION BY et
          |  ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |  AS BIGINT) AS pf FROM ser),
          |t1 AS (SELECT p1.et, idx, n.nh * pf - (idx + 1) * n.sx AS tp
          |  FROM p1 JOIN n ON n.et = p1.et),
          |c1 AS (SELECT et, idx, tp - LEAST(0, MIN(tp) OVER (PARTITION BY et
          |  ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          |  AS cus FROM t1),
          |top_cusum AS (SELECT c1.et, CAST(b.mn + c1.idx AS BIGINT) AS hour_h,
          |  'cusum' AS det FROM c1 JOIN b ON b.et = c1.et
          | QUALIFY row_number() OVER (PARTITION BY c1.et
          |   ORDER BY cus DESC, hour_h ASC) = 1),
          |f1 AS (SELECT ser.et, idx, x FROM ser JOIN n ON n.et = ser.et
          |  WHERE n.nh * x > n.sx),
          |i1 AS (SELECT et, idx, x,
          |  idx - ROW_NUMBER() OVER (PARTITION BY et ORDER BY idx) AS grp
          |  FROM f1),
          |r1 AS (SELECT et, grp, MIN(idx) AS p0,
          |  CAST(COUNT(*) AS BIGINT) AS len_h FROM i1 GROUP BY 1, 2),
          |top_episode AS (SELECT r1.et, CAST(b.mn + r1.p0 AS BIGINT) AS hour_h,
          |  'episode' AS det FROM r1 JOIN b ON b.et = r1.et
          | QUALIFY row_number() OVER (PARTITION BY r1.et
          |   ORDER BY len_h DESC, hour_h ASC) = 1),
          |w AS (SELECT et, CAST(SUM(x) AS BIGINT) AS s24 FROM ser
          |  WHERE idx < 24 GROUP BY 1),
          |i AS (SELECT et,
          |  ((s24 - ((s24 % 24) + 24) % 24) // 24) AS l0 FROM w),
          |s0 AS (SELECT ser.et, list(ser.x - i.l0 ORDER BY ser.idx) AS ss
          |  FROM ser JOIN i USING (et) WHERE ser.idx < 24 GROUP BY ser.et),
          |rec AS (
          |  SELECT i.et, CAST(23 AS BIGINT) AS t, i.l0 AS l,
          |    CAST(0 AS BIGINT) AS b2, s0.ss AS ss, CAST(NULL AS BIGINT) AS r
          |  FROM i JOIN s0 USING (et)
          |  UNION ALL
          |  SELECT rec.et, ser.idx, CAST($ln AS BIGINT) AS l,
          |    CAST($bn AS BIGINT) AS b2,
          |    list_concat(rec.ss[2:24], [CAST($sn AS BIGINT)]) AS ss,
          |    CAST(ser.x - (rec.l + rec.b2 + rec.ss[1]) AS BIGINT) AS r
          |  FROM rec JOIN ser ON ser.et = rec.et AND ser.idx = rec.t + 1),
          |p2 AS (SELECT et, t, CAST(SUM(r) OVER (PARTITION BY et ORDER BY t
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |  AS pf FROM rec WHERE r IS NOT NULL),
          |c2 AS (SELECT et, t, pf - LEAST(0, MIN(pf) OVER (PARTITION BY et
          |  ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          |  AS cus FROM p2),
          |top_rc AS (SELECT c2.et, CAST(b.mn + c2.t AS BIGINT) AS hour_h,
          |  'residual_cusum' AS det
          | FROM c2 JOIN b ON b.et = c2.et JOIN n ON n.et = c2.et
          | WHERE n.nh >= 48
          | QUALIFY row_number() OVER (PARTITION BY c2.et
          |   ORDER BY cus DESC, hour_h ASC) = 1),
          |nim AS (SELECT et, CAST(MAX(idx) AS BIGINT) AS im
          |  FROM ser GROUP BY 1),
          |win AS (SELECT nim.et, gs.s
          |  FROM nim, UNNEST(range(0, nim.im - 24 + 2)) gs(s)
          | WHERE nim.im + 1 >= 48),
          |wl AS (SELECT w2.et, w2.s, list(ser.x ORDER BY ser.idx) AS wa
          |  FROM win w2 JOIN ser ON ser.et = w2.et
          |    AND ser.idx BETWEEN w2.s AND w2.s + 23
          |  GROUP BY 1, 2),
          |pd AS (SELECT a.et, a.s AS sa,
          |  CAST(MIN(list_sum(list_transform(range(1, 25),
          |    k -> (a.wa[CAST(k AS INT)] - bb.wa[CAST(k AS INT)])
          |       * (a.wa[CAST(k AS INT)] - bb.wa[CAST(k AS INT)]))))
          |    AS BIGINT) AS score
          | FROM wl a JOIN wl bb ON bb.et = a.et AND abs(a.s - bb.s) >= 24
          | GROUP BY 1, 2),
          |top_disc AS (SELECT pd.et, CAST(b.mn + pd.sa AS BIGINT) AS hour_h,
          |  'discord' AS det FROM pd JOIN b ON b.et = pd.et
          | QUALIFY row_number() OVER (PARTITION BY pd.et
          |   ORDER BY score DESC, hour_h ASC) = 1),
          |u AS (SELECT * FROM top_cusum UNION ALL SELECT * FROM top_episode
          |  UNION ALL SELECT * FROM top_rc UNION ALL SELECT * FROM top_disc)
          |SELECT u.et AS event_type, u.hour_h,
          | CAST(COUNT(*) AS BIGINT) AS n_detectors,
          | STRING_AGG(det, ',' ORDER BY det) AS detectors
          |FROM u GROUP BY 1, 2
          |ORDER BY n_detectors DESC, event_type ASC, hour_h ASC""".stripMargin
      },
    "q137_discord" ->
      // same cents series on the same dense spine; the pair distances
      // are an elementwise 24-term join (exact integers), discord =
      // per-window MIN over non-overlapping partners
      """WITH s AS (SELECT
        |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x0
        | FROM events GROUP BY 1),
        |b AS (SELECT MIN(hi) mn, MAX(hi) mx FROM s),
        |g AS (SELECT gs.hi FROM b, UNNEST(range(b.mn, b.mx + 1)) gs(hi)),
        |d AS (SELECT g.hi, COALESCE(s.x0, 0) AS x FROM g LEFT JOIN s USING (hi)),
        |ser AS (SELECT d.hi - b.mn AS idx, d.x FROM d CROSS JOIN b),
        |n AS (SELECT CAST(MAX(idx) AS BIGINT) AS im FROM ser),
        |win AS (SELECT gs.s FROM n, UNNEST(range(0, n.im - 24 + 2)) gs(s)
        | WHERE n.im + 1 >= 48),
        |pd AS (SELECT a.s AS sa, bb.s AS sb,
        |  CAST(SUM((x1.x - x2.x) * (x1.x - x2.x)) AS BIGINT) AS d2
        | FROM win a JOIN win bb ON abs(a.s - bb.s) >= 24
        | CROSS JOIN UNNEST(range(0, 24)) kk(k)
        | JOIN ser x1 ON x1.idx = a.s + kk.k
        | JOIN ser x2 ON x2.idx = bb.s + kk.k
        | GROUP BY 1, 2),
        |sc AS (SELECT sa, MIN(d2) AS score FROM pd GROUP BY 1)
        |SELECT CAST(b.mn + sc.sa AS BIGINT) AS win_start_h, score
        |FROM sc CROSS JOIN b
        |ORDER BY score DESC, win_start_h ASC LIMIT 3""".stripMargin,
    "q87_decompose" ->
      // dense spine via UNNEST(range(...)) — generate_series rejects
      // lateral column bounds; trend snap and seasonal means mirror
      // the Spark side's exact-integer staging bit for bit
      s"""WITH s AS (SELECT event_type,
         |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
         |  CAST(SUM($v4Sql) AS BIGINT) AS x0
         | FROM events GROUP BY 1, 2),
         |b AS (SELECT MIN(hi) lo, MAX(hi) hi2 FROM s),
         |sp AS (SELECT DISTINCT event_type FROM s),
         |g AS (SELECT sp.event_type, gs.hi
         | FROM sp, b, UNNEST(range(b.lo, b.hi2 + 1)) gs(hi)),
         |d AS (SELECT g.event_type, g.hi, COALESCE(s.x0, 0) AS x
         | FROM g LEFT JOIN s ON s.event_type = g.event_type AND s.hi = g.hi),
         |t2 AS (SELECT event_type, hi, x,
         |  CAST(ROUND((CAST(SUM(x) OVER w AS DOUBLE) / (COUNT(*) OVER w))
         |    * 1048576.0) AS BIGINT) AS trendq,
         |  x * 1048576 - CAST(ROUND((CAST(SUM(x) OVER w AS DOUBLE)
         |    / (COUNT(*) OVER w)) * 1048576.0) AS BIGINT) AS detrq
         | FROM d WINDOW w AS (PARTITION BY event_type ORDER BY hi
         |   ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)),
         |se AS (SELECT event_type, hi % 24 AS hod,
         |  CAST(SUM(detrq) AS DOUBLE) / (COUNT(*) * 1048576.0) AS seas
         | FROM t2 GROUP BY 1, 2)
         |SELECT t2.event_type, t2.hi,
         | CAST(ROUND(CAST((x / 10000.0) AS DECIMAL(28,10)), 4) AS DOUBLE)
         |   AS value_total,
         | CAST(ROUND(CAST((trendq / (10000.0 * 1048576.0)) AS DECIMAL(28,10)), 4) AS DOUBLE)
         |   AS trend,
         | CAST(ROUND(CAST((seas / 10000.0) AS DECIMAL(28,10)), 4) AS DOUBLE)
         |   AS seasonal,
         | CAST(ROUND(CAST((detrq / (10000.0 * 1048576.0) - seas / 10000.0)
         |   AS DECIMAL(28,10)), 4) AS DOUBLE) AS residual
         |FROM t2 JOIN se ON se.event_type = t2.event_type
         | AND t2.hi % 24 = se.hod""".stripMargin,
    "q88_cross_corr" ->
      s"""WITH a AS (SELECT
         |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
         |  CAST(SUM($v4Sql) AS HUGEINT) AS x
         | FROM events WHERE event_type = 'error' GROUP BY 1),
         |bb AS (SELECT
         |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hj,
         |  CAST(SUM($v4Sql) AS HUGEINT) AS y
         | FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |l AS (SELECT UNNEST([${CcfLags.mkString(", ")}]) AS lag),
         |p AS (SELECT l.lag, a.x AS x, bb.y AS y
         | FROM a CROSS JOIN l JOIN bb ON bb.hj = a.hi - l.lag),
         |m AS (SELECT lag, COUNT(*) n, SUM(x) sx, SUM(y) sy,
         |  SUM(x*y) sxy, SUM(x*x) sxx, SUM(y*y) syy
         | FROM p GROUP BY 1),
         |f AS (SELECT lag, n, sx, sy, sxy,
         |  n*sxx - sx*sx AS dx, n*syy - sy*sy AS dy
         | FROM m WHERE n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0)
         |SELECT lag, CAST(n AS BIGINT) AS n,
         | CAST(ROUND(CAST((CAST((n*sxy - sx*sy) AS DOUBLE) /
         |   SQRT(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)))
         |   AS DECIMAL(28,10)), 4) AS DOUBLE) AS ccf
         |FROM f""".stripMargin,
    "q86_acf" ->
      s"""WITH s AS (SELECT event_type,
         |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
         |  CAST(SUM($v4Sql) AS HUGEINT) AS x
         | FROM events GROUP BY 1, 2),
         |l AS (SELECT UNNEST([${AcfLags.mkString(", ")}]) AS lag),
         |p AS (SELECT a.event_type, l.lag, a.x AS x, b.x AS y
         | FROM s a CROSS JOIN l
         | JOIN s b ON b.event_type = a.event_type AND b.hi = a.hi - l.lag),
         |m AS (SELECT event_type, lag, COUNT(*) n,
         |  SUM(x) sx, SUM(y) sy, SUM(x*y) sxy,
         |  SUM(x*x) sxx, SUM(y*y) syy
         | FROM p GROUP BY 1, 2),
         |f AS (SELECT event_type, lag, n, sx, sy, sxy,
         |  n*sxx - sx*sx AS dx, n*syy - sy*sy AS dy
         | FROM m WHERE n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0)
         |SELECT event_type, lag, CAST(n AS BIGINT) AS n,
         | CAST(ROUND(CAST((CAST((n*sxy - sx*sy) AS DOUBLE) /
         |   SQRT(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)))
         |   AS DECIMAL(28,10)), 4) AS DOUBLE) AS acf
         |FROM f""".stripMargin,
    "q47_anomaly_seasonal" ->
      s"""WITH ev AS (SELECT event_type, value, $v4Sql AS v4,
         |  EXTRACT(hour FROM ts) AS hod FROM events),
         |st AS (SELECT event_type et, hod h, COUNT(*) n, SUM(v4) sv,
         |  SUM(v4*v4) q FROM ev GROUP BY 1, 2)
         |SELECT event_type, hod, COUNT(*) AS n_outliers,
         | MAX(value) AS max_value
         |FROM ev JOIN st ON event_type = et AND hod = h
         |WHERE n >= 30 AND
         | (CAST(v4 AS HUGEINT)*n - sv)*(CAST(v4 AS HUGEINT)*n - sv) >
         |  (CAST(n AS HUGEINT)*q - CAST(sv AS HUGEINT)*sv) * 9
         |GROUP BY 1, 2""".stripMargin,
    "q32_anomaly_zscore" ->
      s"""WITH ev AS (SELECT event_id, event_type, value,
         |  $v4Sql AS v4 FROM events),
         |st AS (SELECT event_type et, COUNT(*) n, SUM(v4) sv,
         |  SUM(v4*v4) q FROM ev GROUP BY 1)
         |SELECT event_id, event_type, value,
         | CAST(ROUND(CAST((CAST(CAST(v4 AS HUGEINT)*n - sv AS DOUBLE) /
         |   SQRT(CAST((CAST(n AS HUGEINT)*q - CAST(sv AS HUGEINT)*sv) AS DOUBLE)))
         |   AS DECIMAL(28,10)), 4) AS DOUBLE) AS z
         |FROM ev JOIN st ON event_type = et
         |WHERE (CAST(v4 AS HUGEINT)*n - sv)*(CAST(v4 AS HUGEINT)*n - sv) >
         |  (CAST(n AS HUGEINT)*q - CAST(sv AS HUGEINT)*sv) * 9""".stripMargin,
    "q33_anomaly_window" ->
      s"""WITH ev AS (SELECT time_bucket(INTERVAL '10 minutes', ts) wb,
         |  event_type, $v4Sql AS v4 FROM events),
         |st AS (SELECT wb wbs, event_type et, COUNT(*) n, SUM(v4) sv,
         |  SUM(v4*v4) q FROM ev GROUP BY 1, 2)
         |SELECT STRFTIME(wb, '%Y-%m-%d %H:%M:%S') AS window_start,
         | event_type, MAX(n) AS n,
         | CAST(SUM(CASE WHEN (CAST(v4 AS HUGEINT)*n - sv)*(CAST(v4 AS HUGEINT)*n - sv) >
         |   (CAST(n AS HUGEINT)*q - CAST(sv AS HUGEINT)*sv) * 4
         |  THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
         | CAST(ROUND(CAST((CAST(MAX(sv) AS DOUBLE) / 10000.0 / MAX(n))
         |   AS DECIMAL(28,10)), 4) AS DOUBLE) AS avg_value
         |FROM ev JOIN st ON wb = wbs AND event_type = et
         |GROUP BY 1, 2""".stripMargin,
    "q34_anomaly_rolling" ->
      s"""WITH ev AS (SELECT event_id, user_id, ts, value, $v4Sql AS v4
         |  FROM events),
         |fr AS (SELECT event_id, user_id, value, v4,
         |  COUNT(*) OVER w AS nf, SUM(v4) OVER w AS sf,
         |  SUM(v4*v4) OVER w AS qf
         | FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
         |SELECT event_id, user_id, value,
         | CAST(ROUND(CAST((CAST(sf AS DOUBLE) / 10000.0 / nf)
         |   AS DECIMAL(28,10)), 4) AS DOUBLE) AS rolling_avg
         |FROM fr WHERE nf >= 5 AND
         | (CAST(v4 AS HUGEINT)*nf - sf)*(CAST(v4 AS HUGEINT)*nf - sf) >
         |   (CAST(nf AS HUGEINT)*qf - CAST(sf AS HUGEINT)*sf) * 4""".stripMargin,
    "q35_anomaly_robust" ->
      s"""WITH ev AS (SELECT event_type, $v4Sql AS v4 FROM events),
         |med AS (SELECT event_type et, quantile_cont(v4, 0.5) med4
         |  FROM ev GROUP BY 1)
         |SELECT event_type, COUNT(*) AS n,
         | CAST(ROUND(CAST((MAX(med4) / 10000.0) AS DECIMAL(28,10)), 4)
         |   AS DOUBLE) AS median_value,
         | CAST(ROUND(CAST((quantile_cont(ABS(v4 - med4), 0.5) / 10000.0)
         |   AS DECIMAL(28,10)), 4) AS DOUBLE) AS mad
         |FROM ev JOIN med ON event_type = et
         |GROUP BY event_type""".stripMargin,
  )
}
