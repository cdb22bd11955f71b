package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming anomaly surface (SURVEY §2.10 K4 — the consumer
  * side the reference never built; semantics follow Structured
  * Streaming defaults: late rows beyond the watermark are dropped).
  *
  * Sources are pluggable `readStream` DataFrames: files in tests,
  * `.format("kafka")` in deployment (connector jar is a deploy-time
  * dependency; see [[Replay.kafkaSinkOptions]]).
  */
object AnomalyStream {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class Welford(n: Long, mean: Double, m2: Double) {
    def add(x: Double): Welford = {
      val n1 = n + 1
      val d = x - mean
      val m = mean + d / n1
      Welford(n1, m, m2 + d * (x - m))
    }
    def std: Double = if (n < 2) 0.0 else math.sqrt(m2 / n)
  }

  case class Hit(event_id: Long, event_type: String, user_id: Long,
      value: Double, z: Double)

  /** Watermarked tumbling-window aggregation — the streaming twin of
    * batch q33. Append mode: a window emits once its watermark passes.
    */
  def windowedStats(events: DataFrame, watermark: String = "10 minutes",
      window_ : String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"),
        max(col("value")).as("max_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"), col("max_value"))

  /** Watermarked stream-stream interval join — the streaming analog of
    * the batch as-of join (q36): each click joins the errors the same
    * user raised in the preceding `horizon`. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * buffered state is evicted as watermarks advance (an unbounded
    * stream-stream join would hold both streams' history forever).
    *
    * `joinType` "inner" (default) emits only matched pairs as they
    * arrive; "left_outer" additionally emits each unmatched click —
    * with null err columns — once the watermark proves no qualifying
    * error can still arrive (i.e. at state eviction, not immediately).
    */
  def clickErrorJoin(clicks: DataFrame, errors: DataFrame,
      horizon: String = "10 minutes", joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("ts", horizon)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val e = errors.withWatermark("ts", horizon)
      .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
        col("ts").as("err_ts"))
    c.join(e,
      col("user_id") === col("err_user") &&
        col("err_ts") <= col("click_ts") &&
        col("err_ts") >= col("click_ts") - expr(s"INTERVAL $horizon"),
      joinType)
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("err_id"), col("err_ts"))
  }

  /** Streaming exact dedup for document pipelines: content fingerprint
    * + `dropDuplicatesWithinWatermark` — duplicate payloads arriving
    * within the watermark horizon emit once, and fingerprint state is
    * EVICTED once the watermark passes (bounded state; a plain
    * dropDuplicates would grow state forever at 100 TB/day).
    */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
      horizon: String = "10 minutes"): DataFrame =
    docs.withColumn("fp", md5(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming twin of batch q53 (gap-based sessionization): Spark's
    * built-in `session_window` carries each user's open session as
    * store state and emits the session FACT — (start_us, end_us,
    * n_events, total_value), the same shape batch
    * [[graft.operators.Relational.sessionize]] aggregates — once the
    * watermark proves no event can extend it. Small state by
    * construction: one open session row per (user, session), merged by
    * the state store, evicted at emission.
    *
    * Gap-boundary parity: the batch rule opens a new session only on a
    * silence STRICTLY longer than gapUs, i.e. a gap of exactly gapUs
    * still merges. `session_window` merges an event iff it lands
    * strictly BEFORE last + gap, so the twin passes `gapUs + 1`
    * microseconds — timestamps are integral micros, so the two rules
    * coincide exactly (the boundary case the library property spec
    * drives). total_value mirrors the batch dsum spelling
    * (DECIMAL(18,4) sum, round 2, double) for census equality; sids
    * are per-user ordinals by start_us downstream, exactly as batch
    * derives them. Late rows beyond the watermark drop — the standard
    * streaming-vs-batch caveat every detector here documents.
    */
  def sessionizeStream(events: DataFrame, gapUs: Long = 1800000000L,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"${gapUs + 1} microseconds"))
      .agg(min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast(
          org.apache.spark.sql.types.DecimalType(18, 4))), 2)
          .cast("double").as("total_value"))
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"), col("total_value"))

  /** q78's greedy funnel fold as streaming state: most recent view,
    * most recent window-qualifying click, deepest depth reached.
    */
  case class FunnelState(depth: Int, tv: Long, tc: Long)
  case class FunnelHit(user_id: Long, depth: Int, at_us: Long)

  // floorDiv, not /: getTime truncates toward zero, so for pre-1970
  // timestamps plain division double-counts the fractional second
  // (-0.5s would become +500000us) and corrupts funnel ordering for
  // pre-epoch events; floorDiv agrees with getNanos' always-positive
  // sub-second convention
  private[graft] def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Streaming twin of batch q78: the per-user greedy funnel fold as
    * O(1) keyed state, emitting a row each time a user REACHES a new
    * depth (view → click within the window → purchase within the
    * window). Within a micro-batch rows sort by (event time, type,
    * id) — the exact order the batch fold sees; across micro-batches
    * state carries the greedy (tv, tc) markers, so any arrival that
    * respects event-time order per user reproduces the batch census.
    * State never grows with events — three numbers per user, sharded
    * across executor state stores like every detector here.
    */
  def funnelDetector(events: Dataset[Event],
      windowUs: Long = graft.operators.Relational.FunnelWindowUs)
      : Dataset[FunnelHit] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "view" || e.event_type == "click" ||
        e.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, -1L, -1L))
          val hits = scala.collection.mutable.ArrayBuffer.empty[FunnelHit]
          // same-instant ties process purchase → click → view (the
          // batch fold's tie rank): each step must only see STRICTLY
          // earlier predecessors, or a same-us click overwrites the
          // marker a same-us purchase should have matched against
          def rank(t: String) =
            if (t == "purchase") 0 else if (t == "click") 1 else 2
          rows.toSeq
            .sortBy(e => (micros(e.ts), rank(e.event_type), e.event_id))
            .foreach { e =>
              val us = micros(e.ts)
              e.event_type match {
                case "view" =>
                  if (st.depth < 1) hits += FunnelHit(uid, 1, us)
                  st = FunnelState(math.max(st.depth, 1), us, st.tc)
                case "click"
                    if st.tv >= 0 && us > st.tv && us - st.tv <= windowUs =>
                  if (st.depth < 2) hits += FunnelHit(uid, 2, us)
                  st = FunnelState(math.max(st.depth, 2), st.tv, us)
                case "purchase"
                    if st.tc >= 0 && us > st.tc && us - st.tc <= windowUs =>
                  if (st.depth < 3) hits += FunnelHit(uid, 3, us)
                  st = FunnelState(3, st.tv, st.tc)
                case _ => ()
              }
            }
          state.update(st)
          hits.iterator
      }
  }

  case class LangTok(lang: String, tok: String)
  case class HeavyHit(lang: String, seen: Long, rank: Long, tok: String,
      cnt: Long)

  /** Streaming heavy hitters per language: the SAME mergeable
    * Misra–Gries sketch the batch aggregates ride (q58/q64,
    * [[org.apache.spark.sql.graft.FreqItemsBuffer]]) carried as keyed
    * stream state — bounded `capacity` counters per key regardless of
    * stream length. Each micro-batch folds its tokens into the sketch
    * (sorted first, so replays reproduce byte-identical snapshots) and
    * emits the current top-`topK` tagged with `seen` (tokens absorbed
    * so far), so consumers read the latest snapshot per key as
    * max-seen. The MG undercount bound (true − sketch ≤
    * seen/(capacity+1)) holds across batches because state restore is
    * exactly the aggregate's addRaw merge.
    */
  def heavyHittersStream(toks: Dataset[LangTok], capacity: Int = 64,
      topK: Int = 10): Dataset[HeavyHit] = {
    import toks.sparkSession.implicits._
    toks.groupByKey(_.lang)
      .flatMapGroupsWithState[(Map[String, Long], Long), HeavyHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (lang, rows, state) =>
          val (saved, seen0) = state.getOption.getOrElse(
            (Map.empty[String, Long], 0L))
          val buf = new org.apache.spark.sql.graft.FreqItemsBuffer(capacity)
          saved.foreach { case (t, c) => buf.addRaw(t, c) }
          buf.trim()
          val batch = rows.map(_.tok).toSeq.sorted
          batch.foreach(buf.add(_, 1L))
          val seen = seen0 + batch.size
          state.update((buf.counters.toMap, seen))
          buf.counters.toSeq
            .sortBy { case (t, c) => (-c, t) }
            .take(topK).zipWithIndex.iterator
            .map { case ((t, c), i) => HeavyHit(lang, seen, i + 1L, t, c) }
      }
  }

  case class KeyHash(key: String, hv: Long)
  case class DistinctEst(key: String, seen: Long, sketch_size: Long,
      n_est: Double)

  /** Streaming twin of batch q103: the SAME KMV bottom-k sketch
    * ([[org.apache.spark.sql.graft.BottomKSet]]) carried as keyed
    * stream state — O(k) longs per key regardless of stream length,
    * where exact streaming count-distinct state grows with the key
    * space. Feed it (group key, md5_prefix60-hash) rows; each batch
    * folds its hashes into the sketch and emits the current estimate
    * snapshot tagged with `seen` (rows absorbed so far), so consumers
    * read the latest snapshot per key as max-seen — the
    * [[heavyHittersStream]] contract.
    *
    * Replay stability is UNCONDITIONAL here, unlike the arrival-order-
    * dependent detectors ([[semDedupStream]]'s documented caveat): the
    * retained set is a pure function of the SET of hashes seen —
    * insertion-order- and batch-slicing-free — so any re-slicing of
    * the same events yields byte-identical final state, and the final
    * snapshot equals the batch `bottom_k_distinct` aggregate over the
    * same rows (StreamingSpec pins both). Estimate = (k−1)·2^60/h_k
    * once the sketch holds k hashes; below k the sketch IS the exact
    * distinct count.
    */
  def distinctStream(rows: Dataset[KeyHash], k: Int = 256)
      : Dataset[DistinctEst] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.key)
      .flatMapGroupsWithState[(Array[Long], Long), DistinctEst](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, it, state) =>
          val (saved, seen0) = state.getOption.getOrElse(
            (Array.empty[Long], 0L))
          val buf = new org.apache.spark.sql.graft.BottomKSet(k)
          saved.foreach(buf.add)
          var n = 0L
          it.foreach { r => buf.add(r.hv); n += 1 }
          val seen = seen0 + n
          val vs = buf.sortedValues
          state.update((vs, seen))
          val est =
            if (vs.length < k || vs.last == 0L) vs.length.toDouble
            else (k - 1).toDouble * 1152921504606846976.0 / vs.last.toDouble
          Iterator.single(DistinctEst(key, seen, vs.length.toLong, est))
      }
  }

  /** Streaming twin of batch q123: the engine's STREAM-STREAM interval
    * join — clicks and purchases as two watermarked substreams of one
    * event stream, joined on user_id with the same integer
    * epoch-microsecond interval predicate ([0, 1h]) as the batch
    * query. Both sides carry a 2-hour watermark, so Spark bounds the
    * join state to (watermark + interval) per side and evicts
    * automatically — the state contract that makes a stream-stream
    * join survive unbounded streams.
    *
    * Emits every qualifying (click, purchase) pair; last-touch
    * selection is the downstream per-purchase argmax exactly as q123
    * spells it (a stream-stream join cannot retract an earlier
    * emitted pair when a later click arrives, so the argmax belongs
    * after the join — standard Structured Streaming composition).
    * StreamingSpec pins pair-set equality with the batch join under
    * sliced arrivals.
    */
  def attributionStream(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"),
        col("event_id").as("click_id"))
      .withWatermark("cts", "2 hours")
    val purch = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("pts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("pts", "2 hours")
    clicks.join(purch,
      expr("user_id = p_user AND pts >= cts AND " +
        "pts <= cts + interval 1 hour"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        (unix_micros(col("pts")) - unix_micros(col("cts"))).as("lag_us"))
  }

  case class CmsCells(lang: String, seen: Long, cells: Array[Long])

  /** Streaming twin of batch q112: a per-key count-min sketch carried
    * as keyed stream state — D·W counters per key regardless of stream
    * length or vocabulary size, answering point-frequency queries
    * ([[cmsEstimate]]) where exact streaming per-token counts grow
    * with the vocabulary. Bucket addressing is bit-identical to q112
    * (first-8-hex of md5("r:" ++ tok) mod W), so a snapshot's
    * estimates are directly comparable to the batch census.
    *
    * Replay stability is UNCONDITIONAL (the KMV/[[distinctStream]]
    * class, unlike the arrival-order detectors): cells are plain sums
    * over the token MULTISET, so batch re-slicing or reordering of the
    * same rows yields byte-identical final state — StreamingSpec pins
    * this and the stream-equals-batch-sketch law. Each batch emits the
    * current snapshot tagged with `seen`; consumers read max-seen per
    * key (the [[heavyHittersStream]] contract).
    */
  def cmsStream(toks: Dataset[LangTok], d: Int = 4, w: Int = 64)
      : Dataset[CmsCells] = {
    import toks.sparkSession.implicits._
    toks.groupByKey(_.lang)
      .flatMapGroupsWithState[(Array[Long], Long), CmsCells](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, it, state) =>
          val (cells0, seen0) = state.getOption.getOrElse(
            (Array.fill(d * w)(0L), 0L))
          val cells = cells0.clone()
          var n = 0L
          it.foreach { t =>
            var r = 0
            while (r < d) { cells(r * w + cmsBucket(r, t.tok, w)) += 1; r += 1 }
            n += 1
          }
          state.update((cells, seen0 + n))
          Iterator.single(CmsCells(key, seen0 + n, cells))
      }
  }

  /** q112's bucket address: first 8 hex chars of md5("r:tok") mod w. */
  private[streaming] def cmsBucket(r: Int, tok: String, w: Int): Int = {
    val dg = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$r:$tok".getBytes("UTF-8"))
    // first 4 bytes = first 8 hex chars, as an unsigned 32-bit value
    val v = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
      ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
    (v % w).toInt
  }

  /** Point-frequency query against a [[cmsStream]] snapshot: min over
    * rows of the addressed cell (never undercounts).
    */
  def cmsEstimate(cells: Array[Long], tok: String, d: Int = 4,
      w: Int = 64): Long =
    (0 until d).map(r => cells(r * w + cmsBucket(r, tok, w))).min

  case class HllEst(key: String, seen: Long, npresent: Long,
      reg_checksum: Long, est: Double)

  /** Streaming twin of batch q131: per-key HyperLogLog registers as
    * keyed stream state — 64 six-bit registers per key regardless of
    * stream length or key-space size (the smallest state of the four
    * streaming sketches). Register addressing and rho are bit-identical
    * to q131's SQL device (JVM md5 hex, same string-derived
    * leading-zero classification — StreamingSpec pins the parity), and
    * the estimate uses the same exact-integer harmonic sum, so a
    * snapshot is directly comparable to the batch census.
    *
    * Replay stability is UNCONDITIONAL (the [[distinctStream]]/
    * [[cmsStream]] class): registers are per-cell maxima over the
    * value SET, so batch re-slicing or reordering yields byte-identical
    * final state, and max-merge across shards/keys is the closed
    * algebra TopKAggSpec proves for the batch side. Each batch emits
    * the current snapshot tagged with `seen`; consumers read max-seen
    * per key.
    */
  def hllStream(toks: Dataset[LangTok]): Dataset[HllEst] = {
    import toks.sparkSession.implicits._
    toks.groupByKey(_.lang)
      .flatMapGroupsWithState[(Array[Long], Long), HllEst](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, it, state) =>
          val (regs0, seen0) = state.getOption.getOrElse(
            (Array.fill(64)(0L), 0L))
          val regs = regs0.clone()
          var n = 0L
          it.foreach { t =>
            val (j, rho) = hllRegister(t.tok)
            if (rho > regs(j)) regs(j) = rho.toLong
            n += 1
          }
          val seen = seen0 + n
          state.update((regs, seen))
          val npresent = regs.count(_ > 0L).toLong
          val v = 64L - npresent
          val ssum = regs.filter(_ > 0L).map(m => 1L << (53 - m)).sum +
            v * 9007199254740992L
          val eraw = (0.7213 / (1.0 + 1.079 / 64.0)) * 4096.0 *
            9007199254740992.0 / ssum.toDouble
          val est = if (eraw <= 160.0 && v > 0L)
            64.0 * math.log(64.0 / v.toDouble) else eraw
          val checksum = regs.zipWithIndex
            .map { case (m, j) => j.toLong * m }.sum
          Iterator.single(HllEst(key, seen, npresent, checksum, est))
      }
  }

  // --- PSI drift stream (q176's live twin) -----------------------------------
  /** Reference band counts for [[psiStream]] — yesterday's snapshot
    * distribution as 10 longs, collected ONCE at stream construction
    * (an audited bounded collect, the SkewJoin.hotKeys class: the
    * spine is fixed at 10 bands by the q176 contract, so this is 10
    * numbers however large the reference corpus is).
    */
  def psiRefCounts(ref: DataFrame): Seq[Long] = {
    import ref.sparkSession.implicits._
    val m = ref.select(least(lit(9L),
        expr("CAST(ROUND(quality * 10000) AS BIGINT) div 1000")).as("band"))
      .groupBy($"band").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 9L).map(b => m.getOrElse(b, 0L))
  }

  /** Streaming twin of batch q176: the PSI drift monitor on the LIVE
    * scored-ingest stream — per watermarked tumbling window, the
    * quality-band distribution against a FROZEN reference snapshot
    * (the trained model's corpus), emitted as q176's per-band rows
    * (both counts, both Laplace-smoothed proportions, the psi_term)
    * so the alarm read is identical batch or live: Σ psi_term per
    * window vs the 0.1/0.2 fleet thresholds, then "which band moved".
    *
    * One streaming aggregation (10 conditional sums + the total per
    * window — Structured Streaming's single-agg rule), then the band
    * explode, the 10-literal reference lookup, and the PSI arithmetic
    * are stateless projections above it. State = one row per open
    * window; append emits a window's 10 rows once its watermark
    * passes. Exactness is q176's: integer-scaled banding, Laplace
    * (+1/+10) ratios of exact integers, LN of a ratio of integer
    * products — so a closed window's rows equal batch
    * [[graft.operators.TextAnalysis.psiBands]] over (window rows,
    * reference rows) exactly (StreamingSpec pins it).
    */
  def psiStream(scored: DataFrame, refCounts: Seq[Long],
      watermark: String = "10 minutes",
      window_ : String = "60 minutes"): DataFrame = {
    require(refCounts.size == 10, "refCounts must have exactly 10 bands")
    psiWindowedCore(scored.select(col("ts"), least(lit(9L),
        expr("CAST(ROUND(quality * 10000) AS BIGINT) div 1000")).as("band")),
      refCounts, watermark, window_)
  }

  /** The shared windowed-PSI skeleton behind [[psiStream]] (quality
    * bands) and [[driftStream]] (quantizer cells): one streaming
    * aggregation per window (n conditional sums + the total), then the
    * band explode, the n-literal reference lookup, and q176's PSI
    * arithmetic (Laplace +1/+n, LN of a ratio of integer products) as
    * stateless projections above it. Smoothing denominator = band
    * count, matching each batch twin exactly.
    */
  private def psiWindowedCore(banded: DataFrame, refCounts: Seq[Long],
      watermark: String, window_ : String): DataFrame = {
    val n = refCounts.size
    val refTot = refCounts.sum
    val refArr = array(refCounts.map(lit(_)): _*)
    val sums = (0 until n).map(b =>
      sum(when(col("band") === b, 1L).otherwise(0L)).as(s"b$b")) :+
      count(lit(1)).as("n_tot")
    val agg = banded
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_))
      .agg(sums.head, sums.tail: _*)
    val pc = (col("n_cur") + 1).cast("double") /
      (col("n_tot") + n).cast("double")
    val pr = (col("n_ref") + 1).cast("double") /
      (lit(refTot) + n.toLong).cast("double")
    agg
      .select(col("window.start").as("window_start"), col("n_tot"),
        posexplode(array((0 until n).map(b => col(s"b$b")): _*)))
      .select(col("window_start"), col("pos").cast("long").as("band"),
        col("col").as("n_cur"), col("n_tot"),
        element_at(refArr, (col("pos") + 1).cast("int")).as("n_ref"))
      .select(col("window_start"), col("band"), col("n_cur"), col("n_ref"),
        graft.core.Exact.dround(pc, 6).as("p_cur"),
        graft.core.Exact.dround(pr, 6).as("p_ref"),
        graft.core.Exact.dround((pc - pr) *
          log(((col("n_cur") + 1).cast("double")
            * (lit(refTot) + n.toLong).cast("double"))
            / ((col("n_ref") + 1).cast("double")
              * (col("n_tot") + n).cast("double"))), 6).as("psi_term"))
  }

  /** Frozen centroids for [[driftStream]], collected ONCE at stream
    * construction from a trained quantizer's (cell, centroid) frame —
    * k×dim doubles, the bounded-collect class (k = 8 here).
    */
  def driftCentroids(cents: DataFrame): Seq[(Long, Seq[Double])] =
    cents.collect().map(r => (r.getLong(0),
      r.getSeq[Double](1).toSeq)).toSeq.sortBy(_._1)

  /** Per-cell reference counts for [[driftStream]]: the training
    * snapshot's own assignment censused over the k-cell spine (cells
    * are seed ids 1..k; missing cells read 0).
    */
  def driftRefCounts(idx: DataFrame, k: Int = 8): Seq[Long] = {
    import idx.sparkSession.implicits._
    val m = idx.groupBy($"cell").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to k.toLong).map(c => m.getOrElse(c, 0L))
  }

  /** Streaming twin of batch q178: the DENSE drift monitor on the
    * live embedding-ingest stream — each vector is assigned to its
    * nearest FROZEN centroid (bit-parity with the batch
    * `kmeansAssign` rule: same composed-dot d2, smallest-cell ties),
    * and per watermarked tumbling window the cell-occupancy
    * distribution is compared against the training snapshot's with
    * q178's exact PSI terms. A window's rows ARE the retrain alarm:
    * Σ psi_term vs the 0.1/0.2 thresholds, then "which cell moved".
    *
    * The centroid table rides the stream as LITERALS (k×dim doubles —
    * the assignment is one stateless codegen'd projection, no
    * stream-static join); state is one row per open window.
    * Exactness and the psi-term symmetry law ((x−y)·ln(x/y) is
    * orientation-invariant) are pinned by StreamingSpec against the
    * batch q178 machinery over the same rows.
    */
  def driftStream(vecs: DataFrame, centroids: Seq[(Long, Seq[Double])],
      refCounts: Seq[Long], watermark: String = "10 minutes",
      window_ : String = "60 minutes"): DataFrame = {
    require(centroids.nonEmpty && refCounts.size == centroids.size,
      "refCounts must have one entry per centroid cell")
    val centsLit = array(centroids.map { case (cl, cv) =>
      struct(lit(cl).as("cl"),
        array(cv.map(lit(_)): _*).as("cvec"))
    }: _*)
    // whole-array Cast (codegen'd), not a per-element transform lambda
    val ev = col("embedding").cast("array<double>")
    val d2 = (c: org.apache.spark.sql.Column) =>
      graft.functions.geo.dot_product(ev, ev) -
        lit(2.0) * graft.functions.geo.dot_product(ev, c) +
        graft.functions.geo.dot_product(c, c)
    val cell = array_min(transform(centsLit, c =>
      struct(d2(c.getField("cvec")).as("d2"),
        c.getField("cl").as("cl")))).getField("cl")
    psiWindowedCore(
      vecs.select(col("ts"), (cell - 1L).as("band")),
      refCounts, watermark, window_)
      .withColumnRenamed("band", "cellm1")
      .withColumn("cell", col("cellm1") + 1L)
      .select(col("window_start"), col("cell"), col("n_cur"),
        col("n_ref"), col("p_cur"), col("p_ref"), col("psi_term"))
  }

  case class DiscordHit(seen: Long, win_start_h: Long, score: Long)

  /** Streaming twin of batch q137: the matrix-profile discord over the
    * LIVE hourly series — the subsequence-level anomaly detector next
    * to the point detectors ([[zscoreDetector]]/[[ewmaDetector]]).
    * State is the hourly cents map — bounded by the TIME SPAN (the
    * q71/q137 contract: 720 entries per month), NOT by stream volume —
    * under one global key (the series is global by definition; the
    * per-batch work is a bounded H²·W fold over ≤ a-few-thousand
    * hours, microseconds of CPU — a production long-horizon deployment
    * swaps in the incremental STAMPI update, same state contract).
    * Each batch emits the CURRENT top discord tagged with `seen`
    * (max-seen = latest, the [[heavyHittersStream]] contract); no
    * emission until the series spans 2 windows.
    *
    * Replay stability is UNCONDITIONAL ([[cmsStream]]'s class): the
    * state is a sum map over the event multiset, so re-slicing cannot
    * diverge, and the final snapshot equals batch
    * [[graft.operators.Anomaly.discordCensus]] over the same rows
    * (StreamingSpec pins both).
    */
  def discordStream(events: Dataset[Event]): Dataset[DiscordHit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_ => 0)
      .flatMapGroupsWithState[(Map[Long, Long], Long), DiscordHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, it, state) =>
          val (m, seen) = foldHourlyCents(it, state)
          topDiscord(m) match {
            case Some((h, sc)) => Iterator.single(DiscordHit(seen, h, sc))
            case None => Iterator.empty
          }
      }
  }

  /** q137's discord rule over a sparse hourly map: densify to the
    * span, score every window by min distance to a non-overlapping
    * partner, return the (max score, then smallest start) winner.
    */
  private[streaming] def topDiscord(m: Map[Long, Long],
      w: Int = 24): Option[(Long, Long)] = {
    if (m.isEmpty) return None
    val mn = m.keys.min; val mx = m.keys.max
    if (mx - mn + 1 < 2L * w) return None
    val sv = (mn to mx).map(h => m.getOrElse(h, 0L)).toArray
    val scores = (0 to sv.length - w).map { s =>
      val d = (0 to sv.length - w).iterator
        .filter(t => math.abs(t - s) >= w)
        .map { t =>
          var k = 0; var acc = 0L
          while (k < w) {
            val df = sv(s + k) - sv(t + k); acc += df * df; k += 1
          }
          acc
        }.min
      (mn + s, d)
    }
    Some(scores.minBy { case (h, d) => (-d, h) })
  }

  /** q131's register address + rho: j = first md5 byte mod 64; rho =
    * leading-zero BITS of the next 52 (13 hex chars), derived by the
    * same string classification as the SQL device so the two are
    * bit-identical by construction.
    */
  private[streaming] def hllRegister(value: String): (Int, Int) = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(value.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val j = Integer.parseInt(hex.substring(0, 2), 16) % 64
    val st = hex.substring(2, 15).dropWhile(_ == '0')
    val rho = if (st.isEmpty) 53 else {
      val d = st.charAt(0)
      val extra =
        if (d >= '8') 0 else if (d >= '4') 1 else if (d >= '2') 2 else 3
      4 * (13 - st.length) + extra + 1
    }
    (j, rho)
  }

  case class CusumHit(seen: Long, hour_h: Long, cusum_scaled: Long)

  /** Streaming twin of batch q140 CUSUM — the drift detector as stream
    * state, [[discordStream]]'s class exactly: state is the hourly
    * cents map (TIME-SPAN-bounded, never stream-volume-bounded) under
    * one global series key; each batch folds its events into the map
    * and emits the CURRENT peak accumulated-drift point (largest
    * scaled CUSUM, smallest hour on ties) tagged with `seen`
    * (max-seen = latest). Cents round HALF_UP away from zero — bit
    * parity with batch round()/DuckDB ROUND (the round-11 rule).
    *
    * Replay stability is UNCONDITIONAL: the state is a sum map over
    * the event multiset, so re-slicing cannot diverge it, and the
    * final snapshot's peak equals batch
    * [[graft.operators.Anomaly.cusumCensus]]'s top row over the same
    * rows (StreamingSpec pins both).
    */
  def cusumStream(events: Dataset[Event]): Dataset[CusumHit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_ => 0)
      .flatMapGroupsWithState[(Map[Long, Long], Long), CusumHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, it, state) =>
          val (m, seen) = foldHourlyCents(it, state)
          topCusum(m) match {
            case Some((h, c)) => Iterator.single(CusumHit(seen, h, c))
            case None         => Iterator.empty
          }
      }
  }

  /** q140's closed form over a sparse hourly map: densify to the span,
    * scaled statistic n·P_t − t·S minus its running min (floored at
    * the empty prefix), return the (max, then smallest hour) peak.
    */
  private[streaming] def topCusum(m: Map[Long, Long])
      : Option[(Long, Long)] = {
    if (m.isEmpty) return None
    val mn = m.keys.min; val mx = m.keys.max
    val sv = (mn to mx).map(h => m.getOrElse(h, 0L)).toArray
    val n = sv.length.toLong; val sx = sv.sum
    var c = 0L; var best = Long.MinValue; var bestH = mn
    var i = 0
    while (i < sv.length) {
      c = math.max(0L, c + (n * sv(i) - sx))
      if (c > best) { best = c; bestH = mn + i }
      i += 1
    }
    Some((bestH, best))
  }

  case class EpisodeHit(seen: Long, start_h: Long, len_h: Long,
      excess_scaled: Long)

  /** Streaming twin of batch q141 — the sustained-episode detector as
    * stream state, [[cusumStream]]'s class exactly: state is the
    * hourly cents map (TIME-SPAN-bounded) under one global series key;
    * each batch emits the CURRENT top episode (longest maximal run of
    * consecutive above-mean hours, smallest start on ties) with its
    * exact accumulated excess mass, tagged with `seen`. The above-mean
    * flag is the integer comparison n·x > S — no rational mean — so
    * the scan is exact BIGINTs like the batch census. Cents round
    * HALF_UP away from zero (the round-11 rule). Replay stability is
    * UNCONDITIONAL (sum-map state); the final snapshot equals batch
    * [[graft.operators.Anomaly.episodeCensus]]'s top row over the same
    * rows (StreamingSpec pins both).
    */
  def episodeStream(events: Dataset[Event]): Dataset[EpisodeHit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_ => 0)
      .flatMapGroupsWithState[(Map[Long, Long], Long), EpisodeHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, it, state) =>
          val (m, seen) = foldHourlyCents(it, state)
          topEpisode(m) match {
            case Some((h, len, ex)) =>
              Iterator.single(EpisodeHit(seen, h, len, ex))
            case None => Iterator.empty
          }
      }
  }

  /** q141's gaps-and-islands rule over a sparse hourly map: densify to
    * the span, scan for maximal runs of n·x > S, return the (longest,
    * then smallest start) run with its exact excess Σ(n·x − S).
    */
  private[streaming] def topEpisode(m: Map[Long, Long])
      : Option[(Long, Long, Long)] = {
    if (m.isEmpty) return None
    val mn = m.keys.min; val mx = m.keys.max
    val sv = (mn to mx).map(h => m.getOrElse(h, 0L)).toArray
    val n = sv.length.toLong; val sx = sv.sum
    var best: Option[(Long, Long, Long)] = None
    var i = 0
    while (i < sv.length) {
      if (n * sv(i) > sx) {
        val start = i; var excess = 0L
        while (i < sv.length && n * sv(i) > sx) {
          excess += n * sv(i) - sx; i += 1
        }
        val len = (i - start).toLong
        if (best.forall(b => len > b._2))
          best = Some((mn + start, len, excess))
      } else i += 1
    }
    best
  }

  case class HoltHit(seen: Long, hour_h: Long, residual_scaled: Long)

  /** Streaming twin of batch q142 Holt–Winters — the FORECAST-residual
    * detector as stream state, [[cusumStream]]'s class exactly: state
    * is the hourly cents map (TIME-SPAN-bounded, never
    * stream-volume-bounded) under one global series key; each batch
    * folds its events into the map and emits the CURRENT top
    * forecast-residual hour (largest |actual − (l+b+s)|, smallest hour
    * on ties) tagged with `seen` (max-seen = latest). The fixed-point
    * recurrence (α=β=γ=1/2, floor-halving — Long >> 1) replays from
    * warmup over the densified span each batch: ≤720 steps of integer
    * queue work per month of span, microseconds — a long-horizon
    * deployment carries (l, b, season queue) incrementally instead,
    * same state contract. Cents round HALF_UP away from zero — bit
    * parity with batch round()/DuckDB ROUND (the round-11 rule). No
    * emission until the series spans two periods.
    *
    * Replay stability is UNCONDITIONAL: the state is a sum map over
    * the event multiset, so re-slicing cannot diverge it, and the
    * final snapshot's peak equals batch
    * [[graft.operators.Anomaly.holtWintersCensus]]'s top row over the
    * same rows (StreamingSpec pins both).
    */
  def holtStream(events: Dataset[Event]): Dataset[HoltHit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_ => 0)
      .flatMapGroupsWithState[(Map[Long, Long], Long), HoltHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, it, state) =>
          val (m, seen) = foldHourlyCents(it, state)
          topHoltResidual(m) match {
            case Some((h, r)) => Iterator.single(HoltHit(seen, h, r))
            case None         => Iterator.empty
          }
      }
  }

  case class QuantileSnap(event_type: String, seen: Long, p50: Double,
      p90: Double, p99: Double)

  /** Streaming exact quantiles — the sketch-family member production
    * asks for first (live p99), as state bounded by the VALUE DOMAIN:
    * per event type, one cents→count map (the 2-decimal value contract
    * makes cents lossless, so these are EXACT quantiles, not a
    * GK/t-digest approximation; state is the ≤~50k distinct cents
    * values, never the row count — batch q152's bounding trick as
    * keyed stream state). Each batch emits the key's current
    * p50/p90/p99 by the same pure-integer rank rule (smallest value
    * with 100·cum ≥ p·total). Replay-stable UNCONDITIONALLY (sum-map
    * state); the final snapshot equals the matching batch
    * [[graft.operators.Anomaly.exactQuantiles]] row over the same rows
    * (StreamingSpec pins it).
    *
    * STATE BOUND, honestly stated (the batch query's contract,
    * Anomaly.scala q152 doc, carried here because a stream never gets
    * to "re-run smaller"): the cents map is bounded by the DISTINCT
    * OBSERVED VALUES, which is only a bound when the metric has
    * bounded precision and range — the 2-decimal dollar contract here.
    * For an unbounded-domain metric (free-floating doubles,
    * micro-precision latencies) the map grows with cardinality, and
    * the escape hatches are: (1) `capCents` — values above the cap
    * clamp INTO the cap bucket, so state is ≤ cap+1 entries and every
    * quantile at or below the cap stays EXACT (only quantiles landing
    * above report the cap itself — a one-sided floor, the
    * StreamingSpec-pinned behavior); or (2) fall back to the approx
    * sketch family (the q35 `approx_percentile` twin) when even a
    * capped domain is too wide.
    */
  def quantileStream(events: Dataset[Event],
      capCents: Long = Long.MaxValue): Dataset[QuantileSnap] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[(Map[Long, Long], Long), QuantileSnap](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, it, state) =>
          val (m0, seen0) = state.getOption.getOrElse(
            (Map.empty[Long, Long], 0L))
          var m = m0; var n = 0L
          it.foreach { e =>
            val cents = math.min(capCents,
              BigDecimal(e.value * 100)
                .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
            m = m.updated(cents, m.getOrElse(cents, 0L) + 1L)
            n += 1
          }
          val seen = seen0 + n
          state.update((m, seen))
          if (m.isEmpty) Iterator.empty
          else {
            val sorted = m.toArray.sortBy(_._1)
            val tot = sorted.map(_._2).sum
            def q(p100: Long): Double = {
              var cum = 0L; var i = 0
              while (i < sorted.length && cum * 100 < tot * p100) {
                cum += sorted(i)._2; i += 1
              }
              // loop exits at the first value whose cum satisfies the
              // rank rule; i-1 indexes it (tot ≥ 1 here, so i ≥ 1)
              sorted(i - 1)._1.toDouble / 100.0
            }
            Iterator.single(QuantileSnap(key, seen, q(50), q(90), q(99)))
          }
      }
  }

  case class KeyedHoltHit(event_type: String, seen: Long, hour_h: Long,
      residual_scaled: Long)

  /** [[holtStream]] SHARDED BY THE SERIES KEY — the streaming twin of
    * batch q148 and the form a cluster deployment runs: state is one
    * hourly cents map PER EVENT TYPE (each bounded by its own time
    * span), keys scale out across executors exactly as q148's packed
    * rows do. Each batch emits every updated key's current peak
    * forecast-residual hour tagged with that key's own `seen` count.
    * Replay-stable unconditionally per key (sum-map state); the final
    * snapshot per key equals the matching q148 row over the same rows
    * (StreamingSpec pins it).
    */
  def holtStreamByType(events: Dataset[Event]): Dataset[KeyedHoltHit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[(Map[Long, Long], Long), KeyedHoltHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, it, state) =>
          val (m, seen) = foldHourlyCents(it, state)
          topHoltResidual(m) match {
            case Some((h, r)) =>
              Iterator.single(KeyedHoltHit(key, seen, h, r))
            case None => Iterator.empty
          }
      }
  }

  case class KeyedCusumHit(event_type: String, seen: Long, hour_h: Long,
      cusum_scaled: Long)

  /** [[cusumStream]] SHARDED BY THE SERIES KEY — the streaming twin of
    * batch q155 and the fleet-telemetry deployment form
    * ([[holtStreamByType]]'s class exactly): state is one hourly cents
    * map PER EVENT TYPE (each bounded by its own time span), keys
    * scale out across executor state stores as q155's packed rows do
    * across tasks. Each batch emits every updated key's current peak
    * accumulated-drift hour tagged with that key's own `seen`.
    * Replay-stable unconditionally per key (sum-map state); the final
    * snapshot per key equals the matching q155 row over the same rows
    * (StreamingSpec pins it).
    */
  def cusumStreamByType(events: Dataset[Event]): Dataset[KeyedCusumHit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[(Map[Long, Long], Long), KeyedCusumHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, it, state) =>
          val (m, seen) = foldHourlyCents(it, state)
          topCusum(m) match {
            case Some((h, c)) =>
              Iterator.single(KeyedCusumHit(key, seen, h, c))
            case None => Iterator.empty
          }
      }
  }

  case class KeyedEpisodeHit(event_type: String, seen: Long, start_h: Long,
      len_h: Long, excess_scaled: Long)

  /** [[episodeStream]] SHARDED BY THE SERIES KEY — the streaming twin
    * of batch q156: per-key hourly cents map state, each batch emits
    * every updated key's current top sustained episode against the
    * key's OWN mean. Same replay/parity contract as
    * [[cusumStreamByType]] (StreamingSpec pins snapshot == q156).
    */
  def episodeStreamByType(events: Dataset[Event])
      : Dataset[KeyedEpisodeHit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[(Map[Long, Long], Long), KeyedEpisodeHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, it, state) =>
          val (m, seen) = foldHourlyCents(it, state)
          topEpisode(m) match {
            case Some((h, len, ex)) =>
              Iterator.single(KeyedEpisodeHit(key, seen, h, len, ex))
            case None => Iterator.empty
          }
      }
  }

  case class KeyedDiscordHit(event_type: String, seen: Long,
      win_start_h: Long, score: Long)

  /** [[discordStream]] SHARDED BY THE SERIES KEY — the streaming twin
    * of batch q159: per key, the matrix-profile discord over the
    * key's own live hourly series. State is one time-span-bounded
    * hourly map per event type; each batch's per-key work is the
    * bounded H²·W fold. Silent until the key spans two windows. Same
    * replay/parity contract as the other keyed twins (StreamingSpec
    * pins snapshot == q159 per key).
    */
  def discordStreamByType(events: Dataset[Event])
      : Dataset[KeyedDiscordHit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[(Map[Long, Long], Long), KeyedDiscordHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, it, state) =>
          val (m, seen) = foldHourlyCents(it, state)
          topDiscord(m) match {
            case Some((h, sc)) =>
              Iterator.single(KeyedDiscordHit(key, seen, h, sc))
            case None => Iterator.empty
          }
      }
  }

  case class KeyedRcHit(event_type: String, seen: Long, hour_h: Long,
      cusum_scaled: Long)

  /** Seasonal-adjusted residual CUSUM SHARDED BY THE SERIES KEY — the
    * streaming twin of batch q157: per key, the fixed-point
    * Holt–Winters recurrence replays over the key's densified span and
    * Page's statistic accumulates over ITS residuals; each batch emits
    * the key's current peak unexplained-drift hour. Silent until the
    * key spans two periods (the fold's own guard, like
    * [[holtStreamByType]]). Same replay/parity contract (StreamingSpec
    * pins snapshot == q157).
    */
  def residualCusumStreamByType(events: Dataset[Event])
      : Dataset[KeyedRcHit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[(Map[Long, Long], Long), KeyedRcHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, it, state) =>
          val (m, seen) = foldHourlyCents(it, state)
          topResidualCusum(m) match {
            case Some((h, c)) =>
              Iterator.single(KeyedRcHit(key, seen, h, c))
            case None => Iterator.empty
          }
      }
  }

  case class KeyedEnsembleHit(event_type: String, seen: Long, hour_h: Long,
      n_detectors: Long, detectors: String)

  /** The LIVE twin of batch q161 — per-type corroboration across all
    * four keyed detectors off ONE shared state: each key keeps the
    * single hourly cents map every keyed twin uses
    * ([[foldHourlyCents]]), and each batch re-runs the four bounded
    * in-JVM detector folds (CUSUM, episodes, residual CUSUM via the
    * Holt replay, discord) over it, emitting the key's CURRENT
    * corroboration census: one row per flagged hour with the sorted
    * detector roster. `n_detectors ≥ 2` is the live page. Consumers
    * read max-seen per key for the snapshot; the final snapshot equals
    * the batch q161 rows for the key over the same events
    * (StreamingSpec pins it). Replay-stable unconditionally (sum-map
    * state, the cusumStreamByType class); detectors whose span guards
    * aren't met yet (two periods / two windows) simply don't vote,
    * exactly as their batch forms drop short series.
    *
    * Scale shape: ONE state store entry per key — running the four
    * detectors as separate streams keeps four copies of the same
    * hourly map and pays four shuffles of the event stream; this
    * composition pays one of each.
    */
  def ensembleStreamByType(events: Dataset[Event])
      : Dataset[KeyedEnsembleHit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[(Map[Long, Long], Long), KeyedEnsembleHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, it, state) =>
          val (m, seen) = foldHourlyCents(it, state)
          val flags = Seq(
            topCusum(m).map { case (h, _) => (h, "cusum") },
            topEpisode(m).map { case (h, _, _) => (h, "episode") },
            topResidualCusum(m).map { case (h, _) => (h, "residual_cusum") },
            topDiscord(m).map { case (h, _) => (h, "discord") }).flatten
          flags.groupBy(_._1).toSeq
            .map { case (h, fs) =>
              KeyedEnsembleHit(key, seen, h, fs.size.toLong,
                fs.map(_._2).sorted.mkString(","))
            }
            .sortBy(r => (-r.n_detectors, r.hour_h)).iterator
      }
  }

  /** Fold a batch of events into the (hourly cents map, seen count)
    * state and persist it — the shared state-update step of every
    * series-detector stream. Cents round HALF_UP (away from zero) for
    * BIT-PARITY with the batch censuses' Spark round(value*100) and
    * the oracle's DuckDB ROUND, which also round half away from zero;
    * math.round (half toward +inf) would silently break the
    * stream==batch law on a negative exact half-cent (round-11
    * advice — latent on the nonnegative corpus, wrong on any corpus
    * with refunds).
    */
  private def foldHourlyCents(it: Iterator[Event],
      state: org.apache.spark.sql.streaming.GroupState[(Map[Long, Long], Long)])
      : (Map[Long, Long], Long) = {
    val (m0, seen0) = state.getOption.getOrElse((Map.empty[Long, Long], 0L))
    var m = m0; var n = 0L
    it.foreach { e =>
      val h = micros(e.ts) / 3600000000L
      val cents = BigDecimal(e.value * 100)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      m = m.updated(h, m.getOrElse(h, 0L) + cents)
      n += 1
    }
    val seen = seen0 + n
    state.update((m, seen))
    (m, seen)
  }

  /** q153/q157's composition over a sparse hourly map: replay the
    * fixed-point Holt–Winters recurrence over the densified span and
    * accumulate Page's statistic over the residual stream (prefix sum
    * minus running min, floored at the empty prefix — residuals are
    * model-centered so there is no mean term), returning the
    * (max CUSUM, then smallest hour) peak. None below two periods.
    */
  private[streaming] def topResidualCusum(m: Map[Long, Long])
      : Option[(Long, Long)] = {
    if (m.isEmpty) return None
    val mn = m.keys.min; val mx = m.keys.max
    if (mx - mn + 1 < 48L) return None
    val sv = (mn to mx).map(h => m.getOrElse(h, 0L)).toArray
    val w24 = sv.take(24).sum
    val l0 = (w24 - (((w24 % 24) + 24) % 24)) / 24
    var l = l0; var b = 0L
    val q = scala.collection.mutable.Queue(sv.take(24).map(_ - l0): _*)
    var pf = 0L; var minPf = Long.MaxValue
    var best = Long.MinValue; var bestH = mn
    var t = 24
    while (t < sv.length) {
      val sh = q.dequeue(); val x = sv(t)
      val r = x - (l + b + sh)
      val ln = (x - sh + l + b) >> 1
      val bn = (ln - l + b) >> 1
      val sn = (x - ln + sh) >> 1
      q.enqueue(sn); l = ln; b = bn
      pf += r
      minPf = math.min(minPf, pf)
      val cus = pf - math.min(0L, minPf)
      if (cus > best) { best = cus; bestH = mn + t }
      t += 1
    }
    Some((bestH, best))
  }

  /** q142's fixed-point recurrence over a sparse hourly map: densify to
    * the span, warm up on the first day (l₀ = floored mean, b₀ = 0,
    * seasons = first-day deviations), step the floor-halving updates,
    * return the (max |residual|, then smallest hour) peak. Long >> 1
    * IS floor(a/2) — the same arithmetic the batch fold and the
    * DuckDB oracle spell.
    */
  private[streaming] def topHoltResidual(m: Map[Long, Long])
      : Option[(Long, Long)] = {
    if (m.isEmpty) return None
    val mn = m.keys.min; val mx = m.keys.max
    if (mx - mn + 1 < 48L) return None
    val sv = (mn to mx).map(h => m.getOrElse(h, 0L)).toArray
    val w24 = sv.take(24).sum
    val l0 = (w24 - (((w24 % 24) + 24) % 24)) / 24
    var l = l0; var b = 0L
    val q = scala.collection.mutable.Queue(sv.take(24).map(_ - l0): _*)
    var bestAbs = -1L; var bestR = 0L; var bestH = mn
    var t = 24
    while (t < sv.length) {
      val sh = q.dequeue(); val x = sv(t)
      val r = x - (l + b + sh)
      val ln = (x - sh + l + b) >> 1
      val bn = (ln - l + b) >> 1
      val sn = (x - ln + sh) >> 1
      q.enqueue(sn); l = ln; b = bn
      if (math.abs(r) > bestAbs) {
        bestAbs = math.abs(r); bestR = r; bestH = mn + t
      }
      t += 1
    }
    Some((bestH, bestR))
  }

  case class DocEvent(doc_id: Long, lang: String, text: String)
  case class ChunkSeen(ch: String, doc_id: Long, lang: String,
      chunk_toks: Long, occ: Long)

  /** Streaming twin of batch q133 CDC chunking — the incremental-crawl
    * story `cdcChunks`' shift invariance exists for: each arriving
    * document chunks IN-ROW through the ONE boundary definition
    * ([[graft.operators.Dedup.cdcChunksOf]], spec-pinned bit-parity
    * with the batch Column spelling), and each chunk instance matches
    * against the corpus chunk-hash state — keyed by `ch`, state = one
    * occurrence counter per distinct chunk. An emission's `occ` is the
    * chunk's corpus-wide occurrence count AFTER this instance, so
    * `occ > 1` is "this instance is a duplicate of something already
    * crawled" — the q61 incremental-dedup reading at chunk grain.
    *
    * State is one long per DISTINCT CHUNK — corpus-dictionary-sized by
    * the operator's nature (exactly q61's contract: an incremental
    * index must remember what it has seen), sharded across executor
    * state stores by the ch key; a production deployment backs it with
    * the RocksDB state store and ages cold chunks by TTL.
    *
    * Replay stability is UNCONDITIONAL (the [[cmsStream]] class): the
    * final state is the chunk-occurrence multiset — re-slicing cannot
    * diverge it — and per-instance emissions are reproducible because
    * within a batch instances apply in (doc_id, document chunk order)
    * order. The final snapshot census equals batch
    * [[graft.operators.Dedup.q133CdcChunking]] over the same rows
    * (StreamingSpec pins the law).
    */
  def cdcChunkStream(docs: Dataset[DocEvent]): Dataset[ChunkSeen] = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      graft.operators.Dedup.cdcChunksOf(d.text).zipWithIndex.map {
        case ((_, toks, h), pos) => (h, d.doc_id, d.lang, toks, pos)
      }
    }
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, ChunkSeen](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (ch, it, state) =>
          var occ = state.getOption.getOrElse(0L)
          val out = it.toSeq.sortBy(r => (r._2, r._5)).map { r =>
            occ += 1
            ChunkSeen(ch, r._2, r._3, r._4, occ)
          }
          state.update(occ)
          out.iterator
      }
  }

  case class RetentionHit(user_id: Long, cohort_day: Long,
      week_offset: Long)

  /** Streaming twin of batch q79 (weekly cohort retention): per-user
    * keyed state carries the cohort week (first-activity Monday, UTC —
    * the same `date_trunc('week')` convention as the batch query) plus
    * the set of week offsets already counted, emitting one row the
    * FIRST time a user is active in each offset — the incremental feed
    * of the retention triangle (a census is one downstream
    * aggregation). State per user is the cohort day plus one Int per
    * ACTIVE week — bounded by stream lifetime in weeks, not by events
    * (a year-long stream holds ≤ 52 entries for the most loyal user).
    *
    * Ordering contract (same as [[funnelDetector]]): per-user arrival
    * must respect event-time order ACROSS micro-batches to reproduce
    * the batch census. The cohort pins at the first week SEEN: a
    * pre-cohort event arriving late (after the user's state exists)
    * cannot rebase the cohort — earlier offsets were already emitted
    * against it and append mode cannot retract — so such events are
    * dropped (off < 0). Batch q79 over the full data is the
    * authoritative triangle; this stream is its incremental
    * approximation under ordered arrival.
    */
  def retentionDetector(events: Dataset[Event]): Dataset[RetentionHit] = {
    import events.sparkSession.implicits._
    // Monday-truncated epoch day: day 0 (1970-01-01) was a Thursday,
    // so the latest Monday <= d sits floorMod(d - 4, 7) days back
    def mondayOf(us: Long): Long = {
      val d = Math.floorDiv(us, 86400000000L)
      d - Math.floorMod(d - 4L, 7L)
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Set[Int]), RetentionHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid, rows, state) =>
          val weeks = rows.map(e => mondayOf(micros(e.ts))).toSeq.sorted
          var (cohort, seen) = state.getOption.getOrElse(
            (mondayOf(Long.MaxValue), Set.empty[Int]))
          val hits = scala.collection.mutable.ArrayBuffer.empty[RetentionHit]
          weeks.foreach { w =>
            if (seen.isEmpty && w < cohort) cohort = w
            val off = ((w - cohort) / 7L).toInt
            if (off >= 0 && !seen(off)) {
              seen += off
              hits += RetentionHit(uid, cohort, off.toLong)
            }
          }
          state.update((cohort, seen))
          hits.iterator
      }
  }

  case class Transition(user_id: Long, cur: String, nxt: String,
      at_us: Long)

  /** Streaming twin of batch q80 (first-order transition matrix):
    * per-user state is just the LAST event type — O(1) — and each
    * arrival emits the (previous → current) transition edge; the
    * matrix census is one downstream aggregation. Within a
    * micro-batch rows sort by (event time, event_id), the batch
    * query's lead() order, so per-user event-time-ordered arrival
    * across batches reproduces the batch counts exactly (the same
    * ordering contract as [[funnelDetector]] / [[retentionDetector]]).
    */
  def transitionDetector(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[String, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid, rows, state) =>
          var lastType = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            if (lastType != null)
              out += Transition(uid, lastType, e.event_type, micros(e.ts))
            lastType = e.event_type
          }
          state.update(lastType)
          out.iterator
      }
  }

  case class Ewma(mean: Double, varEst: Double, n: Long) {
    def add(x: Double, alpha: Double): Ewma = {
      if (n == 0) Ewma(x, 0.0, 1)
      else {
        val d = x - mean
        val m = mean + alpha * d
        // West's EWMA variance recurrence
        Ewma(m, (1 - alpha) * (varEst + alpha * d * d), n + 1)
      }
    }
    def std: Double = math.sqrt(math.max(0, varEst))
  }

  case class Vec(vec_id: Long, embedding: Array[Float])
  case class SemDecision(vec_id: Long, cell: Int, rep: Long,
      cos_rep: Option[Double], kept: Boolean)

  /** Streaming twin of batch q97 SemDeDup
    * ([[graft.operators.Similarity.semDedup]]): each arriving
    * embedding is quantized to its 8-bit grid cell and compared to the
    * cell's REPRESENTATIVE — kept if cosine < tau, dropped otherwise.
    * A stream cannot know the global min vec_id, so the rep is
    * ARRIVAL-FIXED: the first vector a cell ever sees (ties within a
    * micro-batch break to the lowest vec_id, so replays are
    * deterministic). Same census rule as batch; rep choice is the
    * documented semantic difference.
    *
    * Replay stability contract (StreamingSpec pins both halves): for a
    * FIXED micro-batch slicing the output is deterministic, but
    * re-slicing the same events can elect a DIFFERENT rep (the first
    * batch to touch a cell wins) and flip members' keep/drop against
    * it — by design, the price of O(cells) state. Invariant under ANY
    * slicing: exactly one decision per vector, the rep is kept, and a
    * cell's rep never changes once set. Pipelines needing a
    * slicing-independent census must run the batch twin over the
    * settled corpus.
    *
    * State per cell = one (rep id, rep vector) pair — bounded by the
    * quantizer's cell count (≤ 2⁸ here, ≤ k under a k-means
    * quantizer), NEVER by stream length; cells shard across executor
    * state stores like every other keyed detector here.
    */
  def semDedupStream(vecs: Dataset[Vec], tau: Double = 0.25)
      : Dataset[SemDecision] = {
    import vecs.sparkSession.implicits._
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    // ONE quantizer definition shared with the batch twin
    // (spec-asserted bit-parity with the Column form)
    vecs.groupByKey(v => graft.operators.Similarity.gridCellOf(v.embedding))
      .flatMapGroupsWithState[(Long, Array[Double]), SemDecision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (cell: Int, rows: Iterator[Vec],
            state: GroupState[(Long, Array[Double])]) =>
          var st = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[SemDecision]
          rows.toSeq.sortBy(_.vec_id).foreach { v =>
            val vd = v.embedding.map(_.toDouble)
            st match {
              case None =>
                st = Some((v.vec_id, vd))
                out += SemDecision(v.vec_id, cell, v.vec_id, None, kept = true)
              case Some((repId, rv)) =>
                val cos = dot(vd, rv) /
                  (math.sqrt(dot(vd, vd)) * math.sqrt(dot(rv, rv)))
                if (cos.isNaN) {
                  // zero-norm vector (either side): cosine undefined —
                  // KEEP, null cos_rep, batch-twin rule. Also the
                  // crash guard: BigDecimal(NaN) throws, which would
                  // kill the whole streaming query on one bad row.
                  out += SemDecision(v.vec_id, cell, repId, None, kept = true)
                } else {
                  // display rounding mirrors the batch column (HALF_UP)
                  val cr = BigDecimal(cos)
                    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                  out += SemDecision(v.vec_id, cell, repId, Some(cr), cos < tau)
                }
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  /** EWMA detector: exponentially weighted mean/variance per key —
    * adapts to drifting baselines where Welford's all-history moments
    * go stale (level shifts, diurnal drift). Same O(1) state and
    * emission contract as [[zscoreDetector]].
    */
  def ewmaDetector(events: Dataset[Event], alpha: Double = 0.05,
      k: Double = 3.0, minN: Long = 10): Dataset[Hit] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[Ewma, Hit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Event], state: GroupState[Ewma]) =>
          var st = state.getOption.getOrElse(Ewma(0.0, 0.0, 0L))
          val hits = scala.collection.mutable.ArrayBuffer.empty[Hit]
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            if (st.n >= minN && st.std > 0) {
              val z = math.abs(e.value - st.mean) / st.std
              if (z > k) hits += Hit(e.event_id, key, e.user_id, e.value, z)
            }
            st = st.add(e.value, alpha)
          }
          state.update(st)
          hits.iterator
      }
  }

  /** Per-key streaming z-score detector: running Welford mean/variance
    * per (event_type), emitting events whose |z| exceeds `k` once at
    * least `minN` observations back the estimate. State is O(1) per
    * key — at cluster scale keys shard across executors' state stores.
    */
  def zscoreDetector(events: Dataset[Event], k: Double = 3.0,
      minN: Long = 10): Dataset[Hit] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[Welford, Hit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Event], state: GroupState[Welford]) =>
          var st = state.getOption.getOrElse(Welford(0, 0.0, 0.0))
          val hits = scala.collection.mutable.ArrayBuffer.empty[Hit]
          // deterministic within-batch order
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            if (st.n >= minN && st.std > 0) {
              val z = math.abs(e.value - st.mean) / st.std
              if (z > k) hits += Hit(e.event_id, key, e.user_id, e.value, z)
            }
            st = st.add(e.value)
          }
          state.update(st)
          hits.iterator
      }
  }
}
