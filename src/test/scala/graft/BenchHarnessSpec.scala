package graft

/** The bench/verify execution scope must leave no cached blocks behind:
  * q26/q28/q49 pin their gram/token streams for intra-query reuse, and
  * without scoping those blocks accumulate across a 49-query run and
  * skew every later query's memory and timings (the round-2/3
  * "Asked to cache already cached data" random-walk).
  */
class BenchHarnessSpec extends SparkTestBase {

  test("runScoped leaves the CacheManager empty after every query") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      Bench.runScoped(spark, fn(spark, sfDir))
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name leaked cached blocks past its bench scope")
    }
  }

  test("runScoped clears caches even when materialization fails") {
    import spark.implicits._
    val cached = Seq(1, 2, 3).toDF("x").cache()
    cached.count() // pin the block for real
    val boom = cached.selectExpr("assert_true(x < 0) as y")
    intercept[Throwable] { Bench.runScoped(spark, boom) }
    assert(spark.sharedState.cacheManager.isEmpty,
      "failed run left cached blocks behind")
  }

  // BENCH_r07's artifact lost 57/90 per-query timings to a 2,000-char
  // log-tail capture; the fix is a parsable file carrying the full
  // line. These cases gate both halves: the line parses with EVERY
  // query key present, and the file write round-trips byte-identically.
  test("renderJson parses with every query key, reps, and noise_band present") {
    val results: Seq[(String, Seq[Double])] =
      SparkEntry.queries.keys.toSeq.sorted.map(_ -> Seq(0.30, 0.10, 0.20)) :+
        ("q_failed" -> Seq.empty[Double])
    val line = Bench.renderJson(results, "/tmp/sfX", reps = 3)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(line)
    val queries = root.get("queries")
    val repsSec = root.get("reps_sec")
    results.foreach { case (name, _) =>
      assert(queries.has(name), s"queries missing $name")
      assert(repsSec.has(name), s"reps_sec missing $name")
    }
    assert(queries.get(results.head._1).asDouble() === 0.10) // min of reps
    assert(root.get("queries_median").get(results.head._1).asDouble() === 0.20)
    assert(repsSec.get(results.head._1).size() === 3)
    assert(queries.get("q_failed").asDouble() === -1.0)
    assert(root.get("errors").size() === 1 &&
      root.get("errors").get(0).asText() === "q_failed")
    assert(root.get("noise_band").get("max_spread").asDouble() === 3.0)
    assert(root.get("value").asDouble() > 0.0)
    assert(root.get("host").isNull, "default host block must be JSON null")
  }

  // BENCH_r08's 123.5 s total was pure host contention (61× rep spread;
  // a quiet re-run measured 39 s on identical code). The artifact must
  // carry the host-load evidence a reader needs to discount such a run
  // without a re-measurement.
  test("host block records loadavg before/after and processor count") {
    val host = Bench.hostJson(Some((1.25, 2.5, 3.75)), Some((4.0, 5.0, 6.0)),
      32, quietWaitSec = 40)
    val line = Bench.renderJson(Seq("q1" -> Seq(1.0)), "/tmp/sfX", reps = 1, host)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val h = mapper.readTree(line).get("host")
    assert(h.get("load_before").get(0).asDouble() === 1.25)
    assert(h.get("load_before").size() === 3)
    assert(h.get("load_after").get(2).asDouble() === 6.0)
    assert(h.get("procs").asInt() === 32)
    // round 11: the artifact records how long the bench waited for a
    // quiet host (the settle-wait that makes BENCH_rN itself
    // trustworthy rather than needing quiet re-run anchors)
    assert(h.get("quiet_wait_sec").asInt() === 40)
    // an already-quiet host (any real load is below an absurd
    // threshold) returns immediately
    assert(Bench.waitQuiet(1e9, 60) === 0)
    // off-Linux degradation: null fields, stable schema, still valid JSON
    val none = Bench.renderJson(Seq("q1" -> Seq(1.0)), "/tmp/sfX", 1,
      Bench.hostJson(None, None, 8))
    val h2 = mapper.readTree(none).get("host")
    assert(h2.get("load_before").isNull && h2.get("procs").asInt() === 8)
    // unmeasured probes render null, measured ones render their value
    assert(h2.get("cpu_probe_sec").isNull &&
      h2.get("cpu_probe_mt_sec").isNull)
    val hm = mapper.readTree(Bench.renderJson(Seq("q1" -> Seq(1.0)),
      "/tmp/sfX", 1, Bench.hostJson(None, None, 8, 0, 0.33, 0.41)))
      .get("host")
    assert(hm.get("cpu_probe_sec").asDouble() === 0.33 &&
      hm.get("cpu_probe_mt_sec").asDouble() === 0.41)
    // the all-cores probe measures something real and, like the
    // single-core one, can never be elided to ~0
    val mt = Bench.cpuProbeMt(reps = 1, threads = 2)
    assert(mt > 0.01 && mt < 60.0)
    // this host is Linux: the live read must produce three load fields
    val live = Bench.loadAvg()
    assert(live.nonEmpty && live.get._1 >= 0.0)
  }

  // Rounds 8–11 all shipped loaded-host official artifacts needing
  // manual A/B against quiet anchors; the quiet_ratio block bakes that
  // A/B into the artifact so a reader divides by the median to recover
  // the quiet-host estimate mechanically.
  test("quiet_ratio summarizes this run's per-query ratio vs the anchor; " +
    "null without an anchor; anchor file round-trips through readAnchor") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // anchor write+read round-trip (the flat {"q": sec} format)
    val dir = java.nio.file.Files.createTempDirectory("anchor")
    val p = dir.resolve("quiet_anchor.json")
    java.nio.file.Files.write(p,
      """{"q1": 1.0, "q2": 0.5, "q_new": 2.0}""".getBytes("UTF-8"))
    val anchor = Bench.readAnchor(p.toString)
    assert(anchor === Map("q1" -> 1.0, "q2" -> 0.5, "q_new" -> 2.0))
    // ratios: q1 measured 1.3x its anchor, q2 2.0x; q_only has no
    // anchor entry and q_new no measurement — both excluded from n
    val results: Seq[(String, Seq[Double])] = Seq(
      "q1" -> Seq(1.5, 1.3), "q2" -> Seq(1.0), "q_only" -> Seq(9.9))
    val line = Bench.renderJson(results, "/tmp/sfX", reps = 2, "null",
      Bench.quietRatioJson(results, anchor))
    val qr = mapper.readTree(line).get("quiet_ratio")
    assert(qr.get("n_common").asInt() === 2)
    assert(qr.get("median").asDouble() === 1.65) // (1.3 + 2.0) / 2
    assert(qr.get("p90").asDouble() === 2.0) // nearest-rank, never < median
    assert(qr.get("max").asDouble() === 2.0)
    // no anchor -> JSON null, and the default render stays null
    assert(Bench.quietRatioJson(results, Map.empty) === "null")
    assert(mapper.readTree(Bench.renderJson(results, "/tmp/sfX", 2))
      .get("quiet_ratio").isNull)
    // unreadable path degrades to empty, never throws
    assert(Bench.readAnchor("/nonexistent/anchor.json").isEmpty)
    // the shipped anchor file parses and covers the query surface
    val shipped = Bench.readAnchor("tools/quiet_anchor.json")
    assert(shipped.size >= 150,
      s"shipped anchor covers ${shipped.size} queries")
    assert(shipped.values.forall(_ > 0.0))
  }

  // The anchor file is load-bearing for the quiet_ratio diagnostic, so
  // refreshes must follow one rule: min-wins per query (a plan win
  // lowers the denominator next round; a contended run can never raise
  // it), new queries adopted wholesale, and the rendered file
  // round-trips through readAnchor byte-stably (sorted keys).
  test("mergedAnchor keeps min-per-query, adopts new queries, never raises; " +
    "renderAnchor round-trips through readAnchor; ratio block is labeled diagnostic") {
    val anchor = Map("q1" -> 1.0, "q2" -> 0.5, "q_gone" -> 3.0)
    val results: Seq[(String, Seq[Double])] = Seq(
      "q1" -> Seq(1.5, 0.8),     // beats anchor -> 0.8
      "q2" -> Seq(2.0),          // contended rep -> anchor 0.5 stands
      "q_new" -> Seq(4.0),       // new query adopted
      "q_err" -> Seq.empty)      // errored query ignored
    val merged = Bench.mergedAnchor(anchor, results)
    assert(merged === Map("q1" -> 0.8, "q2" -> 0.5, "q_gone" -> 3.0,
      "q_new" -> 4.0))
    val back = {
      val dir = java.nio.file.Files.createTempDirectory("anchor_rt")
      val p = dir.resolve("a.json")
      java.nio.file.Files.write(p,
        Bench.renderAnchor(merged).getBytes("UTF-8"))
      Bench.readAnchor(p.toString)
    }
    assert(back === merged)
    // sorted-key determinism: two renders of equal maps are identical
    assert(Bench.renderAnchor(merged) ===
      Bench.renderAnchor(merged.toSeq.reverse.toMap))
    // the ratio block self-identifies as diagnostic (ADVICE r12: a
    // self-measured anchor must not read as an official correction)
    val qr = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      Bench.quietRatioJson(Seq("q1" -> Seq(1.0)), Map("q1" -> 1.0)))
    assert(qr.get("note").asText().contains("diagnostic"))
    assert(qr.get("note").asText().contains("self-measured"))
    // rendered anchors FLOOR, never round up: a re-read value must be
    // <= the measured min for ANY input (ADVICE r13 — %.4f half-up
    // could write a merged min 5e-5 high, raising an anchor)
    Seq(0.12345999, 0.99999, 1.00005, 2.0, 0.00004).foreach { m =>
      val dir = java.nio.file.Files.createTempDirectory("anchor_fl")
      val p = dir.resolve("a.json")
      java.nio.file.Files.write(p,
        Bench.renderAnchor(Map("q" -> m)).getBytes("UTF-8"))
      val got = Bench.readAnchor(p.toString)("q")
      assert(got <= m && m - got < 1e-4,
        s"floor rule violated: $m rendered as $got")
    }
  }

  test("quiet-gate helpers: medianRatio over common queries only, " +
    "pickQuietest emits one attempt's raw numbers, disclosure block " +
    "carries every attempt's median in order") {
    val anchor = Map("q1" -> 1.0, "q2" -> 2.0)
    // common queries only; errored and anchor-less queries ignored
    val noisy: Seq[(String, Seq[Double])] = Seq(
      "q1" -> Seq(2.0, 3.0), "q2" -> Seq(2.4), "q_new" -> Seq(9.0),
      "q_err" -> Seq.empty)
    val quiet: Seq[(String, Seq[Double])] = Seq(
      "q1" -> Seq(1.05), "q2" -> Seq(2.1, 2.5), "q_new" -> Seq(1.0))
    assert(Bench.medianRatio(noisy, anchor).contains((2.0 + 1.2) / 2))
    assert(Bench.medianRatio(quiet, anchor).contains((1.05 + 1.05) / 2))
    assert(Bench.medianRatio(noisy, Map.empty).isEmpty,
      "no common queries -> the gate cannot judge")
    // the quietest attempt is emitted verbatim — never a min-merge
    val picked = Bench.pickQuietest(
      Seq((noisy, "host_noisy", 0.4), (quiet, "host_quiet", 0.4)), anchor)
    assert(picked == ((quiet, "host_quiet", 0.4)))
    // anchor-less attempts rank last, never win over a judged one
    assert(Bench.pickQuietest(
      Seq((Seq("q_x" -> Seq(0.1)), "a", 0.4), (quiet, "b", 0.4)),
      anchor)._2 == "b")
    val gate = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      Bench.quietGateJson(Seq((noisy, 0.4, 0.4), (quiet, 0.4, 0.4)),
        anchor, 1.05, 1.6, passed = true))
    assert(gate.get("attempts").asInt == 2)
    assert(gate.get("attempt_medians").size == 2)
    assert(gate.get("attempt_medians").get(0).asDouble == 1.6)
    assert(gate.get("attempt_medians").get(1).asDouble == 1.05)
    assert(gate.get("passed").asBoolean)
    assert(gate.get("threshold").asDouble == 1.05)
    assert(gate.get("p90_threshold").asDouble == 1.6)
  }

  // r15 verdict #1: the closing gate FAILED three rounds running on
  // drift-only hosts and each PASS was a narrative adjudication against
  // the cpu probe — this mechanizes the arithmetic the r15 judge did by
  // hand (raw 1.248 median / 1.188 probe drift ≈ 1.05 → pass).
  test("quiet gate consumes the cpu probe: drift-normalized median " +
    "passes a slower host mechanically, still fails a real mover") {
    val anchor = Map("q1" -> 1.0, "q2" -> 2.0, Bench.ProbeKey -> 0.3355)
    // driftFactor: slower host scales down; faster host floors at 1.0
    assert(Bench.driftFactor(0.3986, anchor.get(Bench.ProbeKey))
      === 0.3986 / 0.3355)
    assert(Bench.driftFactor(0.30, anchor.get(Bench.ProbeKey)) === 1.0,
      "a FASTER host must never discount a regression")
    assert(Bench.driftFactor(0.5, None) === 1.0,
      "no anchor stamp -> raw-ratio gate (pre-r16 behavior)")
    assert(Bench.driftFactor(-1.0, anchor.get(Bench.ProbeKey)) === 1.0,
      "unmeasured probe -> no normalization")
    // the r15 artifact's own numbers: raw median 1.248 on a host whose
    // probe read 1.188x the anchor stamp -> normalized 1.0505.. would
    // still fail a strict 1.05; the same raw median at the measured
    // drift 1.25 passes — the gate now does that division itself
    val drifted: Seq[(String, Seq[Double])] = Seq(
      "q1" -> Seq(1.25), "q2" -> Seq(2.5)) // raw median 1.25
    assert(Bench.medianRatio(drifted, anchor).contains(1.25))
    val norm = Bench.normalizedMedian(drifted, anchor,
      probeSec = 0.3355 * 1.25).get
    assert(math.abs(norm - 1.0) < 1e-9,
      s"pure drift must normalize to ~1.0, got $norm")
    // a real mover: queries 2x raw on a NON-drifting host (probe at the
    // anchor stamp) — normalization must not save it
    val mover: Seq[(String, Seq[Double])] = Seq(
      "q1" -> Seq(2.0), "q2" -> Seq(4.0))
    assert(Bench.normalizedMedian(mover, anchor, 0.3355).get === 2.0)
    // a mover HIDING under drift: queries 2.5x raw, host only 1.25x
    // slow — normalized 2.0 still fails
    val both: Seq[(String, Seq[Double])] = Seq(
      "q1" -> Seq(2.5), "q2" -> Seq(5.0))
    assert(Bench.normalizedMedian(both, anchor, 0.3355 * 1.25).get === 2.0)
    // ProbeKey is a pseudo-key: never a query ratio, never merged as one
    assert(Bench.medianRatio(
      Seq(Bench.ProbeKey -> Seq(1.0)), anchor).isEmpty)
    // disclosure block carries the full arithmetic: raw medians, probe
    // seconds, drift factors, normalized medians, anchor stamp
    val gate = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      Bench.quietGateJson(
        Seq((drifted, 0.3355 * 1.25, 0.3355 * 1.25), (mover, 0.3355, 0.3355)),
        anchor, 1.05, 1.6, passed = true))
    assert(gate.get("attempt_medians").get(0).asDouble === 1.25)
    assert(math.abs(gate.get("attempt_probe_sec").get(0).asDouble
      - 0.3355 * 1.25) < 1e-4)
    assert(gate.get("anchor_probe_sec").asDouble === 0.3355)
    assert(math.abs(gate.get("drift_factors").get(0).asDouble - 1.25) < 1e-3)
    assert(math.abs(gate.get("attempt_medians_normalized").get(0).asDouble
      - 1.0) < 1e-3)
    assert(gate.get("attempt_medians_normalized").get(1).asDouble === 2.0)
    // pickQuietest ranks by the NORMALIZED median: the drifted-but-
    // clean attempt (norm 1.0) beats the mover (norm 2.0)
    val pick = Bench.pickQuietest(
      Seq((mover, "m", 0.3355), (drifted, "d", 0.3355 * 1.25)), anchor)
    assert(pick._2 == "d")
  }

  // r16 verdict #2 + advice: the gate's drift discount now divides by
  // the STRICTER min(pre,post) probe, a forgiving normalization below
  // 0.9 is "over-corrected - re-run" instead of a pass with headroom,
  // and the min-probe-normalized p90 must clear its own threshold so a
  // tail of >2x movers can't hide under a clean median.
  test("r17 gate rule: min-probe normalization, over-correction floor, " +
    "p90 tail threshold") {
    val anchor = Map("q1" -> 1.0, "q2" -> 2.0, "q3" -> 1.0, "q4" -> 1.0,
      "q5" -> 1.0, "q6" -> 1.0, "q7" -> 1.0, "q8" -> 1.0, "q9" -> 1.0,
      "q10" -> 1.0, Bench.ProbeKey -> 0.3355)
    def flat(r: Double): Seq[(String, Seq[Double])] =
      anchor.keys.filterNot(_.startsWith("_")).toSeq.sorted
        .map(q => q -> Seq(anchor(q) * r))
    // raw median under threshold passes with no normalization at all
    assert(Bench.attemptPasses(flat(1.0), anchor, 0.5, 0.5, 1.05, 1.6))
    // genuine drift: both probes read 1.25x the stamp -> strict
    // normalization 1.25/1.25 = 1.0 passes, no over-correction
    assert(Bench.attemptPasses(flat(1.25), anchor,
      0.3355 * 1.25, 0.3355 * 1.25, 1.05, 1.6))
    // probe-noise drift: only the POST sample spiked (min probe at the
    // stamp) -> the r16 max-probe gate would pass 1.25/1.25 = 1.0; the
    // strict gate divides by min-probe drift 1.0 and FAILS
    assert(!Bench.attemptPasses(flat(1.25), anchor,
      0.3355 * 1.25, 0.3355, 1.05, 1.6))
    // over-correction: raw 1.27 with a 1.56x forgiving drift factor
    // normalizes to 0.81 < 0.9 -> re-run, never a pass (the r16
    // driver artifact's exact shape; min probe also high so the
    // strict quotient is under threshold)
    assert(!Bench.attemptPasses(flat(1.27), anchor,
      0.3355 * 1.56, 0.3355 * 1.50, 1.05, 1.6))
    // p90 tail: clean median but two >2x movers in ten queries ->
    // nearest-rank p90 picks the tail and fails its threshold
    val tail = flat(1.0).map {
      case (q, v) if q == "q8" || q == "q9" => q -> v.map(_ * 2.4)
      case kv => kv
    }
    assert(Bench.p90Ratio(tail, anchor).exists(r => math.abs(r - 2.4) < 1e-9))
    assert(!Bench.attemptPasses(tail, anchor, 0.3355, 0.3355, 1.05, 1.6))
    assert(Bench.attemptPasses(tail, anchor, 0.3355, 0.3355, 1.05, 0.0),
      "p90Thr <= 0 disables the tail check")
    // disclosure: over_corrected flag and the min-probe fields render
    val gate = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      Bench.quietGateJson(
        Seq((flat(1.27), 0.3355 * 1.56, 0.3355 * 1.50)),
        anchor, 1.05, 1.6, passed = false))
    assert(gate.get("over_corrected").get(0).asBoolean)
    assert(math.abs(gate.get("drift_factors_min").get(0).asDouble - 1.50)
      < 1e-3)
    assert(math.abs(gate.get("attempt_medians_normalized_min").get(0)
      .asDouble - 1.27 / 1.50) < 1e-3)
    assert(gate.get("attempt_p90s_normalized_min").get(0).isNumber)
    assert(!gate.get("passed").asBoolean)
  }

  test("writeLine persists the exact line and reports the absolute path") {
    val dir = java.nio.file.Files.createTempDirectory("bench_out")
    val target = dir.resolve("bench_out.json").toString
    val line = Bench.renderJson(Seq("q1" -> Seq(1.0)), "/tmp/sfX", reps = 1)
    val written = Bench.writeLine(line, target)
    assert(written.contains(java.nio.file.Paths.get(target).toAbsolutePath))
    val back = new String(
      java.nio.file.Files.readAllBytes(written.get), "UTF-8")
    assert(back === line + "\n")
    assert(Bench.writeLine(line, dir.resolve("no/such/dir/x.json").toString).isEmpty,
      "unwritable path must return None, not throw")
  }
}
