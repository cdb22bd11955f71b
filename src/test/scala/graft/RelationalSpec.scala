package graft

import graft.operators.Relational
import org.apache.spark.sql.functions.{count, lit}

class RelationalSpec extends SparkTestBase {

  test("every relational query runs and returns rows at sf0.001") {
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      // q2/q5 filters can legitimately select zero rows at tiny SF
      assert(n >= 0, s"$name failed")
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("q1 groups by returnflag/linestatus with positive sums") {
    val rows = Relational.q1Agg(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("q6 topk returns exactly 10 descending prices") {
    val prices = Relational.q6TopK(spark, sfDir).collect()
      .map(_.getAs[Double]("o_totalprice"))
    assert(prices.length == 10)
    assert(prices.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("every query key has an oracle") {
    val missing = Relational.queries.keySet -- Relational.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("q71 resample: complete hourly grid, event conservation, no ffill " +
    "gap after a type's first observation") {
    val r = Relational.q71ResampleFfill(spark, sfDir).collect()
    val perType = r.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(perType.values.toSet.size == 1,
      s"every type must span the same grid: $perType")
    val total = graft.core.Tables.events(spark, sfDir).count()
    assert(r.map(_.getAs[Long]("n_events")).sum == total,
      "every raw event lands in exactly one grid slot")
    r.groupBy(_.getString(0)).foreach { case (t, rows) =>
      val vs = rows.sortBy(_.getAs[String]("hour"))
        .map(row => Option(row.get(3)))
      val first = vs.indexWhere(_.isDefined)
      assert(first >= 0, s"type $t never observes a value")
      assert(vs.drop(first).forall(_.isDefined),
        s"type $t: ffill must never go null after the first observation")
    }
  }

  test("bloom sketch: no false negatives, FP rate within bound, bits " +
    "invariant under repartitioning, q67 equals the plain semi join") {
    import spark.implicits._
    import graft.functions.geo.{bloom_agg, might_contain}
    val keys = (0L until 3000L).map(_ * 7L + 1L)
    def bloomOf(parts: Int): Array[Byte] =
      keys.toDF("k").repartition(parts)
        .agg(bloom_agg($"k", 1 << 18, 5)).head().getAs[Array[Byte]](0)
    val bf = bloomOf(4)
    // merge is OR: the serialized bits cannot depend on partitioning
    assert(java.util.Arrays.equals(bf, bloomOf(13)),
      "bloom bits must be partition-invariant")
    // no false negatives — every inserted key probes true
    val misses = keys.toDF("k")
      .filter(!might_contain(lit(bf), $"k")).count()
    assert(misses == 0L, s"$misses inserted keys probed false")
    // FP bound: 3k keys in 2^18 bits, k=5 → theoretical FP ~ 2e-6;
    // assert a lenient 1% over 100k known non-members
    val fps = (0L until 100000L).map(_ * 7L + 3L).toDF("k")
      .filter(might_contain(lit(bf), $"k")).count()
    assert(fps < 1000L, s"false-positive rate too high: $fps / 100000")
    // end-to-end: the prefiltered semi join returns exactly the plain
    // semi join's rows (the bloom only prunes, never drops matches)
    val viaBloom = Relational.q67BloomSemi(spark, sfDir)
    val keys2 = graft.core.Tables.customer(spark, sfDir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val o = graft.core.Tables.orders(spark, sfDir)
    val plain = o.join(keys2, o("o_custkey") === keys2("c_custkey"), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
    val a = viaBloom.select("o_orderpriority", "n_orders")
    assert(a.exceptAll(plain).count() == 0 && plain.exceptAll(a).count() == 0)
  }

  test("q78: greedy fold census equals a direct exists-chain recompute") {
    import org.apache.spark.sql.functions.unix_micros
    import org.apache.spark.sql.Row
    val fromQuery = Relational.q78Funnel(spark, sfDir).collect()
      .map(r => r.getAs[Int]("funnel_depth") -> r.getAs[Long]("n_users"))
      .toMap
    // direct recompute: per user, existence of a view→click→purchase
    // chain with 0 < gap <= window, via the O(n²) pair scan the fold
    // is meant to replace
    val W = Relational.FunnelWindowUs
    val evs = graft.core.Tables.events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("event_type")
        .isin("view", "click", "purchase"))
      .select(org.apache.spark.sql.functions.col("user_id"),
        unix_micros(org.apache.spark.sql.functions.col("ts")).as("us"),
        org.apache.spark.sql.functions.col("event_type"))
      .collect()
    val byUser = evs.groupBy(_.getAs[Long]("user_id"))
    val expected = byUser.values.map { rows =>
      def ts(t: String) = rows.filter(_.getAs[String]("event_type") == t)
        .map(_.getAs[Long]("us")).sorted
      val (vs, cs, ps) = (ts("view"), ts("click"), ts("purchase"))
      val qualClicks = cs.filter(c => vs.exists(v => c > v && c - v <= W))
      val d3 = ps.exists(p => qualClicks.exists(c => p > c && p - c <= W))
      if (d3) 3 else if (qualClicks.nonEmpty) 2 else if (vs.nonEmpty) 1 else 0
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(fromQuery == expected,
      s"fold census $fromQuery != direct recompute $expected")
  }

  test("q80: transition matrix rows are distributions; totals conserve") {
    val rows = Relational.q80Transitions(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // per-cur probabilities sum to 1 (within 4dp-rounding slack)
    rows.groupBy(_.getAs[String]("cur")).foreach { case (_, rs) =>
      val psum = rs.map(_.getAs[Double]("p_next")).sum
      assert(math.abs(psum - 1.0) < 1e-3, s"p sums to $psum")
    }
    // every user with n events contributes exactly n-1 transitions
    val ev = graft.core.Tables.events(spark, sfDir)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_trans")).sum == nEvents - nUsers)
  }

  test("q83: RFM segments partition users; median splits are near-even") {
    val rows = Relational.q83RfmSegments(spark, sfDir).collect()
    val ev = graft.core.Tables.events(spark, sfDir)
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers,
      "segments must partition the user base")
    // a strict > split at the interpolated median puts at most half
    // (plus interpolation slack) on the high side of each axis
    for (axis <- Seq("r_high", "f_high", "m_high")) {
      val high = rows.filter(_.getAs[Boolean](axis))
        .map(_.getAs[Long]("n_users")).sum
      assert(high <= nUsers / 2 + 1, s"$axis high=$high of $nUsers")
      assert(high >= nUsers / 4, s"$axis split degenerate: $high")
    }
    // monetary-high segments outspend their low twins
    val byKey = rows.map(r => (r.getAs[Boolean]("r_high"),
      r.getAs[Boolean]("f_high"), r.getAs[Boolean]("m_high")) ->
      r.getAs[Double]("avg_monetary")).toMap
    byKey.keys.filter(_._3).foreach { k =>
      byKey.get((k._1, k._2, false)).foreach { low =>
        assert(byKey(k) > low, s"m_high segment $k must outspend $low")
      }
    }
  }

  test("q84: full outer keeps every day from either side; counts conserve") {
    import org.apache.spark.sql.functions.{col, dayofmonth}
    val rows = Relational.q84Reconcile(spark, sfDir).collect()
    val o = graft.core.Tables.orders(spark, sfDir)
    val e = graft.core.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
    val oDays = o.select(dayofmonth(col("o_orderdate")).cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    val eDays = e.select(dayofmonth(col("ts")).cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("dom")).toSet == (oDays ++ eDays))
    rows.foreach { r =>
      val expected =
        (oDays(r.getAs[Long]("dom")), eDays(r.getAs[Long]("dom"))) match {
          case (true, true) => "both"
          case (true, false) => "orders_only"
          case _ => "events_only"
        }
      assert(r.getAs[String]("status") == expected, r.toString)
    }
    assert(rows.map(_.getAs[Long]("n_orders")).sum == o.count())
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == e.count())
  }

  test("q85: trailing-hour RANGE frame matches a direct scan per key") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val rows = Relational.q85TrailingRange(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // direct recompute: for each event, count events of the same
    // (type, user) with us in [us - 1h, us] — value-based, ties included
    val evs = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("user_id"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("user_id"), r.getAs[Long]("us")))
    val byKey = evs.groupBy(e => (e._2, e._3))
    val want = evs.map { case (id, t, u, us) =>
      id -> byKey((t, u)).count(o => o._4 <= us && o._4 >= us - 3600000000L)
    }.toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_1h") ==
        want(r.getAs[Long]("event_id")).toLong, r.toString)
    }
  }

  test("q86: ACF bounded and equal to a direct Pearson recompute") {
    import org.apache.spark.sql.functions.{col, expr, round, sum}
    val rows = graft.operators.Anomaly.q86Acf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("acf")) <= 1.0))
    // direct recompute for every (type, lag) from the hourly series
    val series = graft.core.Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
          .as("hi"))
      .agg(sum(round(col("value") * 10000).cast("long")).as("x"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(r =>
        r.getAs[Long]("hi") -> r.getAs[Long]("x")).toMap).toMap
    rows.foreach { r =>
      val m = series(r.getAs[String]("event_type"))
      val lag = r.getAs[Int]("lag")
      val pairs = m.toSeq.flatMap { case (hi, x) =>
        m.get(hi - lag).map(y => (x.toDouble, y.toDouble))
      }
      val n = pairs.size.toDouble
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val want = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(r.getAs[Long]("n") == pairs.size.toLong)
      assert(math.abs(r.getAs[Double]("acf") - want) < 1e-3,
        s"${r.getAs[String]("event_type")} lag $lag: " +
          s"${r.getAs[Double]("acf")} vs $want")
    }
  }

  test("q88: CCF bounded, covers all lags, lag 0 equals direct Pearson") {
    import org.apache.spark.sql.functions.{col, expr, round, sum}
    val rows = graft.operators.Anomaly.q88CrossCorr(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("lag")).toSet ==
      graft.operators.Anomaly.CcfLags.toSet)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("ccf")) <= 1.0))
    // lag-0 recompute from the two hourly series
    def hourly(t: String) = graft.core.Tables.events(spark, sfDir)
      .filter(col("event_type") === t)
      .groupBy(expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
        .as("hi"))
      .agg(sum(round(col("value") * 10000).cast("long")).as("x"))
      .collect().map(r => r.getAs[Long]("hi") -> r.getAs[Long]("x")).toMap
    val (ea, pb) = (hourly("error"), hourly("purchase"))
    val pairs = ea.toSeq.flatMap { case (hi, x) =>
      pb.get(hi).map(y => (x.toDouble, y.toDouble))
    }
    val n = pairs.size.toDouble
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val want = (n * pairs.map(p => p._1 * p._2).sum - sx * sy) /
      math.sqrt((n * pairs.map(p => p._1 * p._1).sum - sx * sx) *
        (n * pairs.map(p => p._2 * p._2).sum - sy * sy))
    val got = rows.find(_.getAs[Int]("lag") == 0).get.getAs[Double]("ccf")
    assert(math.abs(got - want) < 1e-3, s"lag 0: $got vs $want")
  }

  test("q87: decomposition is additive and covers the dense spine") {
    val rows = graft.operators.Anomaly.q87Decompose(spark, sfDir).collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct.length
    val his = rows.map(_.getAs[Long]("hi"))
    // dense spine: every type covers every hour in [min, max]
    assert(rows.length == types * (his.max - his.min + 1))
    rows.foreach { r =>
      val add = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")
      assert(math.abs(r.getAs[Double]("value_total") - add) < 5e-4,
        s"not additive at $r")
    }
    // seasonal is constant per (type, hour-of-day)
    rows.groupBy(r => (r.getAs[String]("event_type"),
      r.getAs[Long]("hi") % 24)).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Double]("seasonal")).distinct.length == 1)
    }
  }

  test("q79: cohort triangle invariants (offset-0 totals, no negatives)") {
    val rows = Relational.q79Retention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("week_offset") >= 0L)
      assert(r.getAs[Long]("n_users") > 0L)
      // weeks truncate to Monday
      assert(r.getAs[java.sql.Date]("cohort_week").toLocalDate
        .getDayOfWeek == java.time.DayOfWeek.MONDAY)
    }
    // every cohort has its own offset-0 row, and offset-0 user counts
    // sum to the distinct-user total (each user in exactly one cohort)
    val cohorts = rows.map(_.getAs[java.sql.Date]("cohort_week")).distinct
    val zeroRows = rows.filter(_.getAs[Long]("week_offset") == 0L)
    assert(zeroRows.map(_.getAs[java.sql.Date]("cohort_week")).distinct
      .length == cohorts.length)
    val users = graft.core.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(zeroRows.map(_.getAs[Long]("n_users")).sum == users)
    // retention never exceeds its cohort's size
    val size = zeroRows.map(r =>
      r.getAs[java.sql.Date]("cohort_week") -> r.getAs[Long]("n_users")).toMap
    rows.foreach(r => assert(
      r.getAs[Long]("n_users") <= size(r.getAs[java.sql.Date]("cohort_week"))))
  }

  test("q127/saltedJoin: result identical to the plain join, and the hot " +
    "key's rows spread over multiple shuffle partitions (the plain plan " +
    "pins them on one)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // synthetic skew: one bot key owns 20k of 21k probe rows
    val probe = spark.range(21000)
      .select(when($"id" < 20000, lit(1L)).otherwise($"id").as("k"),
        $"id".as("payload"))
    val dim = Seq((1L, "hot"), (20500L, "cold")).toDF("dk", "attr")
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    // force a shuffle join and keep partition ids stable (AQE would
    // coalesce the tiny test shuffle into one partition and hide the
    // very spread this test measures)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val salted = graft.operators.SkewJoin
        .saltedJoin(probe, dim, "k", "dk", nSalts = 8)
        .select($"k", $"payload", $"attr")
      val plain = probe.join(dim, probe("k") === dim("dk"))
        .select($"k", $"payload", $"attr")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      assert(rows(salted) == rows(plain))
      def hotSpread(df: org.apache.spark.sql.DataFrame) = df
        .filter($"k" === 1L).select(spark_partition_id().as("p"))
        .distinct().count()
      // no single task owns the hot key under salting; the plain
      // spelling provably concentrates it on one
      assert(hotSpread(plain) == 1L)
      assert(hotSpread(salted) >= 2L,
        "salting failed to spread the hot key across shuffle partitions")
      // the partial (census-fed) variant: same result, same spread for
      // the flagged hot key, and the build replicates ONLY hot rows
      val hotSalted = graft.operators.SkewJoin
        .saltedJoinHot(probe, dim, "k", "dk", hotKeys = Seq(1L), nSalts = 8)
        .select($"k", $"payload", $"attr")
      assert(rows(hotSalted) == rows(plain))
      assert(hotSpread(hotSalted) >= 2L,
        "hot-key salting failed to spread the flagged key")
      // the census feed (round 11, what q127 now runs): flags exactly
      // the bot key — its 20k rows vs mean ~21 dwarf any ratio — and
      // nothing else on this corpus
      val hot = graft.operators.SkewJoin.hotKeys(probe, "k", ratio = 4.0,
        cap = 64)
      assert(hot == Seq(1L), s"census flagged $hot")
      // empty census ⇒ saltedJoinHot degrades to the PLAIN join: same
      // rows, and no salt machinery in the plan
      val none = graft.operators.SkewJoin
        .saltedJoinHot(probe, dim, "k", "dk", hotKeys = Nil, nSalts = 8)
        .select($"k", $"payload", $"attr")
      assert(rows(none) == rows(plain))
      assert(!none.queryExecution.executedPlan.toString.contains("__salt"))
      // a uniform corpus yields an empty census (nothing exceeds 4x
      // the mean when every key has exactly one row)
      val uniform = spark.range(1000).select($"id".as("k"))
      assert(graft.operators.SkewJoin.hotKeys(uniform, "k").isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("q129: capped path mining equals q124 exactly once cap covers " +
    "every user; a 1M-event bot user stays bounded and yields the " +
    "predicted recent-window census") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = graft.core.Tables.events(spark, sfDir)
    val maxPerUser = events.groupBy($"user_id")
      .agg(count(lit(1)).as("n")).agg(max($"n")).head().getLong(0).toInt
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(canon(Relational.pathMiningCapped(events, maxPerUser)) ==
      canon(Relational.q124PathMining(spark, sfDir)),
      "cap >= max per-user activity must reproduce q124 exactly")
    // bot user: 1M events, one user — the case that pins a task in the
    // collect_list spelling; the bounded heap keeps 64 entries per key
    val bot = spark.range(1000000).select(
      lit(7L).as("user_id"),
      timestamp_micros(lit(1700000000000000L) + $"id" * 1000000L).as("ts"),
      $"id".as("event_id"),
      element_at(array(lit("view"), lit("click"), lit("purchase")),
        ($"id" % 3 + 1).cast("int")).as("event_type"))
    val got = Relational.pathMiningCapped(bot, Relational.PathCap)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // driver-side expectation over the last PathCap events (ids
    // 999_936..999_999, types cycling id % 3)
    val types = Array("view", "click", "purchase")
    val tail = (1000000 - Relational.PathCap) until 1000000
    val want = tail.map(i => types(i % 3)).sliding(3)
      .map(_.mkString(">")).toSeq.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    assert(got == want, s"got $got want $want")
  }
  test("q174 k-anonymity census: hand-computed groups — rows at risk, " +
    "small-group count, l_min from the least-diverse group; a fully " +
    "anonymous frame votes anonymous") {
    import spark.implicits._
    // QI = (a, b); sensitive = u. Groups: (x,1): 5 rows 2 users;
    // (x,2): 2 rows 2 users (below k=5, at risk); (y,1): 6 rows 1 user
    // (size fine, l=1 — the l-diversity leak k-anonymity misses)
    val df = (
      Seq.fill(3)(("x", 1L, 10L)) ++ Seq.fill(2)(("x", 1L, 11L)) ++
      Seq(("x", 2L, 20L), ("x", 2L, 21L)) ++
      Seq.fill(6)(("y", 1L, 30L))
    ).toDF("a", "b", "u")
    val r = graft.operators.Relational
      .kAnonymityCensus(df, Seq("a", "b"), "u", k = 5).head()
    assert(r.getAs[Long]("n_rows") == 13L)
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("min_group") == 2L)
    assert(r.getAs[Long]("max_group") == 6L)
    assert(r.getAs[Long]("n_small_groups") == 1L)
    assert(r.getAs[Long]("rows_at_risk") == 2L)
    assert(r.getAs[Long]("l_min") == 1L)
    assert(r.getAs[Long]("anonymous") == 0L)
    // drop the risky group -> anonymous=1, but l_min still exposes the
    // single-user group (the two audits are independent by design)
    val r2 = graft.operators.Relational.kAnonymityCensus(
      df.filter($"b" =!= 2L), Seq("a", "b"), "u", k = 5).head()
    assert(r2.getAs[Long]("anonymous") == 1L)
    assert(r2.getAs[Long]("l_min") == 1L)
  }
}