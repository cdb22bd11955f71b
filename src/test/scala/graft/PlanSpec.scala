package graft

import graft.operators.{Alignment, Anomaly, Relational, Similarity, TextAnalysis}

/** Physical-plan audits: the 100 TB design properties the queries rely
  * on must be visible in the executed plan, not assumed — filter
  * pushdown to parquet, column pruning, broadcast joins for small
  * sides, and top-k without a global sort.
  */
class PlanSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Number of parquet scan OPERATORS in the plan tree. String-counting
    * "Scan parquet" lines overcounts: every InMemoryTableScan prints
    * its cached plan's lineage (including the original FileScan) even
    * though execution reads the cache. Tree collect does not descend
    * into cached relations.
    */
  private def fileScans(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    root.collect { case f: FileSourceScanExec => f }.size
  }

  test("scan-count gate: no query plans more than 2 scans of any one " +
    "table, except the named synthetic-construction exceptions — the " +
    "r12 ScanAudit cleanup, locked in") {
    // 2 is the documented two-pass class (stats pass + scoring pass
    // with a broadcast join back, or sketch census + exact twin). The
    // exceptions build their OWN comparison data from the corpus
    // (snapshot-B families, delta feeds, recipe compositions) — the
    // operator under test is single-scan per side; the extra scans are
    // the synthetic second side a real deployment reads from its own
    // storage. Anything above its bound here is a regression of the
    // kind this round removed (q143 read the corpus 34x, q147 14x).
    val exceptions = Map(
      "q55_contamination" -> 3, // corpus + synthetic benchmark suite
      "q57_corpus_recipe" -> 3, // multi-op recipe (r11 audit)
      "q111_snapshot_diff" -> 3, // snapshot B derived from A
      "q125_merge_apply" -> 4, // 3-branch synthetic delta feed + snap
      // THREE independent stored layouts (full/SQ8/PQ), each scanned
      // ONCE per sweep — their roots' subdirs share basenames
      // (index/_cents/_query), so the name-keyed census reads 3
      // distinct tables as 3 scans of one
      "q204_stored_recall" -> 3)
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val root = fn(spark, sfDir).queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.initialPlan
          case p => p
        }
        val byTable = root.collect { case f: FileSourceScanExec =>
          f.relation.location.rootPaths.headOption
            .map(_.getName).getOrElse("?") }
          .groupBy(identity).map { case (t, fs) => (t, fs.size) }
        val cap = exceptions.getOrElse(name, 2)
        byTable.collect { case (t, n) if n > cap => s"$name: $t x$n (cap $cap)" }
    }
    spark.catalog.clearCache()
    assert(bad.isEmpty, "queries over their scan cap:\n" + bad.mkString("\n"))
  }

  test("q2: predicate pushes down to the parquet scan") {
    val p = plan(Relational.q2FilterProject(spark, sfDir))
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThanOrEqual(p_size,10)"), p.take(2000))
  }

  test("q1: column pruning — scan reads only referenced lineitem columns") {
    val p = plan(Relational.q1Agg(spark, sfDir))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey") &&
      !readSchema.contains("l_partkey"), readSchema)
    assert(readSchema.contains("l_returnflag"), readSchema)
  }

  test("q3: dimension joins broadcast (no shuffle of the fact side)") {
    val p = plan(Relational.q3Join(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q6: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(Relational.q6TopK(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q29: query vector is broadcast against the embedding scan") {
    val p = plan(Similarity.q29BruteTopK(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(2000))
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      graft.core.Tables.orders(spark, sfDir)
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_b")
      graft.core.Tables.customer(spark, sfDir)
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), $"o_custkey" === $"c_custkey")
      val p = plan(joined)
      // co-located bucketed join: sort-merge with NO shuffle exchange
      assert(p.contains("SortMergeJoin"), p.take(1500))
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${p.take(2000)}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("q38: media metadata stays in codegen — no object deserialization") {
    val p = plan(Alignment.q38MediaMeta(spark, sfDir))
    assert(!p.contains("DeserializeToObject") && !p.contains("MapPartitions"),
      p.take(2000))
    assert(p.contains("*(1)"), p.take(1500))
  }

  test("q35: no unframed window over event_type — medians broadcast back") {
    val p = plan(Anomaly.q35RobustStats(spark, sfDir))
    assert(!p.contains("Window"),
      s"q35 must not window-partition whole event types:\n${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q46: Zipf head broadcasts, unbounded tail vocab shuffles, no driver total") {
    val qe = TextAnalysis.q46Surprisal(spark, sfDir).queryExecution
    val opt = qe.optimizedPlan.toString
    // exactly the two BOUNDED head joins (inner hit + anti route) carry
    // broadcast hints; the tail's tf join must NOT be hinted — the full
    // unigram table grows with the corpus and a hint on it OOMs at
    // 100 TB (the planner may still pick broadcast at toy SFs from size
    // estimates; that adapts with scale, a hint does not)
    val hinted = "strategy=broadcast".r.findAllIn(opt).length
    assert(hinted == 2, s"expected 2 head broadcast hints, got $hinted:\n${opt.take(2500)}")
    // head membership is top-k by df: a bounded TakeOrdered, never a
    // global sort of the vocabulary
    val phys = plan(TextAnalysis.q46Surprisal(spark, sfDir))
    assert(phys.contains("TakeOrderedAndProject"), phys.take(2000))
    // corpus total must be a 1-row aggregate cross-joined in, not a
    // collected literal (which would mean a driver action mid-query)
    assert(opt.contains("Join Cross"), opt.take(2000))
  }

  test("q42: winnowing is one narrow map stage — no exchange anywhere") {
    // the window minima are computed inside each row (higher-order
    // array functions), so the whole fingerprint pass must plan with
    // zero shuffles: at 100 TB the alternative (posexplode + per-doc
    // Window) shuffles ~n_chars rows per document just to sort them
    // back into the order they started in
    val p = plan(TextAnalysis.q42Winnow(spark, sfDir))
    assert(!p.contains("Exchange"),
      s"q42 must not shuffle:\n${p.take(2000)}")
  }

  test("q53: sessionize runs in ONE user_id exchange — window sort and " +
    "session aggregation share it") {
    // HashPartitioning(user_id) satisfies the (user_id, sid) grouping's
    // clustering requirement, so the session aggregation must NOT add a
    // second shuffle on top of the window's
    val p = plan(Relational.q53Sessionize(spark, sfDir))
    val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n == 1, s"expected one user_id exchange, got $n:\n${p.take(2500)}")
  }

  test("q54: packing runs in ONE shard exchange — running sum and " +
    "sequence aggregation share it") {
    val p = plan(graft.operators.Pipeline.q54Pack(spark, sfDir))
    val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n == 1, s"expected one shard exchange, got $n:\n${p.take(2500)}")
  }

  test("q94: shuffle-shard census runs in ONE shard exchange — rank " +
    "window and census aggregation share it, no global sort") {
    // a global row_number would show as a single-partition Exchange +
    // full Sort; the scale shape is hash(shard) once, reused by both
    val p = plan(graft.operators.Pipeline.q94ShuffleShard(spark, sfDir))
    val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n == 1, s"expected one shard exchange, got $n:\n${p.take(2500)}")
    assert(!p.contains("Exchange SinglePartition"),
      s"global single-partition stage in shuffle-shard plan:\n${p.take(2500)}")
  }

  test("q95: the LM joins bigram instances by BROADCAST — no " +
    "instance-sized shuffle reaches the scoring join") {
    // the (w1, w2) LM table is vocab²-bounded; if it ever arrived via
    // a shuffled hash join the corpus-sized instance frame would
    // repartition on (w1, w2) — Zipf skew on one reducer
    val p = plan(graft.operators.TextAnalysis.q95LmQuality(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      s"instance join must not sort-merge:\n${p.take(2500)}")
    // exactly two corpus scans (LM build + scoring pass): a
    // self-referencing bc.join(bc.groupBy(...)) spelling silently
    // recomputes the whole explode pipeline a third time
    val scans95 = fileScans(graft.operators.TextAnalysis.q95LmQuality(spark, sfDir))
    assert(scans95 == 2, s"expected 2 corpus scans, saw $scans95")
  }

  test("q75: the LM builds in ONE corpus scan — prefix totals come " +
    "from a window over the aggregated frame, not a second pass") {
    val scans = fileScans(TextAnalysis.q75BigramLm(spark, sfDir))
    assert(scans == 1, s"expected 1 corpus scan, saw $scans")
  }

  test("q46: two corpus scans + a cached vocab LUT — head, total, and " +
    "tail all read the cache; nothing re-aggregates the instance stream") {
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val df = TextAnalysis.q46Surprisal(spark, sfDir)
    // the LM build's own scan lives inside the InMemoryRelation, so the
    // consuming tree shows exactly the two routed scoring passes
    // (runtime total: 1 cache build + 2 scoring = 3, down from 6)
    val scans = fileScans(df)
    assert(scans == 2, s"expected 2 corpus scans (the routed scoring " +
      s"passes; LM build hides in the cache), saw $scans")
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val cacheReads = root.collect { case m: InMemoryTableScanExec => m }.size
    assert(cacheReads >= 1,
      s"tf LUT must be served from cache, saw $cacheReads cache scans")
  }

  test("q56: the corpus-side window partitions on (lang, bucket), never " +
    "lang alone, and bucket prefixes broadcast back") {
    // a lang-only window would put the whole corpus on 5 reducers; only
    // the BOUNDED per-bucket aggregate may window by lang alone
    val p = plan(graft.operators.Pipeline.q56Mixture(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    val specs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.exists(s => s.contains("lang") && s.contains("bucket")),
      s"corpus window must partition by (lang, bucket):\n${specs.mkString("\n")}")
  }

  test("q52: repetition metrics are one narrow map stage — no exchange") {
    // top-n-gram counts come from an in-row sort + longest-run
    // aggregate, not explode + groupBy: zero shuffles at any corpus size
    val p = plan(TextAnalysis.q52Repetition(spark, sfDir))
    assert(!p.contains("Exchange"),
      s"q52 must not shuffle:\n${p.take(2000)}")
  }

  test("q33: no broadcast hint on the time-growing window-stats table") {
    // (window × event_type) cardinality grows with the data's time span
    val p = Anomaly.q33WindowStats(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("strategy=broadcast"), p.take(2000))
  }

  test("q14: orders⨝customer happens once — second pass reads the persisted frame") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    // AQE off so the operator tree is walkable (query stages hide
    // children from collect); the property itself is AQE-independent
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Relational.q14HavingJoin(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan
      // every base-table access in the outer plan goes through the
      // persisted frame — no direct re-scan of orders or customer
      assert(plan.collect { case f: FileSourceScanExec => f }.isEmpty,
        s"base tables must be read via the persisted frame:\n${plan.toString.take(2500)}")
      val memScans = plan.collect { case m: InMemoryTableScanExec => m }
      assert(memScans.size == 2, s"expected both passes cached, got ${memScans.size}")
      // ONE shared relation => the join materialized exactly once
      assert(memScans.map(_.relation.cacheBuilder).distinct.size == 1)
    } finally {
      spark.catalog.clearCache()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("q8: set-op classes derive from one aggregation, not three passes") {
    val p = plan(Relational.q8SetOps(spark, sfDir))
    val nAggExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(nAggExchanges <= 1,
      s"expected a single custkey shuffle, got $nAggExchanges:\n${p.take(2500)}")
  }

  test("q63/q66: PII redaction and normalization are narrow map stages " +
    "inside whole-stage codegen — no exchange, no object path") {
    // chained regexps and the NFC expression are per-row: any Exchange
    // or DeserializeToObject here would mean the cleaning stage costs a
    // shuffle of the full corpus at 100 TB
    Seq(TextAnalysis.q63PiiRedact(spark, sfDir),
        TextAnalysis.q66Normalize(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("Exchange"), s"must not shuffle:\n${p.take(2000)}")
      assert(!p.contains("DeserializeToObject") && !p.contains("BatchEvalPython"),
        p.take(2000))
      assert(p.contains("*(1)"), p.take(1500))
    }
  }

  test("q64: weighted sketch rides the two-phase aggregate — partial " +
    "(map-side) before the single final exchange") {
    val p = plan(TextAnalysis.q64HeavyWeighted(spark, sfDir))
    val n = p.linesIterator.count(_.contains("Exchange"))
    // global aggregate: one SinglePartition exchange, nothing else
    assert(n == 1, s"expected one exchange, got $n:\n${p.take(2500)}")
    assert(p.contains("partial_freq_items") || p.contains("ObjectHashAggregate"),
      s"sketch must aggregate partially map-side:\n${p.take(2500)}")
  }

  test("q68: domain cap is a bounded-heap aggregate — no sort, no window, " +
    "one exchange") {
    // the naive row_number() spelling sorts every source's full
    // partition to keep 15 rows; the heap aggregate must plan with
    // exactly the one source exchange and zero Sort/Window operators
    val p = plan(TextAnalysis.q68DomainCap(spark, sfDir))
    assert(!p.contains("Window") && !p.contains("Sort "),
      s"q68 must not sort whole domains:\n${p.take(2500)}")
    val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n == 1, s"expected one source exchange, got $n:\n${p.take(2500)}")
    assert(p.contains("partial_top_k_by") || p.contains("ObjectHashAggregate"),
      s"heap must aggregate partially map-side:\n${p.take(2500)}")
  }

  test("q97: SemDeDup joins broadcast — one aggregation exchange, " +
    "no all-pairs join") {
    // the rep table (≤ 2^8 rows) must broadcast to both its consumers;
    // the only shuffle is the cell aggregation that builds it. A
    // SortMergeJoin or cartesian here would mean the star comparison
    // degenerated into a data-sized shuffle.
    val p = plan(Similarity.q97SemDedup(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"rep joins must broadcast:\n${p.take(2500)}")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"q97 must not plan an all-pairs or shuffled join:\n${p.take(2500)}")
    val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n <= 1, s"expected only the rep aggregation exchange, got $n:\n" +
      p.take(2500))
  }

  test("q67: bloom prefilter sits below the semi-join exchange") {
    // with broadcast off (the regime the operator exists for), the
    // orders side must be filtered by might_contain BEFORE its shuffle:
    // that is the whole point — the exchange carries only the
    // bloom-surviving rows
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(Relational.q67BloomSemi(spark, sfDir))
      val lines = p.linesIterator.toSeq
      val probe = lines.indexWhere(_.contains("might_contain"))
      val exch = lines.indexWhere(_.contains("Exchange hashpartitioning"))
      assert(probe >= 0, s"no bloom probe in plan:\n${p.take(2000)}")
      assert(exch >= 0 && probe > exch,
        s"bloom probe must be below (after) the exchange in tree order, " +
          s"i.e. evaluated before the shuffle: probe@$probe exch@$exch\n${p.take(2500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("whole-stage codegen covers the scan->filter->project spine (q2)") {
    // formatted plans mark codegen stages with *(n)
    val p = plan(Relational.q2FilterProject(spark, sfDir))
    assert(p.contains("*(1)"), p.take(1500))
  }

  test("q75: prefix denominators from a vocab²-bounded window; " +
    "top-25 is a bounded heap") {
    val p = plan(TextAnalysis.q75BigramLm(spark, sfDir))
    // the window runs over the aggregated (w1, w2) frame, never the
    // bigram instance stream — instances must partial-aggregate first
    assert(p.contains("Window"), p.take(2000))
    assert(p.contains("partial_count"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q76 default (join spelling): no Window, per-doc top-3 rides the " +
    "bounded-heap aggregate") {
    val p = plan(TextAnalysis.q76TfIdfTerms(spark, sfDir))
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("top_k_by"), p.take(2000))
  }

  test("q72: split census plans as one partial+final aggregate pair") {
    val p = plan(TextAnalysis.q72SplitAssign(spark, sfDir))
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      p.take(2000))
  }

  test("q78: funnel streams per-partition — no Window, no self-joins, " +
    "no per-user array buffering") {
    val p = plan(Relational.q78Funnel(spark, sfDir))
    assert(!p.contains("Window"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      p.take(2000))
    // the skew-safe shape: NO collect_list aggregation buffer; the
    // per-user fold rides a spillable in-partition sort + MapPartitions
    assert(!p.contains("collect_list"), p.take(2000))
    assert(p.contains("MapPartitions"), p.take(2000))
    // at most two exchanges: events → user_id, depths → funnel_depth.
    // Upper bound, not equality: AQE re-planning or plan-string
    // rendering changes across Spark versions can merge/reword a line
    // without any semantic regression — what this guards is a THIRD
    // shuffle sneaking onto the event relation.
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2,
      p.take(2000))
  }

  test("q77: centroid table broadcasts against the embedding scan") {
    val p = plan(Similarity.q77EmbeddingOutliers(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q89-q93 media decode is a narrow mapPartitions pass — " +
    "zero exchanges, doc_id-only scan") {
    Seq(Alignment.q89PngDecode(spark, sfDir),
      Alignment.q90WavDecode(spark, sfDir),
      Alignment.q91BmpDecode(spark, sfDir),
      Alignment.q92JpegDecode(spark, sfDir),
      Alignment.q93GifDecode(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("Exchange"), p.take(2000))
      assert(p.contains("MapPartitions"), p.take(2000))
      val readSchema = p.linesIterator.find(_.contains("ReadSchema"))
      assert(readSchema.exists(l =>
        l.contains("doc_id") && !l.contains("text")), readSchema.toString)
    }
  }

  test("tf-idf in-row fast path: ranking is in-row — no Window, no " +
    "per-doc sort, no token-instance shuffle join") {
    val p = plan(TextAnalysis.tfIdfTermsInRow(spark, sfDir))
    assert(!p.contains("Window"), p.take(2000))
    assert(!p.contains("SortExec"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q110: count tables broadcast to the position stream — no " +
    "shuffle join touches the eval positions") {
    val p = plan(TextAnalysis.q110StupidBackoff(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q102: k-means assignment is a broadcast projection — full-data " +
    "exchanges only for the k-row update and the census, no Window") {
    val p = plan(Similarity.q102KmeansClusters(spark, sfDir))
    // an N×k row_number spelling would add a Window + a vec_id
    // exchange per round; the packed-broadcast argmin adds none
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("BroadcastExchange"), p.take(2000))
    // hash exchanges: centroid update groupBy(cl) + census groupBy(cl)
    // — the embedding column itself never hash-shuffles
    val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n <= 2, s"expected <=2 hash exchanges, got $n\n${p.take(3000)}")
  }

  test("q103: the KMV sketch rides ObjectHashAggregate — no Window, " +
    "no per-group sort") {
    val p = plan(Relational.q103KmvDistinct(spark, sfDir))
    // the rank-window oracle spelling is for DuckDB only; the engine
    // path must be sketch-in-aggregate
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("q104: canonicalization is in-row — one doc_id-only scan, no " +
    "exchange before the census aggregation, no UDF") {
    import graft.operators.Pipeline
    val df = Pipeline.q104UrlCanonical(spark, sfDir)
    val p = plan(df)
    assert(fileScans(df) == 1, p.take(2000))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema"))
    assert(readSchema.exists(l => l.contains("doc_id") && !l.contains("text")),
      readSchema.toString)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      p.take(2000))
    // census = two countDistincts -> Expand + the usual two-phase
    // aggregation; nothing else may shuffle
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q112: one corpus scan feeds the cached vocab frame; the cell " +
    "matrix joins by broadcast, top-10 is TakeOrdered") {
    val df = TextAnalysis.q112CountMin(spark, sfDir)
    val p = plan(df)
    // cells derive from the cached count frame, not a second explode
    assert(fileScans(df) <= 1, p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    df.sparkSession.catalog.clearCache()
  }

  test("q114: the 256-bucket ratio table broadcasts to the scoring " +
    "pass — no shuffle join touches the token stream") {
    val df = TextAnalysis.q114DsirWeights(spark, sfDir)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      p.take(2000))
    df.sparkSession.catalog.clearCache()
  }

  test("q115: merge rules collapse to one broadcast row; application " +
    "is projection-only — no Window, no shuffle join on the word stream") {
    val df = TextAnalysis.q115BpeApply(spark, sfDir)
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      p.take(2000))
    df.sparkSession.catalog.clearCache()
  }

  test("q138: the six-table join broadcasts every dim — the fact side " +
    "shuffles only for the final rollup, and both filters push to scans") {
    val df = Relational.q138LocalRevenue(spark, sfDir)
    val p = plan(df)
    // all joins against lineitem are broadcast (no SortMergeJoin /
    // ShuffledHashJoin anywhere: dims are region-pruned and tiny)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // the date range reaches the orders parquet scan as pushed filters
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(o_orderdate") &&
      p.contains("IsNotNull(r_name)"), p.take(3000))
    // exactly one exchange: the 25-row rollup's (AQE may label it; the
    // fact scan itself must not pre-shuffle)
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange") &&
        !l.contains("reuse"))
    assert(exchanges == 1, s"expected one shuffle exchange, got $exchanges:\n" +
      p.take(2000))
  }

  test("q130/q131/q132/q133: round-10 additions keep their scale shapes " +
    "— broadcast stats joins, TakeOrdered not global Sort, no Window, " +
    "no nested-loop blowup") {
    import graft.operators.{Dedup, Pipeline}
    // q130: the corpus-stats and idf frames broadcast; no Window; the
    // top-10 is TakeOrdered
    val p130 = plan(TextAnalysis.q130Bm25(spark, sfDir))
    assert(p130.contains("BroadcastExchange"), p130.take(2000))
    assert(!p130.contains("Window"), p130.take(2000))
    assert(p130.contains("TakeOrderedAndProject"), p130.take(2000))
    // q131: two hash aggregations, never a window over the key stream
    val p131 = plan(Relational.q131HllDistinct(spark, sfDir))
    assert(!p131.contains("Window") &&
      !p131.contains("CartesianProduct"), p131.take(2000))
    // q132: exact-size top-k rides TakeOrdered — a global Sort here
    // would be the one-reducer anti-pattern the operator exists to avoid
    val p132 = plan(Pipeline.q132WeightedSample(spark, sfDir))
    assert(p132.contains("TakeOrderedAndProject"), p132.take(2000))
    assert(!p132.contains("Exchange"), p132.take(2000))
    // q133: chunking is in-row — no Window, no per-position explode
    // before the chunk aggregation; round-11 contract: the chunk
    // stream shuffles ONCE and is never join material — the executed
    // plan contains NO join of any kind (the round-10 spelling joined
    // occurrence counts back onto the instance stream; that data-sized
    // second shuffle is what the rewrite deleted)
    val p133 = plan(Dedup.q133CdcChunking(spark, sfDir))
    assert(!p133.contains("Window") &&
      !p133.contains("CartesianProduct") &&
      !p133.contains("BroadcastNestedLoopJoin"), p133.take(2000))
    assert(!p133.linesIterator.exists(_.contains("Join")),
      "q133 must not join at all after the round-11 rewrite:\n" +
        p133.take(2000))
    // q140/q141 (round 11): series work happens on the exploded
    // TIME-SPAN-bounded frame; every window is PARTITIONED by the
    // series key (never an unkeyed window, never over the event
    // stream), no cartesian blowup, and the top-5 rides TakeOrdered
    // not a global Sort
    for (q <- Seq(graft.operators.Anomaly.q140Cusum _,
        graft.operators.Anomaly.q141Episodes _)) {
      val pq = plan(q(spark, sfDir))
      assert(!pq.contains("CartesianProduct"), pq.take(2000))
      assert(pq.contains("TakeOrderedAndProject"), pq.take(2000))
      val specs = pq.linesIterator
        .filter(_.contains("windowspecdefinition")).toSeq
      assert(specs.nonEmpty &&
        specs.forall(_.contains("windowspecdefinition(mn")),
        "every window must be partitioned by the series key:\n" +
          specs.mkString("\n"))
    }
    // q142 (round 11): the sequential recurrence is ONE in-row fold
    // over the packed bounded series — no Window at all (the join in
    // the plan is the bounded dense-spine fill), and top-5 rides
    // TakeOrdered
    val p142 = plan(graft.operators.Anomaly.q142HoltWinters(spark, sfDir))
    assert(!p142.contains("CartesianProduct"), p142.take(2000))
    assert(!p142.contains("Window"),
      "q142's recurrence must be the in-row fold, not a window:\n" +
        p142.take(2000))
    assert(p142.contains("TakeOrderedAndProject"), p142.take(2000))
    // q148 (round 11): the sharded form — the fold stays in-row per
    // key row; the only window is the per-key top-1, PARTITIONED BY
    // the series key
    val p148 = plan(graft.operators.Anomaly.q148HoltByType(spark, sfDir))
    assert(!p148.contains("CartesianProduct"), p148.take(2000))
    val w148 = p148.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(w148.nonEmpty &&
      w148.forall(_.contains("windowspecdefinition(event_type")),
      "q148's only window must partition by the series key:\n" +
        w148.mkString("\n"))
    spark.catalog.clearCache()
  }

  test("q144: decorrelated Q17 — the fact side never shuffles: brand " +
    "filter pushed to the part scan, both join sides broadcast, the " +
    "per-part aggregate's map-combined exchange is the plan's only one") {
    val p = plan(graft.operators.Relational.q144SmallQtyRevenue(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("EqualTo(p_brand"),
      "brand filter must push to the part parquet scan:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "both q144 joins must broadcast at test scale:\n" + p.take(2000))
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size == 1 && hashEx.head.contains("l_partkey"),
      "the per-part aggregate's exchange must be the only hash " +
        s"exchange:\n${hashEx.mkString("\n")}")
    spark.catalog.clearCache()
  }

  test("q150: decorrelated Q21 — no correlated re-scan: the existentials " +
    "are aggregate predicates, the supplier dim broadcasts, top-10 " +
    "rides TakeOrdered") {
    val p = plan(graft.operators.Relational.q150WaitingSuppliers(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // the decorrelation contract: no existential-subquery artifacts
    // (a correlated spelling leaves anti/semi joins in the plan)
    assert(!p.contains("LeftAnti") && !p.contains("LeftSemi"),
      "the existentials must be aggregate predicates, not joins:\n" +
        p.take(2000))
    spark.catalog.clearCache()
  }

  test("q154: the detector ensemble shares ONE materialized spine — " +
    "zero direct events scans in the executed plan (all four branches " +
    "read the checkpointed packed series / fold), and the spine itself " +
    "is exactly one events scan") {
    // the round-11 spelling rebuilt packedHourlySeries independently in
    // all four branches (4 scans of raw events) and ran the Holt fold
    // twice; the round-12 contract is: raw events are scanned once to
    // build the spine, everything downstream is bounded in-row/window
    // work off the two checkpointed frames
    val df = Anomaly.q154DetectorEnsemble(spark, sfDir)
    assert(fileScans(df) == 0,
      "every ensemble branch must read the checkpointed spine, not " +
        s"re-scan events — saw ${fileScans(df)} direct file scans")
    assert(!plan(df).contains("CartesianProduct"), plan(df).take(2000))
    // the one-scan proof decomposes: the hourly rollup (the only
    // file-reading subtree in the whole family) plans exactly ONE
    // events scan, and the packed spine built over its checkpoint
    // plans NONE — so any spine consumer reads events exactly once
    val roll = Anomaly.hourlyRollup(graft.core.Tables.events(spark, sfDir))
    assert(fileScans(roll) == 1,
      s"hourly rollup must scan events exactly once, saw ${fileScans(roll)}")
    val spine = Anomaly.packedHourlySeries(
      graft.core.Tables.events(spark, sfDir))
    assert(fileScans(spine) == 0,
      "the spine's bounds/dense-join must read the checkpointed " +
        s"rollup, not re-scan events — saw ${fileScans(spine)} scans")
    // and the result is still the four censuses' union (19-20 rows of
    // corroborated hours at this SF, never empty)
    assert(df.count() > 0)
    spark.catalog.clearCache()
  }

  test("q155/q156/q157/q159: keyed detectors — every window partitions " +
    "by the series key; no CartesianProduct; the fold stays in-row " +
    "(q157 plans no Window over the recurrence itself)") {
    for (df <- Seq(Anomaly.q155CusumByType(spark, sfDir),
        Anomaly.q156EpisodesByType(spark, sfDir),
        Anomaly.q157ResidualCusumByType(spark, sfDir),
        Anomaly.q159DiscordByType(spark, sfDir))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), p.take(2000))
      val specs = p.linesIterator
        .filter(_.contains("windowspecdefinition")).toSeq
      assert(specs.nonEmpty &&
        specs.forall(_.contains("windowspecdefinition(event_type")),
        "every keyed-detector window must partition by event_type:\n" +
          specs.mkString("\n"))
    }
    spark.catalog.clearCache()
  }

  test("q161: the keyed ensemble shares ONE keyed spine — zero direct " +
    "events scans in the plan (all four keyed branches read the " +
    "checkpointed packed series / keyed fold), and the spine's keyed " +
    "rollup is exactly one events scan") {
    // the q154 contract applied to the keyed family: raw events are
    // scanned once to build the (key, hour) rollup; the packed spine
    // and the keyed Holt fold are checkpointed and shared, so the
    // whole four-detector corroboration census costs one events scan
    val df = Anomaly.q161KeyedEnsemble(spark, sfDir)
    assert(fileScans(df) == 0,
      "every keyed-ensemble branch must read the checkpointed spine, " +
        s"not re-scan events — saw ${fileScans(df)} direct file scans")
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the spine itself: one events scan inside the keyed rollup, none
    // in the dense-join over its checkpoint
    val spine = Anomaly.packedHourlySeriesBy(
      graft.core.Tables.events(spark, sfDir), "event_type")
    assert(fileScans(spine) == 0,
      "the keyed spine's bounds/dense-join must read the checkpointed " +
        s"rollup, not re-scan events — saw ${fileScans(spine)} scans")
    // census shape: one row per (type, flagged hour); every type
    // appears (each contributes at least its cusum+episode top-1s)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).distinct.length >= 2)
    spark.catalog.clearCache()
  }

  test("q164/q165/q166: batch probes — per-query windows partition by " +
    "query_id, the fan-out joins broadcast, no CartesianProduct") {
    // the batch-serving contract: N queries must not multiply the
    // data-sized work — query/term tables ride broadcasts, ranking is
    // per-query windows over bounded scored frames
    for (df <- Seq(
        TextAnalysis.q164Bm25BatchProbe(spark, sfDir),
        graft.operators.Similarity.q165AnnBatchProbe(spark, sfDir),
        graft.operators.Similarity.q166RrfBatchFusion(spark, sfDir))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), p.take(2000))
      assert(!p.contains("SortMergeJoin"),
        "batch fan-out joins must broadcast:\n" + p.take(2000))
      val specs = p.linesIterator
        .filter(_.contains("windowspecdefinition")).toSeq
      assert(specs.nonEmpty &&
        specs.forall(_.contains("windowspecdefinition(query_id")),
        "every batch-probe window must partition by query_id:\n" +
          specs.mkString("\n"))
    }
    spark.catalog.clearCache()
  }

  test("q171: the packed quantile plan has NO windows at all — the " +
    "point of the state-shape spelling vs q152's two cumsum window " +
    "passes; one events scan; rank selection is in-row") {
    val df = Anomaly.q171QuantilesPacked(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("windowspecdefinition"),
      "the packed plan must not plan a Window:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"))
    assert(fileScans(df) == 1,
      s"one data-sized rollup scan expected, saw ${fileScans(df)}")
    // the window-based q152 it replaces DOES plan windows — the
    // contrast the pin exists to keep honest
    assert(plan(Anomaly.q152ExactQuantiles(spark, sfDir))
      .contains("windowspecdefinition"))
    spark.catalog.clearCache()
  }

  test("q172/q173: compaction census joins broadcast the tombstone " +
    "sets (no sort-merge join reaches a layout scan); the q173 probes " +
    "carry partition filters on the term buckets") {
    import graft.operators.TextAnalysis
    // census over freshly built+mutated layouts (the q172 body without
    // the oracle wrapper): every join must be broadcast — tombstones
    // are bounded by deletes-since-compaction BY CONTRACT
    val censusPlan = plan(TextAnalysis.q172CompactionCensus(spark, sfDir))
    assert(!censusPlan.contains("SortMergeJoin"),
      "census tombstone joins must broadcast:\n" + censusPlan.take(2000))
    assert(!censusPlan.contains("CartesianProduct"))
    // bm25 probes crossJoin the broadcast 1-row stats frame — planned
    // as BroadcastNestedLoopJoin, never a CartesianProduct
    val swapPlan = plan(TextAnalysis.q173CompactSwap(spark, sfDir))
    assert(!swapPlan.contains("CartesianProduct"), swapPlan.take(2000))
    // the probe's pruned scan hides behind its localCheckpoint in the
    // probe's own plan (the ServingBench lesson) — pin the pruning on
    // the pre-checkpoint live-postings frame over the compacted
    // generation the q173 call just built and swapped to
    val gen1 = TextAnalysis.bm25TempIndexPath(sfDir) + "_swap/gen1"
    val livePlan = plan(TextAnalysis.bm25LivePostings(
      spark, gen1, TextAnalysis.Bm25Query))
    val scanLines = livePlan.linesIterator
      .filter(l => l.contains("PartitionFilters: [") && l.contains("tb#"))
      .toSeq
    assert(scanLines.nonEmpty && scanLines.forall(_.contains(" IN ")),
      "the compacted-generation probe read must carry a static tb IN " +
        "partition filter:\n" + livePlan.take(2000))
    spark.catalog.clearCache()
  }

  test("q175: the tenant probe's read carries BOTH static partition " +
    "filters (lang dir AND term buckets) — two-level pruning on the " +
    "shared multi-tenant layout") {
    import graft.operators.TextAnalysis
    // q175 builds the layout as a side effect of planning it
    plan(TextAnalysis.q175TenantProbe(spark, sfDir))
    val path = TextAnalysis.bm25TempIndexPath(sfDir) + "_tenants"
    val p = plan(TextAnalysis.bm25TenantPostings(spark, path, "en",
      TextAnalysis.Bm25Query))
    val scanLines = p.linesIterator
      .filter(_.contains("PartitionFilters: [")).toSeq
    assert(scanLines.nonEmpty &&
      scanLines.forall(l => l.contains("lang#") && l.contains("tb#")),
      "tenant probe must prune on lang AND tb:\n" + p.take(2000))
    spark.catalog.clearCache()
  }

  test("q178/q179: drift census and recall curve keep the broadcast " +
    "discipline — centroid/spine joins never sort-merge, no " +
    "CartesianProduct; q179's sweep windows run over the per-cell " +
    "top-10 frame, not the index") {
    for (df <- Seq(
        Similarity.q178EmbeddingDrift(spark, sfDir),
        Similarity.q179RecallCurve(spark, sfDir))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), p.take(2000))
      assert(!p.contains("SortMergeJoin"),
        "k-row centroid/spine joins must broadcast:\n" + p.take(2000))
    }
    spark.catalog.clearCache()
  }

  test("q180: the purged layout's probe read keeps BOTH static " +
    "partition filters, and the tombstone anti-join sits ABOVE the " +
    "pruned scan as a broadcast join") {
    import graft.operators.TextAnalysis
    // q180 builds + purges the layout as a side effect of planning it
    plan(TextAnalysis.q180TenantPurge(spark, sfDir))
    val path = TextAnalysis.bm25TempIndexPath(sfDir) + "_purge"
    val pruned = plan(TextAnalysis.bm25TenantPostings(spark, path, "en",
      TextAnalysis.Bm25Query))
    val scanLines = pruned.linesIterator
      .filter(_.contains("PartitionFilters: [")).toSeq
    assert(scanLines.nonEmpty &&
      scanLines.forall(l => l.contains("lang#") && l.contains("tb#")),
      "post-purge probe must still prune on lang AND tb:\n" +
        pruned.take(2000))
    // live view = pruned scan + broadcast anti-join (the
    // bm25LivePostings discipline applied to the tenant probe)
    import spark.implicits._
    val live = TextAnalysis.bm25TenantPostings(spark, path, "en",
        TextAnalysis.Bm25Query)
      .join(org.apache.spark.sql.functions.broadcast(
          spark.read.parquet(s"$path/_tombstones").distinct()),
        Seq("doc_id"), "left_anti")
    val lp = plan(live)
    assert(lp.contains("LeftAnti") && lp.contains("BroadcastExchange"),
      lp.take(2000))
    spark.catalog.clearCache()
  }

  test("q184/q185/q186/q187: the continuation additions keep their " +
    "scale shapes — SCD2 is one keyed window; Q22's threshold rides " +
    "a broadcast and the NOT-EXISTS is a real anti-join; Q15's max " +
    "is a broadcast over the checkpointed rollup; the matryoshka " +
    "sweep points are TakeOrdered, never a global sort") {
    import graft.operators.Pipeline
    val p184 = plan(Pipeline.q184Scd2History(spark, sfDir))
    assert(!p184.contains("CartesianProduct"), p184.take(2000))
    assert(p184.linesIterator.count(_.contains("windowspecdefinition")) >= 1
      && p184.contains("windowspecdefinition(doc_id"),
      "SCD2 must window per doc_id:\n" + p184.take(2000))
    val p185 = plan(Relational.q185SalesOpportunity(spark, sfDir))
    assert(p185.contains("LeftAnti"), p185.take(2000))
    assert(p185.contains("BroadcastNestedLoopJoin") ||
      p185.contains("BroadcastExchange"),
      "Q22's scalar threshold must broadcast:\n" + p185.take(2000))
    assert(!p185.contains("CartesianProduct"), p185.take(2000))
    val p186 = plan(Relational.q186TopSupplier(spark, sfDir))
    assert(!p186.contains("CartesianProduct"), p186.take(2000))
    assert(!p186.contains("SortMergeJoin"),
      "Q15's max + name joins must broadcast:\n" + p186.take(2000))
    val p187 = plan(Similarity.q187MatryoshkaRecall(spark, sfDir))
    assert(p187.contains("TakeOrderedAndProject"),
      "matryoshka sweep points must be TakeOrdered:\n" + p187.take(2000))
    assert(!p187.contains("CartesianProduct") &&
      !p187.contains("SortMergeJoin"), p187.take(2000))
    spark.catalog.clearCache()
  }

  test("q118: novelty joins only DOC-cardinality frames — the gram " +
    "stream feeds one aggregation and is never join-back material; no " +
    "candidate pairing, no Window, no nested-loop join") {
    val df = TextAnalysis.q118NoveltyCensus(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
    // round-10 rewrite contract: the only join keys on doc_id (the
    // round-9 spelling joined the full gram stream on the gram hash —
    // the linear term behind its 13x-at-100x decade factor)
    val joinLines = p.linesIterator.filter(_.contains("Join")).toSeq
    assert(joinLines.nonEmpty && joinLines.forall(l =>
      l.contains("doc_id") && !l.contains("gram")), joinLines.mkString("\n"))
    df.sparkSession.catalog.clearCache()
  }
}
