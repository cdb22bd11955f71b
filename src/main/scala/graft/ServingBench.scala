package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Probe-only serving benchmark over PERSISTED index layouts.
  *
  * The oracle-checked q160/q162 (BM25) and q128/q139/q158 (IVF) build
  * their layouts in-query so the whole lifecycle sits under the hash
  * gate — which means their bench numbers price the BUILD together
  * with the probe. A serving deployment builds once and probes
  * millions of times; the claim that matters there is "a probe's
  * bytes-read scale with |query terms| / nprobe cells, not corpus
  * size". This main MEASURES that claim instead of inferring it from
  * the plan (the MediaBench decode-vs-encode split applied to
  * retrieval):
  *
  *   1. setup (untimed): [[graft.operators.TextAnalysis.bm25IndexWrite]]
  *      and [[graft.operators.Similarity.ivfServingSetup]] persist the
  *      two layouts into a scratch root;
  *   2. measured: min-of-REPS over the probe-only paths
  *      ([[graft.operators.TextAnalysis.bm25Probe]] /
  *      [[graft.operators.Similarity.ivfProbeStored]]), through
  *      Bench.runScoped (noop sink, cache-scoped); the in-query
  *      build+probe forms (q160, q128) run on the same session for the
  *      build-share baseline;
  *   3. prints ONE JSON line carrying, per probe, the physically
  *      scanned file/byte counts next to the layout's totals — the
  *      pruning evidence as MEASURED numbers.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32),
  * SPARK_GRAFT_REPS (3), SPARK_GRAFT_SERVING_OUT (default
  * target/serving_layouts).
  */
object ServingBench {

  /** (filesRead, bytesRead) summed over the FileSourceScans of `df`'s
    * executed plan whose root path contains `pathSubstr` — walks
    * through AQE wrapper nodes (the PipelineOpsSpec walker).
    */
  def scanStats(df: DataFrame, pathSubstr: String): (Long, Long) = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(walk)
    }
    // underscore sidecars (_stats/_cents/_query/_tombstones) are
    // bounded metadata reads, not the pruning claim — exclude them so
    // files_read counts POSTINGS/INDEX files alone, comparable to
    // layoutTotals' denominator
    val scans = walk(df.queryExecution.executedPlan).filter { f =>
      val roots = f.relation.location.rootPaths.map(_.toString)
      roots.exists(_.contains(pathSubstr)) && !roots.exists(_.contains("/_"))
    }
    (scans.map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum,
      scans.map(_.metrics.get("filesSize").map(_.value).getOrElse(0L)).sum)
  }

  /** Total (files, bytes) under a layout directory, sidecar dirs
    * excluded — the denominator of the pruning ratio.
    */
  def layoutTotals(root: String): (Long, Long) = {
    def files(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles).toSeq.flatten.flatMap { f =>
        if (f.isDirectory) {
          if (f.getName.startsWith("_")) Seq.empty else files(f)
        } else if (f.getName.endsWith(".parquet")) Seq(f)
        else Seq.empty
      }
    val fs = files(new java.io.File(root))
    (fs.size.toLong, fs.map(_.length).sum)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val out = sys.env.getOrElse("SPARK_GRAFT_SERVING_OUT",
      "target/serving_layouts")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.{Similarity, TextAnalysis}
    // setup, untimed (but reported: the build share a deployment
    // amortizes across every query)
    val bm25Root = s"$out/bm25"
    val ivfRoot = s"$out/ivf"
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val buildBm25 = timed(TextAnalysis.bm25IndexWrite(
      graft.core.Tables.documents(spark, sfDir), bm25Root))
    val buildIvf = timed(Similarity.ivfServingSetup(spark, sfDir, ivfRoot))
    val tenantRoot = s"$out/bm25_tenants"
    val buildTenants = timed(TextAnalysis.bm25IndexWriteTenants(
      graft.core.Tables.documents(spark, sfDir), tenantRoot))
    // compressed-at-rest layout: same quantizer, 1-byte codes on disk —
    // the bytes_read shrink is THE claim this bench exists to measure
    val sq8Root = s"$out/ivf_sq8"
    val buildSq8 = timed(Similarity.ivfServingSetupSq8(spark, sfDir, sq8Root))
    val ivfTenRoot = s"$out/ivf_tenants"
    val buildIvfTen = timed(
      Similarity.ivfServingSetupTenants(spark, sfDir, ivfTenRoot))
    val tenSq8Root = s"$out/ivf_tsq8"
    val buildTenSq8 = timed(
      Similarity.ivfServingSetupTenantsSq8(spark, sfDir, tenSq8Root))
    // stored product quantization: 4-byte codes at rest — the step
    // past SQ8's 4x cut (r15 verdict #3); same probed-cell file count,
    // far fewer bytes
    val pqRoot = s"$out/ivf_pq"
    val buildPq = timed(Similarity.ivfServingSetupPq(spark, sfDir, pqRoot))
    // the full composition: tenant pruning x 4-byte codes
    val tenPqRoot = s"$out/ivf_tpq"
    val buildTenPq = timed(
      Similarity.ivfServingSetupTenantsPq(spark, sfDir, tenPqRoot))

    val queries: Seq[(String, () => DataFrame)] = Seq(
      "bm25_probe_only" -> (() =>
        TextAnalysis.bm25Probe(spark, bm25Root, TextAnalysis.Bm25Query)),
      "bm25_batch_probe_only" -> (() =>
        TextAnalysis.bm25ProbeBatch(spark, bm25Root, TextAnalysis.Bm25Batch)),
      "ivf_probe_only" -> (() =>
        Similarity.ivfProbeStored(spark, ivfRoot, excludeVecId = Some(0L))),
      "ivf_batch_probe_only" -> (() =>
        Similarity.ivfProbeStoredBatch(spark, ivfRoot)),
      "bm25_tenant_probe_only" -> (() =>
        TextAnalysis.bm25ProbeTenant(spark, tenantRoot, "en",
          TextAnalysis.Bm25Query)),
      "ivf_sq8_probe_only" -> (() =>
        Similarity.ivfProbeStoredSq8(spark, sq8Root,
          excludeVecId = Some(0L))),
      "ivf_tenant_probe_only" -> (() =>
        Similarity.ivfProbeStoredTenant(spark, ivfTenRoot,
          Similarity.IvfTenants.head, excludeVecId = Some(0L))),
      "ivf_tenant_sq8_probe_only" -> (() =>
        Similarity.ivfProbeStoredTenantSq8(spark, tenSq8Root,
          Similarity.IvfTenants.head, excludeVecId = Some(0L))),
      "ivf_pq_probe_only" -> (() =>
        Similarity.ivfProbeStoredPq(spark, pqRoot,
          excludeVecId = Some(0L))),
      "ivf_tenant_pq_probe_only" -> (() =>
        Similarity.ivfProbeStoredTenantPq(spark, tenPqRoot,
          Similarity.IvfTenants.head, excludeVecId = Some(0L))),
      "inquery_q160_bm25" -> (() =>
        TextAnalysis.q160Bm25Probe(spark, sfDir)),
      "inquery_q128_ivf" -> (() =>
        Similarity.q128AnnIvfLearned(spark, sfDir)))

    queries.foreach { case (_, fn) => Bench.runScoped(spark, fn()) } // warmup
    val loadBefore = Bench.loadAvg()
    val timedQs = queries.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        Bench.runScoped(spark, fn())
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    // pruning evidence: run each probe's PHYSICAL READ once more to a
    // collected result and read the scan metrics off the executed
    // plan. For bm25 that read is bm25LivePostings — the probe itself
    // wraps a lazy localCheckpoint around it (one scan feeding both
    // the df/idf and scoring passes), which replaces the scan with an
    // RDD in the probe's own executed plan and hides the metrics
    // (round-13 advice); the pre-checkpoint frame IS the plan the
    // checkpoint materializes, so its scan stats are the probe's.
    def pruned(df: DataFrame, root: String): (Long, Long) = {
      df.collect(); scanStats(df, root)
    }
    val (bmFiles, bmBytes) = pruned(
      TextAnalysis.bm25LivePostings(spark, bm25Root, TextAnalysis.Bm25Query),
      "bm25")
    val (ivFiles, ivBytes) = pruned(
      queries.find(_._1 == "ivf_probe_only").get._2(), "ivf/index")
    // tenant pruning: the en probe must read only en-dir bucket files —
    // the two-level claim as a measured number against the SHARED
    // multi-tenant layout's totals
    val (tnFiles, tnBytes) = pruned(
      TextAnalysis.bm25TenantPostings(spark, tenantRoot, "en",
        TextAnalysis.Bm25Query), "bm25_tenants")
    // sq8: same probed-cell file COUNT as full-precision, ~4x fewer
    // BYTES — compression changes the wire cost, never the pruning
    val (sqFiles, sqBytes) = pruned(
      queries.find(_._1 == "ivf_sq8_probe_only").get._2(), "ivf_sq8/index")
    // dense tenant: two-level (tb, cell) pruning as measured numbers
    val (itFiles, itBytes) = pruned(
      queries.find(_._1 == "ivf_tenant_probe_only").get._2(),
      "ivf_tenants/index")
    // composed layout: tenant pruning AND the byte-code cut together
    val (tsFiles, tsBytes) = pruned(
      queries.find(_._1 == "ivf_tenant_sq8_probe_only").get._2(),
      "ivf_tsq8/index")
    // stored PQ: unchanged probed-cell file count, 4-byte member rows
    val (pqFiles, pqBytes) = pruned(
      queries.find(_._1 == "ivf_pq_probe_only").get._2(), "ivf_pq/index")
    // tenant x PQ: two-level pruning AND the 4-byte cut together
    val (tpFiles, tpBytes) = pruned(
      queries.find(_._1 == "ivf_tenant_pq_probe_only").get._2(),
      "ivf_tpq/index")
    val (bmTotF, bmTotB) = layoutTotals(bm25Root)
    val (ivTotF, ivTotB) = layoutTotals(s"$ivfRoot/index")
    val (tnTotF, tnTotB) = layoutTotals(tenantRoot)
    val (sqTotF, sqTotB) = layoutTotals(s"$sq8Root/index")
    val (itTotF, itTotB) = layoutTotals(s"$ivfTenRoot/index")
    val (tsTotF, tsTotB) = layoutTotals(s"$tenSq8Root/index")
    val (pqTotF, pqTotB) = layoutTotals(s"$pqRoot/index")
    val (tpTotF, tpTotB) = layoutTotals(s"$tenPqRoot/index")

    val host = Bench.hostJson(loadBefore, Bench.loadAvg(),
      Runtime.getRuntime.availableProcessors)
    def r4(x: Double) =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(x))
    val qs = timedQs.map { case (n, t) => s""""$n":${r4(t)}""" }.mkString(",")
    println(s"""{"metric":"serving_probe_only","unit":"sec","sf":"$sfDir",""" +
      s""""reps":$reps,"queries":{$qs},""" +
      s""""setup_sec":{"bm25_build":${r4(buildBm25)},"ivf_build":${r4(buildIvf)},"tenants_build":${r4(buildTenants)},"ivf_sq8_build":${r4(buildSq8)},"ivf_tenants_build":${r4(buildIvfTen)},"ivf_tenant_sq8_build":${r4(buildTenSq8)},"ivf_pq_build":${r4(buildPq)},"ivf_tenant_pq_build":${r4(buildTenPq)}},""" +
      s""""pruning":{"bm25":{"files_read":$bmFiles,"files_total":$bmTotF,""" +
      s""""bytes_read":$bmBytes,"bytes_total":$bmTotB},""" +
      s""""ivf":{"files_read":$ivFiles,"files_total":$ivTotF,""" +
      s""""bytes_read":$ivBytes,"bytes_total":$ivTotB},""" +
      s""""ivf_sq8":{"files_read":$sqFiles,"files_total":$sqTotF,""" +
      s""""bytes_read":$sqBytes,"bytes_total":$sqTotB},""" +
      s""""ivf_tenants":{"files_read":$itFiles,"files_total":$itTotF,""" +
      s""""bytes_read":$itBytes,"bytes_total":$itTotB},""" +
      s""""ivf_tenant_sq8":{"files_read":$tsFiles,"files_total":$tsTotF,""" +
      s""""bytes_read":$tsBytes,"bytes_total":$tsTotB},""" +
      s""""ivf_pq":{"files_read":$pqFiles,"files_total":$pqTotF,""" +
      s""""bytes_read":$pqBytes,"bytes_total":$pqTotB},""" +
      s""""ivf_tenant_pq":{"files_read":$tpFiles,"files_total":$tpTotF,""" +
      s""""bytes_read":$tpBytes,"bytes_total":$tpTotB},""" +
      s""""bm25_tenants":{"files_read":$tnFiles,"files_total":$tnTotF,""" +
      s""""bytes_read":$tnBytes,"bytes_total":$tnTotB}},"host":$host}""")
    spark.stop()
  }
}
