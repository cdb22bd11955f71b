package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to files — the
  * plan-evidence artifacts the optimization rounds commit under
  * `plans/rNN/`. Usage:
  *
  *   SPARK_GRAFT_ONLY=q147_ann_pq_adc,q149_ann_ivf_pq \
  *   SPARK_GRAFT_PLAN_DIR=plans/r17 SPARK_GRAFT_PLAN_SUFFIX=_before \
  *   sbt "runMain graft.DumpPlans"
  *
  * Building a query's DataFrame runs any in-query serving-layout
  * builds (they are eager side effects by design); the dumped plan is
  * the returned frame's — the probe/answer side the driver times.
  * Diagnostic only — never part of the driver contract.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r17")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
      .getOrElse(sys.error("set SPARK_GRAFT_ONLY to the queries to dump"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.contains(n) }
      .foreach { case (name, fn) =>
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(outDir, s"$name$suffix.txt")
        java.nio.file.Files.write(p, plan.getBytes("UTF-8"))
        println(s"[plans] wrote $p")
      }
    spark.stop()
  }
}
