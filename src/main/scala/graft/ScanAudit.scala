package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev diagnostic: walk every registered query's physical plan and
  * report how many times each table is SCANNED. A query that reads the
  * same parquet root twice for one logical pass is a candidate for a
  * scoped `.cache()` of the shared subtree (the q46/q62/q31 pattern) —
  * at 100 TB a redundant corpus scan IS the bottleneck, and this is the
  * mechanical way to find them. Run:
  *   sbt "runMain graft.ScanAudit"
  * Reads the initial (pre-AQE) plan so the count reflects what Catalyst
  * materialized, not runtime re-planning.
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").appName("audit")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val df = fn(spark, dir)
        val root = df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.initialPlan
          case p => p
        }
        val scans = root.collect { case f: FileSourceScanExec => f }
        val byTable = scans.groupBy(f =>
          f.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?"))
          .map { case (t, fs) => s"$t=${fs.size}" }.toSeq.sorted.mkString(",")
        val dup = scans.groupBy(f =>
          f.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?"))
          .exists(_._2.size > 1)
        println(s"[audit] $name dup=$dup $byTable")
      } catch { case e: Throwable =>
        println(s"[audit] $name ERR ${e.getClass.getSimpleName}")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
