package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
object TmpAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").appName("audit")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
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
