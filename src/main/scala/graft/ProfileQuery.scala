package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB profiler for one or more declared queries (guide §1.5:
  * label your jobs / attribute wall time). Bench prices a query as one
  * wall number; this main decomposes it into the Spark jobs it
  * schedules — each line is (job seconds, callsite) so a 5 s serving
  * build can be read as "0.9 s codebook training, 1.8 s partitioned
  * write, ..." and the optimization target is the line, not the query.
  *
  * Usage: SPARK_GRAFT_ONLY=q197_ivf_pq_stored sbt "runMain
  * graft.ProfileQuery". Same session config as Bench (local[$CPUS],
  * shuffle.partitions=$CPUS); one unmeasured warmup run per query
  * (JIT/codegen), then one measured run with the listener attached.
  * Diagnostic only — never part of the driver contract.
  */
object ProfileQuery {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
      .getOrElse(sys.error("set SPARK_GRAFT_ONLY to the queries to profile"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val jobSec = new java.util.concurrent.atomic.DoubleAdder()
    // last job-activity timestamp: gap = driver-side dead time between
    // the previous job's end and this job's start (planning, listing,
    // commit renames) — the half a wall-total hides
    val lastEnd = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // all stage callsites (deduped, with task counts) — the future
        // callsite alone ("withThreadLocalCaptured") attributes nothing
        val site = js.stageInfos
          .map(si => s"${si.name}×${si.numTasks}")
          .groupBy(identity).toSeq
          .map { case (n, g) => if (g.size > 1) s"$n(*${g.size})" else n }
          .sorted.mkString(" | ")
        val prev = lastEnd.get()
        val gap = if (prev == 0L) 0.0 else (js.time - prev) / 1e3
        if (gap > 0.05)
          lines.add(f"[gap] $gap%8.3f s  before job=${js.jobId}")
        starts.put(js.jobId, (js.time, site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        lastEnd.set(je.time)
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          val sec = (je.time - t0) / 1e3
          jobSec.add(sec)
          if (sec > 0.05)
            lines.add(f"[job] $sec%8.3f s  job=${je.jobId}%-4d $site")
        }
      }
    }

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.contains(n) }
    queries.foreach { case (name, fn) =>
      // warmup (codegen + JIT), unlistened
      Bench.runScoped(spark, fn(spark, sfDir))
      lines.clear(); jobSec.reset(); lastEnd.set(0L)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      Bench.runScoped(spark, fn(spark, sfDir))
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      println(f"[profile] $name total=$total%.3f s, in-jobs=${jobSec.sum()}%.3f s (gaps=driver-side):")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
