package graft.sources

import org.apache.spark.sql.DataFrame

/** Output-file sizing for corpus writes — the small-files problem.
  *
  * A 100 TB pipeline that writes with whatever partitioning the last
  * shuffle left behind produces either thousands of KB-sized files
  * (every downstream scan pays per-file open/footer cost, and the
  * driver pays listing) or a handful of multi-GB files (no read
  * parallelism, whole-file retries). Sizing the write to a target
  * file size keeps scans split-friendly and metadata bounded.
  */
object Compaction {

  /** Repartition `df` so each output file lands near `targetMB`, using
    * Catalyst's own logical-plan size estimate (parquet footer totals
    * for scans, propagated through operators — no extra pass over the
    * data). The estimate is of the IN-MEMORY/source bytes, so the
    * on-disk parquet files come out at roughly targetMB × its
    * compression ratio — pick targetMB accordingly (e.g. 256–512 for
    * ~128 MB files on text-heavy data).
    */
  def sizedForWrite(df: DataFrame, targetMB: Int = 256): DataFrame = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val target = BigInt(targetMB) * 1024 * 1024
    // stats default to a huge sentinel when no source can be sized —
    // cap the partition count so an unknown estimate degrades to the
    // session's shuffle parallelism instead of a million-task shuffle
    val cap = BigInt(math.max(df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt, 1) * 16)
    val raw = bytes / target + (if (bytes % target > 0) 1 else 0)
    df.repartition(raw.min(cap).max(1).toInt)
  }

  /** Compact a parquet directory in place-adjacent: read, resize,
    * write to `out`. The round-trip is a narrow scan + one shuffle —
    * run it per partition directory on partitioned datasets so only
    * hot partitions pay.
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
      in: String, out: String, targetMB: Int = 256): Unit =
    sizedForWrite(spark.read.parquet(in), targetMB)
      .write.mode("overwrite").parquet(out)
}
