package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.Fs

/** Streaming twin of the q125 CDC merge ([[graft.operators.Pipeline
  * .mergeApply]]): a delta FEED applied to a maintained snapshot via
  * `foreachBatch`, versioned-directory state with an atomically-swapped
  * pointer, and an idempotent-replay guard keyed on the streaming batch
  * id — the micro-batch shape of MERGE INTO maintenance (reference
  * analogue: the notebook pipelines re-derive downstream state per
  * batch; a lakehouse deployment swaps this layer for a transactional
  * table commit, same `applyBatch` body).
  *
  * State layout under `statePath`:
  *   v_init/, v<batchId>/   parquet snapshot versions (doc_id, lang, text)
  *   VERSION                "<lastCommittedBatchId>\t<dataDirName>"
  *
  * Correctness contract:
  *  - versions are WRITTEN BEFORE the pointer moves, and never
  *    overwritten in place, so a crash between write and commit leaves
  *    the previous version live (write-ahead);
  *  - the pointer swap is a same-directory atomic rename;
  *  - a batch id <= the committed id is a REPLAY (foreachBatch's
  *    at-least-once redelivery after restart) and must be skipped —
  *    [[applyBatch]] returns false without touching state, making the
  *    apply exactly-once on state (StreamingSpec pins replay
  *    idempotence).
  *
  * Scale shape: each batch is one [[graft.operators.Pipeline
  * .mergeApply]] full-outer join (delta typically broadcast) + one
  * snapshot rewrite; at 100 TB the rewrite becomes a partitioned /
  * transactional-table MERGE, but the batch protocol (version, commit,
  * replay-skip by batch id) is exactly this one.
  */
object CdcApply {

  private def versionFile(statePath: String) = s"$statePath/VERSION"

  /** Seed the maintained snapshot; must run once before the stream. */
  def initState(snapshot: DataFrame, statePath: String): Unit = {
    snapshot.select("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$statePath/v_init")
    commitPointer(snapshot.sparkSession, statePath, -1L, "v_init")
  }

  /** (lastCommittedBatchId, dataDirName). Routed through the path's
    * own Hadoop FileSystem ([[Fs.readUtf8]]) — a `java.nio` read is
    * silently absent on hdfs://s3a:// roots, which would disable the
    * replay guard and double-apply redelivered batches (round-13
    * advice; same discipline as the `_tombstones` checks).
    */
  def readPointer(s: SparkSession, statePath: String): (Long, String) = {
    val parts = Fs.readUtf8(s, versionFile(statePath)).trim.split("\t")
    (parts(0).toLong, parts(1))
  }

  private def commitPointer(s: SparkSession, statePath: String,
      batchId: Long, dir: String): Unit =
    Fs.writeUtf8Atomic(s, versionFile(statePath), s"$batchId\t$dir")

  /** The current maintained snapshot (doc_id, lang, text). */
  def currentState(spark: SparkSession, statePath: String): DataFrame = {
    val (_, dir) = readPointer(spark, statePath)
    spark.read.parquet(s"$statePath/$dir")
  }

  /** TIME TRAVEL: the snapshot as of `batchId` (−1 = the initial
    * seed). Versions are write-ahead and never rewritten, so every
    * committed state remains readable — the lakehouse time-travel
    * contract, free once the apply protocol is versioned. Throws for
    * a batch id that never committed (readers must not silently get a
    * neighboring version).
    */
  def stateAt(spark: SparkSession, statePath: String,
      batchId: Long): DataFrame = {
    val dir = if (batchId < 0L) "v_init" else s"v$batchId"
    require(Fs.exists(spark, s"$statePath/$dir"),
      s"no committed version for batch $batchId under $statePath")
    spark.read.parquet(s"$statePath/$dir")
  }

  /** Apply one delta batch; returns false (untouched state) on replay.
    * Exactly-once on state by write-ahead: the new version dir is
    * fully written BEFORE the pointer swaps, versions are never
    * rewritten in place, and a crash between the two re-runs the batch
    * against the still-live previous version — the rewrite of
    * `v<batchId>` on retry converges to the clean-run state.
    */
  def applyBatch(batch: DataFrame, batchId: Long,
      statePath: String): Boolean = {
    val (committed, dir) = readPointer(batch.sparkSession, statePath)
    if (batchId <= committed) return false
    val cur = batch.sparkSession.read.parquet(s"$statePath/$dir")
    graft.operators.Pipeline.mergeApply(cur, batch)
      .select("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$statePath/v$batchId")
    commitPointer(batch.sparkSession, statePath, batchId, s"v$batchId")
    true
  }

  /** Start the apply loop over a streaming delta frame
    * (doc_id, op, lang, text). Caller supplies the checkpoint dir.
    */
  def cdcApplyStream(deltas: DataFrame, statePath: String,
      checkpoint: String): StreamingQuery = {
    deltas.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, statePath); ()
      }
      .start()
  }
}
