package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** FULL CRUD maintenance stream for the IVF serving layout — the
  * dense twin of [[Bm25Maintain]], completing the maintenance matrix
  * (both layouts: batch CRUD, streaming ingest, streaming CRUD): one
  * feed of (op, vec_id, embedding) rows where adds are new embeddings
  * (assigned to their nearest FROZEN centroid, the
  * [[graft.operators.Similarity.ivfAssignNew]] retrain-free contract)
  * and dels are takedown verdicts (tombstone rows).
  *
  * Each micro-batch's two artifacts (cell-partitioned postings,
  * tombstone ids) stage and publish together under [[IngestCommit]] —
  * a crash can never land a batch's vectors without its tombstones or
  * vice versa, and a replayed batch is refused by the commit pointer.
  * The IVF layout keeps no stats sidecar, so the delete leg needs no
  * live-view pricing: raw ids append and [[graft.operators.Similarity
  * .ivfReadLive]] distincts at read (duplicates harmless), which makes
  * the staged protocol strictly simpler than the lexical one. Same
  * no-id-reuse contract: the id-based tombstone filter would hide a
  * re-added vec_id until a compaction retires the tombstone.
  *
  * Scale shape: one zero-shuffle assignment projection per batch
  * (k-row centroid broadcast), staged write touching only the batch's
  * cells, ≤|touched cells|+1 renames. StreamingSpec pins stream ==
  * batch ivfAppend+ivfDelete of the same rows and replay refusal.
  */
object IvfMaintain {

  private val Artifacts = Seq("post" -> "", "tomb" -> "_tombstones")

  private def index(root: String) = s"$root/index"

  /** Last committed micro-batch id; −1 before any batch. */
  def committedBatch(s: SparkSession, root: String): Long =
    IngestCommit.committed(s, index(root))

  /** Apply one (op, vec_id, embedding) micro-batch; returns false
    * (layout untouched) on replay.
    */
  def applyBatch(batch: DataFrame, batchId: Long, root: String): Boolean = {
    val s = batch.sparkSession
    val b = batch.localCheckpoint(false)
    IngestCommit.applyStaged(s, index(root), batchId, Artifacts, staged => {
      graft.operators.Similarity
        .ivfAssignNew(
          b.filter(col("op") === "add").select("vec_id", "embedding"),
          s.read.parquet(s"$root/_cents"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$staged/post")
      b.filter(col("op") === "del")
        .select(col("vec_id").cast("long"))
        .write.mode("overwrite").parquet(s"$staged/tomb")
    })
  }

  /** Start the maintenance loop over a streaming (op, vec_id,
    * embedding) frame against the serving layout at `root` (built by
    * ivfServingSetup). Caller supplies the checkpoint dir.
    */
  def ivfMaintainStream(feed: DataFrame, root: String,
      checkpoint: String): StreamingQuery =
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, root); ()
      }
      .start()
}
