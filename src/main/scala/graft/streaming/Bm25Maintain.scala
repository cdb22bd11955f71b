package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** FULL CRUD maintenance stream for the BM25 serving layout — the
  * generalization of [[Bm25Ingest]] (adds only) to the CDC-style feed
  * a production index actually consumes: one stream of
  * (op, doc_id, lang, text) rows, `op ∈ {add, del}`, where adds are
  * new crawl results and dels are takedown/dedup verdicts
  * ([[graft.operators.Pipeline]]'s delta shape pointed at the serving
  * layout instead of the corpus snapshot).
  *
  * Every micro-batch applies ATOMICALLY under [[IngestCommit]]: the
  * batch's four artifacts (postings, doc lengths, tombstone rows, ONE
  * stats subtree carrying both the add and delete deltas) stage
  * together and publish together, so a crash can never land the adds
  * without their stats or a tombstone without its negative delta —
  * the failure a direct bm25Append+bm25Delete sequence per batch is
  * exposed to (delete recomputes victims from the live view, so a
  * replay after a tombstone-published/stats-missing crash would find
  * no live victims and the stats stay wrong forever). Within a batch,
  * adds apply before dels: add-then-delete of the same doc nets to a
  * tombstoned doc with exact stats (spec law).
  *
  * Scale shape: batch-sized work only — one tokenize, postings staged
  * under the batch terms' buckets, the victim computation is a
  * doc-cardinality semi-join against the (broadcast-tombstone-
  * filtered) `_docs` sidecar, never a postings scan; publish is
  * ≤|touched buckets|+3 renames. Probes between batches stay pruned
  * scans. StreamingSpec pins stream == batch-rebuild-on-survivors,
  * replay refusal, and the within-batch ordering law.
  */
object Bm25Maintain {

  private val Artifacts = Seq(
    "post" -> "", "docs" -> "_docs", "tomb" -> "_tombstones",
    "stats" -> "_stats")

  /** Last committed micro-batch id; −1 before any batch. */
  def committedBatch(s: SparkSession, path: String): Long =
    IngestCommit.committed(s, path)

  /** Apply one (op, doc_id, lang, text) micro-batch; returns false
    * (layout untouched) on replay.
    */
  def applyBatch(batch: DataFrame, batchId: Long, path: String): Boolean = {
    val s = batch.sparkSession
    val b = batch.localCheckpoint(false)
    IngestCommit.applyStaged(s, path, batchId, Artifacts, staged =>
      graft.operators.TextAnalysis.bm25MaintainStage(
        b.filter(col("op") === "add").select("doc_id", "lang", "text"),
        b.filter(col("op") === "del").select("doc_id"),
        path, staged))
  }

  /** Start the maintenance loop over a streaming (op, doc_id, lang,
    * text) frame against the layout at `path` (built by
    * bm25IndexWrite). Caller supplies the checkpoint dir.
    */
  def bm25MaintainStream(feed: DataFrame, path: String,
      checkpoint: String): StreamingQuery =
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, path); ()
      }
      .start()
}
