package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** LIVE BM25 index maintenance — the streaming half of q162's
  * lifecycle: a stream of newly crawled documents appends into an
  * existing [[graft.operators.TextAnalysis.bm25IndexWrite]] layout, so
  * a probe between batches serves base+ingested docs alike through the
  * same pruned scan.
  *
  * Each micro-batch rides the [[IngestCommit]] staged-publish
  * protocol: the batch's three artifacts (postings partitioned by term
  * bucket, `_docs` rows, ONE exact `_stats` delta) are written under
  * an underscore-hidden staging dir, renamed into the live tree under
  * batch-tagged names, then the commit pointer swaps — exactly-once on
  * layout state across crash/replay, with every pointer and file op
  * scheme-correct via the Hadoop FileSystem API (see IngestCommit's
  * scaladoc for the full crash analysis and the S3 rename caveat).
  *
  * Scale shape: each micro-batch pays batch-sized work only (tokenize
  * once, postings staged under the batch's terms' buckets, renames are
  * metadata moves); the serving read never rewrites and never sees the
  * staging dir. Delete/compact ride the same layout's q162 surface —
  * this stream is the ingest leg. StreamingSpec pins
  * probe-after-stream == full rebuild, replay refusal, and
  * crash-retry == clean-run end state.
  */
object Bm25Ingest {

  /** The staging-subdir → live-subdir map of the three artifacts. */
  private val Artifacts = Seq(
    "post" -> "", "docs" -> "_docs", "stats" -> "_stats")

  /** Last committed micro-batch id; −1 before any batch. */
  def committedBatch(s: SparkSession, path: String): Long =
    IngestCommit.committed(s, path)

  /** Apply one micro-batch; returns false (layout untouched) on
    * replay. Exposed so the spec can drive the replay and crash-retry
    * laws directly.
    */
  def applyBatch(batch: DataFrame, batchId: Long, path: String): Boolean =
    IngestCommit.applyStaged(batch.sparkSession, path, batchId, Artifacts,
      staged => graft.operators.TextAnalysis.bm25AppendStage(batch, staged))

  /** Start the ingest loop over a streaming (doc_id, lang, text)
    * frame into the layout at `path` (built by bm25IndexWrite).
    * Caller supplies the checkpoint dir.
    */
  def bm25IngestStream(docs: DataFrame, path: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, path); ()
      }
      .start()
}
