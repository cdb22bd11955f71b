package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** LIVE BM25 index maintenance — the streaming half of q162's
  * lifecycle: a stream of newly crawled documents appends into an
  * existing [[graft.operators.TextAnalysis.bm25IndexWrite]] layout via
  * `foreachBatch` → [[graft.operators.TextAnalysis.bm25Append]]
  * (touched-bucket postings append + `_docs` growth + one exact
  * `_stats` delta per micro-batch), so a probe between batches serves
  * base+ingested docs alike through the same pruned scan.
  *
  * Replay protocol: bm25Append is NOT idempotent — a replayed
  * micro-batch (foreachBatch's at-least-once contract after a crash)
  * would double its postings AND its stats delta. The committed
  * batch-id pointer ([[CdcApply]]'s VERSION discipline: write-tmp,
  * atomic rename) makes each batch apply exactly once; a batch id at
  * or below the committed id is skipped untouched. StreamingSpec pins
  * probe-after-stream == full rebuild AND replay idempotence.
  *
  * Scale shape: each micro-batch pays batch-sized work only (tokenize
  * once, append under its terms' buckets); the serving read never
  * rewrites. Delete/compact ride the same layout's q162 surface —
  * this stream is the ingest leg.
  */
object Bm25Ingest {

  private def pointerFile(path: String) = Paths.get(path, "_INGEST_COMMIT")

  /** Last committed micro-batch id; −1 before any batch. */
  def committedBatch(path: String): Long =
    if (!Files.exists(pointerFile(path))) -1L
    else new String(Files.readAllBytes(pointerFile(path)),
      StandardCharsets.UTF_8).trim.toLong

  private def commitBatch(path: String, batchId: Long): Unit = {
    val tmp = Paths.get(path, "_INGEST_COMMIT.tmp")
    Files.write(tmp, batchId.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointerFile(path),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Apply one micro-batch; returns false (layout untouched) on
    * replay. Exposed so the spec can drive the replay law directly.
    */
  def applyBatch(batch: DataFrame, batchId: Long, path: String): Boolean = {
    if (batchId <= committedBatch(path)) return false
    graft.operators.TextAnalysis.bm25Append(batch, path)
    commitBatch(path, batchId)
    true
  }

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
