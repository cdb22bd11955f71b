package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.core.Fs

/** The staged-publish exactly-once protocol shared by the two serving
  * ingest streams ([[Bm25Ingest]] lexical, [[IvfIngest]] dense).
  *
  * `foreachBatch` is at-least-once: after a crash the last
  * un-checkpointed micro-batch is REDELIVERED, and both layouts'
  * append paths are non-idempotent (double postings / double vectors,
  * double `_stats` deltas). Naive "append then write a committed-id
  * pointer" narrows the window but does not close it — a crash
  * BETWEEN the append and the pointer write double-applies on replay
  * (round-13 advice). This protocol closes it with staging + tagged
  * renames:
  *
  *   1. guard   — `batchId <= committed(layout)` → refuse, untouched;
  *   2. scrub   — delete `<tag>-*.parquet` files of THIS batch id from
  *                the live tree (leftovers of a crashed prior attempt;
  *                none on the happy path) and the staging dir;
  *   3. stage   — write the batch's artifacts under
  *                `layout/_staged_b<id>/` (underscore-prefixed: Spark's
  *                file listing never sees it, so a live probe is
  *                unaffected by an in-flight batch);
  *   4. publish — rename every staged file into the live tree under a
  *                batch-tagged deterministic name `b<id>-<k>.parquet`
  *                ([[Fs.publishParquet]]); renames are metadata-only
  *                moves on HDFS/file:;
  *   5. commit  — atomically swap the pointer ([[Fs.writeUtf8Atomic]])
  *                and drop the staging dir.
  *
  * A crash at ANY step before 5 leaves the pointer at the previous
  * batch, so the redelivered batch re-runs 2–5; the scrub makes the
  * retry produce exactly the clean-run end state — exactly-once on
  * LAYOUT STATE, which is the guarantee that matters (the stream
  * itself is at-least-once by contract). Every pointer and file
  * operation goes through the path's own Hadoop FileSystem
  * ([[graft.core.Fs]]), so the guard fires identically on file:,
  * hdfs: and s3a: roots — a `java.nio` pointer is silently absent on
  * remote schemes and the guard never fires (round-13 advice).
  * S3 caveat: rename on plain s3a:// is copy+delete, so step 4 is
  * slower there and step 5's swap is not atomic — the protocol still
  * converges (missing pointer reads as "nothing committed" and the
  * scrub re-cleans), but rename-atomic stores give the hard guarantee.
  *
  * The scrub is one recursive walk of the layout root deleting this
  * batch's `b<id>-*.parquet` files at any partition depth — no
  * per-layout glob list to maintain.
  *
  * SINGLE-WRITER contract: one maintenance stream per layout. The
  * pointer records one monotone batch-id sequence — two concurrent
  * streams (each with its own foreachBatch counter) would collide on
  * ids and scrub each other's files. Multiplex adds and deletes into
  * ONE feed instead ([[Bm25Maintain]]/[[IvfMaintain]] exist precisely
  * for that); this matches Structured Streaming's own
  * one-writer-per-checkpoint model.
  */
object IngestCommit {

  private def pointerPath(layout: String) = s"$layout/_INGEST_COMMIT"

  def stagingDir(layout: String, batchId: Long): String =
    s"$layout/_staged_b$batchId"

  def tag(batchId: Long): String = s"b$batchId"

  /** Last committed micro-batch id; −1 before any batch (or when the
    * pointer is unreadable mid-swap on a non-atomic store — safe: the
    * apply path is scrub-first idempotent).
    */
  def committed(s: SparkSession, layout: String): Long =
    if (!Fs.exists(s, pointerPath(layout))) -1L
    else Fs.readUtf8(s, pointerPath(layout)).trim.toLong

  /** Run one staged batch apply; returns false (layout untouched) on
    * replay of an already-committed batch id.
    *
    * @param destSubdirs live subtrees the staged tree publishes into,
    *        as (staging-subdir, layout-subdir) pairs — `""` for the
    *        layout root. The scrub step derives its globs from these.
    * @param stage writes the batch's artifacts under the supplied
    *        staging root, one subtree per pair's staging-subdir.
    */
  def applyStaged(s: SparkSession, layout: String, batchId: Long,
      destSubdirs: Seq[(String, String)], stage: String => Unit): Boolean = {
    if (batchId <= committed(s, layout)) return false
    val t = tag(batchId)
    // every dest subtree lives under the layout root, so ONE recursive
    // walk scrubs this batch's tagged files at ANY partition depth —
    // the pre-r17 spelling ran three glob tree-walks per dest subtree
    // and was still blind past two partitionBy levels (its own caveat)
    Fs.deleteTagged(s, layout, t)
    val staged = stagingDir(layout, batchId)
    Fs.deleteRecursive(s, staged)
    stage(staged)
    destSubdirs.foreach { case (stageSub, destSub) =>
      val dest = if (destSub.isEmpty) layout else s"$layout/$destSub"
      Fs.publishParquet(s, s"$staged/$stageSub", dest, t)
    }
    Fs.writeUtf8Atomic(s, pointerPath(layout), batchId.toString)
    Fs.deleteRecursive(s, staged)
    true
  }
}
