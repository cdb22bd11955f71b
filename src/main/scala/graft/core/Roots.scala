package graft.core

import org.apache.spark.sql.SparkSession

/** Serving-root indirection — the atomic generation swap every
  * compaction scaladoc in this repo promises ("written to a NEW root;
  * the caller swaps serving roots atomically"), as actual code:
  * generations are immutable subdirs under one base
  * (`base/gen0`, `base/gen1`, ...), and a `_CURRENT` pointer names
  * the live one. Readers resolve the pointer per query; compaction
  * builds the next generation OFFLINE and [[publish]] flips the
  * pointer in one atomic rename ([[Fs.writeUtf8Atomic]] — scheme-
  * correct on file:/hdfs:, copy+delete caveat on plain s3a:), so
  *
  *   - a probe never observes a half-written layout (the new
  *     generation is complete before the pointer names it);
  *   - in-flight queries that resolved the OLD generation keep
  *     reading it untouched (immutable dirs — the q96 snapshot
  *     contract); old generations are retired by a separate cleanup
  *     once their readers drain, never by the swap itself.
  *
  * This is the parquet rendition of a metastore pointer swap /
  * HDFS view flip; a lakehouse deployment replaces it with a
  * transactional-table commit, same call sites.
  */
object Roots {

  private def pointer(base: String) = s"$base/_CURRENT"

  /** The live generation's FULL path (base/<gen>). */
  def current(s: SparkSession, base: String): String =
    s"$base/${currentGen(s, base)}"

  /** The live generation's name; throws if never published — readers
    * must not silently invent a generation.
    */
  def currentGen(s: SparkSession, base: String): String = {
    require(Fs.exists(s, pointer(base)),
      s"no published generation under $base")
    Fs.readUtf8(s, pointer(base)).trim
  }

  /** Atomically make `gen` (a complete, already-written subdir of
    * `base`) the live generation.
    */
  def publish(s: SparkSession, base: String, gen: String): Unit = {
    require(Fs.exists(s, s"$base/$gen"),
      s"generation $gen not written under $base — publish after the build")
    Fs.writeUtf8Atomic(s, pointer(base), gen)
  }

  /** A PINNED generation's full path — the point-in-time read: any
    * retired-but-retained generation stays probe-able (immutable dirs)
    * for audit / reproduction ("what did the index answer before the
    * swap?"); a generation deleted past retention fails loudly here
    * instead of surfacing as an empty scan.
    */
  def at(s: SparkSession, base: String, gen: String): String = {
    require(Fs.exists(s, s"$base/$gen"),
      s"generation $gen not under $base (never written, or retired past retention)")
    s"$base/$gen"
  }

  /** All generation subdirs under `base` (names matching `gen<N>`),
    * sorted by N.
    */
  def generations(s: SparkSession, base: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches("gen\\d+"))
      .map(_.getPath.getName)
      .sortBy(_.stripPrefix("gen").toLong)
  }

  /** Retire old generations: delete all but the newest `keepLatest`
    * (and NEVER the current one, whatever its age) — the cleanup half
    * of the swap contract, run once a deployment's in-flight readers
    * have drained (a retention window, a reader lease — policy the
    * caller owns; this is the mechanism). Returns the deleted names.
    */
  def retire(s: SparkSession, base: String, keepLatest: Int = 2): Seq[String] = {
    require(keepLatest >= 1, "keepLatest must be >= 1")
    val gens = generations(s, base)
    val cur = currentGen(s, base)
    val victims = gens.dropRight(keepLatest).filterNot(_ == cur)
    victims.foreach(g => Fs.deleteRecursive(s, s"$base/$g"))
    victims
  }
}
