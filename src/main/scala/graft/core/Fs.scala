package graft.core

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-FileSystem path helpers for the serving layouts' sidecar
  * directories (`_tombstones`, `_stats`). `java.io.File` only
  * understands local paths — against an hdfs:// or s3a:// index root
  * it silently reports "absent", which for a tombstone check means
  * deleted rows get served as live. Resolving through the path's own
  * FileSystem makes the check scheme-correct everywhere Spark can
  * read (the same discipline as [[graft.sources.AvroSink]] /
  * [[graft.sources.Compaction]]).
  */
/** A Hadoop Configuration that survives task serialization — the
  * standard wrapper (write/readFields through Java serialization) for
  * shipping the SESSION'S conf to executor-side FileSystem.get calls:
  * a bare `new Configuration()` on an executor loses every session
  * setting (s3a credentials, endpoint overrides), and Spark's own
  * SerializableConfiguration is private[spark].
  */
class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

object Fs {
  /** True iff `path` exists on its OWN filesystem (file:, hdfs:,
    * s3a:, ... — whatever the URI scheme resolves to under the
    * session's Hadoop configuration).
    */
  def exists(s: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Recursive delete (used by build+probe oracle rows to clean up
    * their per-invocation temp layouts — a bench runs each query 3+
    * times per round and must not leak a corpus-sized index per rep).
    */
  def deleteRecursive(s: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Whole-file UTF-8 read — the commit-pointer sidecars
    * (`_INGEST_COMMIT`, CDC `VERSION`) are a few bytes; routing them
    * through the path's own FileSystem is what makes the replay guard
    * scheme-correct. `java.nio.file.Files` against an hdfs:// or
    * s3a:// root silently reports "absent", so the guard never fires
    * and a replayed micro-batch double-applies — the exact failure the
    * pointer exists to prevent.
    */
  def readUtf8(s: SparkSession, path: String): String = {
    val p = new Path(path)
    val in = p.getFileSystem(s.sparkContext.hadoopConfiguration).open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Write `content` to `path` via write-tmp + overwrite-rename
    * through [[FileContext]], whose `Rename.OVERWRITE` is the
    * documented atomic pointer swap on HDFS (and a posix rename on
    * file:). CAVEAT, stated not hidden: on object stores without
    * atomic rename (plain s3a://) the swap is copy+delete — a reader
    * can observe a missing pointer for an instant, which the
    * ingest protocols tolerate (missing pointer reads as "nothing
    * committed", and every batch apply is scrub-first idempotent), but
    * deployments wanting a hard guarantee should put the pointer on a
    * rename-atomic store (HDFS, S3+directory-bucket, abfs).
    */
  def writeUtf8Atomic(s: SparkSession, path: String, content: String): Unit = {
    val p = new Path(path)
    val tmp = new Path(path + ".tmp")
    val conf = s.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    FileContext.getFileContext(p.toUri, conf)
      .rename(tmp, p, Options.Rename.OVERWRITE)
  }

  /** Recursive file walk via plain `listStatus` — NEVER
    * `fs.listFiles(recursive)`: that returns LocatedFileStatus, whose
    * construction forces permission/block-location loading, and on the
    * local FileSystem without Hadoop native libs each permission load
    * FORKS a shell process — measured ~9 ms per file, turning a
    * 110-file staged-tree listing into ~1 s of driver dead time per
    * micro-batch (r17 profile). A listStatus walk touches none of
    * that on any scheme and stays one-RPC-per-directory on HDFS.
    */
  private def walkFiles(fs: org.apache.hadoop.fs.FileSystem,
      root: Path)(f: Path => Unit): Unit = {
    val stack = scala.collection.mutable.Stack(root)
    while (stack.nonEmpty) {
      val dir = stack.pop()
      fs.listStatus(dir).foreach { st =>
        if (st.isDirectory) stack.push(st.getPath) else f(st.getPath)
      }
    }
  }

  /** All data files under `root`, recursively, as (relative-dir,
    * path) sorted by relative path — a DETERMINISTIC enumeration, so
    * a publish retry assigns each staged file the same published name.
    * Spark bookkeeping files (`_SUCCESS`, `.crc`, anything not
    * `.parquet`) are skipped.
    */
  def listParquet(s: SparkSession, root: String): Seq[(String, Path)] = {
    val rp = new Path(root)
    val fs = rp.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(rp)) return Seq.empty
    val buf = Seq.newBuilder[(String, Path)]
    val rootUri = fs.makeQualified(rp).toUri
    walkFiles(fs, rp) { f =>
      if (f.getName.endsWith(".parquet")) {
        val rel = rootUri.relativize(fs.makeQualified(f).toUri).getPath
        val relDir = rel.lastIndexOf('/') match {
          case -1 => ""
          case i  => rel.substring(0, i)
        }
        buf += ((relDir, f))
      }
    }
    buf.result().sortBy { case (d, p) => (d, p.getName) }
  }

  /** PUBLISH a staged parquet tree into a live layout: every
    * `.parquet` file under `stagedRoot` renames to
    * `destRoot/<same-relative-dir>/<tag>-<k>.parquet` (k = the file's
    * index in the deterministic [[listParquet]] order). Relative dirs
    * are preserved, so a `partitionBy` staging tree lands under the
    * live layout's matching partition dirs. Renames are per-file (a
    * crash mid-publish leaves a prefix published) — callers get
    * exactly-once END STATE by scrubbing `<tag>-*` files via the
    * [[graft.streaming.IngestCommit]] scrub before retrying.
    *
    * Metadata-op shape (r17, guide §1.2 per-task work applied to the
    * driver): one `mkdirs` per DISTINCT destination dir (idempotent —
    * no exists pre-check), rename-first per file with a delete+retry
    * fallback only on failure (the scrub already removed this tag's
    * files, so the fallback never fires on the happy path), and the
    * renames run on a bounded worker pool — they are independent
    * metadata moves, and a publish of hundreds of bucket files was
    * serializing hundreds of round-trips (measured 1.4–1.8 s
    * driver-side gaps per q203 micro-batch at sf0.1; on an object
    * store, where rename is copy+delete, the serial form is strictly
    * worse). Determinism of published NAMES is unchanged: k is
    * assigned from the sorted listing before any rename runs.
    */
  def publishParquet(s: SparkSession, stagedRoot: String, destRoot: String,
      tag: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val fs = new Path(destRoot).getFileSystem(conf)
    val files = listParquet(s, stagedRoot).zipWithIndex
    // dir creation: one call per DISTINCT destination dir; on the
    // file: scheme go through java.nio — Hadoop's local mkdirs forks a
    // shell per created dir for the permission set (~4 ms each, 0.4 s
    // per 110-dir publish measured); remote schemes keep fs.mkdirs
    val localFs = fs.getScheme == "file"
    files.map(_._1._1).distinct.foreach { relDir =>
      val destDir =
        if (relDir.isEmpty) new Path(destRoot)
        else new Path(destRoot, relDir)
      if (localFs)
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(fs.makeQualified(destDir).toUri.getPath))
      else fs.mkdirs(destDir)
    }
    val par = math.min(16, Runtime.getRuntime.availableProcessors).max(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    try {
      val tasks = files.map { case ((relDir, src), k) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            val destDir =
              if (relDir.isEmpty) new Path(destRoot)
              else new Path(destRoot, relDir)
            val dest = new Path(destDir, s"$tag-$k.parquet")
            if (!fs.rename(src, dest)) {
              // a half-published prior attempt the scrub missed (e.g.
              // a non-atomic store listing lag): clear and retry once
              if (fs.exists(dest)) fs.delete(dest, false)
              if (!fs.rename(src, dest))
                throw new java.io.IOException(s"rename $src -> $dest failed")
            }
          }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
  }

  /** Delete every published file named `<tag>-*.parquet` anywhere
    * under `root` — ONE recursive listing instead of a glob walk per
    * partition depth (the pre-r17 scrub ran three `globStatus` tree
    * walks per destination subtree and still only covered two
    * `partitionBy` levels; this covers any depth in a single walk).
    */
  def deleteTagged(s: SparkSession, root: String, tag: String): Unit = {
    val rp = new Path(root)
    val fs = rp.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(rp)) return
    val prefix = tag + "-"
    walkFiles(fs, rp) { f =>
      if (f.getName.startsWith(prefix) && f.getName.endsWith(".parquet")) {
        fs.delete(f, false); ()
      }
    }
  }
}
