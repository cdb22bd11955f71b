package graft.core

import org.apache.hadoop.fs.Path
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
}
