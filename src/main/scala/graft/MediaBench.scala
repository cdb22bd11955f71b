package graft

import org.apache.spark.sql.SparkSession

/** Decode-only media benchmark over a STORED binary corpus.
  *
  * The oracle-checked q99/q100 build their payloads in-plan (per-row
  * PNG/JPEG encodes + AVI container assembly) so DuckDB can replicate
  * them from a closed form — which means their bench numbers price the
  * fixture builder together with the decoder. A real 100 TB media
  * corpus stores the bytes; the scan-side cost is decode only. This
  * main makes that number first-class:
  *
  *   1. setup (untimed): [[graft.operators.Alignment.writeMediaCorpus]]
  *      writes `(doc_id, bytes)` parquet for the PNG and AVI families
  *      into a scratch dir;
  *   2. measured: min-of-REPS over the decode-only queries
  *      ([[graft.operators.Alignment.storedResize]] /
  *      [[graft.operators.Alignment.storedVideoDecode]]), plus the
  *      in-plan q99/q100 on the same session for the encode+decode
  *      baseline, all through Bench.runScoped (noop sink, cache-scoped);
  *   3. prints ONE JSON line with both sets so the encode share is
  *      readable directly from the artifact.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32),
  * SPARK_GRAFT_REPS (3), SPARK_GRAFT_MEDIA_OUT (default
  * target/media_corpus).
  */
object MediaBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val out = sys.env.getOrElse("SPARK_GRAFT_MEDIA_OUT", "target/media_corpus")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.Alignment
    Alignment.writeMediaCorpus(spark, sfDir, out) // setup, untimed

    val queries: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "stored_png_resize" -> (() => Alignment.storedResize(spark, out)),
      "stored_avi_decode" -> (() => Alignment.storedVideoDecode(spark, out)),
      "inplan_q99_resize" -> (() => Alignment.q99ImageResize(spark, sfDir)),
      "inplan_q100_video" -> (() => Alignment.q100VideoDecode(spark, sfDir)))

    queries.foreach { case (_, fn) => Bench.runScoped(spark, fn()) } // warmup
    val loadBefore = Bench.loadAvg()
    val timed = queries.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        Bench.runScoped(spark, fn())
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val host = Bench.hostJson(loadBefore, Bench.loadAvg(),
      Runtime.getRuntime.availableProcessors)
    def r4(x: Double) =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(x))
    val qs = timed.map { case (n, t) => s""""$n":${r4(t)}""" }.mkString(",")
    println(s"""{"metric":"media_decode_only","unit":"sec","sf":"$sfDir",""" +
      s""""reps":$reps,"queries":{$qs},"host":$host}""")
    spark.stop()
  }
}
