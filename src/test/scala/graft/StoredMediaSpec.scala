package graft

import graft.operators.Alignment
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.Exchange

/** Stored-media corpus: the decode-only path over a persisted binary
  * column must (a) produce byte-identical results to the oracle-checked
  * in-plan q99/q100 spellings, and (b) actually be a parquet
  * binary-column scan feeding the codecs — no in-plan hex, no
  * exchanges. This is the proof that MediaBench's decode-only numbers
  * price the same decoder the oracle checks.
  */
class StoredMediaSpec extends SparkTestBase {

  private lazy val corpus: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-media").toString
    Alignment.writeMediaCorpus(spark, sfDir, d)
    d
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("stored PNG resize is byte-identical to in-plan q99") {
    assert(rows(Alignment.storedResize(spark, corpus)) ==
      rows(Alignment.q99ImageResize(spark, sfDir)))
  }

  test("stored AVI decode is byte-identical to in-plan q100") {
    assert(rows(Alignment.storedVideoDecode(spark, corpus)) ==
      rows(Alignment.q100VideoDecode(spark, sfDir)))
  }

  test("stored decode is a parquet binary scan, zero exchanges") {
    for (df <- Seq(Alignment.storedResize(spark, corpus),
        Alignment.storedVideoDecode(spark, corpus))) {
      val plan = df.queryExecution.executedPlan
      // the scan must read the stored bytes column (decode input comes
      // from parquet, not from any in-plan builder) ...
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "expected a parquet file scan")
      assert(scans.forall(_.requiredSchema.fieldNames.contains("bytes")),
        s"scan must read the binary column: ${scans.map(_.requiredSchema)}")
      // ... and the whole plan must stay narrow
      assert(plan.collect { case e: Exchange => e }.isEmpty,
        "decode-only plan must have zero exchanges")
    }
  }

  test("corpus truncation family survives storage: every 97th invalid") {
    import org.apache.spark.sql.functions.col
    val v = Alignment.storedVideoDecode(spark, corpus)
    val bad = v.filter(!col("valid")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(bad.nonEmpty && bad.forall(_ % 97 == 0))
  }
}
