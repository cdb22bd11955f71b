package graft

import graft.core.{OracleGen, Tables}
import org.apache.spark.sql.functions._

/** Guards the oracle-generator contract ([[graft.core.OracleGen]]):
  * position-enumerating oracle SQL ranges over a FIXED
  * `generate_series(1, MaxDocSeries)` (DuckDB rejects lateral column
  * bounds), so any fixture document longer than the bound would have
  * its tail positions silently skipped by the oracle while the Spark
  * side tiles the full array. This spec turns that silent divergence
  * into a loud failure when the corpus is regenerated.
  */
class OracleBoundSpec extends SparkTestBase {

  test("every fixture document stays under the fixed oracle series " +
    "bound, in characters and in tokens") {
    val m = Tables.documents(spark, sfDir)
      .select(max(length(col("text"))).as("mc"),
        max(size(split(col("text"), " "))).as("mt")).head()
    assert(m.getAs[Int]("mc") <= OracleGen.MaxDocSeries,
      s"max chars ${m.getAs[Int]("mc")} exceeds OracleGen.MaxDocSeries " +
        s"(${OracleGen.MaxDocSeries}) — oracle SQL would silently skip tails")
    assert(m.getAs[Int]("mt") <= OracleGen.MaxDocSeries,
      s"max tokens ${m.getAs[Int]("mt")} exceeds OracleGen.MaxDocSeries " +
        s"(${OracleGen.MaxDocSeries}) — oracle SQL would silently skip tails")
  }
}
