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

  test("per-user event counts stay under the q124 oracle series bound " +
    "(path-mining trigram enumeration)") {
    // q124's oracle enumerates trigram positions i = 1..MaxDocSeries
    // with i <= len(seq) - 2, so a user with more than MaxDocSeries + 2
    // events would have tail trigrams silently skipped by the oracle
    // while the Spark side's transform() tiles the full sequence.
    // Unlike document length, per-user event count is a RANDOM marginal
    // of the generator (mean ~67 at sf0.1), not a capped one — this
    // assertion is the loud failure a regenerated corpus hits first.
    val mu = Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx")).head().getAs[Long]("mx")
    assert(mu <= OracleGen.MaxDocSeries - 2,
      s"max per-user event count $mu exceeds the q124 oracle trigram " +
        s"bound (MaxDocSeries - 2 = ${OracleGen.MaxDocSeries - 2}) — " +
        "the DuckDB oracle would silently truncate that user's paths")
  }

  test("lineitem quantities are integral (q144's exact below-average " +
    "predicate depends on it)") {
    // q144 evaluates qty < avg/5 as the integer comparison
    // 5·q·cnt < Σq — exact only because quantities are whole numbers.
    // A regenerated corpus with fractional quantities must fail HERE,
    // not as a silent boundary drift between Spark and DuckDB.
    val frac = Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") =!= round(col("l_quantity")))
      .count()
    assert(frac == 0L,
      s"$frac lineitem rows have fractional l_quantity — q144's exact " +
        "integer predicate no longer matches the SQL average semantics")
  }
}
