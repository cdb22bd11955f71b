package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.QueryPack

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-domain packs (graft.operators.*); keys
  * are globally unique and each oracle-checkable query carries equivalent
  * DuckDB SQL in `oracleSql`.
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    graft.operators.Relational,
    graft.operators.GeoQueries,
    graft.operators.TextAnalysis,
    graft.operators.Dedup,
    graft.operators.Similarity,
    graft.operators.Anomaly,
    graft.operators.Alignment,
    graft.operators.Pipeline,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
