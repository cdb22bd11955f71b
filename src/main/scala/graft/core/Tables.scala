package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries take a scale-factor directory and read parquet directly so
  * Catalyst sees the file scan (predicate pushdown / column pruning reach
  * the parquet reader). At cluster scale the same call works on any
  * Hadoop-compatible path.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, path): re-resolving parquet footers/schema
  // for every query added ~0.3 s fixed overhead × 49 queries in Bench.
  // Plain logical-plan reuse, NOT .cache() — no CacheManager involvement,
  // so input_file_name() and fresh-read semantics are unaffected.
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    memo.getOrElseUpdate((spark, s"$dir/$name.parquet"), {
      // The generator writes NAIVE timestamp[us] columns (no UTC flag),
      // which Spark 4 infers as TIMESTAMP_NTZ by default — a type
      // unix_micros/window functions reject. Read them as TIMESTAMP
      // (LTZ): with the UTC session zone both spellings denote the
      // same instant, and it matches DuckDB's naive-as-wall-clock
      // oracle semantics. Set lazily so ad-hoc sessions work;
      // memoization means this runs once per (session, table). Only
      // when truly UNSET: a caller who explicitly configured the conf
      // (either value) keeps their choice — the framework must not
      // silently override user intent as a read side effect.
      if (spark.conf.getOption("spark.sql.parquet.inferTimestampNTZ.enabled").isEmpty)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      spark.read.parquet(s"$dir/$name.parquet")
    })

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as raw nanos and convert. Integer `div`
    * (not `/`) — the long→double round-trip loses ~256ns of precision
    * at 2024-era epochs, enough to shift a microsecond.
    */
  def events(s: SparkSession, d: String): DataFrame =
    memo.getOrElseUpdate((s, s"$d/events.parquet#converted"), {
      // session setup normally sets this (Verify/Bench/specs); guard for
      // ad-hoc sessions without mutating config on every call
      if (s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
          .forall(_ != "true"))
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = table(s, d, "events")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
        case _ => raw
      }
    })
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** A named set of queries plus (optionally) DuckDB oracle SQL per query.
  * SparkEntry aggregates the packs; keys must be globally unique.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}

/** Cross-engine deterministic rounding.
  *
  * Spark's round(double) rounds the exact binary expansion
  * (BigDecimal HALF_UP); DuckDB's multiplies by 10^s first, which can
  * round UP at decimal half-points (e.g. 353/400*0.5+0.5 = 0.94125 →
  * 0.9413 in DuckDB, 0.9412 in Spark). Snapping to DECIMAL(28,10)
  * before the visible rounding makes both engines agree: the
  * double→decimal conversion lands on the same 10-decimal value in
  * both, and decimal rounding is exact HALF_UP everywhere.
  * Use `dround`/`sqlDround` for every rounded ratio in query outputs.
  */
object Exact {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.round
  import org.apache.spark.sql.types.DecimalType

  def dround(c: Column, s: Int): Column =
    round(c.cast(DecimalType(28, 10)), s).cast("double")

  def sqlDround(e: String, s: Int): String =
    s"CAST(ROUND(CAST(($e) AS DECIMAL(28,10)), $s) AS DOUBLE)"
}

/** Contracts between oracle SQL and the test-data generator. */
object OracleGen {
  /** DuckDB's `generate_series` rejects lateral column bounds, so
    * every oracle that enumerates per-character or per-token positions
    * ranges over a FIXED series of this length guarded by
    * `WHERE i <= len(...)`. That makes the bound a silent contract
    * with the data generator: a document LONGER than this would have
    * its tail positions skipped by the oracle while the Spark side
    * tiles the full array — a hash divergence with no error anywhere.
    * The driver's corpus stays far below it (measured max 577 chars /
    * 100 tokens across sf0.001–0.1); OracleBoundSpec asserts the bound
    * against the fixtures so a regenerated corpus that breaks it fails
    * loudly in CI instead of silently diverging on long documents.
    */
  val MaxDocSeries = 4096
}
