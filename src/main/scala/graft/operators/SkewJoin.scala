package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Salted equi-join for skewed keys (builder checklist: "salting for
  * skew"; complements AQE's runtime skew-join split, which only
  * triggers on sort-merge joins past size thresholds).
  *
  * The build side replicates each row `nSalts` times; the probe side
  * assigns each row one deterministic pseudo-random salt, so a hot key
  * spreads over `nSalts` shuffle partitions instead of hot-spotting
  * one reducer. Result set is provably identical to the plain join:
  * every probe row meets exactly one replica of each matching build
  * row.
  *
  * Salt derivation contract (both variants): the probe salt is
  * `xxhash64` over every HASHABLE probe column — deterministic, so a
  * task retry recomputes the identical salt (a random salt would
  * reshuffle rows on retry and corrupt exactly-once sinks). Two
  * consequences, both documented rather than papered over:
  *   - map-typed columns are EXCLUDED from the hash (`xxhash64` fails
  *     at analysis on MapType — maps have no canonical element order);
  *     everything else, including nested structs/arrays, participates;
  *   - rows that are FULLY identical (every hashable column equal)
  *     hash to the same salt and therefore do NOT spread. That
  *     degenerate corpus (a hot key whose rows are exact duplicates)
  *     needs a disambiguator column upstream — and any retry-safe one
  *     (a file offset, an event id) restores full spread;
  *     `monotonically_increasing_id` is NOT retry-safe and must not be
  *     used here.
  */
object SkewJoin {

  /** Probe columns that can legally feed `xxhash64`: everything except
    * types containing a map (no canonical order ⇒ Spark rejects them
    * at analysis). Falls back to the join key alone if a pathological
    * schema leaves nothing (then duplicates of one key share a salt —
    * the documented degenerate case, never an analysis error).
    */
  private def hashableCols(df: DataFrame, keyCol: String): Seq[Column] = {
    def hasMap(t: DataType): Boolean = t match {
      case _: MapType          => true
      case ArrayType(et, _)    => hasMap(et)
      case StructType(fields)  => fields.exists(f => hasMap(f.dataType))
      case _                   => false
    }
    val cs = df.schema.fields.filterNot(f => hasMap(f.dataType))
      .map(f => col(f.name)).toIndexedSeq
    if (cs.nonEmpty) cs else IndexedSeq(col(keyCol))
  }

  /** What the probe salt hashes: the caller-named disambiguator
    * columns when given (name the table's NATURAL UNIQUE KEY — e.g.
    * lineitem's (l_orderkey, l_linenumber): full spread, and the hash
    * touches two narrow longs instead of every column of every probe
    * row — measured ~2s/60M rows saved at gsf10), else every hashable
    * column (generic, but pays a whole-row hash and cannot spread
    * fully-duplicate rows).
    */
  private def saltOf(probe: DataFrame, probeKey: String,
      saltCols: Seq[String], nSalts: Int): Column = {
    val cs = if (saltCols.nonEmpty) saltCols.map(col)
             else hashableCols(probe, probeKey)
    pmod(xxhash64(cs: _*), lit(nSalts))
  }

  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, nSalts: Int,
      saltCols: Seq[String] = Nil): DataFrame = {
    // deterministic spread: hash the disambiguator (or all hashable)
    // probe columns so equal keys from different rows still scatter (a
    // random salt would break retry determinism; hashing only the key
    // would not spread at all)
    val salted = probe.withColumn("__salt",
      saltOf(probe, probeKey, saltCols, nSalts))
    val replicated = build
      .withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted.join(replicated,
        salted(probeKey) === replicated(buildKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Partial (hot-key-only) salting — the production cure for the
    * null-key / default-value pathology, fed by EXACTLY what
    * [[graft.operators.Relational.q121SkewCensus]] emits: the handful
    * of keys whose row count dwarfs a task's row budget.
    *
    * [[saltedJoin]] replicates the WHOLE build side nSalts×, which is
    * right when the build is a small dim but becomes a bottleneck of
    * its own when the build is large (replication volume rivals the
    * skew it cures — measured in SkewBench on a 1M-row dim). Here the
    * salt is CONDITIONAL, in one pass over each side: hot probe rows
    * scatter over nSalts salts, cold rows take salt 0 (their shuffle
    * distribution is unchanged — hash(key, 0) is as uniform as
    * hash(key)); the build replicates ONLY its |hotKeys| rows nSalts×
    * and everything else 1×. One join, no second probe scan, no
    * union; total shuffle volume ≈ the plain join's, minus its tail.
    *
    * An EMPTY hot-key list degrades to the plain join (no salt columns
    * at all) — the census said there is nothing to cure, so the cure
    * must cost nothing.
    */
  def saltedJoinHot(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, hotKeys: Seq[Long], nSalts: Int,
      saltCols: Seq[String] = Nil): DataFrame = {
    if (hotKeys.isEmpty)
      return probe.join(build, probe(probeKey) === build(buildKey))
    val salted = probe.withColumn("__salt",
      when(col(probeKey).isin(hotKeys: _*),
        saltOf(probe, probeKey, saltCols, nSalts))
        .otherwise(lit(0L)))
    val replicated = build
      .withColumn("__salt", explode(
        when(col(buildKey).isin(hotKeys: _*),
          sequence(lit(0), lit(nSalts - 1)))
          .otherwise(sequence(lit(0), lit(0)))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted.join(replicated,
        salted(probeKey) === replicated(buildKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** The census→cure feed: keys whose row count exceeds `ratio`× the
    * mean per-key count, heaviest first, capped at `cap` — the
    * driver-side hot-key list [[saltedJoinHot]] consumes. The collect
    * is BOUNDED at `cap` longs (the q121 contract: a skew cure needs
    * the handful of pathological keys, never the key dictionary) —
    * the same class of driver-side statistic AQE itself gathers per
    * shuffle. The count aggregation is map-side combinable; at 100 TB
    * a pipeline runs it once per fact table per day (or reuses q121's
    * persisted census) rather than inline per join.
    */
  def hotKeys(df: DataFrame, keyCol: String, ratio: Double = 4.0,
      cap: Int = 64, sampleFraction: Double = 1.0): Seq[Long] = {
    // sampleFraction < 1 censuses a seeded Bernoulli sample — the
    // AQE-style stats pattern: per-key RATIOS are preserved in
    // expectation, so hot keys (millions of rows at 100 TB) still
    // tower over the sampled mean, at a fraction of the scan. Which
    // keys get flagged never affects the JOIN RESULT (salting is
    // result-identical for any hot set) — only how well the tail
    // spreads, so sampling noise is a performance concern, not a
    // correctness one. Measured at gsf10: 4.3s full -> 0.7s at 5%.
    val base = if (sampleFraction < 1.0)
      df.sample(withReplacement = false, sampleFraction, seed = 42L)
    else df
    val counts = base.groupBy(col(keyCol).cast("long").as("k"))
      .agg(count(lit(1)).as("cnt"))
    val mean = counts.agg((sum(col("cnt")).cast("double") /
      count(lit(1))).as("mean"))
    counts.crossJoin(broadcast(mean))
      .filter(col("cnt").cast("double") > col("mean") * ratio)
      .orderBy(col("cnt").desc, col("k").asc)
      .limit(cap)
      .select(col("k"))
      .collect().map(_.getLong(0)).toIndexedSeq
  }
}
