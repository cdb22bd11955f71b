package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  */
object SkewJoin {

  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, nSalts: Int): DataFrame = {
    // deterministic spread: hash ALL probe columns so equal keys from
    // different rows still scatter (a random salt would break retry
    // determinism; hashing only the key would not spread at all)
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.toIndexedSeq.map(col): _*), lit(nSalts)))
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
    */
  def saltedJoinHot(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, hotKeys: Seq[Long], nSalts: Int): DataFrame = {
    val salted = probe.withColumn("__salt",
      when(col(probeKey).isin(hotKeys: _*),
        pmod(xxhash64(probe.columns.toIndexedSeq.map(col): _*), lit(nSalts)))
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
}
