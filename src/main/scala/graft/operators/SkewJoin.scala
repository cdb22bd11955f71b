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
}
