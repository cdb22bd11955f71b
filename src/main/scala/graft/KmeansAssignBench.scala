package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** kmeansAssign hot-kernel audit (driver-side measurement main, like
  * SkewBench): the round-14 verdict flagged the shared assignment's
  * `array_min(transform(cents, ...))` as a POSSIBLE interpreted-lambda
  * pitfall — it feeds every dense ANN leg (q101→q193) — and asked for
  * a decade measurement before any rewrite.
  *
  * Two spellings of one Lloyd assignment pass over the embeddings
  * table, each materialized to the same Σ best-d2 checksum:
  *
  *  A. `assign`       — the production kernel
  *     ([[graft.operators.Similarity.kmeansAssign]]): the k centroids
  *     ride ONE broadcast packed row, argmin = the codegen'd
  *     NearestCentroidExpr (k tight primitive loops per row). The
  *     round-14 spelling here was `array_min(transform(...))`, whose
  *     lambda evaluated interpreted per candidate — THIS main measured
  *     it 5.5–6.4× slower than spelling B (gsf1: 1.11 s, gsf10:
  *     1.58 s per pass), which is what got the kernel promoted.
  *  B. `literal_least` — the ceiling: centroids collect to the driver
  *     (k rows — bounded), each candidate is a literal-embedded
  *     struct(d2, cl) column, argmin = `least(...)`. Fastest possible
  *     (everything whole-stage-generated, zero indirection) but only
  *     expressible when k is a compile-time literal list; the
  *     production kernel keeps the broadcast-packed form that scales
  *     past literal-embedding limits and now sits within ~1.6–2.1× of
  *     this ceiling (gsf10: 0.45 s vs 0.28 s), down from 6.4×.
  *
  * Both must produce the IDENTICAL checksum (same d2 rule, same tie
  * order) — that equality is the bit-parity proof for the promotion.
  *
  * Env: SPARK_GRAFT_SF_DIR (default /tmp/gsf/gsf10), SPARK_GRAFT_CPUS
  * (32), SPARK_GRAFT_REPS (5). Prints one JSON line.
  */
object KmeansAssignBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/gsf/gsf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.functions.geo.dot_product

    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").localCheckpoint(false)
    val n = emb.count()
    def vec(c: Column): Column = transform(c, _.cast("double"))
    val cent0 = emb.filter($"vec_id".between(1L, 8L))
      .select($"vec_id".as("cl"), vec($"embedding").as("cvec"))

    // A: the production kernel, forced through its d2 column
    def assignSum(): Double =
      graft.operators.Similarity.kmeansAssign(emb, cent0)
        .agg(sum($"d2")).head().getDouble(0)

    // B: literal-embedded candidates + least() — zero lambdas
    val cents: Seq[(Long, Seq[Double])] = cent0
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    def codegenSum(): Double = {
      val v = vec($"embedding")
      val cands: Seq[Column] = cents.map { case (cl, c) =>
        val cc = c.map(x => x * x).sum
        struct(
          (dot_product(v, typedLit(c)) * lit(-2.0)
            + dot_product(v, v) + lit(cc)).as("d2"),
          lit(cl).as("cl"))
      }
      emb.select(least(cands: _*).as("best"))
        .agg(sum($"best.d2")).head().getDouble(0)
    }

    def timedMin(f: () => Double): (Double, Double) = {
      f() // warmup (codegen compile + JIT)
      var best = Double.MaxValue; var last = 0.0
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime(); last = f()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, last)
    }
    val (tA, sumA) = timedMin(assignSum _)
    val (tB, sumB) = timedMin(codegenSum _)
    require(math.abs(sumA - sumB) <= math.abs(sumA) * 1e-12,
      s"checksum mismatch: assign=$sumA literal_least=$sumB — tie/d2 rule drift")
    def r4(x: Double) =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(x))
    println(s"""{"metric":"kmeans_assign_audit","unit":"sec","sf":"$sfDir",""" +
      s""""rows":$n,"reps":$reps,"assign_sec":${r4(tA)},""" +
      s""""literal_least_sec":${r4(tB)},"ratio":${r4(tA / tB)},""" +
      s""""checksum":${r4(sumA)}}""")
    spark.stop()
  }
}
