package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Salted-vs-plain skew-join comparator (driver-side measurement main,
  * like Bench/MediaBench): the decade evidence behind q127.
  *
  * Two measured cases, each timed as min-of-reps wall plus the MAX TASK
  * duration of the run (the tail-task bound that skew actually moves —
  * wall on a 32-core box can hide a pinned task behind spare cores;
  * at 1000 executors the pinned task IS the wall):
  *
  *  1. `gsf` — q127's brand rollup over the generated zipf-ish
  *     lineitem ⨝ part, plain vs salted. The gsf skew is RELATIVE
  *     (max/mean ~1400× at gsf10) but the hot key owns only ~0.07% of
  *     rows — far below one task's row budget — so the expected
  *     finding is parity: a census-flagged key is not automatically a
  *     salting case; the decision input is hot-key rows vs
  *     rows-per-task, exactly what q121 emits.
  *  2. `hot` — the pathological shape salting exists for: one key owns
  *     30% of the probe table (the null-key / default-value
  *     pathology). Plain (AQE on and off) vs salted. AQE's skew-join
  *     split bounds the SCAN+JOIN side for sort-merge joins, so the
  *     interesting split is: AQE-on plain vs salted when the join
  *     output must then AGGREGATE by the same key — the hash
  *     aggregation after the join re-concentrates the hot key on one
  *     reducer unless the pre-aggregation runs on the salted keys.
  *
  * Env: SPARK_GRAFT_SF_DIR (gsf dir), SKEW_N (hot-case probe rows,
  * default 20M), SPARK_GRAFT_REPS (default 3).
  * Prints one JSON line per case.
  */
object SkewBench {

  /** max task duration (ms) accumulated since the last reset. */
  private final class TailListener extends SparkListener {
    @volatile var maxTaskMs: Long = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val d = t.taskInfo.duration
      if (d > maxTaskMs) maxTaskMs = d
    }
    def reset(): Unit = maxTaskMs = 0L
  }

  private def timed(l: TailListener, reps: Int)(f: => Unit): (Double, Long) = {
    var bestWall = Double.MaxValue
    var tailOfBest = 0L
    (1 to reps).foreach { _ =>
      l.reset()
      val t0 = System.nanoTime()
      f
      val w = (System.nanoTime() - t0) / 1e9
      if (w < bestWall) { bestWall = w; tailOfBest = l.maxTaskMs }
    }
    (bestWall, tailOfBest)
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/gsf/gsf0.1")
    val n = sys.env.getOrElse("SKEW_N", "20000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val listener = new TailListener
    spark.sparkContext.addSparkListener(listener)

    def conf(k: String, v: String): Unit = spark.conf.set(k, v)
    // isolate shuffle-join behavior: the dim must not broadcast, or
    // both spellings degenerate to the same broadcast plan
    conf("spark.sql.autoBroadcastJoinThreshold", "-1")

    // ---- case 1: gsf lineitem ⨝ part (q127's rollup) -------------------
    val li = graft.core.Tables.lineitem(spark, dir)
    val dim = graft.core.Tables.part(spark, dir)
      .select($"p_partkey", $"p_brand")
    def rollup(joined: DataFrame): Unit = {
      joined.groupBy($"p_brand")
        .agg(count(lit(1)).as("n"), sum($"l_quantity".cast("long")).as("q"))
        .collect(); ()
    }
    conf("spark.sql.adaptive.enabled", "true")
    val (gPlainW, gPlainT) = timed(listener, reps) {
      rollup(li.join(dim, $"l_partkey" === $"p_partkey"))
    }
    val (gSaltW, gSaltT) = timed(listener, reps) {
      rollup(graft.operators.SkewJoin.saltedJoin(
        li, dim, "l_partkey", "p_partkey", nSalts = 8))
    }
    println(s"""{"case":"gsf","dir":"$dir","plain_sec":$gPlainW,""" +
      s""""plain_max_task_ms":$gPlainT,"salted_sec":$gSaltW,""" +
      s""""salted_max_task_ms":$gSaltT}""")

    // ---- case 2: pathological 30% hot key ------------------------------
    // deterministic synthetic: key 0 owns 30% of the probe; the rest
    // spread uniformly over 1M keys; dim = the 1M-key table
    val nKeys = 1000000L
    val probe = spark.range(n).select(
      when(pmod($"id", lit(10)) < 3, lit(0L))
        .otherwise(pmod(xxhash64($"id"), lit(nKeys))).as("k"),
      ($"id" % 97).as("v"))
    val hotDim = spark.range(nKeys).select($"id".as("dk"),
      concat(lit("g"), pmod($"id", lit(25))).as("grp"))
    def hotRollup(joined: DataFrame): Unit = {
      joined.groupBy($"grp")
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
        .collect(); ()
    }
    sealed trait Mode
    case object Plain extends Mode
    case object FullSalt extends Mode
    case object HotSalt extends Mode
    // AQE's OptimizeSkewedJoin is gated on the COMPRESSED size of the
    // skewed shuffle partition (default threshold 256MB): this hot
    // partition's small-int payload compresses below it, so default
    // AQE never marks the join skewed (verified: no `skew=true` in the
    // executed plan). "Tuned" drops the threshold to 64MB, where the
    // split fires — measuring both separates "AQE can't" from "AQE
    // won't until tuned".
    def tune(on: Boolean): Unit = {
      conf("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        if (on) "64MB" else "256MB")
      conf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    }
    def runHot(aqe: Boolean, tuned: Boolean, mode: Mode): (Double, Long) = {
      conf("spark.sql.adaptive.enabled", aqe.toString)
      tune(tuned)
      timed(listener, reps) {
        mode match {
          case Plain => hotRollup(probe.join(hotDim, $"k" === $"dk"))
          case FullSalt => hotRollup(graft.operators.SkewJoin.saltedJoin(
            probe, hotDim, "k", "dk", nSalts = 32))
          case HotSalt => hotRollup(graft.operators.SkewJoin.saltedJoinHot(
            probe, hotDim, "k", "dk", hotKeys = Seq(0L), nSalts = 32))
        }
      }
    }
    val (pNoAqeW, pNoAqeT) = runHot(aqe = false, tuned = false, Plain)
    val (pAqeW, pAqeT) = runHot(aqe = true, tuned = false, Plain)
    val (pTunW, pTunT) = runHot(aqe = true, tuned = true, Plain)
    val (fW, fT) = runHot(aqe = true, tuned = false, FullSalt)
    val (hW, hT) = runHot(aqe = true, tuned = false, HotSalt)
    println(s"""{"case":"hot30pct","n":$n,""" +
      s""""plain_noaqe_sec":$pNoAqeW,"plain_noaqe_max_task_ms":$pNoAqeT,""" +
      s""""plain_aqe_sec":$pAqeW,"plain_aqe_max_task_ms":$pAqeT,""" +
      s""""plain_aqe_tuned_sec":$pTunW,"plain_aqe_tuned_max_task_ms":$pTunT,""" +
      s""""fullsalt_aqe_sec":$fW,"fullsalt_aqe_max_task_ms":$fT,""" +
      s""""hotsalt_aqe_sec":$hW,"hotsalt_aqe_max_task_ms":$hT}""")

    // ---- case 3: JOIN-ONLY (no downstream aggregation) ----------------
    // control: the same join feeding a noop sink, default vs tuned
    // AQE vs salted — isolates the join stage from the rollup
    def joinOnly(aqe: Boolean, tuned: Boolean,
        salted: Boolean): (Double, Long) = {
      conf("spark.sql.adaptive.enabled", aqe.toString)
      tune(tuned)
      timed(listener, reps) {
        val j = if (salted)
          graft.operators.SkewJoin.saltedJoinHot(
            probe, hotDim, "k", "dk", hotKeys = Seq(0L), nSalts = 32)
        else probe.join(hotDim, $"k" === $"dk")
        j.write.format("noop").mode("overwrite").save()
      }
    }
    val (joNo, joNoT) = joinOnly(aqe = false, tuned = false, salted = false)
    val (joAqe, joAqeT) = joinOnly(aqe = true, tuned = false, salted = false)
    val (joTun, joTunT) = joinOnly(aqe = true, tuned = true, salted = false)
    val (joSalt, joSaltT) = joinOnly(aqe = true, tuned = false, salted = true)
    println(s"""{"case":"hot30pct_joinonly","n":$n,""" +
      s""""plain_noaqe_sec":$joNo,"plain_noaqe_max_task_ms":$joNoT,""" +
      s""""plain_aqe_sec":$joAqe,"plain_aqe_max_task_ms":$joAqeT,""" +
      s""""plain_aqe_tuned_sec":$joTun,"plain_aqe_tuned_max_task_ms":$joTunT,""" +
      s""""hotsalt_aqe_sec":$joSalt,"hotsalt_aqe_max_task_ms":$joSaltT}""")
    spark.stop()
  }
}
