package graft

import graft.functions.geo.top_k_by
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TopKByAggregate: the native grouped top-k (bounded heap, mergeable)
  * vs the window+rank idiom that sorts every group.
  */
class TopKAggSpec extends SparkTestBase {

  test("matches window+rank top-3 per segment exactly") {
    val orders = graft.core.Tables.orders(spark, sfDir)
      .join(graft.core.Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))

    val viaAgg = orders.groupBy(col("c_mktsegment"))
      .agg(top_k_by(col("o_totalprice"),
        col("o_orderkey").cast("string"), 3).as("top"))
      .select(col("c_mktsegment"), explode(col("top")).as("e"))
      .select(col("c_mktsegment"), col("e.ord"), col("e.payload"))

    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").cast("string").asc)
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("o_totalprice").as("ord"),
        col("o_orderkey").cast("string").as("payload"))

    assert(viaAgg.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaAgg).count() == 0)
  }

  test("partial aggregation: plan shows two-phase hash aggregate, no sort") {
    val orders = graft.core.Tables.orders(spark, sfDir)
    val p = orders.groupBy(col("o_orderstatus"))
      .agg(top_k_by(col("o_totalprice"), col("o_orderpriority"), 5))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate partial + final = map-side combine before the
    // shuffle; the window form would show Sort + Window instead
    assert(p.contains("ObjectHashAggregate"), p.take(1500))
    assert(!p.contains("Window"), p.take(1500))
  }

  test("k larger than group, nulls, and merge determinism") {
    import spark.implicits._
    val df = Seq(
      ("a", 3.0, "x"), ("a", 1.0, "y"), ("b", 2.0, null.asInstanceOf[String]),
      ("a", 3.0, "w") // tie on ord: payload asc wins
    ).toDF("g", "o", "p").repartition(4)
    val rows = df.groupBy($"g")
      .agg(top_k_by($"o", $"p", 10).as("top"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(e => (e.getDouble(0), e.getString(1)))).toMap
    assert(rows("a") == Seq((3.0, "w"), (3.0, "x"), (1.0, "y")))
    assert(rows("b") == Seq((2.0, null)))
  }

  // --- bottom_k_distinct (KMV sketch, q103's engine) ----------------------

  test("bottom_k_distinct: dedup, ground-truth bottom-k, partition invariance") {
    import spark.implicits._
    import graft.functions.geo.bottom_k_distinct
    // heavy repetition: 5000 rows over 500 distinct values — duplicates
    // must occupy ONE slot or the retained set creeps upward
    val vals = (0 until 5000).map(i => (i % 500) * 1000003L + 17L)
    val df = vals.toDF("h")
    val got = df.agg(bottom_k_distinct($"h", 64).as("bk"))
      .head().getSeq[Long](0)
    val truth = vals.distinct.sorted.take(64)
    assert(got == truth, "sketch must be the exact bottom-64 distinct set")
    // merge path: a different physical layout yields the identical set
    val rep = df.repartition(13).agg(bottom_k_distinct($"h", 64))
      .head().getSeq[Long](0)
    assert(rep == truth)
    // under-k group keeps every distinct value (the exact-fallback case)
    val small = df.filter($"h" < 50L * 1000003L)
      .agg(bottom_k_distinct($"h", 256)).head().getSeq[Long](0)
    assert(small == vals.distinct.sorted.filter(_ < 50L * 1000003L))
  }

  test("bottom_k_distinct: KMV estimate lands inside the error band") {
    import spark.implicits._
    import graft.functions.geo.{bottom_k_distinct, md5_prefix60}
    // 10,000 distinct keys, k=256: expected rel error ~1/sqrt(254)≈6%;
    // assert a generous 4-sigma band so the test pins the estimator,
    // not the draw
    val n = 10000
    val df = (1 to n).map(_.toString).toDF("key")
      .select(md5_prefix60($"key").as("h"))
    val bk = df.agg(bottom_k_distinct($"h", 256)).head().getSeq[Long](0)
    assert(bk.length == 256)
    val est = 255.0 * 1152921504606846976.0 / bk.last.toDouble
    assert(math.abs(est - n) / n < 0.25, s"estimate $est vs $n")
  }

  test("kmv union algebra: merging two sketches equals sketching the union") {
    import spark.implicits._
    import graft.functions.geo.{bottom_k_distinct, md5_prefix60}
    import graft.operators.Relational
    // two overlapping key sets, each > k distinct
    val a = (1 to 900).map(i => ("a", s"k$i"))
    val b = (600 to 1500).map(i => ("b", s"k$i"))
    val df = (a ++ b).toDF("side", "key")
      .select($"side", md5_prefix60($"key").as("hv"))
    val sk = df.groupBy($"side").agg(bottom_k_distinct($"hv", 64).as("bk"))
      .agg(min_by($"bk", $"side").as("bka"), max_by($"bk", $"side").as("bkb"))
      .select(Relational.kmvUnion($"bka", $"bkb", 64).as("merged"))
      .head().getSeq[Long](0)
    // ground truth: the sketch built from the union's rows directly —
    // the closed-merge law that makes KMV sketches composable across
    // shards/snapshots without re-scanning
    val direct = df.agg(bottom_k_distinct($"hv", 64)).head().getSeq[Long](0)
    assert(sk == direct, "merge(sketch(A), sketch(B)) must equal sketch(A∪B)")
  }

  test("bottom_k_distinct: SQL registration and two-phase plan") {
    graft.functions.geo.register(spark)
    graft.core.Tables.orders(spark, sfDir).createOrReplaceTempView("t_orders")
    val df = spark.sql(
      """SELECT o_orderstatus,
        |  bottom_k_distinct(md5_prefix60(CAST(o_custkey AS STRING)), 8) bk
        |FROM t_orders GROUP BY 1""".stripMargin)
    assert(df.collect().forall(_.getSeq[Long](1).length == 8))
    // rides ObjectHashAggregate with map-side partials, like top_k_by
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p.take(1500))
  }

  // --- count-min sketch (q112's engine) -----------------------------------

  test("q112 count-min: one-sided error, overcount band, partition invariance") {
    import spark.implicits._
    val rows = graft.operators.TextAnalysis
      .q112CountMin(spark, sfDir).collect()
    assert(rows.length == 10)
    val n = graft.core.Tables.documents(spark, sfDir)
      .select(explode(split($"text", " ")).as("tok"))
      .filter(length($"tok") > 0).count()
    rows.foreach { r =>
      val (exact, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // CMS never undercounts: cells only gain collision mass
      assert(est >= exact, s"undercount at ${r.getString(0)}: $est < $exact")
      assert(over == est - exact)
      // min over D=4 rows keeps the collision mass well under the
      // single-cell expectation N/W; N/16 = 4x that expectation is a
      // deterministic bound on this fixed corpus + fixed hashes
      assert(over <= n / 16, s"overcount $over above band (N=$n)")
    }
    // the census is a pure function of the token bag — physical row
    // placement must not move a single count
    val shuffled = graft.operators.TextAnalysis.q112CountMin(spark, sfDir)
    assert(shuffled.collect().toSet == rows.toSet)
  }

  test("q131 HLL: error band, partition invariance, and register-merge " +
    "closure (max-merge of per-side registers = registers of the union)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Relational.q131HllDistinct(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val err = r.getAs[Double]("rel_err")
      // m=64 gives sigma = 1.04/sqrt(64) ~ 13%; the single fixed hash
      // draw makes per-group errors correlated, so the band is ~2.5
      // sigma, not the iid expectation
      assert(err < 0.35, s"${r.getString(0)}: rel_err $err out of band")
      assert(r.getAs[Double]("n_est") > 0.0)
    }
    // pure function of the key set: physical placement moves nothing
    val again = graft.operators.Relational.q131HllDistinct(spark, sfDir)
    assert(again.collect().toSet == rows.toSet)
    // merge closure on the raw registers: split orders at a date,
    // sketch each side, per-cell max-merge — must equal the union's
    // registers cell for cell (the property that makes HLL shardable
    // across a cluster and across time partitions)
    def registers(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = df
      .select($"o_custkey",
        (conv(substring(md5($"o_custkey".cast("string")), 1, 2), 16, 10)
          .cast("long") % 64L).as("j"),
        ltrim(substring(md5($"o_custkey".cast("string")), 3, 13), "0").as("st"))
      .withColumn("rho", when(length($"st") === 0, lit(53L))
        .otherwise(lit(4L) * (lit(13L) - length($"st")) +
          when(substring($"st", 1, 1) >= "8", 0L)
            .when(substring($"st", 1, 1) >= "4", 1L)
            .when(substring($"st", 1, 1) >= "2", 2L).otherwise(3L) + lit(1L)))
      .groupBy($"j").agg(max($"rho").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val orders = graft.core.Tables.orders(spark, sfDir)
    val cut = lit("1997-01-01").cast("timestamp")
    val a = registers(orders.filter($"o_orderdate" < cut))
    val b = registers(orders.filter($"o_orderdate" >= cut))
    val union = registers(orders)
    val merged = (a.keySet ++ b.keySet).map(j =>
      j -> math.max(a.getOrElse(j, 0L), b.getOrElse(j, 0L))).toMap
    assert(merged == union, "max-merge of side registers must equal the union sketch")
  }
}
