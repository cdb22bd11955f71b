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
}
