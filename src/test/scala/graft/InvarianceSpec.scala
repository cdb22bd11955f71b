package graft

import org.apache.spark.sql.functions._

/** Engine-wide guarantees swept across every registered query. */
class InvarianceSpec extends SparkTestBase {

  test("no query plans a CartesianProduct") {
    // broadcast nested-loop against 1-row/tiny frames is intended
    // (q29/q40); an unbroadcast CartesianProduct anywhere is a scale
    // bug by definition
    SparkEntry.queries.foreach { case (name, fn) =>
      val p = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n${p.take(1500)}")
    }
  }

  test("every query is invariant to shuffle partition count") {
    def canon(name: String): Seq[String] = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val cols = df.columns.sorted
      df.select(cols.map(c => col(c).cast("string")): _*)
        .collect().map(_.mkString("|")).sorted.toSeq
    }
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        val a = canon(name)
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val b = canon(name)
        assert(a == b, s"$name changes with partitioning: " +
          s"${a.diff(b).take(2)} vs ${b.diff(a).take(2)}")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
