package graft

/** The bench/verify execution scope must leave no cached blocks behind:
  * q26/q28/q49 pin their gram/token streams for intra-query reuse, and
  * without scoping those blocks accumulate across a 49-query run and
  * skew every later query's memory and timings (the round-2/3
  * "Asked to cache already cached data" random-walk).
  */
class BenchHarnessSpec extends SparkTestBase {

  test("runScoped leaves the CacheManager empty after every query") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      Bench.runScoped(spark, fn(spark, sfDir))
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name leaked cached blocks past its bench scope")
    }
  }

  test("runScoped clears caches even when materialization fails") {
    import spark.implicits._
    val cached = Seq(1, 2, 3).toDF("x").cache()
    cached.count() // pin the block for real
    val boom = cached.selectExpr("assert_true(x < 0) as y")
    intercept[Throwable] { Bench.runScoped(spark, boom) }
    assert(spark.sharedState.cacheManager.isEmpty,
      "failed run left cached blocks behind")
  }
}
