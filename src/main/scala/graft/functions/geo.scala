package graft.functions

import org.apache.spark.sql.{Column, GraftGlue, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.{DotProductExpr, GeohashApproxDistanceExpr, GeohashDecodeExpr, GeohashEncodeExpr, HaversineKmExpr, Md5Prefix60Expr, NfcNormalizeExpr}

/** Column-API + SQL surface for the geo expressions. */
object geo {
  private def col(e: Expression): Column = GraftGlue.column(e)
  private def ex(c: Column): Expression = GraftGlue.expression(c)

  def geohash_encode(lat: Column, lon: Column, precision: Int = 12): Column =
    col(GeohashEncodeExpr(ex(lat), ex(lon), Literal(precision)))

  def geohash_decode(h: Column): Column = col(GeohashDecodeExpr(ex(h)))

  /** pygeohash-table approximate distance in meters (SURVEY §2.8 G2). */
  def geohash_approx_distance(h1: Column, h2: Column): Column =
    col(GeohashApproxDistanceExpr(ex(h1), ex(h2)))

  def haversine_km(lat1: Column, lon1: Column,
                   lat2: Column, lon2: Column): Column =
    col(HaversineKmExpr(ex(lat1), ex(lon1), ex(lat2), ex(lon2)))

  /** Grouped top-k without sorting each group (bounded-heap
    * TypedImperativeAggregate): array of the k largest (ord, payload)
    * pairs, ord desc / payload asc.
    */
  def top_k_by(ord: Column, payload: Column, k: Int): Column =
    col(org.apache.spark.sql.graft.TopKByAggregate(ex(ord), ex(payload), k)
      .toAggregateExpression())

  /** Codegen'd vector dot product (similarity/ANN hot path; SURVEY
    * §2.13) — same accumulation order as DuckDB `list_dot_product`.
    */
  def dot_product(a: Column, b: Column): Column =
    col(DotProductExpr(ex(a), ex(b)))

  /** Codegen'd Lloyd-assignment argmin: struct(d2, cl) of the nearest
    * centroid among a packed array<struct<cl, cvec>> column — the
    * kernel under every dense ANN leg (replaces the interpreted
    * array_min-over-transform form; see NearestCentroidExpr).
    */
  def nearest_centroid(v: Column, cents: Column): Column =
    col(org.apache.spark.sql.graft.NearestCentroidExpr(ex(v), ex(cents)))

  /** Codegen'd 60-bit md5 prefix as a long — equal to
    * `conv(substring(md5(x), 1, 15), 16, 10)` without the hex render
    * (fingerprint/SimHash hot path).
    */
  def md5_prefix60(s: Column): Column = col(Md5Prefix60Expr(ex(s)))

  /** Bloom-filter build over a long-typed key column (SURVEY §2.13
    * sketch family): fixed `numBits` of state however many keys, bits
    * partition-invariant (merge is OR). Pair with [[might_contain]].
    */
  def bloom_agg(c: Column, numBits: Int, numHashes: Int): Column =
    col(org.apache.spark.sql.graft.BloomFilterAggregate(
      ex(c.cast("long")), numBits, numHashes).toAggregateExpression())

  /** Codegen'd probe of a serialized bloom sketch; no false negatives. */
  def might_contain(bloom: Column, v: Column): Column =
    col(org.apache.spark.sql.graft.MightContainExpr(
      ex(bloom), ex(v.cast("long"))))

  /** Unicode NFC normalization (codegen'd, ASCII fast path) — matches
    * DuckDB `nfc_normalize`.
    */
  def nfc_normalize(c: Column): Column =
    col(org.apache.spark.sql.graft.NfcNormalizeExpr(ex(c)))

  /** Codegen'd Morton (Z-order) interleave of two 16-bit dimension
    * keys — order/range-partition writes by this for two-dimensional
    * file-level min/max pruning (Delta/Iceberg Z-ORDER semantics).
    */
  def z_order16(x: Column, y: Column): Column =
    col(org.apache.spark.sql.graft.ZOrder16Expr(
      ex(x.cast("long")), ex(y.cast("long"))))

  /** One-pass deduped char-n-gram xxhash64 stream (dedup hot path). */
  def gram_hashes(s: Column, gramLen: Int): Column =
    col(org.apache.spark.sql.graft.GramHashesExpr(ex(s), gramLen))

  /** One-pass deduped n-token shingle md5Prefix60 stream. */
  def token_shingle_hashes(s: Column, n: Int): Column =
    col(org.apache.spark.sql.graft.TokenShingleHashesExpr(ex(s), n))

  /** One-pass winnowing fingerprint stats:
    * struct(n_fingerprints, min_fp, max_fp). */
  def winnow_stats(s: Column): Column =
    col(org.apache.spark.sql.graft.WinnowStatsExpr(ex(s)))

  /** Misra-Gries frequent-items sketch (mergeable, bounded state):
    * array<struct<item, cnt>> of the <= capacity retained counters,
    * (cnt desc, item asc)-sorted. Exact when capacity >= distinct
    * items; undercounts by <= n/capacity beyond that.
    */
  def freq_items(c: Column, capacity: Int): Column =
    col(org.apache.spark.sql.graft.FreqItemsAggregate(ex(c), capacity)
      .toAggregateExpression())

  /** Weighted variant: each row contributes `weight` (e.g. token count)
    * instead of 1; undercount bound becomes totalWeight/(capacity+1).
    * Null or non-positive weights skip the row.
    */
  def freq_items(c: Column, weight: Column, capacity: Int): Column =
    col(org.apache.spark.sql.graft.FreqItemsAggregate(ex(c), ex(weight),
      capacity).toAggregateExpression())

  /** KMV bottom-k distinct sketch over a long hash column (SURVEY
    * §2.13 sketch family): the ≤k smallest DISTINCT hashes ascending,
    * O(k) state, mergeable map-side. Feed it md5_prefix60(key) and
    * estimate distinct |keys| as (k−1)·2^60 / arr[k−1] — deterministic
    * in the key set, hence cross-engine replicable (q103), unlike
    * HLL-based approx_count_distinct.
    */
  def bottom_k_distinct(c: Column, k: Int): Column =
    col(org.apache.spark.sql.graft.BottomKDistinctAggregate(ex(c), k)
      .toAggregateExpression())

  /** Fixed-point Holt–Winters fold over one packed series row —
    * struct(l, b, ss, rs): final level/trend, seasonal queue, full
    * residual trajectory. Positional O(H + m) kernel; null for series
    * under two seasons. The shared kernel of the q142 detector family.
    */
  def holt_fold(sv: Column, m: Int = 24): Column =
    col(org.apache.spark.sql.graft.HoltFoldExpr(ex(sv), m))

  /** Sketch/heap aggregates take size parameters as integer literals
    * in SQL (`freq_items(tok, 256)`); anything non-foldable is a user
    * error worth a clear message, not an analysis mystery.
    */
  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case Literal(v: Long, org.apache.spark.sql.types.LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** ONE registry row per SQL function: (name, implementing class for
    * catalog metadata, builder). The class rides in the same tuple so
    * a new function cannot compile without its `DESCRIBE FUNCTION`
    * metadata (a parallel name→class map drifted silently).
    */
  private[functions] val sqlFunctions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("geohash_encode", classOf[GeohashEncodeExpr].getName, { es =>
      val p = if (es.size >= 3) es(2) else Literal(12)
      GeohashEncodeExpr(es(0), es(1), p)
    }),
    ("geohash_decode", classOf[GeohashDecodeExpr].getName,
      es => GeohashDecodeExpr(es.head)),
    ("geohash_approx_distance", classOf[GeohashApproxDistanceExpr].getName,
      es => GeohashApproxDistanceExpr(es(0), es(1))),
    ("haversine_km", classOf[HaversineKmExpr].getName,
      es => HaversineKmExpr(es(0), es(1), es(2), es(3))),
    ("dot_product", classOf[DotProductExpr].getName,
      es => DotProductExpr(es(0), es(1))),
    ("nearest_centroid",
      classOf[org.apache.spark.sql.graft.NearestCentroidExpr].getName,
      es => org.apache.spark.sql.graft.NearestCentroidExpr(es(0), es(1))),
    ("md5_prefix60", classOf[Md5Prefix60Expr].getName,
      es => Md5Prefix60Expr(es.head)),
    ("nfc_normalize", classOf[NfcNormalizeExpr].getName,
      es => NfcNormalizeExpr(es.head)),
    ("z_order16", classOf[org.apache.spark.sql.graft.ZOrder16Expr].getName,
      es => org.apache.spark.sql.graft.ZOrder16Expr(es(0), es(1))),
    ("holt_fold", classOf[org.apache.spark.sql.graft.HoltFoldExpr].getName, { es =>
      val m = if (es.size >= 2) intArg(es(1), "holt_fold season length") else 24
      org.apache.spark.sql.graft.HoltFoldExpr(es(0), m)
    }),
    // aggregates: the analyzer wraps a bare AggregateFunction returned
    // from a registry builder in its AggregateExpression
    ("freq_items",
      classOf[org.apache.spark.sql.graft.FreqItemsAggregate].getName, { es =>
      if (es.size >= 3)
        org.apache.spark.sql.graft.FreqItemsAggregate(es(0), es(1),
          intArg(es(2), "freq_items capacity"))
      else org.apache.spark.sql.graft.FreqItemsAggregate(es(0),
        intArg(es(1), "freq_items capacity"))
    }),
    ("top_k_by",
      classOf[org.apache.spark.sql.graft.TopKByAggregate].getName,
      es => org.apache.spark.sql.graft.TopKByAggregate(es(0), es(1),
        intArg(es(2), "top_k_by k"))),
    ("bottom_k_distinct",
      classOf[org.apache.spark.sql.graft.BottomKDistinctAggregate].getName,
      es => org.apache.spark.sql.graft.BottomKDistinctAggregate(es(0),
        intArg(es(1), "bottom_k_distinct k"))),
    ("bloom_agg",
      classOf[org.apache.spark.sql.graft.BloomFilterAggregate].getName,
      es => org.apache.spark.sql.graft.BloomFilterAggregate(es(0),
        intArg(es(1), "bloom_agg numBits"),
        intArg(es(2), "bloom_agg numHashes"))),
    ("might_contain",
      classOf[org.apache.spark.sql.graft.MightContainExpr].getName,
      es => org.apache.spark.sql.graft.MightContainExpr(es(0), es(1))),
    ("gram_hashes",
      classOf[org.apache.spark.sql.graft.GramHashesExpr].getName,
      es => org.apache.spark.sql.graft.GramHashesExpr(es(0),
        intArg(es(1), "gram_hashes gramLen"))),
    ("token_shingle_hashes",
      classOf[org.apache.spark.sql.graft.TokenShingleHashesExpr].getName,
      es => org.apache.spark.sql.graft.TokenShingleHashesExpr(es(0),
        intArg(es(1), "token_shingle_hashes n"))),
    ("winnow_stats",
      classOf[org.apache.spark.sql.graft.WinnowStatsExpr].getName,
      es => org.apache.spark.sql.graft.WinnowStatsExpr(es.head)),
  )

  /** Imperative registration for sessions not built with
    * [[GraftExtensions]] (e.g. the driver-owned Verify session).
    * Idempotent — and it registers the SAME ExpressionInfo the
    * extension path does, so catalog metadata cannot depend on how the
    * session was built.
    */
  def register(spark: SparkSession): Unit = {
    sqlFunctions.foreach { case (name, className, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), new ExpressionInfo(className, name),
        builder)
    }
    val rule = org.apache.spark.sql.graft.GeohashPrecisionPushdown
    if (!spark.experimental.extraOptimizations.contains(rule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
  }
}

/** `SparkSession.builder().withExtensions(new GraftExtensions)` or config
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ =>
      org.apache.spark.sql.graft.GeohashPrecisionPushdown)
    // one registry: whatever geo.register offers imperatively, the
    // extension offers at session build (scalars AND aggregates — the
    // analyzer wraps a bare AggregateFunction from a builder)
    geo.sqlFunctions.foreach { case (name, className, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(className, name), builder))
    }
  }
}
