package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.RouteSchema
import graft.functions.{geo, Geohash}

/** Geospatial operator surface (SURVEY §2.8).
  *
  * The reference builds a geohash-prefix-partitioned index
  * (`Assignment_3.ipynb:625-653`) and answers nearest-airport queries by
  * a full O(N) scan with pygeohash's bucketed prefix distance
  * (`Assignment_3.ipynb:692-720`). Here: enrichment is a codegen'd
  * Catalyst expression, the index is a Hive-style partitioned write
  * (same pruning semantics, SURVEY §7.4 declares byte-identical layout a
  * non-goal), and the query has two forms — full-scan argmin
  * (correctness baseline) and partition-pruned candidate scan (the
  * 100 TB path: reads ≤9 of ~2400 partitions).
  */
object Geo {

  /** Read route records (jsonl.gz, possibly nested in prefix dirs) with
    * the canonical schema — S1 ingest; gzip + line split are native.
    */
  def readRoutes(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("recursiveFileLookup", "true")
      .schema(RouteSchema.routeSchema)
      .json(path)

  /** Typed form: compile-time field checks via the canonical case
    * classes (`Dataset[Route]` where type safety helps; DataFrame for
    * dynamic-schema operators).
    */
  def readRoutesTyped(spark: SparkSession,
      path: String): org.apache.spark.sql.Dataset[RouteSchema.Route] = {
    import spark.implicits._
    readRoutes(spark, path).as[RouteSchema.Route]
  }

  /** G1/P5: add a 12-char geohash of the source airport. Explicit
    * null guards — the reference's Python truthiness drops lat/lon 0.0
    * (a bug, SURVEY §2.2 F2); intended semantics keep them.
    */
  def enrichGeohash(routes: DataFrame): DataFrame =
    routes.withColumn("geohash",
      when(col("src_airport").isNotNull &&
        col("src_airport.latitude").isNotNull &&
        col("src_airport.longitude").isNotNull,
        geo.geohash_encode(col("src_airport.latitude"),
          col("src_airport.longitude"))))

  /** G4/W4: write the geo index partitioned by 3-char geohash prefix.
    * One shuffle-free write: partitionBy splits files by prefix so a
    * reader filtering on `g3` prunes directories, exactly the
    * reference's `{c1}/{c1c2}/{c1c2c3}.jsonl.gz` pruning semantics.
    */
  def writeGeoIndex(routes: DataFrame, out: String): Unit =
    enrichGeohash(routes)
      .filter(col("geohash").isNotNull)
      .withColumn("g3", substring(col("geohash"), 1, 3))
      .write
      .partitionBy("g3")
      .option("compression", "gzip")
      .mode("overwrite")
      .json(out)

  def readGeoIndex(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(RouteSchema.routeSchema.add("g3", "string"))
      .option("basePath", path)
      .json(path)

  /** G3 intended semantics: nearest src_airport by pygeohash bucketed
    * distance, exact haversine then airport name as deterministic
    * tie-breaks (the bucket distance is coarse — many airports share
    * the minimal bucket; the reference's scan-order tie-break is
    * nondeterministic under parallelism).
    * Aggregates to a single row: struct-min is computed per partition
    * then merged — no sort, no shuffle beyond the 1-row reduce.
    */
  def nearestAirport(routesWithGeohash: DataFrame, lat: Double,
      lon: Double): String =
    nearestAirportOpt(routesWithGeohash, lat, lon).get

  private def nearestAirportOpt(routesWithGeohash: DataFrame, lat: Double,
      lon: Double): Option[String] = {
    val qh = Geohash.encode(lat, lon)
    val scored = routesWithGeohash
      .filter(col("geohash").isNotNull)
      .select(
        geo.geohash_approx_distance(lit(qh), col("geohash")).as("adist"),
        geo.haversine_km(lit(lat), lit(lon),
          col("src_airport.latitude"), col("src_airport.longitude"))
          .as("hdist"),
        col("src_airport.name").as("name"))
    scored
      .agg(min(struct(col("adist"), col("hdist"), col("name"))).as("m"))
      .select(col("m.name"))
      .take(1).headOption.flatMap(r => Option(r.getString(0)))
  }

  /** G5: prefix-pruned nearest — scan only the 3-char-prefix partitions
    * of the query cell and its 8 neighbors (any nearer point than the
    * best in-cell match must lie in this block or the scan falls back).
    * At reference scale this reads ≤9 of 2,413 partitions.
    */
  /** One-shot form: constructs the index DataFrame (file listing of
    * ~2.4k partition dirs — the dominant one-time cost locally, ~4.7s
    * vs 0.1-0.6s per pruned query) and delegates. A query service
    * should hold the DataFrame from [[readGeoIndex]] and call the
    * overload below per query.
    */
  def nearestAirportPruned(spark: SparkSession, indexPath: String,
      lat: Double, lon: Double): String =
    nearestAirportPruned(readGeoIndex(spark, indexPath), lat, lon)

  /** Pruned nearest over a shared index DataFrame: one job on the
    * 3×3-neighborhood scan, full-scan fallback whenever the CENTER cell
    * is empty. The center-cell test is what makes pruning exact: any
    * airport outside the block shares ≤2 geohash chars with the query,
    * so a center-cell candidate (≥3 shared chars, strictly smaller
    * adist bucket) beats it — but a neighbor-cell candidate may share
    * ≤2 chars itself and LOSE to an out-of-block airport under the
    * adist-first ranking, so neighbors alone cannot confirm the answer.
    * The center-occupancy flag rides the same single aggregate (no
    * separate isEmpty probe).
    */
  def nearestAirportPruned(idx: DataFrame, lat: Double,
      lon: Double): String = {
    val center = Geohash.encode(lat, lon, 3)
    val prefixes = Geohash.neighbors(center)
    val qh = Geohash.encode(lat, lon)
    val row = idx.filter(col("g3").isin(prefixes: _*))
      .filter(col("geohash").isNotNull)
      .select(
        geo.geohash_approx_distance(lit(qh), col("geohash")).as("adist"),
        geo.haversine_km(lit(lat), lit(lon),
          col("src_airport.latitude"), col("src_airport.longitude"))
          .as("hdist"),
        col("src_airport.name").as("name"),
        (col("g3") === center).as("in_center"))
      .agg(min(struct(col("adist"), col("hdist"), col("name"))).as("m"),
        max(col("in_center")).as("center_hit"))
      .take(1).headOption
    val centerHit = row.exists(r =>
      !r.isNullAt(r.fieldIndex("center_hit")) &&
        r.getBoolean(r.fieldIndex("center_hit")))
    val name = if (centerHit)
      row.flatMap(r => Option(r.getStruct(r.fieldIndex("m")))
        .flatMap(s => Option(s.getString(2))))
    else None
    name.getOrElse(nearestAirport(idx, lat, lon))
  }
}
