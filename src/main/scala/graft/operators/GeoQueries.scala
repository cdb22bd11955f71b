package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryPack, Tables}
import graft.functions.geo

/** Geo operators exposed over the driver test tables (SURVEY §2.8).
  * The tables carry no coordinates, so deterministic synthetic points
  * are derived from supplier keys with exact integer arithmetic — both
  * engines compute identical doubles.
  *
  * Geohash functions have no DuckDB equivalent → those queries are
  * rows-only checked here and fully golden-tested in GeoQuerySpec
  * against the reference's 67k-record index.
  */
object GeoQueries extends QueryPack {

  private def dLat(key: Column): Column =
    ((key * 7919L) % 17000L).cast("double") / 100.0 - 85.0
  private def dLon(key: Column): Column =
    ((key * 104729L) % 36000L).cast("double") / 100.0 - 180.0

  private val sqlLat = "(CAST((s_suppkey * 7919) % 17000 AS DOUBLE) / 100.0 - 85.0)"
  private val sqlLon = "(CAST((s_suppkey * 104729) % 36000 AS DOUBLE) / 100.0 - 180.0)"
  private val sqlHaversine =
    s"""2 * 6371.0088 * ASIN(LEAST(1.0, SQRT(
       | POW(SIN(RADIANS($sqlLat - 41.15) / 2), 2) +
       | COS(RADIANS(41.15)) * COS(RADIANS($sqlLat)) *
       | POW(SIN(RADIANS($sqlLon - (-95.92)) / 2), 2))))""".stripMargin

  // haversine distance from a fixed query point to every derived point
  def q15Haversine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.supplier(s, dir)
      .select($"s_suppkey",
        round(geo.haversine_km(lit(41.15), lit(-95.92),
          dLat($"s_suppkey"), dLon($"s_suppkey")), 4).as("dist_km"))
  }

  // nearest derived point to the query point by exact haversine
  def q16NearestHaversine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.supplier(s, dir)
      .select($"s_suppkey",
        geo.haversine_km(lit(41.15), lit(-95.92),
          dLat($"s_suppkey"), dLon($"s_suppkey")).as("d"))
      .agg(min(struct($"d", $"s_suppkey")).as("m"))
      .select($"m.s_suppkey".as("nearest_suppkey"),
        round($"m.d", 4).as("dist_km"))
  }

  // geohash bucketing of the derived points (rows-only: no SQL geohash)
  def q17GeohashBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.supplier(s, dir)
      .select(geo.geohash_encode(dLat($"s_suppkey"), dLon($"s_suppkey"))
        .as("gh"))
      .groupBy(substring($"gh", 1, 2).as("g2"))
      .agg(count(lit(1)).as("n"))
  }

  // approx-distance nearest with haversine tie-break (rows-only)
  def q18NearestApprox(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qh = graft.functions.Geohash.encode(41.15, -95.92)
    Tables.supplier(s, dir)
      .select($"s_suppkey",
        geo.geohash_approx_distance(lit(qh),
          geo.geohash_encode(dLat($"s_suppkey"), dLon($"s_suppkey")))
          .as("adist"),
        geo.haversine_km(lit(41.15), lit(-95.92),
          dLat($"s_suppkey"), dLon($"s_suppkey")).as("hdist"))
      .agg(min(struct($"adist", $"hdist", $"s_suppkey")).as("m"))
      .select($"m.s_suppkey".as("nearest_suppkey"),
        $"m.adist".as("approx_dist_m"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q15_geo_haversine"        -> (q15Haversine _),
    "q16_geo_nearest"          -> (q16NearestHaversine _),
    "q17_geohash_buckets"      -> (q17GeohashBuckets _),
    "q18_geo_nearest_approx"   -> (q18NearestApprox _),
  )

  override def oracleSql: Map[String, String] = Map(
    "q15_geo_haversine" ->
      s"""SELECT s_suppkey, ROUND($sqlHaversine, 4) AS dist_km
         |FROM supplier""".stripMargin,
    "q16_geo_nearest" ->
      s"""SELECT s_suppkey AS nearest_suppkey, ROUND(d, 4) AS dist_km
         |FROM (SELECT s_suppkey, $sqlHaversine AS d FROM supplier)
         |ORDER BY d ASC, s_suppkey ASC LIMIT 1""".stripMargin,
  )
}
