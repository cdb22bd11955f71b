package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryPack, Tables}
import graft.functions.{geo, Geohash}

/** Geo operators exposed over the driver test tables (SURVEY §2.8).
  * The tables carry no coordinates, so deterministic synthetic points
  * are derived from supplier keys with exact integer arithmetic — both
  * engines compute identical doubles.
  *
  * DuckDB has no geohash builtin, so the q17/q18 oracles replicate
  * `Geohash.encode` bit-for-bit with a recursive bisection CTE: the
  * same IEEE-double midpoint sequence, the same strict-`>` bucket rule,
  * then base32 assembly of the bit string. (Also golden-tested in
  * GeoQuerySpec against the reference's 67k-record index.)
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

  // geohash bucketing of the derived points
  def q17GeohashBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.supplier(s, dir)
      .select(geo.geohash_encode(dLat($"s_suppkey"), dLon($"s_suppkey"))
        .as("gh"))
      .groupBy(substring($"gh", 1, 2).as("g2"))
      .agg(count(lit(1)).as("n"))
  }

  // approx-distance nearest with haversine tie-break
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

  /** Geohash encode as DuckDB CTEs: the recursive `bis` CTE runs the
    * identical double-precision bisection as [[graft.functions.Geohash.encode]]
    * (lon on even bits, lat on odd, strict `>` sends midpoints to the
    * lower half), `gh` packs the bit string into base32. Exact parity:
    * both engines execute the same IEEE ops in the same order.
    */
  private def ghCte(nBits: Int): String = {
    val nch = nBits / 5
    s"""pts AS (SELECT s_suppkey, $sqlLat AS lat, $sqlLon AS lon FROM supplier),
       |bis AS (
       | SELECT s_suppkey, lat, lon, 0 AS j,
       |  CAST(-90 AS DOUBLE) latlo, CAST(90 AS DOUBLE) lathi,
       |  CAST(-180 AS DOUBLE) lonlo, CAST(180 AS DOUBLE) lonhi,
       |  '' AS bits FROM pts
       | UNION ALL
       | SELECT s_suppkey, lat, lon, j+1,
       |  CASE WHEN j%2=1 AND lat > (latlo+lathi)/2 THEN (latlo+lathi)/2 ELSE latlo END,
       |  CASE WHEN j%2=1 AND lat <= (latlo+lathi)/2 THEN (latlo+lathi)/2 ELSE lathi END,
       |  CASE WHEN j%2=0 AND lon > (lonlo+lonhi)/2 THEN (lonlo+lonhi)/2 ELSE lonlo END,
       |  CASE WHEN j%2=0 AND lon <= (lonlo+lonhi)/2 THEN (lonlo+lonhi)/2 ELSE lonhi END,
       |  bits || CASE WHEN j%2=0
       |    THEN CASE WHEN lon > (lonlo+lonhi)/2 THEN '1' ELSE '0' END
       |    ELSE CASE WHEN lat > (latlo+lathi)/2 THEN '1' ELSE '0' END END
       | FROM bis WHERE j < $nBits),
       |gh AS (
       | SELECT s_suppkey, string_agg(substr('${Geohash.Base32}',
       |   1 + CAST(substr(bits,CAST(g*5+1 AS INT),1) AS INT)*16
       |     + CAST(substr(bits,CAST(g*5+2 AS INT),1) AS INT)*8
       |     + CAST(substr(bits,CAST(g*5+3 AS INT),1) AS INT)*4
       |     + CAST(substr(bits,CAST(g*5+4 AS INT),1) AS INT)*2
       |     + CAST(substr(bits,CAST(g*5+5 AS INT),1) AS INT), 1), '' ORDER BY g) AS gh
       | FROM (SELECT s_suppkey, bits FROM bis WHERE j = $nBits) h,
       |      generate_series(0, ${nch - 1}) t(g)
       | GROUP BY s_suppkey)""".stripMargin
  }

  private val prefixMetersCase = "CASE LEAST(sl,10) " +
    Geohash.PrefixMeters.zipWithIndex.map { case (m, i) =>
      s"WHEN $i THEN CAST($m AS DOUBLE)"
    }.mkString(" ") + " END"

  override def oracleSql: Map[String, String] = Map(
    "q15_geo_haversine" ->
      s"""SELECT s_suppkey, ROUND($sqlHaversine, 4) AS dist_km
         |FROM supplier""".stripMargin,
    "q16_geo_nearest" ->
      s"""SELECT s_suppkey AS nearest_suppkey, ROUND(d, 4) AS dist_km
         |FROM (SELECT s_suppkey, $sqlHaversine AS d FROM supplier)
         |ORDER BY d ASC, s_suppkey ASC LIMIT 1""".stripMargin,
    "q17_geohash_buckets" ->
      s"""WITH RECURSIVE ${ghCte(10)}
         |SELECT substr(gh,1,2) AS g2, COUNT(*) AS n FROM gh GROUP BY 1""".stripMargin,
    "q18_geo_nearest_approx" ->
      s"""WITH RECURSIVE ${ghCte(60)},
         |sel AS (SELECT s_suppkey,
         |  (SELECT COALESCE(MAX(k),0) FROM generate_series(1,12) t(k)
         |    WHERE substr(gh,1,CAST(k AS INT)) =
         |      substr('${Geohash.encode(41.15, -95.92)}',1,CAST(k AS INT))) AS sl
         | FROM gh),
         |d AS (SELECT sel.s_suppkey, $prefixMetersCase AS adist, hv AS hdist
         | FROM sel JOIN (SELECT s_suppkey AS sk2, $sqlHaversine AS hv
         |   FROM supplier) s2 ON s2.sk2 = sel.s_suppkey)
         |SELECT s_suppkey AS nearest_suppkey, adist AS approx_dist_m
         |FROM d ORDER BY adist ASC, hdist ASC, s_suppkey ASC LIMIT 1""".stripMargin,
  )
}
