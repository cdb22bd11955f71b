package graft.core

import org.apache.spark.sql.types._

/** Canonical schema for the reference's route records — the single
  * source of truth (SURVEY §1.3); the reference declares this entity
  * four times by hand (JSON-Schema `routes-schema.json`, Avro
  * `routes.avsc`, proto2 `routes_pb2.py:22`, pandas inference).
  *
  * Type fixes per SURVEY §1.4: latitude/longitude/timezone are DOUBLE
  * (the Avro `long` declaration is a reference bug); `airline_id` is a
  * nullable int (the `"default": "NONE"` string default is a bug).
  */
object RouteSchema {

  case class Airline(
      airline_id: Option[Int], name: Option[String], alias: Option[String],
      iata: Option[String], icao: Option[String], callsign: Option[String],
      country: Option[String], active: Option[Boolean])

  case class Airport(
      airport_id: Option[Int], name: Option[String], city: Option[String],
      country: Option[String], iata: Option[String], icao: Option[String],
      latitude: Option[Double], longitude: Option[Double],
      altitude: Option[Int], timezone: Option[Double], dst: Option[String],
      tz_id: Option[String], `type`: Option[String], source: Option[String])

  case class Route(
      airline: Option[Airline], src_airport: Option[Airport],
      dst_airport: Option[Airport], codeshare: Option[Boolean],
      equipment: Option[Seq[String]], geohash: Option[String])

  val airportType: StructType = StructType(Seq(
    StructField("airport_id", IntegerType),
    StructField("name", StringType),
    StructField("city", StringType),
    StructField("country", StringType),
    StructField("iata", StringType),
    StructField("icao", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("altitude", IntegerType),
    StructField("timezone", DoubleType),
    StructField("dst", StringType),
    StructField("tz_id", StringType),
    StructField("type", StringType),
    StructField("source", StringType)))

  val airlineType: StructType = StructType(Seq(
    StructField("airline_id", IntegerType),
    StructField("name", StringType),
    StructField("alias", StringType),
    StructField("iata", StringType),
    StructField("icao", StringType),
    StructField("callsign", StringType),
    StructField("country", StringType),
    StructField("active", BooleanType)))

  val routeSchema: StructType = StructType(Seq(
    StructField("airline", airlineType),
    StructField("src_airport", airportType),
    StructField("dst_airport", airportType),
    StructField("codeshare", BooleanType),
    StructField("equipment", ArrayType(StringType)),
    StructField("geohash", StringType)))

  /** Render the canonical schema as a JSON-Schema document (W5: the
    * reference keeps `routes-schema.json` beside the data; we generate
    * it from the one true StructType instead of hand-maintaining it).
    */
  def toJsonSchema(st: StructType = routeSchema): String = {
    def render(dt: DataType): String = dt match {
      case s: StructType =>
        val props = s.fields.map(f =>
          s""""${f.name}": ${render(f.dataType)}""").mkString(", ")
        val req = s.fields.filterNot(_.nullable)
          .map(f => s""""${f.name}"""").mkString(", ")
        s"""{"type": "object", "properties": {$props}, "required": [$req]}"""
      case ArrayType(et, _) =>
        s"""{"type": "array", "items": ${render(et)}}"""
      case IntegerType | LongType => """{"type": "integer"}"""
      case DoubleType | FloatType => """{"type": "number"}"""
      case BooleanType => """{"type": "boolean"}"""
      case _ => """{"type": "string"}"""
    }
    render(st)
  }
}
