package graft

import graft.functions.Geohash
import org.scalatest.funsuite.AnyFunSuite

class GeohashSpec extends AnyFunSuite {

  test("encode matches public geohash fixtures") {
    // Wikipedia "Geohash" worked examples
    assert(Geohash.encode(42.6, -5.6, 5) == "ezs42")
    assert(Geohash.encode(57.64911, 10.40744, 11) == "u4pruydqqvj")
  }

  test("approx distance matches reference golden (Assignment_3.ipynb cell 23)") {
    assert(Geohash.approxDistance("bcd3u", "bc83n") == 625441d)
  }

  test("approx distance table endpoints") {
    assert(Geohash.approxDistance("u4pruydqqvj", "ezs42") == 20000000d)
    assert(Geohash.approxDistance("ezs42", "ezs42") == 3803d) // 5 common
    val h = "u4pruydqqvjb"
    assert(Geohash.approxDistance(h, h) == 0.6d) // capped at 10
  }

  test("decode returns cell center of encode") {
    val (lat, lon) = Geohash.decode("ezs42")
    assert(math.abs(lat - 42.605) < 0.03 && math.abs(lon - (-5.603)) < 0.03)
  }

  private val rnd = new scala.util.Random(42)
  private def randLat() = rnd.nextDouble() * 179.998 - 89.999
  private def randLon() = rnd.nextDouble() * 359.998 - 179.999

  test("property: encode/decode roundtrip stays within cell (500 seeded points)") {
    (1 to 500).foreach { _ =>
      val lat = randLat(); val lon = randLon()
      val h = Geohash.encode(lat, lon, 12)
      val (latLo, latHi, lonLo, lonHi) = Geohash.bounds(h)
      assert(lat >= latLo && lat <= latHi, s"lat out of cell for ($lat,$lon)")
      assert(lon >= lonLo && lon <= lonHi, s"lon out of cell for ($lat,$lon)")
    }
  }

  test("property: truncating hashes never decreases approx distance") {
    (1 to 500).foreach { _ =>
      val h1 = Geohash.encode(randLat(), randLon())
      val h2 = Geohash.encode(randLat(), randLon())
      val d1 = Geohash.approxDistance(h1, h2)
      val d2 = Geohash.approxDistance(h1.take(6), h2.take(6))
      assert(d1 <= d2)
    }
  }

  test("haversine known distances") {
    // Paris <-> London ~ 343.5 km
    val d = Geohash.haversineKm(48.8566, 2.3522, 51.5074, -0.1278)
    assert(math.abs(d - 343.5) < 2.0)
    assert(Geohash.haversineKm(10, 20, 10, 20) == 0.0)
  }

  test("neighbors covers the 3x3 block") {
    val ns = Geohash.neighbors("9z7")
    assert(ns.size == 9 && ns.contains("9z7"))
    // all are valid 3-char hashes and mutually distinct
    assert(ns.forall(_.length == 3))
  }
}
