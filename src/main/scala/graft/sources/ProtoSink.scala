package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import graft.core.RouteSchema

/** Protobuf sink for route records (SURVEY §2.9 W3) — the reference's
  * protobuf writer never ran (NameError captured at
  * `Assignment_3.ipynb:594-601`); intended semantics implemented
  * against the proto2 wire format (a stable public encoding:
  * varint/zigzag-free for our field types, length-delimited messages),
  * since no protobuf runtime ships in this image.
  *
  * Message/field numbers from `routes_pb2.py`:
  *   Airline: airline_id=1 int32, name=2, alias=3, iata=4, icao=5,
  *     callsign=6, country=7, active=8 bool
  *   Airport: airport_id=1 int32, name=2, city=3, iata=4, icao=5,
  *     latitude=6 double, longitude=7 double, altitude=8 int32,
  *     timezone=9 double, dst=10, tz_id=11, type=12, source=13
  *     (NB: proto2 Airport has NO country field — reference quirk kept)
  *   Route: airline=1, src_airport=2, dst_airport=3, codeshare=4 bool,
  *     stops=5 int32, equipment=6 repeated string
  *   Routes: route=1 repeated
  * Snappy compression via the bundled snappy-java (the reference wrote
  * a .snappy sibling of the raw file).
  */
object ProtoWire {
  import java.io.ByteArrayOutputStream

  def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) {
      out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7
    }
    out.write(v.toInt)
  }
  private def tag(field: Int, wire: Int): Long = (field.toLong << 3) | wire

  def putInt32(out: ByteArrayOutputStream, field: Int, v: Int): Unit = {
    writeVarint(out, tag(field, 0)); writeVarint(out, v.toLong)
  }
  def putBool(out: ByteArrayOutputStream, field: Int, v: Boolean): Unit = {
    writeVarint(out, tag(field, 0)); out.write(if (v) 1 else 0)
  }
  def putDouble(out: ByteArrayOutputStream, field: Int, v: Double): Unit = {
    writeVarint(out, tag(field, 1))
    val bits = java.lang.Double.doubleToLongBits(v)
    var i = 0
    while (i < 8) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
  }
  def putString(out: ByteArrayOutputStream, field: Int, v: String): Unit = {
    val b = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    writeVarint(out, tag(field, 2)); writeVarint(out, b.length.toLong)
    out.write(b, 0, b.length)
  }
  def putBytes(out: ByteArrayOutputStream, field: Int, b: Array[Byte]): Unit = {
    writeVarint(out, tag(field, 2)); writeVarint(out, b.length.toLong)
    out.write(b, 0, b.length)
  }

  /** Minimal decoder: (fieldNumber, wireType, value) triples. */
  def decode(bytes: Array[Byte]): Seq[(Int, Int, Any)] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def varint(): Long = {
      var shift = 0; var res = 0L; var b = 0
      do {
        b = buf.get() & 0xFF
        res |= (b & 0x7FL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      res
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Any)]
    while (buf.hasRemaining) {
      val t = varint()
      val field = (t >>> 3).toInt; val wire = (t & 7).toInt
      val v: Any = wire match {
        case 0 => varint()
        case 1 => java.lang.Double.longBitsToDouble(buf.getLong)
        case 2 =>
          val len = varint().toInt
          val arr = new Array[Byte](len); buf.get(arr); arr
        case 5 => buf.getInt
      }
      out += ((field, wire, v))
    }
    out.toSeq
  }
}

object ProtoSink {
  import ProtoWire._
  import java.io.ByteArrayOutputStream

  private def airlineBytes(r: Row): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    if (!r.isNullAt(0)) putInt32(o, 1, r.getInt(0))
    Seq(2 -> 1, 3 -> 2, 4 -> 3, 5 -> 4, 6 -> 5, 7 -> 6).foreach {
      case (f, i) => if (!r.isNullAt(i)) putString(o, f, r.getString(i))
    }
    putBool(o, 8, !r.isNullAt(7) && r.getBoolean(7)) // required, dflt false
    o.toByteArray
  }

  private def airportBytes(r: Row): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    // StructType order: airport_id,name,city,country,iata,icao,lat,lon,
    // altitude,timezone,dst,tz_id,type,source — proto has no country
    if (!r.isNullAt(0)) putInt32(o, 1, r.getInt(0))
    if (!r.isNullAt(1)) putString(o, 2, r.getString(1))
    if (!r.isNullAt(2)) putString(o, 3, r.getString(2))
    if (!r.isNullAt(4)) putString(o, 4, r.getString(4))
    if (!r.isNullAt(5)) putString(o, 5, r.getString(5))
    putDouble(o, 6, if (r.isNullAt(6)) 0.0 else r.getDouble(6)) // required
    putDouble(o, 7, if (r.isNullAt(7)) 0.0 else r.getDouble(7)) // required
    if (!r.isNullAt(8)) putInt32(o, 8, r.getInt(8))
    if (!r.isNullAt(9)) putDouble(o, 9, r.getDouble(9))
    Seq(10 -> 10, 11 -> 11, 12 -> 12, 13 -> 13).foreach { case (f, i) =>
      if (!r.isNullAt(i)) putString(o, f, r.getString(i))
    }
    o.toByteArray
  }

  /** One Route message (presence-conditional fields = F3 semantics). */
  def routeBytes(r: Row): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    if (!r.isNullAt(0)) putBytes(o, 1, airlineBytes(r.getStruct(0)))
    if (!r.isNullAt(1)) putBytes(o, 2, airportBytes(r.getStruct(1)))
    if (!r.isNullAt(2)) putBytes(o, 3, airportBytes(r.getStruct(2)))
    putBool(o, 4, !r.isNullAt(3) && r.getBoolean(3)) // required, dflt false
    if (!r.isNullAt(4)) r.getSeq[String](4).foreach(e => putString(o, 6, e))
    o.toByteArray
  }

  /** Routes container: executor-side, one file per partition
    * (`part-N.pb` / `.pb.snappy`) — the reference's single in-memory
    * message cannot scale; per-partition containers preserve message
    * semantics and parallel I/O. Each task writes through the output
    * path's OWN Hadoop FileSystem (the session conf broadcast to
    * executors), so the sink is cluster-correct on hdfs://s3a://
    * roots — java.nio on an executor wrote to that machine's LOCAL
    * disk, a shared-FS assumption that silently scatters the
    * container across the fleet.
    */
  def write(routes: DataFrame, out: String, snappy: Boolean): Unit = {
    val sc = routes.sparkSession.sparkContext
    val confB = sc.broadcast(
      new graft.core.SerializableHadoopConf(sc.hadoopConfiguration))
    val root = new org.apache.hadoop.fs.Path(out)
    root.getFileSystem(sc.hadoopConfiguration).mkdirs(root)
    routes.rdd.mapPartitionsWithIndex { (idx, rows) =>
      if (rows.hasNext) {
        val o = new ByteArrayOutputStream()
        rows.foreach(r => putBytes(o, 1, routeBytes(r)))
        val raw = o.toByteArray
        val (bytes, ext) =
          if (snappy) (org.xerial.snappy.Snappy.compress(raw), ".pb.snappy")
          else (raw, ".pb")
        val p = new org.apache.hadoop.fs.Path(out, f"part-$idx%05d$ext")
        val os = p.getFileSystem(confB.value.value).create(p, true)
        try os.write(bytes) finally os.close()
        Iterator.single(1)
      } else Iterator.empty
    }.count(): Unit
  }

  /** Count + decode routes from a container dir (roundtrip check) —
    * same FileSystem routing as the writer.
    */
  def readRouteCount(dir: String,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Long = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root)
      .filter(_.getPath.getName.startsWith("part-"))
      .map { st =>
        val in = fs.open(st.getPath)
        val raw0 = try {
          val buf = new ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
          buf.toByteArray
        } finally in.close()
        val raw = if (st.getPath.getName.endsWith(".snappy"))
          org.xerial.snappy.Snappy.uncompress(raw0) else raw0
        ProtoWire.decode(raw).count(t => t._1 == 1 && t._2 == 2).toLong
      }.sum
  }
}
