package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Avro container sink/source (SURVEY §2.9 W2) built directly on the
  * avro-core library that ships with Spark (no spark-avro module in
  * this image). The writer runs per-partition on executors — each task
  * streams its rows into one container file, so the sink scales with
  * input splits exactly like the builtin parquet writer.
  *
  * The Avro schema is GENERATED from the DataFrame's StructType
  * (SURVEY §1.3: one canonical schema, renderings derived) — the
  * reference hand-maintained a 140-line Avro schema with type bugs
  * (`Assignment_3.ipynb:286-430`, lat/long as `long`, §1.4).
  */
object AvroSink {

  def toAvroSchema(st: StructType, name: String = "record",
      ns: String = "graft"): Schema = {
    def field(dt: DataType, fieldName: String): Schema = dt match {
      case s: StructType => toAvroSchema(s, fieldName, ns)
      case ArrayType(et, _) => Schema.createArray(nullable(field(et, fieldName)))
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case _ => Schema.create(Schema.Type.STRING)
    }
    def nullable(s: Schema): Schema =
      Schema.createUnion(List(Schema.create(Schema.Type.NULL), s).asJava)
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, nullable(field(f.dataType, f.name)),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, ns, false, fields.toList.asJava)
  }

  private def toAvro(value: Any, dt: DataType, schema: Schema): Any =
    (value, dt) match {
      case (null, _) => null
      case (r: Row, s: StructType) =>
        val recSchema = nonNull(schema)
        val rec = new GenericData.Record(recSchema)
        s.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, toAvro(r.get(i), f.dataType,
            recSchema.getField(f.name).schema()))
        }
        rec
      case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
        val el = nonNull(schema).getElementType
        seq.map(v => toAvro(v, et, el)).asJava
      case (s: String, _) => s
      case (b: Array[Byte], _) => java.nio.ByteBuffer.wrap(b)
      // any type mapped to Avro STRING (Timestamp/Date/Decimal/...) must
      // be stringified here — the raw object would ClassCastException
      // inside GenericDatumWriter at write time
      case (v, _) if nonNull(schema).getType == Schema.Type.STRING =>
        v.toString
      case (v, _) => v
    }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  /** Executor-side partitioned write: `out/part-NNNNN.avro` per task.
    * All paths resolve through the Hadoop FileSystem API, so `out` may
    * be local, `file:`, `hdfs://`, or `s3a://` — same contract as the
    * builtin sinks.
    */
  def write(df: DataFrame, out: String): Unit = {
    val st = df.schema
    val schemaJson = toAvroSchema(st, "row").toString
    val outPath = new Path(out)
    outPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      .mkdirs(outPath)
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      if (rows.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val part = new Path(out, f"part-$idx%05d.avro")
        // executor-local Configuration: tasks pick up cluster defaults
        // from the classpath (core-site.xml); Configuration itself is
        // not serializable, so it cannot ride in from the driver
        val os = part.getFileSystem(new Configuration()).create(part, true)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        writer.create(schema, os)
        rows.foreach { r =>
          writer.append(toAvro(r, st, schema).asInstanceOf[GenericRecord])
        }
        writer.close()
        Iterator.single(1)
      } else Iterator.empty
    }.count(): Unit
  }

  private def fromAvro(value: Any, dt: DataType): Any = (value, dt) match {
    case (null, _) => null
    case (r: GenericRecord, s: StructType) =>
      Row.fromSeq(s.fields.toSeq.map(f => fromAvro(r.get(f.name), f.dataType)))
    case (l: java.util.List[_], ArrayType(et, _)) =>
      l.asScala.toSeq.map(v => fromAvro(v, et))
    case (u: org.apache.avro.util.Utf8, TimestampType) =>
      java.sql.Timestamp.valueOf(u.toString)
    case (u: org.apache.avro.util.Utf8, DateType) =>
      java.sql.Date.valueOf(u.toString)
    case (u: org.apache.avro.util.Utf8, _: DecimalType) =>
      new java.math.BigDecimal(u.toString)
    case (u: org.apache.avro.util.Utf8, _) => u.toString
    case (bb: java.nio.ByteBuffer, _) =>
      val a = new Array[Byte](bb.remaining()); bb.get(a); a
    case (v, _) => v
  }

  /** Distributed reader: the driver only lists file paths; each task
    * opens and decodes its container files on an executor, so read
    * parallelism scales with file count exactly like the write side.
    * (A production source would register a DataSourceV2 for pushdown;
    * parquet remains the engine's primary at-rest format.)
    */
  def read(spark: SparkSession, dir: String, st: StructType): DataFrame = {
    // Hadoop FS listing (not java.io.File): works for file:, hdfs://,
    // s3a:// — the driver touches only metadata, never file bytes
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val paths = fs.listStatus(dirPath)
      .map(_.getPath).filter(_.getName.endsWith(".avro"))
      .sortBy(_.getName).map(_.toString).toSeq
    val rows = spark.sparkContext
      .parallelize(paths, math.max(1, math.min(paths.size, 32)))
      .flatMap { p =>
        val reader = new DataFileReader[GenericRecord](
          new FsInput(new Path(p), new Configuration()),
          new GenericDatumReader[GenericRecord]())
        openHandles.incrementAndGet()
        var closed = false
        def closeOnce(): Unit = if (!closed) {
          closed = true; reader.close(); openHandles.decrementAndGet(): Unit
        }
        // a downstream limit/take abandons this iterator mid-stream and
        // the exhaustion path below never runs — the task-completion
        // hook is what keeps the FsInput from leaking on the executor
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        // stream records through — never materialize a container in
        // memory (a single .avro file can be GBs); close on exhaustion
        new Iterator[Row] {
          def hasNext: Boolean = !closed && {
            val h = reader.hasNext
            if (!h) closeOnce()
            h
          }
          def next(): Row =
            fromAvro(reader.next(), st).asInstanceOf[Row]
        }
      }
    spark.createDataFrame(rows, st)
  }

  /** Per-JVM count of avro containers currently open in [[read]]
    * tasks. Returns to 0 after every job on each executor (and so
    * globally in local mode, which is what the leak spec asserts).
    */
  val openHandles = new java.util.concurrent.atomic.AtomicLong(0)
}
