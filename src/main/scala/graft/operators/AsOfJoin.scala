package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Exact, QueryPack, Tables}

/** As-of (time-series alignment) join — SURVEY §2.4/§7.4: absent from
  * both the reference and Spark's builtin joins; required for
  * time-series parity (the reference's replay implicitly aligns
  * locations/accelerations streams by time).
  *
  * Implementation composes built-ins (preference order (a) of the
  * builder contract): tag left probes and right state rows, union,
  * then one window pass per key ordered by (time, tag) carrying
  * `last(right_value, ignoreNulls)` — each probe row sees the most
  * recent right row at-or-before its timestamp.
  *
  * Scale: ONE shuffle on the join key (the union sorts within key
  * partitions); no range explosion, no per-row subqueries. The same
  * plan shape Flink/QuestDB use for as-of merges.
  */
object AsOfJoin {

  /** Left rows gain `asof_<c>` for each carried right column: the value
    * from the latest right row with rightTime <= leftTime, per key.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      carry: Seq[String]): DataFrame = {
    val lCols = left.columns
    // tag=1 for probes so they sort AFTER state rows at equal times
    // (ties: a right row AT the probe time matches, per ASOF <= spec)
    val l = left.withColumn("__tag", lit(1))
      .withColumn("__t", col(leftTime))
    val r0 = right.select(
      (col(key).as(key) +: col(rightTime).as("__t") +:
        carry.map(c => col(c).as(s"__c_$c"))): _*)
      .withColumn("__tag", lit(0))
    val lAligned = l.select(
      (col(key) +: col("__t") +: col("__tag") +:
        carry.map(c => lit(null).cast(r0.schema(s"__c_$c").dataType)
          .as(s"__c_$c"))) ++
        lCols.filterNot(_ == key).map(c => col(c)): _*)
    val rAligned = r0.select(
      (col(key) +: col("__t") +: col("__tag") +:
        carry.map(c => col(s"__c_$c"))) ++
        lCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val merged = lAligned.union(rAligned)
    val withCarry = carry.foldLeft(merged) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(col(s"__c_$c"), ignoreNulls = true).over(w))
    }
    withCarry.filter(col("__tag") === 1)
      .select((lCols.map(col) ++ carry.map(c => col(s"asof_$c"))).toIndexedSeq: _*)
  }
}

/** Query-surface operators: as-of join, JSON validation, multimodal
  * plumbing over the test tables.
  */
object Alignment extends QueryPack {

  // --- q36: as-of join — each click sees the latest error before it ------
  def q36AsOf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts", $"value")
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts", $"event_id".as("err_id"), $"value")
    AsOfJoin.asofJoin(clicks, errors, "user_id", "ts", "ts",
        Seq("err_id"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_clicks"),
        count($"asof_err_id").as("n_with_prior_error"),
        max($"asof_err_id").as("max_err_id"))
  }

  // --- q37: JSON validation / extraction (F1 at the query surface) -------
  def q37JsonValidate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType)))
    Tables.events(s, dir)
      .withColumn("parsed", from_json($"props", schema))
      .withColumn("valid", $"parsed".isNotNull && $"parsed.k".isNotNull)
      .groupBy($"valid", ($"parsed.k" % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Multimodal decode STUB (builder contract: the image/audio libs are
    * not in this container — the decode is a deterministic fake; the
    * Spark-side plumbing — binary column, partition-batched decode,
    * output schema — is real). kind from doc_id, dims from byte stats.
    */
  case class MediaMeta(doc_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int)

  // --- q38: media metadata extraction (native expressions) ----------------
  /** The stub decode is pure arithmetic on the payload, so the query
    * path stays in whole-stage codegen with column pruning intact — no
    * DeserializeToObject. Real codecs that genuinely need imperative
    * per-batch decoding plug in via [[decodeMediaBatched]] instead.
    */
  def q38MediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(
      $"doc_id",
      when($"doc_id" % 3 === 0, "image")
        .when($"doc_id" % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      length($"text").cast("int").as("n_bytes"),
      (lit(64) + (length($"text") * 7 + ascii(substring($"text", 1, 1))) % 1857)
        .cast("int").as("width"),
      (lit(64) + (length($"text") * 13) % 1017).cast("int").as("height"))
  }

  /** Partition-batched decode harness for real media codecs: rows decode
    * in batches per partition (the Scala analog of `mapInPandas` batch
    * shape) so a codec initializes once per partition, not per row. The
    * decode body here is the same deterministic stub as q38; REAL
    * decoders with this exact shape ship in [[q82ImageDecode]] (P6)
    * and [[q89PngDecode]] (PNG via JDK ImageIO,
    * [[graft.ops.media.RasterCodec]]) — only video/audio codecs remain
    * deploy-time swaps. Not an oracle query: the oracle-checked path
    * is the codegen'd [[q38MediaMeta]].
    */
  def decodeMediaBatched(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bin = Tables.documents(s, dir)
      .select($"doc_id", encode($"text", "utf-8").as("bytes"))
      .as[(Long, Array[Byte])]
    bin.mapPartitions { it =>
      // real codec init goes here, once per partition
      it.map { case (id, bytes) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val w = 64 + (bytes.length * 7 + (bytes.headOption.getOrElse(0: Byte) & 0xff)) % 1857
        val h = 64 + (bytes.length * 13) % 1017
        MediaMeta(id, kind, bytes.length, w, h)
      }
    }.toDF()
  }

  /** Decoded-image row: exact integer channel sums; invalid rows carry
    * nulls (corrupt input is data, not an exception).
    */
  case class ImgRow(doc_id: Long, valid: Boolean, width: Option[Int],
      height: Option[Int], sum_r: Option[Long], sum_g: Option[Long],
      sum_b: Option[Long])

  private def toImgRow(id: Long,
      d: Option[(Int, Int, Long, Long, Long)]): ImgRow = d match {
    case Some((w, h, r, g, b)) =>
      ImgRow(id, valid = true, Some(w), Some(h), Some(r), Some(g), Some(b))
    case None => ImgRow(id, valid = false, None, None, None, None, None)
  }

  /** Shared metrics projection for the decode queries (q82 PPM, q89
    * PNG): dims as long, channel means dividing EXACT integer sums,
    * 4dp dround — one definition so the two oracles can never drift.
    */
  private def imgMetrics(rows: DataFrame): DataFrame = {
    import rows.sparkSession.implicits._
    rows.select($"doc_id", $"valid",
      $"width".cast("long").as("width"),
      $"height".cast("long").as("height"),
      graft.core.Exact.dround(
        $"sum_r" / ($"width" * $"height"), 4).as("mean_r"),
      graft.core.Exact.dround(
        $"sum_g" / ($"width" * $"height"), 4).as("mean_g"),
      graft.core.Exact.dround(
        $"sum_b" / ($"width" * $"height"), 4).as("mean_b"))
  }

  // --- q82: REAL image decode (binary PPM) over a binary column -----------
  /** End-to-end image decode with a real parser ([[graft.ops.media.Ppm]],
    * pure JVM — P6 header scan, dimension parse, raster read): the
    * binary column is constructed IN THE PLAN (codegen'd hex build +
    * unhex; the raster follows a closed-form the oracle can sum without
    * ever touching bytes), decoded imperatively via the same
    * mapPartitions batch shape [[decodeMediaBatched]] documents for
    * deploy-time codecs. Every 97th document is truncated two bytes
    * short — the decoder must flag it invalid (null metrics), not
    * crash, and the oracle checks the rejection too.
    *
    * Scale shape: narrow per-row transform → mapPartitions decode —
    * zero shuffles, decoder state initialized per partition. Channel
    * means divide EXACT integer sums, so engine parity is trivial.
    */
  def q82ImageDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bin = Tables.documents(s, dir)
      .withColumn("w", (lit(4) + $"doc_id" % 5).cast("int"))
      .withColumn("h", (lit(3) + $"doc_id" % 4).cast("int"))
      .withColumn("hdr", encode(concat(lit("P6\n"), $"w".cast("string"),
        lit(" "), $"h".cast("string"), lit("\n255\n")), "utf-8"))
      .withColumn("pix", unhex(expr(
        """concat_ws('', transform(sequence(0, w * h * 3 - 1),
          |  i -> lpad(hex((doc_id * 31 + (i div 3) * 7 + (i % 3) * 11) % 256),
          |    2, '0')))""".stripMargin)))
      .withColumn("bytes0", concat($"hdr", $"pix"))
      .withColumn("bytes", when($"doc_id" % 97 === 0,
        expr("substring(bytes0, 1, length(bytes0) - 2)")).otherwise($"bytes0"))
      .select($"doc_id", $"bytes").as[(Long, Array[Byte])]
    imgMetrics(bin.mapPartitions { it =>
      it.map { case (id, b) =>
        toImgRow(id, graft.ops.media.Ppm.decode(b)
          .map(i => (i.width, i.height, i.sumR, i.sumG, i.sumB)))
      }
    }.toDF())
  }

  // --- q89: REAL compressed decode (PNG via JDK ImageIO) ------------------
  /** End-to-end COMPRESSED image decode — real PNG bytes (zlib/DEFLATE
    * raster, produced by the JDK's own encoder) decoded back through
    * [[graft.ops.media.RasterCodec]] (`javax.imageio`, in-JVM, no
    * native libs). The raster follows q82's closed form — channel c of
    * row-major pixel p is (doc_id*31 + p*7 + c*11) % 256 — so the
    * oracle sums the formula without ever touching bytes, while the
    * engine must recover it from an actual DEFLATE stream. Every 97th
    * document is truncated to HALF length (cutting mid-IDAT — the
    * PNG reader provably rejects it; a merely tail-truncated PNG still
    * decodes, the reader tolerates a missing IEND) and must surface as
    * an invalid row, not an exception.
    *
    * Scale shape: narrow per-row transform, one mapPartitions stage
    * (codec state per partition, q38's batch shape), zero shuffles.
    */
  def q89PngDecode(s: SparkSession, dir: String): DataFrame =
    losslessRasterDecode("png")(s, dir)

  // --- q91: REAL BMP decode (uncompressed DIB via JDK ImageIO) ------------
  /** BMP sibling of q89 through the SAME closed-form raster and the
    * SAME oracle: the uncompressed-DIB path of `javax.imageio`. The
    * half-cut corruption rows hit the BMP reader's raster EOF (it
    * throws, mapping to an invalid row). Kept as its own CORRECTNESS
    * row because each ImageIO plugin is separate decode code — PNG
    * green says nothing about the BMP raster walk. GIF cannot ride
    * THIS truecolor closed form: the JDK GIF writer palette-quantizes
    * data-dependently even under 256 distinct colors (measured: half
    * of the closed-form rasters shift) — its exact path is the
    * explicit-palette indexed encode, oracle-checked as [[q93GifDecode]].
    */
  def q91BmpDecode(s: SparkSession, dir: String): DataFrame =
    losslessRasterDecode("bmp")(s, dir)

  /** Shared q89/q91 body: encode the closed-form raster — channel c of
    * row-major pixel p is (doc_id*31 + p*7 + c*11) % 256 — through the
    * named LOSSLESS ImageIO writer, truncate every 97th payload to
    * half (mid-raster: both readers provably reject), decode back via
    * [[graft.ops.media.RasterCodec]]. One body + one oracle
    * (RasterClosedFormSql) so the format family can never drift apart.
    */
  private def losslessRasterDecode(fmt: String)(
      s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.media.RasterCodec
    val src = Tables.documents(s, dir).select($"doc_id").as[Long]
    imgMetrics(src.mapPartitions { it =>
      it.map { id =>
        val w = (4 + id % 5).toInt
        val h = (3 + id % 4).toInt
        val img = RasterCodec.encode(fmt, w, h, { p =>
          val r = ((id * 31 + p * 7) % 256).toInt
          val g = ((id * 31 + p * 7 + 11) % 256).toInt
          val b = ((id * 31 + p * 7 + 22) % 256).toInt
          (r << 16) | (g << 8) | b
        })
        val bytes = if (id % 97 == 0) img.take(img.length / 2) else img
        toImgRow(id, RasterCodec.decode(bytes)
          .map(i => (i.width, i.height, i.sumR, i.sumG, i.sumB)))
      }
    }.toDF())
  }

  case class VideoRow(doc_id: Long, valid: Boolean, n_frames: Option[Long],
      width: Option[Long], height: Option[Long],
      sums_in_band: Option[Boolean])

  // --- q100: REAL video decode (MJPEG-in-AVI container walk) --------------
  /** End-to-end VIDEO decode with zero native dependencies: each doc's
    * payload is a real RIFF/AVI container ([[graft.ops.media.AviCodec]])
    * holding 3 MJPEG frames — every frame an ordinary JPEG the JDK
    * decodes — so the full path container-walk → frame-chunk slice →
    * per-frame raster stats runs in-plan. Frame f of doc d follows the
    * q92 closed form shifted per frame (channel c of pixel p =
    * (d·31 + f·17 + p·7 + c·11) mod 256); JPEG being lossy, the oracle
    * pins what survives exactly — declared-vs-decoded frame count,
    * dims, corrupt rejection — plus an engine-computed `sums_in_band`
    * flag (|decoded − exact| < 32 per channel per FRAME), q92's
    * pattern. Every 97th container is cut to half: the movi walk
    * yields fewer complete frames than the avih header declared →
    * invalid row (the WAV-style truncation contract).
    *
    * Scale shape: narrow mapPartitions, zero exchanges — the same
    * shape a real corpus' (path, bytes) scan would use.
    */
  /** q100's synthetic payload for one doc: a real 3-frame MJPEG/AVI
    * container, every 97th cut to half (the truncation family). One
    * builder shared by the in-plan query and the stored-corpus writer
    * so the two paths can never drift.
    */
  private[graft] def aviPayload(id: Long): Array[Byte] = {
    import graft.ops.media.{AviCodec, RasterCodec}
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    def chan(f: Int, c: Int)(p: Int): Long =
      (id * 31 + f * 17 + p * 7 + c * 11) % 256
    val frames = (0 until 3).map(f => RasterCodec.encode("jpg", w, h,
      p => (chan(f, 0)(p).toInt << 16) | (chan(f, 1)(p).toInt << 8) |
        chan(f, 2)(p).toInt))
    val avi = AviCodec.encodeMjpeg(w, h, frames)
    if (id % 97 == 0) avi.take(avi.length / 2) else avi
  }

  /** Decode side of q100 on (id, bytes) — the only video-decode code
    * path; q100 feeds it in-plan payloads, [[storedVideoDecode]] feeds
    * it a parquet binary column.
    */
  private[graft] def videoRowOf(id: Long, bytes: Array[Byte]): VideoRow = {
    import graft.ops.media.AviCodec
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    def chan(f: Int, c: Int)(p: Int): Long =
      (id * 31 + f * 17 + p * 7 + c * 11) % 256
    AviCodec.decode(bytes) match {
      case Some(v) if v.frames.size == v.declaredFrames &&
          v.frames.nonEmpty =>
        val n = (w * h).toDouble
        val band = v.frames.zipWithIndex.forall { case (img, f) =>
          def inBand(got: Long, c: Int): Boolean =
            math.abs(got / n - (0 until w * h).map(chan(f, c)).sum / n) < 32.0
          inBand(img.sumR, 0) && inBand(img.sumG, 1) && inBand(img.sumB, 2)
        }
        VideoRow(id, valid = true, Some(v.frames.size.toLong),
          Some(v.frames.head.width.toLong),
          Some(v.frames.head.height.toLong), Some(band))
      case _ => VideoRow(id, valid = false, None, None, None, None)
    }
  }

  def q100VideoDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = Tables.documents(s, dir).select($"doc_id").as[Long]
    src.mapPartitions { it =>
      it.map(id => videoRowOf(id, aviPayload(id)))
    }.toDF()
  }

  // --- q99: REAL image resize (decode + NN downsample) --------------------
  /** Upgrades the q44 resize STUB to the real operation: the q89
    * closed-form raster goes through a REAL PNG encode/decode, then
    * [[graft.ops.media.RasterCodec.decodeResizeNN]] downsamples it 2×
    * in actual pixel space — nearest-neighbor by explicit index map
    * (target (x,y) ← source (2x, 2y)), so the oracle composes the
    * resized raster from the same closed form over the even pixel
    * lattice. Dims family w∈4..8, h∈3..6 → output 2..4 × 1..3; the
    * every-97th half-truncation rows fail decode → invalid, same
    * contract as q89/q91. Same narrow mapPartitions shape — zero
    * exchanges at any corpus size.
    */
  /** q99's synthetic payload for one doc: a real PNG of the q89
    * closed-form raster, every 97th half-cut. Shared by the in-plan
    * query and the stored-corpus writer.
    */
  private[graft] def pngPayload(id: Long): Array[Byte] = {
    import graft.ops.media.RasterCodec
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    val img = RasterCodec.encode("png", w, h, { p =>
      val r = ((id * 31 + p * 7) % 256).toInt
      val g = ((id * 31 + p * 7 + 11) % 256).toInt
      val b = ((id * 31 + p * 7 + 22) % 256).toInt
      (r << 16) | (g << 8) | b
    })
    if (id % 97 == 0) img.take(img.length / 2) else img
  }

  /** Decode+resize side of q99 on (id, bytes) — shared by the in-plan
    * query and [[storedResize]].
    */
  private[graft] def resizeRowOf(id: Long, bytes: Array[Byte]): ImgRow =
    toImgRow(id, graft.ops.media.RasterCodec.decodeResizeNN(bytes, 2)
      .map(i => (i.width, i.height, i.sumR, i.sumG, i.sumB)))

  def q99ImageResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = Tables.documents(s, dir).select($"doc_id").as[Long]
    imgMetrics(src.mapPartitions { it =>
      it.map(id => resizeRowOf(id, pngPayload(id)))
    }.toDF())
  }

  // --- stored-media corpus: decode-only over a persisted binary column ----
  /** Materialize the q99/q100 payloads to parquet ONCE — `(doc_id,
    * bytes)` with the binary column stored, the layout a real media
    * corpus has. The in-plan q99/q100 spellings pay a per-row ENCODE
    * (3 JPEG encodes + AVI container build per q100 row) that exists
    * only to make the queries self-contained for the oracle; a corpus
    * of stored media pays none of it, so decode benchmarks over this
    * table measure the decoder, not the fixture builder. Written as
    * ordinary multi-file parquet (one part per input partition — the
    * bounded-file-size shape a distributed writer produces).
    */
  def writeMediaCorpus(s: SparkSession, dir: String, out: String): Unit = {
    import s.implicits._
    val ids = Tables.documents(s, dir).select($"doc_id").as[Long]
    ids.mapPartitions(_.map(id => (id, pngPayload(id))))
      .toDF("doc_id", "bytes")
      .write.mode("overwrite").parquet(s"$out/media_png.parquet")
    ids.mapPartitions(_.map(id => (id, aviPayload(id))))
      .toDF("doc_id", "bytes")
      .write.mode("overwrite").parquet(s"$out/media_avi.parquet")
  }

  /** q99 over the stored corpus: parquet binary scan → mapPartitions
    * decode+resize. Byte-identical output to [[q99ImageResize]]
    * (StoredMediaSpec), zero exchanges, no in-plan encode.
    */
  def storedResize(s: SparkSession, corpus: String): DataFrame = {
    import s.implicits._
    imgMetrics(s.read.parquet(s"$corpus/media_png.parquet")
      .select($"doc_id", $"bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => resizeRowOf(id, b) })
      .toDF())
  }

  /** q100 over the stored corpus: parquet binary scan → container walk
    * → per-frame JPEG decode. Byte-identical output to
    * [[q100VideoDecode]] (StoredMediaSpec).
    */
  def storedVideoDecode(s: SparkSession, corpus: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$corpus/media_avi.parquet")
      .select($"doc_id", $"bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => videoRowOf(id, b) })
      .toDF()
  }

  // --- q93: REAL GIF decode (LZW, explicit palette — exact) ---------------
  /** GIF completes the raster family through the LZW path. The
    * truecolor encode is writer-quantized (measured, see q91's note),
    * so q93 builds each payload from an EXPLICIT 16-color palette via
    * [[graft.ops.media.RasterCodec.encodeIndexed]] — bit-exact through
    * the GIF writer+reader pair — with the closed form moved one level
    * up: pixel p carries palette index (doc_id + 3p) mod 16, palette
    * entry k is ((37k+5), (53k+11), (71k+23)) mod 256. The oracle sums
    * the composed formula. Dims keep h >= 5: the JDK GIF codec
    * corrupts heights <= 4 (rows shift — measured across 300 ids,
    * every h <= 4 bad, every h >= 5 exact), so the dims family stays
    * inside the verified-working region and MediaSpec pins it. Every
    * 97th payload is half-cut (the GIF reader throws mid-LZW) and
    * must surface as an invalid row. Same zero-exchange mapPartitions
    * shape as q89/q91/q92.
    */
  def q93GifDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.media.RasterCodec
    val palette = Array.tabulate(16) { k =>
      (((37 * k + 5) % 256) << 16) | (((53 * k + 11) % 256) << 8) |
        ((71 * k + 23) % 256)
    }
    val src = Tables.documents(s, dir).select($"doc_id").as[Long]
    imgMetrics(src.mapPartitions { it =>
      it.map { id =>
        val w = (4 + id % 5).toInt
        val h = (5 + id % 4).toInt
        val gif = RasterCodec.encodeIndexed("gif", w, h, palette,
          p => ((id + 3L * p) % 16).toInt)
        val bytes = if (id % 97 == 0) gif.take(gif.length / 2) else gif
        toImgRow(id, RasterCodec.decode(bytes)
          .map(i => (i.width, i.height, i.sumR, i.sumG, i.sumB)))
      }
    }.toDF())
  }

  // --- q92: REAL JPEG decode (lossy — dims exact, sums banded) ------------
  case class JpegRow(doc_id: Long, valid: Boolean, width: Option[Long],
      height: Option[Long], sums_in_band: Option[Boolean])

  /** JPEG closes the raster family with the codec real corpora are
    * mostly made of (the reference decodes JPEG via PIL:
    * `Week#6_assignment.ipynb:443-499`, `samoyed_puppy_dog_pictures
    * .jpg`). JPEG is LOSSY — channel sums are approximations, so the
    * oracle checks what survives the codec exactly: dimensions,
    * corrupt-row rejection (half-cut streams throw in the Huffman
    * walk), and a banded-decode flag. `sums_in_band` compares the
    * decoded channel means against the closed form inside the engine
    * (|decoded − exact| < 32 per channel, the same band MediaSpec
    * gates); the oracle pins it TRUE for every valid row, so a decoder
    * that parses only the SOF header — right dims, no raster — still
    * fails the query. Scale shape: identical to q89/q91 (narrow scan,
    * one mapPartitions, zero shuffles).
    */
  def q92JpegDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.media.RasterCodec
    val src = Tables.documents(s, dir).select($"doc_id").as[Long]
    src.mapPartitions { it =>
      it.map { id =>
        val w = (4 + id % 5).toInt
        val h = (3 + id % 4).toInt
        def chan(c: Int)(p: Int): Long = (id * 31 + p * 7 + c * 11) % 256
        val jpg = RasterCodec.encode("jpg", w, h, { p =>
          (chan(0)(p).toInt << 16) | (chan(1)(p).toInt << 8) | chan(2)(p).toInt
        })
        val bytes = if (id % 97 == 0) jpg.take(jpg.length / 2) else jpg
        RasterCodec.decode(bytes) match {
          case Some(i) =>
            val n = (w * h).toDouble
            def inBand(got: Long, c: Int): Boolean =
              math.abs(got / n - (0 until w * h).map(chan(c)).sum / n) < 32.0
            JpegRow(id, valid = true, Some(i.width.toLong),
              Some(i.height.toLong),
              Some(inBand(i.sumR, 0) && inBand(i.sumG, 1) &&
                inBand(i.sumB, 2)))
          case None => JpegRow(id, valid = false, None, None, None)
        }
      }
    }.toDF()
  }

  // --- q90: REAL audio decode (WAV/PCM via JDK javax.sound) ---------------
  case class WavRow(doc_id: Long, valid: Boolean, n_samples: Option[Long],
      sample_rate: Option[Long], sum_pcm: Option[Long],
      peak_abs: Option[Long])

  /** End-to-end AUDIO decode — real WAV containers (RIFF header + PCM
    * frames, written by the JDK's own encoder) decoded back through
    * [[graft.ops.media.WavCodec]] (`javax.sound.sampled`, in-JVM).
    * Sample i of document d follows the closed form
    * ((d·31 + i·7) mod 4096) − 2048, so the oracle aggregates the
    * formula while the engine recovers it from actual RIFF bytes.
    * Every 97th document is truncated to half — the WAV reader
    * silently returns FEWER frames on a cut stream (no exception,
    * unlike PNG), so the codec's declared-vs-read frame check is what
    * flags it invalid; that contract is exactly what this query
    * exercises.
    *
    * Scale shape: narrow per-row transform, one mapPartitions stage,
    * zero shuffles (q38's batch shape).
    */
  def q90WavDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.media.WavCodec
    val src = Tables.documents(s, dir).select($"doc_id").as[Long]
    src.mapPartitions { it =>
      it.map { id =>
        val n = (64 + id % 64).toInt
        val wav = WavCodec.encodePcm16(8000, n,
          i => (((id * 31 + i * 7) % 4096) - 2048).toShort)
        val bytes = if (id % 97 == 0) wav.take(wav.length / 2) else wav
        WavCodec.decode(bytes) match {
          case Some(a) => WavRow(id, valid = true, Some(a.nSamples),
            Some(a.sampleRate.toLong), Some(a.sumPcm), Some(a.peakAbs))
          case None => WavRow(id, valid = false, None, None, None, None)
        }
      }
    }.toDF()
      .select($"doc_id", $"valid", $"n_samples", $"sample_rate",
        $"sum_pcm", $"peak_abs",
        graft.core.Exact.dround($"sum_pcm" / $"n_samples", 4)
          .as("mean_pcm"))
  }

  // --- q39: frame sampling (video-style strided byte slicing) -------------
  def q39FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"text",
        explode(sequence(lit(0), lit(3))).as("frame_idx"))
      .withColumn("off", expr("frame_idx * (length(text) div 4) + 1"))
      .filter($"off" + 15 <= length($"text"))
      .select($"doc_id", $"frame_idx",
        expr("substring(text, off, 16)").as("frame"))
  }

  // --- q44: media feature-extract + resize (stub decode, real plumbing) --
  /** Feature vector = 4-bin byte-class histogram; "resize" = stride-8
    * downsample of the payload. Both deterministic stand-ins for codec
    * feature extraction (no media libs offline), both cross-engine
    * checkable.
    */
  def q44MediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def bin(re: String) = length(regexp_replace($"text", re, ""))
    // feature vector serialized to a string: the driver's pandas
    // comparator cannot hash raw array cells
    Tables.documents(s, dir)
      .select($"doc_id",
        concat_ws(",",
          array(bin("[^a-g]"), bin("[^h-n]"), bin("[^o-u]"), bin("[^v-z]")))
          .as("features"),
        // empty payloads: Spark's sequence(1, 0, 8) throws where the
        // oracle's generate_series yields an empty list — guard to ''
        expr("CASE WHEN length(text) = 0 THEN '' ELSE concat_ws('', " +
          "transform(sequence(1, length(text), 8), " +
          "g -> substring(text, g, 1))) END").as("thumb"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_asof_join"     -> (q36AsOf _),
    "q37_json_validate" -> (q37JsonValidate _),
    "q38_media_meta"    -> (q38MediaMeta _),
    "q39_frame_sample"  -> (q39FrameSample _),
    "q44_media_features" -> (q44MediaFeatures _),
    "q82_image_decode"  -> (q82ImageDecode _),
    "q89_png_decode"    -> (q89PngDecode _),
    "q90_wav_decode"    -> (q90WavDecode _),
    "q91_bmp_decode"    -> (q91BmpDecode _),
    "q92_jpeg_decode"   -> (q92JpegDecode _),
    "q93_gif_decode"    -> (q93GifDecode _),
    "q99_image_resize"  -> (q99ImageResize _),
    "q100_video_decode" -> (q100VideoDecode _),
  )

  private val RasterClosedFormSql =
    """WITH dims AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      |  FROM documents),
      |px AS (SELECT doc_id, w, h, p FROM dims, generate_series(0, 55) g(p)
      |  WHERE p < w * h),
      |s AS (SELECT doc_id,
      |  SUM((doc_id * 31 + p * 7) % 256) sr,
      |  SUM((doc_id * 31 + p * 7 + 11) % 256) sg,
      |  SUM((doc_id * 31 + p * 7 + 22) % 256) sb,
      |  COUNT(*) n
      | FROM px GROUP BY 1)
      |SELECT d.doc_id, d.doc_id % 97 != 0 AS valid,
      | CASE WHEN d.doc_id % 97 != 0 THEN d.w END AS width,
      | CASE WHEN d.doc_id % 97 != 0 THEN d.h END AS height,
      | CASE WHEN d.doc_id % 97 != 0 THEN
      |   CAST(ROUND(CAST((s.sr / s.n) AS DECIMAL(28,10)), 4) AS DOUBLE)
      | END AS mean_r,
      | CASE WHEN d.doc_id % 97 != 0 THEN
      |   CAST(ROUND(CAST((s.sg / s.n) AS DECIMAL(28,10)), 4) AS DOUBLE)
      | END AS mean_g,
      | CASE WHEN d.doc_id % 97 != 0 THEN
      |   CAST(ROUND(CAST((s.sb / s.n) AS DECIMAL(28,10)), 4) AS DOUBLE)
      | END AS mean_b
      |FROM dims d JOIN s USING (doc_id)""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    "q36_asof_join" ->
      """WITH clicks AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |errors AS (SELECT user_id, ts, event_id err_id FROM events
        |  WHERE event_type = 'error')
        |SELECT c.user_id, COUNT(*) AS n_clicks,
        | COUNT(e.err_id) AS n_with_prior_error,
        | MAX(e.err_id) AS max_err_id
        |FROM clicks c ASOF LEFT JOIN errors e
        |  ON c.user_id = e.user_id AND e.ts <= c.ts
        |GROUP BY c.user_id""".stripMargin,
    "q37_json_validate" ->
      """SELECT (json_extract(props, '$.k') IS NOT NULL) AS valid,
        | CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        | COUNT(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    // closed-form twin of the in-plan raster: channel c of pixel p is
    // (doc_id*31 + p*7 + c*11) % 256, so the oracle sums the formula
    // the decoder must recover from the actual bytes — q82 from an
    // uncompressed P6 payload, q89 from a real DEFLATE stream; ONE
    // definition (RasterClosedFormSql) so the twins can never drift
    "q82_image_decode" -> RasterClosedFormSql,
    "q89_png_decode"   -> RasterClosedFormSql,
    "q91_bmp_decode"   -> RasterClosedFormSql,
    // GIF's closed form lives one level up (palette index, then
    // palette entry): pixel p of doc d -> index (d + 3p) mod 16 ->
    // channel c = ((37/53/71)*idx + (5/11/23)) mod 256. h >= 5 keeps
    // the dims inside the JDK GIF codec's verified-exact region.
    "q93_gif_decode" ->
      """WITH dims AS (SELECT doc_id, 4 + doc_id % 5 AS w, 5 + doc_id % 4 AS h
        |  FROM documents),
        |px AS (SELECT doc_id, w, h, (doc_id + 3 * p) % 16 AS k
        |  FROM dims, generate_series(0, 63) g(p) WHERE p < w * h),
        |s AS (SELECT doc_id,
        |  SUM((37 * k + 5) % 256) sr,
        |  SUM((53 * k + 11) % 256) sg,
        |  SUM((71 * k + 23) % 256) sb,
        |  COUNT(*) n
        | FROM px GROUP BY 1)
        |SELECT d.doc_id, d.doc_id % 97 != 0 AS valid,
        | CASE WHEN d.doc_id % 97 != 0 THEN d.w END AS width,
        | CASE WHEN d.doc_id % 97 != 0 THEN d.h END AS height,
        | CASE WHEN d.doc_id % 97 != 0 THEN
        |   CAST(ROUND(CAST((s.sr / s.n) AS DECIMAL(28,10)), 4) AS DOUBLE)
        | END AS mean_r,
        | CASE WHEN d.doc_id % 97 != 0 THEN
        |   CAST(ROUND(CAST((s.sg / s.n) AS DECIMAL(28,10)), 4) AS DOUBLE)
        | END AS mean_g,
        | CASE WHEN d.doc_id % 97 != 0 THEN
        |   CAST(ROUND(CAST((s.sb / s.n) AS DECIMAL(28,10)), 4) AS DOUBLE)
        | END AS mean_b
        |FROM dims d JOIN s USING (doc_id)""".stripMargin,
    // JPEG is lossy: the oracle pins what survives the codec exactly —
    // dims, half-cut rejection, and the banded-decode flag (TRUE on
    // every valid row; the engine computes it from real decoded sums)
    "q92_jpeg_decode" ->
      """WITH dims AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        |  FROM documents)
        |SELECT doc_id, doc_id % 97 != 0 AS valid,
        | CASE WHEN doc_id % 97 != 0 THEN CAST(w AS BIGINT) END AS width,
        | CASE WHEN doc_id % 97 != 0 THEN CAST(h AS BIGINT) END AS height,
        | CASE WHEN doc_id % 97 != 0 THEN TRUE END AS sums_in_band
        |FROM dims""".stripMargin,
    "q90_wav_decode" ->
      // closed-form twin of the in-plan PCM payload: sample i of doc d
      // is ((d*31 + i*7) mod 4096) - 2048; the oracle aggregates the
      // formula the codec must recover from real RIFF bytes
      """WITH dims AS (SELECT doc_id, 64 + doc_id % 64 AS n FROM documents),
        |sm AS (SELECT doc_id, n,
        |  CAST(SUM((doc_id * 31 + i * 7) % 4096 - 2048) AS BIGINT) sp,
        |  CAST(MAX(ABS((doc_id * 31 + i * 7) % 4096 - 2048)) AS BIGINT) pk
        | FROM dims, generate_series(0, 127) g(i) WHERE i < n GROUP BY 1, 2)
        |SELECT doc_id, doc_id % 97 != 0 AS valid,
        | CASE WHEN doc_id % 97 != 0 THEN CAST(n AS BIGINT) END AS n_samples,
        | CASE WHEN doc_id % 97 != 0 THEN CAST(8000 AS BIGINT) END AS sample_rate,
        | CASE WHEN doc_id % 97 != 0 THEN sp END AS sum_pcm,
        | CASE WHEN doc_id % 97 != 0 THEN pk END AS peak_abs,
        | CASE WHEN doc_id % 97 != 0 THEN
        |   CAST(ROUND(CAST((sp / n) AS DECIMAL(28,10)), 4) AS DOUBLE)
        | END AS mean_pcm
        |FROM sm""".stripMargin,
    "q38_media_meta" ->
      """SELECT doc_id,
        | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |   ELSE 'video' END AS kind,
        | length(text) AS n_bytes,
        | 64 + (length(text) * 7 + ascii(substr(text, 1, 1))) % 1857 AS width,
        | 64 + (length(text) * 13) % 1017 AS height
        |FROM documents""".stripMargin,
    "q100_video_decode" ->
      // JPEG frames are lossy, so the oracle pins the exact-surviving
      // facts: frame count, dims, truncation rejection; the band flag
      // is engine-computed (q92's pattern)
      """WITH dims AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        |  FROM documents)
        |SELECT doc_id, doc_id % 97 != 0 AS valid,
        | CASE WHEN doc_id % 97 != 0 THEN CAST(3 AS BIGINT) END AS n_frames,
        | CASE WHEN doc_id % 97 != 0 THEN CAST(w AS BIGINT) END AS width,
        | CASE WHEN doc_id % 97 != 0 THEN CAST(h AS BIGINT) END AS height,
        | CASE WHEN doc_id % 97 != 0 THEN TRUE END AS sums_in_band
        |FROM dims""".stripMargin,
    "q99_image_resize" ->
      // the q89 closed form composed over the EVEN pixel lattice: NN
      // target pixel q maps to source p = (2*(q div wo))*w + 2*(q mod
      // wo); series 0..11 (12 values, inclusive) covers max wo*ho =
      // 12 (wo=4, ho=3 from w=8, h=6) — re-derive if the dims family
      // ever widens, the guard is `q < wo * ho` not the series bound
      """WITH dims AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        |  FROM documents),
        |rd AS (SELECT doc_id, w, h, w // 2 AS wo, h // 2 AS ho FROM dims),
        |px AS (SELECT doc_id, wo, ho,
        |  ((2 * (q // wo)) * w + 2 * (q % wo)) AS p
        |  FROM rd, generate_series(0, 11) g(q) WHERE q < wo * ho),
        |s AS (SELECT doc_id,
        |  SUM((doc_id * 31 + p * 7) % 256) sr,
        |  SUM((doc_id * 31 + p * 7 + 11) % 256) sg,
        |  SUM((doc_id * 31 + p * 7 + 22) % 256) sb,
        |  COUNT(*) n
        | FROM px GROUP BY 1)
        |SELECT d.doc_id, d.doc_id % 97 != 0 AS valid,
        | CASE WHEN d.doc_id % 97 != 0 THEN d.wo END AS width,
        | CASE WHEN d.doc_id % 97 != 0 THEN d.ho END AS height,
        | CASE WHEN d.doc_id % 97 != 0 THEN
        |   CAST(ROUND(CAST((s.sr / s.n) AS DECIMAL(28,10)), 4) AS DOUBLE)
        | END AS mean_r,
        | CASE WHEN d.doc_id % 97 != 0 THEN
        |   CAST(ROUND(CAST((s.sg / s.n) AS DECIMAL(28,10)), 4) AS DOUBLE)
        | END AS mean_g,
        | CASE WHEN d.doc_id % 97 != 0 THEN
        |   CAST(ROUND(CAST((s.sb / s.n) AS DECIMAL(28,10)), 4) AS DOUBLE)
        | END AS mean_b
        |FROM rd d JOIN s USING (doc_id)""".stripMargin,
    "q44_media_features" ->
      """SELECT doc_id,
        | array_to_string(
        |  [length(regexp_replace(text, '[^a-g]', '', 'g')),
        |   length(regexp_replace(text, '[^h-n]', '', 'g')),
        |   length(regexp_replace(text, '[^o-u]', '', 'g')),
        |   length(regexp_replace(text, '[^v-z]', '', 'g'))], ',') AS features,
        | COALESCE(array_to_string(list_transform(
        |   generate_series(1, length(text), 8),
        |   g -> substr(text, g, 1)), ''), '') AS thumb
        |FROM documents""".stripMargin,
    "q39_frame_sample" ->
      """SELECT doc_id, frame_idx,
        | substr(text, off, 16) AS frame
        |FROM (SELECT doc_id, text, g AS frame_idx,
        |   g * (length(text) // 4) + 1 AS off
        |  FROM documents, generate_series(0, 3) t(g))
        |WHERE off + 15 <= length(text)""".stripMargin,
  )
}
