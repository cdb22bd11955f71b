package graft

import graft.operators.{Dedup, Relational}
import graft.ops.media.Ppm

/** Seeded randomized properties for the in-row fold operators: each
  * case generates hundreds of adversarial inputs and compares against
  * an independently-written direct computation. Seeds are fixed so
  * failures reproduce.
  */
class FoldPropertiesSpec extends SparkTestBase {

  test("ppm: encode→decode round-trips exact dims and sums; any " +
    "truncation rejects (200 random images)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val w = 1 + rnd.nextInt(12); val h = 1 + rnd.nextInt(9)
      val px = Array.fill(w * h * 3)(rnd.nextInt(256))
      val bytes = (s"P6\n$w $h\n255\n".getBytes("US-ASCII").toSeq ++
        px.map(_.toByte)).toArray
      val img = Ppm.decode(bytes).get
      assert(img.width == w && img.height == h)
      def ch(c: Int) = px.indices.collect {
        case i if i % 3 == c => px(i).toLong
      }.sum
      assert(img.sumR == ch(0) && img.sumG == ch(1) && img.sumB == ch(2))
      assert(Ppm.decode(bytes.dropRight(1 + rnd.nextInt(3))).isEmpty)
      assert(Ppm.decode(bytes ++ Array.fill(1 + rnd.nextInt(3))(0.toByte))
        .isEmpty)
    }
  }

  test("wav: encode→decode round-trips exact sample aggregates; any " +
    "truncation rejects (200 random clips)") {
    import graft.ops.media.WavCodec
    val rnd = new scala.util.Random(19)
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(300)
      val rate = 4000 + rnd.nextInt(44100)
      val xs = Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
      val wav = WavCodec.encodePcm16(rate, n, xs(_))
      val a = WavCodec.decode(wav).get
      assert(a.nSamples == n && a.sampleRate == rate && a.channels == 1)
      assert(a.sumPcm == xs.map(_.toLong).sum)
      assert(a.peakAbs == xs.map(x => math.abs(x.toLong)).max)
      // cut anywhere inside the PCM payload: frames-read < declared
      val cut = wav.length - 2 * (1 + rnd.nextInt(n))
      assert(WavCodec.decode(wav.take(cut)).isEmpty, s"n=$n cut=$cut")
    }
  }

  test("funnel fold: equals brute-force subsequence search over 300 " +
    "random users (ties, bursts, inverted orders)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val types = Array("view", "click", "purchase", "error")
    val W = Relational.FunnelWindowUs
    // timestamps cluster near the window boundary so <=/>/equality
    // edges are actually exercised; duplicates force tie handling
    val rows = (1 to 300).flatMap { uid =>
      val n = 1 + rnd.nextInt(12)
      (1 to n).map { _ =>
        val us = (rnd.nextInt(8).toLong * W / 2) +
          (if (rnd.nextBoolean()) 0L else rnd.nextInt(3).toLong)
        (uid.toLong, us, types(rnd.nextInt(types.length)))
      }
    }
    val got = Relational.funnelDepths(
      rows.toDF("user_id", "us", "event_type"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        r.getAs[Int]("funnel_depth")).toMap
    // direct existence search, independent of the fold
    rows.groupBy(_._1).foreach { case (uid, evs) =>
      def ts(t: String) = evs.collect { case (_, us, `t`) => us }.sorted
      val (vs, cs, ps) = (ts("view"), ts("click"), ts("purchase"))
      val qc = cs.filter(c => vs.exists(v => c > v && c - v <= W))
      val want =
        if (ps.exists(p => qc.exists(c => p > c && p - c <= W))) 3
        else if (qc.nonEmpty) 2
        else if (vs.nonEmpty) 1 else 0
      if (vs.nonEmpty || cs.nonEmpty || ps.nonEmpty)
        assert(got(uid) == want, s"user $uid: ${got(uid)} != $want ($evs)")
      else assert(!got.contains(uid))
    }
  }

  test("funnel fold: invariant under input partitioning and row order " +
    "(the mapPartitions boundary logic cannot depend on either)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(91)
    val types = Array("view", "click", "purchase", "error")
    val W = Relational.FunnelWindowUs
    val rows = (1 to 120).flatMap { uid =>
      (1 to 1 + rnd.nextInt(10)).map { _ =>
        (uid.toLong, rnd.nextInt(6).toLong * W / 2 + rnd.nextInt(3),
          types(rnd.nextInt(types.length)))
      }
    }
    def run(df: org.apache.spark.sql.DataFrame) =
      Relational.funnelDepths(df).collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("funnel_depth"))
        .toMap
    val base = run(rows.toDF("user_id", "us", "event_type"))
    val shuffled = run(rnd.shuffle(rows).toDF("user_id", "us", "event_type")
      .repartition(1))
    val wide = run(rows.reverse.toDF("user_id", "us", "event_type")
      .repartition(17, col("us"))) // deliberately NOT keyed on user
    assert(base.nonEmpty && shuffled == base && wide == base,
      s"partitioning/order changed the census")
  }

  test("funnel fold: one hyper-active user with 1M events streams " +
    "through the fold (skew does not buffer a per-user array)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one bot-like user emitting a million funnel events 1ms apart —
    // the skew profile the collect_list spelling buffered in a single
    // aggregation row; the streaming fold holds O(1) state. A second,
    // ordinary user checks the boundary emit under the same partition.
    val bot = spark.range(1000000L).select(
      lit(1L).as("user_id"), (col("id") * 1000L).as("us"),
      element_at(
        array(lit("view"), lit("click"), lit("purchase"), lit("error")),
        (col("id") % 4 + 1).cast("int")).as("event_type"))
    val human = Seq((2L, 0L, "view"), (2L, 500L, "click"))
      .toDF("user_id", "us", "event_type")
    val got = Relational.funnelDepths(bot.unionAll(human)).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("funnel_depth"))
      .toMap
    assert(got == Map(1L -> 3, 2L -> 2), got.toString)
  }

  test("sessionize: session structure matches a direct gap scan over " +
    "200 random users, including exact-boundary gaps") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val gap = 1800000000L
    // inter-event deltas cluster AT the gap (== must NOT split; +1 must)
    val rows = (1 to 200).flatMap { uid =>
      var us = rnd.nextInt(1000).toLong
      (1 to 1 + rnd.nextInt(10)).map { i =>
        us += (rnd.nextInt(4) match {
          case 0 => gap          // boundary: same session
          case 1 => gap + 1L     // opener
          case 2 => 0L           // same-instant tie
          case _ => rnd.nextInt(1000).toLong
        })
        (uid.toLong, (uid * 1000L + i), us, 1.0)
      }
    }
    val got = Relational.sessionize(
      rows.toDF("user_id", "event_id", "us", "value"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.map(r => (r.getAs[Long]("start_us"),
        r.getAs[Long]("end_us"), r.getAs[Long]("n_events"))).sorted.toSeq)
      .toMap
    rows.groupBy(_._1).foreach { case (uid, evs) =>
      val times = evs.map(_._3).sorted
      val sessions = times.tail.foldLeft(List(List(times.head))) {
        case (acc @ cur :: rest, t) =>
          if (t - cur.head > gap) List(t) :: acc
          else (t :: cur) :: rest
        case (Nil, t) => List(List(t))
      }.map(s => (s.min, s.max, s.size.toLong)).sorted
      assert(got(uid) == sessions, s"user $uid: ${got(uid)} vs $sessions")
    }
  }

  test("corpus repetition fractions: match direct counts over 300 random " +
    "token lists (0..8 tokens, 3-token alphabet)") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(31)
    val alpha = Array("aa", "bb", "cc")
    val docs = (1 to 300).map { id =>
      val toks = Array.fill(rnd.nextInt(9))(alpha(rnd.nextInt(3)))
      (id.toLong, toks.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
      .withColumn(
        "n_chars", org.apache.spark.sql.functions.length($"text"))
    val got = TextAnalysis.corpusFilterCols(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("top_word_frac"),
          r.getAs[Double]("top_bigram_frac"),
          r.getAs[Double]("dup_trigram_frac")))).toMap
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1).toSeq // "" splits to Seq("")
      val bg = toks.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSeq
      val tg = toks.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSeq
      val rw = r4(toks.groupBy(identity).values.map(_.size).max.toDouble /
        toks.size)
      val rb = if (bg.isEmpty) 0.0
        else r4(bg.groupBy(identity).values.map(_.size).max.toDouble /
          bg.size)
      val rt = if (tg.isEmpty) 0.0
        else r4((tg.size - tg.distinct.size).toDouble / tg.size)
      assert(got(id) == ((rw, rb, rt)),
        s"doc $id '$text': ${got(id)} vs ${(rw, rb, rt)}")
    }
  }

  test("holt fold: residual trajectory is EXACTLY translation-invariant " +
    "(300 random series, signed offsets — the floor-halving law)") {
    // adding a constant C to every hourly value shifts the level by
    // exactly C and leaves trend, seasons and residuals untouched —
    // floor((a + 2C)/2) = floor(a/2) + C holds for ALL signed longs,
    // so the invariance is exact, not approximate. This is the law
    // that breaks if anyone swaps the arithmetic shift for truncating
    // division (which rounds toward zero on negatives).
    def residuals(sv: Array[Long]): Seq[Long] = {
      val w24 = sv.take(24).sum
      val l0 = (w24 - (((w24 % 24) + 24) % 24)) / 24
      var l = l0; var b = 0L
      val ss = scala.collection.mutable.Queue(sv.take(24).map(_ - l0): _*)
      (24 until sv.length).map { t =>
        val sh = ss.dequeue(); val x = sv(t)
        val r = x - (l + b + sh)
        val ln = (x - sh + l + b) >> 1
        val bn = (ln - l + b) >> 1
        val sn = (x - ln + sh) >> 1
        ss.enqueue(sn); l = ln; b = bn
        r
      }
    }
    val rnd = new scala.util.Random(23)
    (1 to 300).foreach { _ =>
      val n = 48 + rnd.nextInt(200)
      val sv = Array.fill(n)(rnd.nextLong(2000001L) - 1000000L)
      val c = rnd.nextLong(2000001L) - 1000000L
      assert(residuals(sv) == residuals(sv.map(_ + c)),
        s"translation by $c must not move residuals")
    }
    // the same law through the SPARK fold end to end (one case)
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def frame(off: Double) = (0 until 96).map { h =>
      (new java.sql.Timestamp(base + h * 3600000L),
        (rnd.nextInt(2000) - 1000) / 100.0 + off)
    }.toDF("ts", "value")
    rnd.setSeed(91)
    val a = graft.operators.Anomaly.holtWintersCensus(frame(0.0)).collect()
    rnd.setSeed(91)
    val b = graft.operators.Anomaly.holtWintersCensus(frame(537.29)).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "Spark fold must carry the same invariance")
  }

  test("holt kernel: the positional O(H+m) ring-buffer fold is " +
    "bit-identical to the reference queue recurrence — full state AND " +
    "trajectory, 300 random series + degenerate guards") {
    // the r12→r13 rewrite moved the fold from a declarative
    // aggregate(concat(rs, array(r))) to SeriesMath.holtFold's
    // pre-sized positional writes; this law pins every output field
    // (l, b, seasonal queue order, residual trajectory) to the same
    // reference implementation the translation-invariance test uses
    def reference(sv: Array[Long]): (Long, Long, Seq[Long], Seq[Long]) = {
      val w24 = sv.take(24).sum
      val l0 = (w24 - (((w24 % 24) + 24) % 24)) / 24
      var l = l0; var b = 0L
      val ss = scala.collection.mutable.Queue(sv.take(24).map(_ - l0): _*)
      val rs = (24 until sv.length).map { t =>
        val sh = ss.dequeue(); val x = sv(t)
        val r = x - (l + b + sh)
        val ln = (x - sh + l + b) >> 1
        val bn = (ln - l + b) >> 1
        val sn = (x - ln + sh) >> 1
        ss.enqueue(sn); l = ln; b = bn
        r
      }
      (l, b, ss.toSeq, rs)
    }
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(47)
    (1 to 300).foreach { _ =>
      val n = 48 + rnd.nextInt(700) // up to the ~720-hour month bound
      val sv = Array.fill(n)(rnd.nextLong(2000001L) - 1000000L)
      val row = graft.functions.SeriesMath.holtFold(
        new GenericArrayData(sv), 24)
      val (l, b, ss, rs) = reference(sv)
      assert(row.getLong(0) == l && row.getLong(1) == b)
      assert(row.getArray(2).toLongArray().toSeq == ss,
        "seasonal queue must come out in head..tail order")
      assert(row.getArray(3).toLongArray().toSeq == rs,
        "residual trajectory must be positionally identical")
    }
    // under two seasons -> null (callers filter, the kernel guards)
    assert(graft.functions.SeriesMath.holtFold(
      new GenericArrayData(Array.fill(47)(1L)), 24) == null)
  }

  test("canonical selection: argmax property over 100 random clusters") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 100).flatMap { cid =>
      (1 to 1 + rnd.nextInt(6)).map { i =>
        // coarse qualities force frequent ties
        (cid.toLong, cid * 100L + i, rnd.nextInt(4) / 4.0)
      }
    }
    val got = Dedup.canonicalPerCluster(
      rows.toDF("cluster_id", "doc_id", "quality"))
      .collect().map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("canonical_doc_id"), r.getAs[Long]("n_docs"),
          r.getAs[Double]("quality")))).toMap
    rows.groupBy(_._1).foreach { case (cid, ms) =>
      val best = ms.map(_._3).max
      val want = ms.filter(_._3 == best).map(_._2).min
      assert(got(cid) == ((want, ms.size.toLong, best)), s"cluster $cid")
    }
  }

  test("salted joins: null keys, duplicate dim keys, and empty salts " +
    "all reproduce the plain join exactly (both variants)") {
    import spark.implicits._
    import graft.operators.SkewJoin
    // adversarial frame: a hot key, a null key (must match NOTHING),
    // keys absent from the dim, and a dim with DUPLICATE keys (join
    // multiplicity must replicate per duplicate, not dedup)
    val probe = Seq[(java.lang.Long, Long)](
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (null, 20L), (null, 21L),
      (2L, 30L), (3L, 40L), (99L, 50L))
      .toDF("k", "payload")
    val dim = Seq[(java.lang.Long, String)](
      (1L, "hot-a"), (1L, "hot-b"),   // duplicate key: multiplicity 2
      (2L, "two"), (3L, "three"), (7L, "unused"))
      .toDF("dk", "attr")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select($"k", $"payload", $"attr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    val plain = canon(probe.join(dim, probe("k") === dim("dk")))
    assert(plain.count(_._1 == 1L) == 8, "dup dim key must double the hot rows")
    for (nSalts <- Seq(1, 2, 8)) {
      assert(canon(SkewJoin.saltedJoin(probe, dim, "k", "dk", nSalts))
        == plain, s"saltedJoin nSalts=$nSalts")
      assert(canon(SkewJoin.saltedJoinHot(probe, dim, "k", "dk",
        hotKeys = Seq(1L), nSalts = nSalts)) == plain,
        s"saltedJoinHot nSalts=$nSalts")
      // hot list naming keys absent from either side must be harmless
      assert(canon(SkewJoin.saltedJoinHot(probe, dim, "k", "dk",
        hotKeys = Seq(1L, 99L, 12345L), nSalts = nSalts)) == plain,
        s"saltedJoinHot with phantom hot keys, nSalts=$nSalts")
    }
  }

  test("mergeApply/resolveDeltas: 10 random delta pairs agree with a " +
    "driver-side model, chained and compacted") {
    import spark.implicits._
    import graft.operators.Pipeline
    val rnd = new scala.util.Random(7)
    val snap0 = (0L until 60L).map(i => (i, s"l${i % 3}", s"text$i"))
    val snapDf = snap0.toDF("doc_id", "lang", "text")
    def model(state: Map[Long, (String, String)],
        delta: Seq[(Long, String, String, String)]) =
      delta.foldLeft(state) { case (st, (id, op, lg, tx)) =>
        if (op == "delete") st - id else st + (id -> (lg, tx))
      }
    (1 to 10).foreach { it =>
      def randDelta() = rnd.shuffle((-5L until 65L).toList)
        .take(1 + rnd.nextInt(25)).map { id =>
          (id, if (rnd.nextBoolean()) "upsert" else "delete",
            s"l${rnd.nextInt(3)}", s"new$it-$id-${rnd.nextInt(9)}")
        }
      val d1 = randDelta(); val d2 = randDelta()
      val want = model(model(
        snap0.map(t => t._1 -> (t._2, t._3)).toMap, d1), d2)
        .toSeq.map { case (id, (lg, tx)) => (id, lg, tx) }.sorted
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select($"doc_id", $"lang", $"text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sorted.toSeq
      val d1df = d1.toDF("doc_id", "op", "lang", "text")
      val d2df = d2.toDF("doc_id", "op", "lang", "text")
      val chain = canon(Pipeline.mergeApply(
        Pipeline.mergeApply(snapDf, d1df).select($"doc_id", $"lang", $"text"),
        d2df))
      assert(chain == want, s"iteration $it: chain diverges from model")
      val compact = canon(Pipeline.mergeApply(snapDf,
        Pipeline.resolveDeltas(d1df, d2df)))
      assert(compact == want, s"iteration $it: compacted apply diverges")
    }
  }
}
