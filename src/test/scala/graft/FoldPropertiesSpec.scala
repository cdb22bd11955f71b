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
}
