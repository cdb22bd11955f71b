package org.apache.spark.sql.graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Grouped top-k as a mergeable aggregate (SURVEY §2.7 O4 "grouped
  * top-k", done natively).
  *
  * Spark's idiom — `row_number().over(Window.partitionBy(g).orderBy(o
  * desc)) <= k` — SORTS every row of every group. This aggregate keeps
  * a bounded min-heap of k entries per group, merges partial heaps
  * map-side, and emits the top k sorted descending: O(n log k) work,
  * O(k) state, no per-group sort, and it rides the normal hash
  * aggregate (partial aggregation before the shuffle — the window form
  * shuffles every row).
  *
  * Shape: input (ord DOUBLE, payload STRING) → output
  * array<struct<ord double, payload string>> (k entries, ord desc,
  * payload asc tie-break for determinism).
  */
case class TopKByAggregate(
    ord: Expression, payload: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

  require(k > 0, "k must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, StringType)

  override def children: Seq[Expression] = Seq(ord, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("payload", StringType))), containsNull = false)
  override def prettyName: String = "top_k_by"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ord.eval(input)
    if (o != null) {
      val p = payload.eval(input)
      buf.add(o.asInstanceOf[Double],
        if (p == null) null else p.asInstanceOf[UTF8String].toString)
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    b.entries.foreach { case (o, p) => a.add(o, p) }
    a
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.entries.sortBy { case (o, p) =>
      (-o, if (p == null) "" else p)
    }
    new GenericArrayData(sorted.map { case (o, p) =>
      InternalRow(o, if (p == null) null else UTF8String.fromString(p))
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val es = buf.entries
    out.writeInt(es.size)
    es.foreach { case (o, p) =>
      out.writeDouble(o)
      val b = if (p == null) null else p.getBytes("UTF-8")
      out.writeInt(if (b == null) -1 else b.length)
      if (b != null) out.write(b)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(k)
    val n = in.getInt
    (0 until n).foreach { _ =>
      val o = in.getDouble
      val len = in.getInt
      val p = if (len < 0) null else {
        val arr = new Array[Byte](len); in.get(arr); new String(arr, "UTF-8")
      }
      buf.add(o, p)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): TopKByAggregate =
    copy(ord = cs(0), payload = cs(1))
}

/** Bounded min-heap of (ord, payload); ties broken on payload so the
  * retained set is deterministic regardless of arrival order.
  */
final class TopKBuffer(k: Int) {
  private val heap = new java.util.PriorityQueue[(Double, String)](
    k, (a: (Double, String), b: (Double, String)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      // min-heap on ord; for equal ord evict the LARGER payload so the
      // kept set is the lexicographically smallest (matches sort order)
      if (c != 0) c
      else -Ordering[String].compare(
        if (a._2 == null) "" else a._2, if (b._2 == null) "" else b._2)
    })

  def add(o: Double, p: String): Unit = {
    if (heap.size < k) heap.add((o, p))
    else {
      val head = heap.peek()
      val better = o > head._1 || (o == head._1 &&
        Ordering[String].compare(if (p == null) "" else p,
          if (head._2 == null) "" else head._2) < 0)
      if (better) { heap.poll(); heap.add((o, p)) }
    }
  }

  def entries: Seq[(Double, String)] = {
    import scala.jdk.CollectionConverters._
    heap.iterator().asScala.toSeq
  }
}
