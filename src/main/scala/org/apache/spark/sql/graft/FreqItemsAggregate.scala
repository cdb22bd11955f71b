package org.apache.spark.sql.graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a mergeable aggregate — the
  * heavy-hitters operator for unbounded key domains (builder-prompt
  * "novel sketch" family, same shape as [[TopKByAggregate]]).
  *
  * The exact spelling — groupBy(item).count + top-k — shuffles one
  * counter per DISTINCT item: fine for a 31-token toy vocabulary,
  * unbounded for real corpora (every typo is a key). Misra–Gries keeps
  * at most `capacity` counters per group with the classic guarantee:
  * retained count is an UNDERCOUNT by at most n/capacity, and every
  * item with true frequency > n/capacity survives. Merging sums
  * counters, then subtracts the (capacity+1)-th largest count from all
  * (Agarwal et al., "Mergeable Summaries", PODS'12) — the error bound
  * is preserved through partial aggregation, so the sketch rides the
  * normal two-phase hash aggregate with map-side combine.
  *
  * When capacity >= the number of distinct items, no decrement ever
  * fires and the sketch IS the exact count map — the regime the DuckDB
  * oracle checks (31-token corpus vs capacity 256); the sub-capacity
  * approximation guarantee is spec-tested separately.
  *
  * `weight` generalizes to weighted heavy hitters (e.g. domains
  * weighted by token count): each row contributes `weight` instead of
  * 1, and the undercount bound becomes W/(capacity+1) over total
  * weight W. Rows with null or non-positive weight are skipped.
  *
  * Output: array<struct<item string, cnt long>> of the retained
  * counters, (cnt desc, item asc)-sorted for determinism.
  */
case class FreqItemsAggregate(
    child: Expression, weight: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqItemsBuffer] with ImplicitCastInputTypes {

  require(capacity > 0, "capacity must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def children: Seq[Expression] = Seq(child, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "freq_items"

  override def createAggregationBuffer(): FreqItemsBuffer =
    new FreqItemsBuffer(capacity)

  override def update(buf: FreqItemsBuffer, input: InternalRow): FreqItemsBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val w = weight.eval(input)
      if (w != null) {
        val by = w.asInstanceOf[Number].longValue()
        if (by > 0) buf.add(v.asInstanceOf[UTF8String].toString, by)
      }
    }
    buf
  }

  override def merge(a: FreqItemsBuffer, b: FreqItemsBuffer): FreqItemsBuffer = {
    b.counters.foreach { case (item, c) => a.addRaw(item, c) }
    a.trim()
    a
  }

  override def eval(buf: FreqItemsBuffer): Any = {
    val sorted = buf.counters.toSeq.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    })
  }

  override def serialize(buf: FreqItemsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counters.size)
    buf.counters.foreach { case (item, c) =>
      val b = item.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqItemsBuffer = {
    val in = ByteBuffer.wrap(bytes)
    val buf = new FreqItemsBuffer(capacity)
    val n = in.getInt
    (0 until n).foreach { _ =>
      val len = in.getInt
      val arr = new Array[Byte](len); in.get(arr)
      buf.addRaw(new String(arr, "UTF-8"), in.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): FreqItemsAggregate =
    copy(child = cs(0), weight = cs(1))
}

object FreqItemsAggregate {
  /** Unweighted sketch: every row contributes 1. */
  def apply(child: Expression, capacity: Int): FreqItemsAggregate =
    FreqItemsAggregate(child, Literal(1L), capacity)
}

/** At most `capacity` counters; decrement-all on overflow (update path)
  * or subtract-(capacity+1)-th-largest (merge path, via [[trim]]).
  */
final class FreqItemsBuffer(capacity: Int) {
  val counters = new scala.collection.mutable.HashMap[String, Long]

  /** Weighted MG update: conceptually insert (item, by) as a
    * (capacity+1)-th counter, then subtract the minimum over all
    * capacity+1 counters from every one and drop zeros — at least one
    * counter zeroes, so <= capacity survive, and total decrement stays
    * <= W/(capacity+1). With by=1 this is the classic decrement-all
    * step (the min of positive counters capped at 1 is 1).
    */
  def add(item: String, by: Long): Unit = {
    if (counters.contains(item) || counters.size < capacity)
      counters.update(item, counters.getOrElse(item, 0L) + by)
    else {
      val d = math.min(by, counters.valuesIterator.min)
      counters.mapValuesInPlace((_, c) => c - d)
      counters.filterInPlace((_, c) => c > 0)
      // weight not absorbed by the decrement lands in a freed slot
      val rem = by - d
      if (rem > 0) counters.update(item, rem)
    }
  }

  /** Merge-path insert: counts add without the overflow step; caller
    * runs [[trim]] once after all entries land.
    */
  def addRaw(item: String, by: Long): Unit =
    counters.update(item, counters.getOrElse(item, 0L) + by)

  /** Mergeable-summaries trim: keep the `capacity` largest counters,
    * subtracting the (capacity+1)-th largest from the survivors.
    */
  def trim(): Unit = {
    if (counters.size > capacity) {
      val sorted = counters.toSeq.sortBy { case (item, c) => (-c, item) }
      val sub = sorted(capacity)._2
      counters.clear()
      sorted.take(capacity).foreach { case (item, c) =>
        if (c - sub > 0) counters.update(item, c - sub)
      }
    }
  }
}
