package org.apache.spark.sql.graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct sketch: the k smallest DISTINCT
  * values of a uniform long hash, as a mergeable aggregate (SURVEY
  * §2.13 sketch family, next to bloom_agg/freq_items).
  *
  * Cardinality estimation at 100 TB: exact count(distinct key) is a
  * full shuffle of every distinct key; this keeps O(k) state per
  * group, merges partial sketches map-side (union-then-trim — the KMV
  * merge), and ships k longs per partition instead of the key set.
  * From the result the standard bottom-k estimator is
  * (k−1) / U(k) where U(k) is the k-th smallest hash scaled to (0,1)
  * (Bar-Yossef et al. 2002; Beyer et al., SIGMOD 2007) — expected
  * relative error ≈ 1/sqrt(k−2), so k=256 gives ~6%.
  *
  * DISTINCTNESS is the load-bearing contract: duplicates of a key
  * produce the same hash and must occupy ONE slot, or repetition
  * skew (the norm in a web corpus) biases the estimate low. The
  * buffer is a bounded sorted set, not a heap of rows.
  *
  * Determinism: with a deterministic hash (md5_prefix60) the retained
  * set is a pure function of the input KEY SET — partition- and
  * order-invariant, hence oracle-checkable (q103) — unlike
  * approx_count_distinct's HLL whose estimate is not replicable in
  * another engine.
  *
  * Shape: input LONG (a hash, e.g. md5_prefix60(key)) → output
  * array<long>, the ≤k smallest distinct values ascending. NULL
  * inputs are skipped.
  */
case class BottomKDistinctAggregate(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKSet] with ImplicitCastInputTypes {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottom_k_distinct"

  override def createAggregationBuffer(): BottomKSet = new BottomKSet(k)

  override def update(buf: BottomKSet, input: InternalRow): BottomKSet = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BottomKSet, b: BottomKSet): BottomKSet = {
    b.foreach(a.add)
    a
  }

  override def eval(buf: BottomKSet): Any =
    new GenericArrayData(buf.sortedValues)

  override def serialize(buf: BottomKSet): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val vs = buf.sortedValues
    out.writeInt(vs.length)
    vs.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BottomKSet = {
    val in = ByteBuffer.wrap(bytes)
    val buf = new BottomKSet(k)
    val n = in.getInt
    (0 until n).foreach(_ => buf.add(in.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKDistinctAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKDistinctAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): BottomKDistinctAggregate =
    copy(child = cs(0))
}

/** Bounded sorted set of the k smallest distinct longs. TreeSet gives
  * O(log k) insert/evict and free dedup; beyond k elements the largest
  * is evicted, and an incoming value ≥ the current maximum is rejected
  * without insertion (the common case on a full sketch).
  */
final class BottomKSet(k: Int) {
  private val set = new java.util.TreeSet[java.lang.Long]()

  def add(v: Long): Unit = {
    if (set.size < k) { set.add(v); () }
    else if (v < set.last()) {
      if (set.add(v)) { set.pollLast(); () }
    }
  }

  def foreach(f: Long => Unit): Unit = {
    val it = set.iterator()
    while (it.hasNext) f(it.next())
  }

  def sortedValues: Array[Long] = {
    val out = new Array[Long](set.size)
    var i = 0
    val it = set.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}
