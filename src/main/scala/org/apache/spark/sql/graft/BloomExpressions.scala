package org.apache.spark.sql.graft

import graft.functions.BloomUtil
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom-filter build aggregate for semi-join runtime prefiltering —
  * the 100 TB pattern when the filter side has too many ROWS to
  * broadcast but its fixed-size SKETCH still fits everywhere: build
  * the bloom in one pass (map-side partials OR together, so the merge
  * is order-independent and the bits are partition-invariant), probe
  * the big side with [[MightContainExpr]] BEFORE its shuffle, then let
  * an exact semi join remove the false positives — results stay exact,
  * the exchange shrinks by the selectivity.
  *
  * Spark's AQE injects a similar runtime filter for some shuffle
  * joins; this surfaces the same capability as an explicit,
  * composable operator (e.g. to prefilter a scan feeding several
  * downstream joins, or to ship a sketch across pipeline stages).
  *
  * State is `numBits` regardless of input cardinality. Buffer is the
  * raw word array; serialization shares [[BloomUtil]]'s layout with
  * the final BinaryType value, so a partial and a final sketch are
  * interchangeable bytes.
  */
case class BloomFilterAggregate(
    child: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  require(numBits >= 64, "numBits must be at least one word")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  require(numHashes > 0 && numHashes <= 16, "numHashes in [1, 16]")

  private def numWords: Int = (numBits + 63) / 64

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.put(buf, numHashes, v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = BloomUtil.serialize(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomUtil.serialize(buf, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomUtil.deserialize(bytes)._2

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): BloomFilterAggregate =
    copy(child = cs(0))
}

/** Codegen'd membership probe against a serialized bloom sketch — no
  * false negatives by construction, so `filter(might_contain(...))`
  * before an exact semi join never changes results, only row counts
  * at the exchange.
  */
case class MightContainExpr(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain"

  override protected def nullSafeEval(bloom: Any, v: Any): Any =
    BloomUtil.contains(bloom.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, v) => s"graft.functions.BloomUtil.contains($b, $v)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
