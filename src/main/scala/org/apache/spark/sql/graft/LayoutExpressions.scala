package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Codegen'd Morton (Z-order) interleave of two 16-bit dimension keys
  * (see [[graft.functions.Morton]]) — the data-layout key behind
  * two-dimensional file clustering. A write path orders or
  * range-partitions by this value; a read path gets file-level min/max
  * pruning on BOTH input dimensions.
  */
case class ZOrder16Expr(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "z_order16"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    graft.functions.Morton.zOrder16(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.Morton.zOrder16($x, $y)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
