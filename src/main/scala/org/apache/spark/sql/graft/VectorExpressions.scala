package org.apache.spark.sql.graft

import graft.functions.VectorMath
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector dot product (SURVEY §2.13): the similarity/ANN hot
  * path. The declarative `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`
  * form is correct but interpreted — higher-order functions evaluate a
  * lambda per element outside whole-stage codegen, and at 100 TB the
  * dot product runs N×dims times per query. This compiles to a single
  * static call on the unsafe array data, same left-to-right double
  * accumulation (bit-identical to DuckDB `list_dot_product`, so the
  * similarity oracles still hash-match), null on length mismatch or
  * null elements exactly like the zip_with form.
  */
case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotResult")
      s"""java.lang.Double $r = graft.functions.VectorMath.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
