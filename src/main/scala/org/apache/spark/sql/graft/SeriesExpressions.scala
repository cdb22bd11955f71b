package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Catalyst expression for the fixed-point Holt–Winters fold over one
  * packed series row (SURVEY §2.12; the shared kernel under
  * q142/q145/q146/q148/q153/q154/q157/q161 and the streaming twins'
  * batch halves). Promoted from a declarative `aggregate(...)` fold
  * whose residual accumulation via `concat(rs, array(r))` copied the
  * growing array every step — O(H²) element copies per series; the
  * static kernel ([[graft.functions.SeriesMath.holtFold]]) writes the
  * pre-sized trajectory positionally in O(H + m) and stays inside
  * whole-stage codegen (one static call per series row).
  */
case class HoltFoldExpr(child: Expression, m: Int = 24)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(m > 0, "season length must be positive")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType, containsNull = false))
  override def dataType: DataType = StructType(Seq(
    StructField("l", LongType, nullable = false),
    StructField("b", LongType, nullable = false),
    StructField("ss", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("rs", ArrayType(LongType, containsNull = false),
      nullable = false)))
  // null for series shorter than two seasons, even on non-null input
  override def nullable: Boolean = true
  override def prettyName: String = "holt_fold"

  override protected def nullSafeEval(sv: Any): Any =
    graft.functions.SeriesMath.holtFold(
      sv.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sv => {
      s"""
         |${ev.value} = graft.functions.SeriesMath.holtFold($sv, $m);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
