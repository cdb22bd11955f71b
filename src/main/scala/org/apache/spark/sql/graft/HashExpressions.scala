package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd 60-bit md5 prefix (see [[graft.functions.HashUtil]]) —
  * the hot hash of the fingerprint/SimHash operators, equal by
  * construction to `conv(substring(md5(x), 1, 15), 16, 10)` but
  * computed from digest bytes without the hex render + string base
  * conversion.
  */
case class Md5Prefix60Expr(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override protected def nullSafeEval(s: Any): Any =
    graft.functions.HashUtil.md5Prefix60(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.HashUtil.md5Prefix60($s)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
