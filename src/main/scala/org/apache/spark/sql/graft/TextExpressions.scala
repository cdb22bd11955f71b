package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (see [[graft.functions.TextUtil.nfc]]) —
  * Spark has no builtin normalizer, and a corpus-cleaning pipeline
  * needs one before any hash-based dedup (decomposed "e" + U+0301 and
  * precomposed "é" must fingerprint identically). Codegen'd with an
  * ASCII fast path, so it sits inside whole-stage codegen like the
  * other per-row text transforms. Matches DuckDB's `nfc_normalize`
  * (both implement Unicode NFC).
  */
case class NfcNormalizeExpr(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    graft.functions.TextUtil.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextUtil.nfc($s)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
