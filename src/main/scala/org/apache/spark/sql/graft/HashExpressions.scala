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

/** One-pass deduped char-n-gram xxhash64 stream (see
  * [[graft.functions.HashUtil.gramHashesDistinct]]) — replaces the
  * interpreted `array_distinct(transform(sequence(...), g ->
  * xxhash64(substring(...))))` stack in the dedup gram pipelines.
  */
case class GramHashesExpr(child: Expression, gramLen: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(gramLen > 0)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override protected def nullSafeEval(s: Any): Any =
    graft.functions.HashUtil.gramHashesDistinct(
      s.asInstanceOf[UTF8String], gramLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.HashUtil.gramHashesDistinct($s, $gramLen)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One-pass deduped n-token shingle md5Prefix60 stream (see
  * [[graft.functions.HashUtil.tokenShingleHashes]]) — contamination-
  * screen hot path.
  */
case class TokenShingleHashesExpr(child: Expression, n: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(n > 0)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_shingle_hashes"

  override protected def nullSafeEval(s: Any): Any =
    graft.functions.HashUtil.tokenShingleHashes(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.HashUtil.tokenShingleHashes($s, $n)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One-pass winnowing fingerprint stats (see
  * [[graft.functions.HashUtil.winnowStats]]): struct(n_fingerprints,
  * min_fp, max_fp) of the 8-wide window minima over the char-8-gram
  * md5Prefix60 stream.
  */
case class WinnowStatsExpr(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_fingerprints", LongType, nullable = false),
    StructField("min_fp", LongType),
    StructField("max_fp", LongType)))
  override def prettyName: String = "winnow_stats"

  override protected def nullSafeEval(s: Any): Any =
    graft.functions.HashUtil.winnowStats(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.HashUtil.winnowStats($s)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
