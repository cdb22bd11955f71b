package org.apache.spark.sql.graft

import graft.functions.VectorMath
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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

/** Codegen'd Lloyd-assignment argmin (the kernel under EVERY dense ANN
  * leg, q101→q193): nearest centroid of an array<double> vector among
  * a packed array<struct<cl: long, cvec: array<double>>> centroid
  * column, returned as struct(d2, cl). Replaces the declarative
  * `array_min(transform(cents, c => struct(d2, cl)))` — semantically
  * identical (same composed-dot d2 in the same IEEE operation order,
  * same (d2 asc, cl asc) tie rule, nulls-first undefined distances,
  * null on an empty centroid array) but the lambda evaluated
  * INTERPRETED per candidate with a struct allocation each
  * (KmeansAssignBench measured the HOF form 5.5–6.4× slower per
  * assignment pass at gsf1/gsf10); this compiles to one static call
  * running k tight primitive loops. A NULL vector yields a NULL
  * assignment (the HOF form produced struct(null, min cl) — junk
  * either way; corpora never carry null embeddings and DuckDB's
  * nulls-last d2 order never matched the nulls-first struct rule
  * anyway, so clean data is what keeps cross-engine parity in both
  * spellings).
  */
case class NearestCentroidExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _),
          ArrayType(StructType(Array(a, b)), _))
        if a.dataType == LongType &&
          b.dataType.isInstanceOf[ArrayType] &&
          b.dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects (array<double>, array<struct<long, array<double>>>), got ($l, $r)")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType, nullable = true),
    StructField("cl", LongType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(v: Any, cents: Any): Any =
    VectorMath.nearestCentroid(
      v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cents) => {
      val r = ctx.freshName("nearestResult")
      s"""InternalRow $r = graft.functions.VectorMath.nearestCentroid($v, $cents);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
