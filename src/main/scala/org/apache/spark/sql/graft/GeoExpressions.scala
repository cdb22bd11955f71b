package org.apache.spark.sql.graft

import graft.functions.Geohash
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions for the geo functions (SURVEY §2.13: G1/G2
  * promoted from UDFs so they stay inside whole-stage codegen — they are
  * hot-path at scale). Each generates a static call into
  * [[graft.functions.Geohash]].
  */
case class GeohashEncodeExpr(lat: Expression, lon: Expression,
    precision: Expression)
  extends TernaryExpression with ImplicitCastInputTypes {

  override def first: Expression = lat
  override def second: Expression = lon
  override def third: Expression = precision
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, DoubleType, IntegerType)
  override def dataType: DataType = StringType
  override def prettyName: String = "geohash_encode"

  override protected def nullSafeEval(la: Any, lo: Any, p: Any): Any =
    UTF8String.fromString(Geohash.encode(
      la.asInstanceOf[Double], lo.asInstanceOf[Double], p.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (la, lo, p) =>
      s"UTF8String.fromString(graft.functions.Geohash.encode($la, $lo, $p))")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(lat = f, lon = s, precision = t)
}

case class GeohashApproxDistanceExpr(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "geohash_approx_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Geohash.approxDistance(a.toString, b.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Geohash.approxDistance($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class GeohashDecodeExpr(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false)))
  override def prettyName: String = "geohash_decode"

  override protected def nullSafeEval(h: Any): Any = {
    val (la, lo) = Geohash.decode(h.toString)
    org.apache.spark.sql.catalyst.InternalRow(la, lo)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val tup = ctx.freshName("latlon")
      s"""scala.Tuple2<Object, Object> $tup =
         |  (scala.Tuple2<Object, Object>) graft.functions.Geohash.decode($h.toString());
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ $tup._1(), $tup._2() });""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class HaversineKmExpr(lat1: Expression, lon1: Expression,
    lat2: Expression, lon2: Expression)
  extends QuaternaryExpression with ImplicitCastInputTypes {

  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "haversine_km"

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    Geohash.haversineKm(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.Geohash.haversineKm($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression =
    copy(lat1 = f, lon1 = s, lat2 = t, lon2 = q)
}
