package graft.functions

import graft.geo.Rijksdriehoek
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.struct
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the RD -> WGS84 polynomial transform
 * (reference: bag/rijksdriehoek.py — published Schreutelkamp & Strang van
 * Hees coefficients; the kernel lives in [[graft.geo.Rijksdriehoek]]).
 * Replaces the boxed struct-returning Scala UDF in the scan-side hot path:
 * the generated code calls the static kernel directly inside
 * WholeStageCodegen with no Row/Option/Tuple allocation per row.
 */
object GeoKernels {
  // per-axis kernels: each evaluates ONLY its own polynomial series — no
  // Tuple2 allocation, no discarded half
  def lat(x: Double, y: Double): Double = Rijksdriehoek.rdToLat(x, y)
  def lon(x: Double, y: Double): Double = Rijksdriehoek.rdToLon(x, y)
}

private[functions] trait RdBinary extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (double, double), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
}

/** rd_lat(x, y): WGS84 latitude of an RD coordinate. */
case class RdToLat(left: Expression, right: Expression) extends RdBinary {
  override def prettyName: String = "rd_lat"
  override def nullSafeEval(x: Any, y: Any): Any =
    GeoKernels.lat(x.asInstanceOf[Double], y.asInstanceOf[Double])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.GeoKernels.lat($x, $y);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RdToLat =
    copy(left = l, right = r)
}

/** rd_lon(x, y): WGS84 longitude of an RD coordinate. */
case class RdToLon(left: Expression, right: Expression) extends RdBinary {
  override def prettyName: String = "rd_lon"
  override def nullSafeEval(x: Any, y: Any): Any =
    GeoKernels.lon(x.asInstanceOf[Double], y.asInstanceOf[Double])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.GeoKernels.lon($x, $y);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RdToLon =
    copy(left = l, right = r)
}

object GeoExpressions {
  def rdLat(x: Column, y: Column): Column =
    ColumnBridge.column(RdToLat(ColumnBridge.expression(x), ColumnBridge.expression(y)))
  def rdLon(x: Column, y: Column): Column =
    ColumnBridge.column(RdToLon(ColumnBridge.expression(x), ColumnBridge.expression(y)))

  /** Drop-in for the UDF struct shape: (latitude, longitude). */
  def rdToWgs84Struct(x: Column, y: Column): Column =
    struct(rdLat(x, y).as("latitude"), rdLon(x, y).as("longitude"))
}
