package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

import graft.functions.IcosaGrid

/** Column bindings for [[graft.functions.IcosaGrid]] (F3 — the real
  * icosahedral cell codec). Codegen emits a direct static call — no boxing,
  * no UDF registry, stays inside whole-stage codegen like
  * [[VecDot]]. Null in → null out; invalid cell ids fail loudly inside
  * [[IcosaGrid.decode]].
  */
case class IcosaEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == DoubleType && second.dataType == DoubleType &&
        third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"icosa_encode requires (double, double, int), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, ${third.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "icosa_encode"

  override protected def nullSafeEval(lat: Any, lng: Any, res: Any): Any =
    IcosaGrid.encode(lat.asInstanceOf[Double], lng.asInstanceOf[Double],
      res.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lat, lng, res) =>
      s"graft.functions.IcosaGrid.encode($lat, $lng, $res)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): IcosaEncode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

sealed abstract class IcosaDecodeBase extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint cell id, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType
}

/** Latitude (degrees) of an icosa cell's center. */
case class IcosaLat(child: Expression) extends IcosaDecodeBase {
  override def prettyName: String = "icosa_lat"
  override protected def nullSafeEval(cell: Any): Any =
    IcosaGrid.decodeLat(cell.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IcosaGrid.decodeLat($c)")
  override protected def withNewChildInternal(newChild: Expression): IcosaLat =
    copy(child = newChild)
}

/** Longitude (degrees) of an icosa cell's center. */
case class IcosaLng(child: Expression) extends IcosaDecodeBase {
  override def prettyName: String = "icosa_lng"
  override protected def nullSafeEval(cell: Any): Any =
    IcosaGrid.decodeLng(cell.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IcosaGrid.decodeLng($c)")
  override protected def withNewChildInternal(newChild: Expression): IcosaLng =
    copy(child = newChild)
}
