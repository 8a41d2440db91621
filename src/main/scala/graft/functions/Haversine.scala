package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType}

/** Great-circle distance in kilometers — a native Catalyst `Expression` with
  * whole-stage codegen (`doGenCode`), demonstrating the custom-function
  * extension point the reference exposes through Beam DoFns (§2.11). A Scala
  * UDF would compute the same value but break codegen and box every row;
  * this compiles straight into the generated Java of the enclosing stage.
  *
  * Registered as SQL function `haversine_km` by [[graft.plans.GraftExtensions]].
  */
case class HaversineDistance(lat1: Expression, lon1: Expression,
    lat2: Expression, lon2: Expression)
  extends QuaternaryExpression with Serializable {

  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2
  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    lat1.nullable || lon1.nullable || lat2.nullable || lon2.nullable
  override def prettyName: String = "haversine_km"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = children.filterNot(_.dataType == DoubleType)
    if (bad.isEmpty) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"haversine_km expects DOUBLE inputs, got ${bad.map(_.dataType.simpleString).mkString(",")}")
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    HaversineDistance.compute(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.HaversineDistance.compute($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): Expression =
    copy(lat1 = newFirst, lon1 = newSecond, lat2 = newThird, lon2 = newFourth)
}

object HaversineDistance {
  final val EarthRadiusKm = 6371.0088

  /** Static so generated code can call it directly. */
  def compute(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * EarthRadiusKm * math.asin(math.min(1.0, math.sqrt(a)))
  }

  def apply(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(HaversineDistance(
      expression(lat1.cast("double")), expression(lon1.cast("double")),
      expression(lat2.cast("double")), expression(lon2.cast("double"))))
  }
}
