package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Great-circle distance in kilometres between (lat1,lon1) and (lat2,lon2),
  * in degrees.
  *
  * The reference labels its evaluation metric "Haversine Distance" but
  * actually computes a plain Euclidean distance on scaled degrees
  * (reference: model_architecture.py:119 vs the label at :154). We ship the
  * true haversine as a native Catalyst expression (whole-stage-codegen'd via
  * a static JVM kernel — no boxing, no UDF serialization) and keep the
  * Euclidean form as a composed column function in
  * [[graft.operators.Geo.euclideanDeg]] for reference parity.
  *
  * Deliberately uses an explicit double literal for pi/180 so the arithmetic
  * is reproducible in any engine (DuckDB oracle uses the same literal).
  */
case class HaversineKm(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  // Callers (GraftFunctions.haversine_km) cast children to double; no
  // ExpectsInputTypes here because AbstractDataType is private[sql] in Spark 4.
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "haversine_km"

  override protected def nullSafeEval(lat1: Any, lon1: Any, lat2: Any, lon2: Any): Any =
    HaversineKm.kernel(
      lat1.asInstanceOf[Double], lon1.asInstanceOf[Double],
      lat2.asInstanceOf[Double], lon2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.HaversineKm.kernel($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object HaversineKm {
  /** pi/180 as an explicit double literal (engine-portable, see class doc). */
  final val DegToRad: Double = 0.017453292519943295
  /** IUGG mean earth radius, km. */
  final val EarthRadiusKm: Double = 6371.0088

  /** Static kernel invoked from generated code — keep arithmetic order stable. */
  def kernel(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = (lat2 - lat1) * DegToRad
    val dLon = (lon2 - lon1) * DegToRad
    val sLat = Math.sin(dLat / 2)
    val sLon = Math.sin(dLon / 2)
    val a = sLat * sLat +
      Math.cos(lat1 * DegToRad) * Math.cos(lat2 * DegToRad) * sLon * sLon
    val root = Math.sqrt(a)
    2.0 * EarthRadiusKm * Math.asin(if (root > 1.0) 1.0 else root)
  }
}
