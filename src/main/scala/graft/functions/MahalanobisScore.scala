package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Squared Mahalanobis distance through a fitted eigenbasis, as a fused
  * narrow projection: `Σ_j ((v-μ)·e_j)² / λ_j` with the model (mean,
  * components, ridge-floored inverse eigenvalues) riding INSIDE the
  * expression as driver-collected primitive arrays — the
  * [[NearestCentroid]] discipline. The model is broadcast-sized by
  * contract (d ≤ [[graft.operators.Decomp.MaxDims]], so ≤ d² + 2d
  * doubles).
  *
  * Why native: the same score as a nested `zip_with`/`aggregate` tree
  * costs d² interpreted lambda invocations PER ROW (Spark higher-order
  * functions evaluate their lambdas interpreted even inside
  * whole-stage-codegen stages) — measured 2.47 s for 64-dim × sf0.1
  * versus ~0.4 s through this kernel, a pure projection in one fused
  * JVM loop: centered once into a scratch buffer, then a dense
  * matrix-vector pass. Zero Exchange; vectors never leave their input
  * partition. Returns null only for a null input vector.
  */
case class MahalanobisScore(child: Expression, mean: Seq[Double],
                            components: Seq[Seq[Double]],
                            invEigenvalues: Seq[Double])
    extends UnaryExpression {

  @transient private lazy val mu: Array[Double] = mean.toArray
  @transient private lazy val comps: Array[Array[Double]] =
    components.map(_.toArray).toArray
  @transient private lazy val invLam: Array[Double] = invEigenvalues.toArray
  @transient private lazy val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "mahalanobis_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
        if components.nonEmpty && components.length == invEigenvalues.length &&
          components.forall(_.length == mean.length) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(
        "mahalanobis_score needs components x invEigenvalues of matching " +
          "count, each component mean-length")
    case other => TypeCheckResult.TypeCheckFailure(
      s"mahalanobis_score expects array<float>/array<double>, got ${other.catalogString}")
  }

  def kernel(a: ArrayData): Double = {
    val d = mu.length
    val n = math.min(a.numElements(), d)
    // centered once; the per-component loop then reads a primitive array
    // instead of re-decoding ArrayData d times. Dims beyond a short
    // vector's length stay 0 = mean-imputed (contribute no distance) —
    // inputs are expected homogeneous, same contract as MatrixGram.
    val c = new Array[Double](d)
    var i = 0
    while (i < n) {
      // null ELEMENT -> loud error (same contract as MatrixGram/EigenProject)
      require(!a.isNullAt(i),
        s"mahalanobis_score: null element at index $i — fill or filter nulls first")
      val x = if (childIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      c(i) = x - mu(i)
      i += 1
    }
    var s = 0.0
    var k = 0
    while (k < comps.length) {
      val e = comps(k)
      var p = 0.0
      var j = 0
      while (j < d) { p += c(j) * e(j); j += 1 }
      s += p * p * invLam(k)
      k += 1
    }
    s
  }

  override protected def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mahalanobisScore", this, classOf[MahalanobisScore].getName)
    defineCodeGen(ctx, ev, v => s"$ref.kernel($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
