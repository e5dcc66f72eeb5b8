package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Project a vector through a fitted basis as a fused narrow kernel:
  * `out_k = scale_k × ((v − μ) · e_k)` — with `scale_k = 1` this is the
  * PCA projection onto k components; with `scale_k = 1/√λ_k` it is PCA
  * whitening (output covariance = identity), the preconditioner that
  * stops one loud direction dominating every cosine in ANN/SemDeDup.
  * Same model-rides-as-literals discipline as [[MahalanobisScore]] /
  * [[NearestCentroid]]: the basis is broadcast-sized by contract, the
  * pass is zero-Exchange, and the hot loop is one fused JVM
  * matrix-vector product per row (no HOF lambdas). Returns null only
  * for a null input vector; short vectors are mean-imputed on the
  * missing dims ([[MatrixGram]]'s homogeneous-input contract). */
case class EigenProject(child: Expression, mean: Seq[Double],
                        components: Seq[Seq[Double]], scales: Seq[Double])
    extends UnaryExpression {

  @transient private lazy val mu: Array[Double] = mean.toArray
  @transient private lazy val comps: Array[Array[Double]] =
    components.map(_.toArray).toArray
  @transient private lazy val sc: Array[Double] = scales.toArray
  @transient private lazy val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "eigen_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
        if components.nonEmpty && components.length == scales.length &&
          components.forall(_.length == mean.length) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(
        "eigen_project needs components x scales of matching count, each " +
          "component mean-length")
    case other => TypeCheckResult.TypeCheckFailure(
      s"eigen_project expects array<float>/array<double>, got ${other.catalogString}")
  }

  def kernel(a: ArrayData): GenericArrayData = {
    val d = mu.length
    val n = math.min(a.numElements(), d)
    val c = new Array[Double](d)
    var i = 0
    while (i < n) {
      // null ELEMENT -> loud error (a silent 0.0 would skew every score;
      // same contract as MatrixGram — whole-null vectors return null)
      require(!a.isNullAt(i),
        s"eigen_project: null element at index $i — fill or filter nulls first")
      val x = if (childIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      c(i) = x - mu(i)
      i += 1
    }
    val out = new Array[Double](comps.length)
    var k = 0
    while (k < comps.length) {
      val e = comps(k)
      var p = 0.0
      var j = 0
      while (j < d) { p += c(j) * e(j); j += 1 }
      out(k) = p * sc(k)
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("eigenProject", this, classOf[EigenProject].getName)
    defineCodeGen(ctx, ev, v => s"$ref.kernel($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
