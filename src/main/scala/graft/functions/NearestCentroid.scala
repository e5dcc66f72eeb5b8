package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Max-cosine centroid assignment as a shuffle-free projection — the IVF
  * coarse-quantize step (reference's positional batch routing has no
  * analogue; see SURVEY north-star ANN).
  *
  * The centroid set is tiny by contract (it is broadcast-sized: k cells x
  * dims), so it rides INSIDE the expression as driver-collected primitive
  * arrays rather than as a join side. That turns cell assignment from
  * `crossJoin(broadcast) + groupBy(argmax)` — whose exchange carries every
  * corpus vector WITH its embedding — into a pure narrow projection: zero
  * Exchange, vectors never leave their input partition, and whole-stage
  * codegen calls one fused JVM kernel per row.
  *
  * Arithmetic is kept identical to [[CosineSimilarity.kernel]] (sequential
  * double-precision dot + norms) so assignment ties out bit-for-bit with a
  * scored-join formulation and with the DuckDB oracle. Ties on cosine
  * resolve to the smallest centroid id (the `ORDER BY cos DESC, cell_id`
  * convention). Returns null only for a null input vector.
  */
case class NearestCentroid(child: Expression, centIds: Seq[Long],
                           centVecs: Seq[Seq[Double]])
    extends UnaryExpression {

  @transient private lazy val ids: Array[Long] = centIds.toArray
  @transient private lazy val vecs: Array[Array[Double]] =
    centVecs.map(_.toArray).toArray
  // Centroid self-norms are row-independent: computed once per task, not
  // once per (row x centroid). Summation order matches the fused kernel's
  // nb accumulator (index order), so cosines are bit-identical.
  @transient private lazy val norms: Array[Double] = vecs.map { v =>
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    s
  }
  @transient private lazy val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
        if centIds.nonEmpty && centIds.length == centVecs.length =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(
        "nearest_centroid needs a non-empty centroid set with one id per vector")
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float>/array<double>, got ${other.catalogString}")
  }

  /** Fused argmax pass: per centroid, the same dot/norm loop as
    * [[CosineSimilarity.kernel]] — including on length-mismatched vectors,
    * where all three sums cover the min span; equal-length centroids take
    * the fast path with the probe's self-norm hoisted out of the loop
    * (computed once, not k times). */
  def kernel(a: ArrayData): Long = {
    val n = a.numElements()
    var na = 0.0
    var i = 0
    while (i < n) {
      val x = if (childIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      na += x * x
      i += 1
    }
    // Seed with the first centroid so the result is ALWAYS a real id: with
    // a NaN probe element every cosine is NaN, no comparison ever wins, and
    // an unseeded loop would return a sentinel id that exists in no
    // centroid set (silently lost rows downstream). NaN cosines LOSE here
    // by design — a garbage vector must not capture the corpus (SQL's
    // NaN-sorts-greatest would rank it first; documented divergence).
    var best = Double.NegativeInfinity
    var bestId = ids(0)
    var c = 0
    while (c < vecs.length) {
      val v = vecs(c)
      var dot = 0.0
      var j = 0
      var cos = 0.0
      if (v.length == n) {
        // Fast path (the contract case): probe self-norm hoisted out of the
        // centroid loop, centroid self-norms precomputed per task.
        while (j < n) {
          val x = if (childIsFloat) a.getFloat(j).toDouble else a.getDouble(j)
          dot += x * v(j)
          j += 1
        }
        val nb = norms(c)
        cos = if (na == 0.0 || nb == 0.0) 0.0 else dot / (Math.sqrt(na) * Math.sqrt(nb))
      } else {
        // Length-mismatched input: CosineSimilarity.kernel computes dot AND
        // both norms over the min span, so recompute both norms over that
        // same span here — otherwise assignment could disagree with a
        // scored-join formulation on malformed vectors.
        val m = math.min(n, v.length)
        var naM = 0.0
        var nbM = 0.0
        while (j < m) {
          val x = if (childIsFloat) a.getFloat(j).toDouble else a.getDouble(j)
          dot += x * v(j)
          naM += x * x
          nbM += v(j) * v(j)
          j += 1
        }
        cos = if (naM == 0.0 || nbM == 0.0) 0.0 else dot / (Math.sqrt(naM) * Math.sqrt(nbM))
      }
      if (cos > best || (cos == best && ids(c) < bestId)) { best = cos; bestId = ids(c) }
      c += 1
    }
    bestId
  }

  override protected def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this, classOf[NearestCentroid].getName)
    defineCodeGen(ctx, ev, v => s"$ref.kernel($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
