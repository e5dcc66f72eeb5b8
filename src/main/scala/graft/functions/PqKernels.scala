package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — public algorithm).
  *
  * PQ is the 100-TB embedding-store representation: a d-dim float vector
  * (d x 4 bytes) becomes `m` small integer codes (m bytes at ksub <= 256) —
  * a 32x shrink at d=64/m=8 — and top-k search runs over CODES with a
  * per-probe lookup table, never touching raw vectors. The reference has no
  * analogue (its vectors ride whole tensors, process_test_train_Images
  * .py:52); this is the scale path past [[graft.operators.Similarity]]'s
  * IVF tier.
  *
  * Both kernels follow this package's native-expression pattern
  * ([[NearestCentroid]]): driver-collected constants ride INSIDE the
  * expression, so encode and score are pure narrow projections — zero
  * Exchange, whole-stage codegen calls one fused JVM kernel per row.
  */

/** `pq_encode(vec)` — quantize a vector to `m` subspace codes.
  *
  * Subspace `j` covers elements `[offset_j, offset_j + dsub_j)`; its code is
  * the argmin SQUARED L2 DISTANCE centroid (ties -> smallest code). L2, not
  * cosine: PQ reconstructs the vector as the concatenation of chosen
  * centroids, and L2 on the subvector is the term that minimizes total
  * reconstruction error — cosine would ignore subvector magnitude and break
  * [[PqCosine]]'s norm reconstruction. A wrong-length input throws with the
  * expected layout in the message (slicing a ragged vector into subspaces is
  * undefined, and a silent null would vanish rows from the index); a null
  * vector returns null.
  */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  require(books.nonEmpty, "pq_encode needs at least one subspace codebook")
  books.zipWithIndex.foreach { case (b, j) =>
    require(b.nonEmpty, s"pq_encode subspace $j has an empty codebook")
    require(b.head.nonEmpty, s"pq_encode subspace $j has zero-dim centroids")
    require(b.forall(_.length == b.head.length),
      s"pq_encode subspace $j mixes centroid lengths")
  }

  @transient private lazy val vecs: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val totalDims: Int = vecs.map(_(0).length).sum
  @transient private lazy val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float>/array<double>, got ${other.catalogString}")
  }

  def kernel(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n != totalDims)
      throw new IllegalArgumentException(
        s"pq_encode expects vectors of length $totalDims (${vecs.length} subspaces), got $n")
    val out = new Array[Int](vecs.length)
    var off = 0
    var j = 0
    while (j < vecs.length) {
      val book = vecs(j)
      val dsub = book(0).length
      // NaN distances LOSE (never beat the running best), so a garbage
      // subvector falls back to code 0 instead of poisoning the argmin —
      // same total-ordering policy as NearestCentroid's seeded loop.
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val x = if (childIsFloat) a.getFloat(off + i).toDouble else a.getDouble(off + i)
          val diff = x - cent(i)
          d2 += diff * diff
          i += 1
        }
        if (d2 < best) { best = d2; bestC = c }
        c += 1
      }
      out(j) = bestC
      off += dsub
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    defineCodeGen(ctx, ev, v => s"$ref.kernel($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pq_cosine(codes, lut)` — asymmetric-distance (ADC) cosine between a
  * probe and a PQ-encoded corpus vector, via a per-probe lookup table.
  *
  * `lut` layout (one flat array<double>, built driver-side per probe from
  * the codebooks — [[graft.operators.Similarity.pqTopK]]):
  * {{{
  *   lut[j*K + c]          = dot(probe_subvec_j, centroid_{j,c})
  *   lut[m*K + j*K + c]    = ||centroid_{j,c}||^2
  *   lut[2*m*K]            = ||probe||                 (full-vector norm)
  *   lut[2*m*K + 1 + j]    = k_j                       (subspace j book size)
  * }}}
  * with `m = |codes|` and stride `K = (|lut| - 1 - m) / (2m)` (the max
  * codebook size; short subspace books pad with unused slots). The book
  * sizes ride in the tail because the pad slots are ZERO-FILLED, not
  * poisoned: heterogeneous books happen whenever Lloyd empties a cell
  * (k_j < K for that subspace), and a stale or cross-fit code in
  * [k_j, K) would otherwise read a zero dot/norm and silently mis-rank —
  * the bound each code is validated against must be its OWN subspace's
  * size, not the padded stride. Because subspaces partition the
  * dimensions, the reconstruction's dot and squared norm are EXACT sums
  * of per-subspace terms: `cos = sum_j dot_j / (||probe|| *
  * sqrt(sum_j ||c_j||^2))` — the only approximation is quantization
  * itself. Zero norms score 0.0 (the [[CosineSimilarity]] convention);
  * malformed inputs (empty codes, non-divisible lut length, code outside
  * its subspace's book) throw rather than silently mis-rank.
  */
case class PqCosine(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_cosine"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_cosine expects (array<int> codes, array<double> lut), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  def kernel(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    val lutLen = lut.numElements()
    if (m == 0 || lutLen < 1 + m || (lutLen - 1 - m) % (2 * m) != 0)
      throw new IllegalArgumentException(
        s"pq_cosine lut length $lutLen does not fit ${m} subspaces (need 2*m*K + 1 + m)")
    val k = (lutLen - 1 - m) / (2 * m)
    var dot = 0.0
    var rsq = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      // bound against the OWNING subspace's book size, not the padded
      // stride: codes in [k_j, K) land on zero-filled pad slots
      val kj = lut.getDouble(2 * m * k + 1 + j).toInt
      if (c < 0 || c >= kj)
        throw new IllegalArgumentException(
          s"pq_cosine code $c out of range [0, $kj) in subspace $j")
      dot += lut.getDouble(j * k + c)
      rsq += lut.getDouble(m * k + j * k + c)
      j += 1
    }
    val qn = lut.getDouble(2 * m * k)
    if (qn == 0.0 || rsq <= 0.0) 0.0 else dot / (qn * Math.sqrt(rsq))
  }

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    kernel(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCosine", this, classOf[PqCosine].getName)
    defineCodeGen(ctx, ev, (c, l) => s"$ref.kernel($c, $l)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
