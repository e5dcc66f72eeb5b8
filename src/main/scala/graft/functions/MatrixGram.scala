package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass second-moment (Gram) aggregate over an `array<float>`/
  * `array<double>` column: accumulates `n`, `Σx` (d doubles) and the
  * upper triangle of `Σ x xᵀ` (d(d+1)/2 doubles), from which mean and
  * population covariance follow in the driver — the fit half of PCA /
  * whitening / Mahalanobis ([[graft.operators.Decomp]]).
  *
  * Why a native aggregate: the declarative alternative is
  * `posexplode` + a self-join to form (i, j) pairs — the shuffle carries
  * `n_vectors × d²` rows, corpus-sized. Here the buffer is one
  * `d(d+3)/2`-double array per task, merged map-side: shuffle bytes are
  * O(d²) PER TASK, independent of corpus size — the same
  * fit-is-broadcast-sized discipline as [[VectorAvg]]'s centroids. At
  * d = 512 the buffer is ~1 MB; the [[graft.operators.Decomp]] driver
  * caps d so an accidental mega-dimension column fails loudly instead of
  * allocating quadratic memory.
  *
  * Null/ragged handling follows [[VectorAvg]]: null vectors are skipped;
  * the dimension is fixed by the first vector seen; shorter/longer
  * vectors contribute their overlapping prefix (inputs are expected
  * homogeneous).
  *
  * Output struct: (n long, sum array<double>[d],
  * prod array<double>[d(d+1)/2] — upper triangle, row-major:
  * entry (i,j), i<=j, lives at `i*d - i(i-1)/2 + (j-i)`).
  */
case class MatrixGram(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MatrixGram.Buffer] {

  @transient private lazy val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sum", ArrayType(DoubleType, containsNull = false)),
    StructField("prod", ArrayType(DoubleType, containsNull = false))))
  override def prettyName: String = "matrix_gram"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"matrix_gram expects array<float>/array<double>, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): MatrixGram.Buffer =
    new MatrixGram.Buffer(null, null, 0L)

  override def update(buf: MatrixGram.Buffer, input: InternalRow): MatrixGram.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sums == null) {
        // hard cap INSIDE the task, before any allocation: past ~46k dims
        // n*(n+1)/2 overflows Int, and well before that the quadratic
        // buffer OOMs the executor — the driver-side Decomp.MaxDims check
        // runs only after the corpus pass, too late to prevent either
        require(n <= MatrixGram.MaxDims,
          s"matrix_gram: vector has $n dims; the quadratic buffer is " +
            s"built for embedding widths (<= ${MatrixGram.MaxDims}) — " +
            "reduce dimensionality first")
        buf.sums = new Array[Double](n)
        buf.prods = new Array[Double](n * (n + 1) / 2)
      }
      val d = buf.sums.length
      val m = math.min(n, d)
      // local copy: each element is read d/2 times in the product loop
      val x = new Array[Double](m)
      var i = 0
      while (i < m) {
        // a silent 0.0 for a null ELEMENT would corrupt every moment —
        // loud per-row error instead (whole-null vectors are skipped
        // above; element nulls mean the caller forgot na.fill/filter)
        require(!arr.isNullAt(i),
          s"matrix_gram: null element at index $i — fill or filter nulls first")
        x(i) = if (childIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        buf.sums(i) += x(i)
        i += 1
      }
      i = 0
      while (i < m) {
        val base = i * d - i * (i - 1) / 2 - i
        val xi = x(i)
        var j = i
        while (j < m) {
          buf.prods(base + j) += xi * x(j)
          j += 1
        }
        i += 1
      }
      buf.count += 1
    }
    buf
  }

  override def merge(a: MatrixGram.Buffer, b: MatrixGram.Buffer): MatrixGram.Buffer = {
    if (b.sums != null) {
      if (a.sums == null) { a.sums = b.sums; a.prods = b.prods; a.count = b.count }
      else {
        val m = math.min(a.sums.length, b.sums.length)
        var i = 0
        while (i < m) { a.sums(i) += b.sums(i); i += 1 }
        // triangles only align when dims agree; ragged input fixes d at
        // first-seen per task, so cross-task d mismatch means truly
        // heterogeneous data — merge the overlapping triangle
        val da = a.sums.length
        val db = b.sums.length
        i = 0
        while (i < m) {
          val baseA = i * da - i * (i - 1) / 2 - i
          val baseB = i * db - i * (i - 1) / 2 - i
          var j = i
          while (j < m) { a.prods(baseA + j) += b.prods(baseB + j); j += 1 }
          i += 1
        }
        a.count += b.count
      }
    }
    a
  }

  override def eval(buf: MatrixGram.Buffer): Any =
    if (buf.sums == null || buf.count == 0) null
    else InternalRow(buf.count,
      new GenericArrayData(buf.sums.clone()),
      new GenericArrayData(buf.prods.clone()))

  override def serialize(buf: MatrixGram.Buffer): Array[Byte] = {
    val d = if (buf.sums == null) 0 else buf.sums.length
    val t = if (buf.prods == null) 0 else buf.prods.length
    val bb = ByteBuffer.allocate(8 + 4 + 4 + 8 * (d + t))
    bb.putLong(buf.count).putInt(d).putInt(t)
    var i = 0
    while (i < d) { bb.putDouble(buf.sums(i)); i += 1 }
    i = 0
    while (i < t) { bb.putDouble(buf.prods(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MatrixGram.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong()
    val d = bb.getInt()
    val t = bb.getInt()
    if (d == 0) new MatrixGram.Buffer(null, null, count)
    else {
      val sums = new Array[Double](d)
      var i = 0
      while (i < d) { sums(i) = bb.getDouble(); i += 1 }
      val prods = new Array[Double](t)
      i = 0
      while (i < t) { prods(i) = bb.getDouble(); i += 1 }
      new MatrixGram.Buffer(sums, prods, count)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MatrixGram =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MatrixGram =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MatrixGram {
  /** Hard per-task dimension cap (2048 ⇒ ≤ 16 MB triangle buffer) —
    * enforced BEFORE allocation; [[graft.operators.Decomp.MaxDims]]
    * keeps the tighter driver-side budget for the eigen solves. */
  final val MaxDims = 2048

  /** Running `n`, `Σx`, and upper-triangular `Σ x xᵀ`. */
  final class Buffer(var sums: Array[Double], var prods: Array[Double],
                     var count: Long)
}
