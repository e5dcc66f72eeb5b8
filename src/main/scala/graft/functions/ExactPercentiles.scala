package graft.functions

import java.nio.ByteBuffer
import java.util.Arrays

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact linear-interpolation percentiles over a double column as a
  * primitive-buffer aggregate — a drop-in for SQL
  * `percentile(x, array(...))` on the engine's exact lane
  * ([[graft.operators.Encode.percentileFit]], q44/q61/q68/q98).
  *
  * Same semantics, same memory class, ~5× less per-row cost: Spark's
  * built-in `Percentile` updates a boxed `OpenHashMap[AnyRef, Long]`
  * per row (hash + box per value — the measured cost of every exact
  * fit in the suite); this buffer is a growable primitive double array
  * (append per row), merged by concatenation, sorted once at eval.
  * Both buffer O(group) state — the exact lane is the small-group /
  * final-report path BY CONTRACT (`percentile_approx` is the 100-TB
  * path; see percentileFit's scaladoc) — but for mostly-distinct
  * doubles (prices, scores) the raw array is also ~3× smaller than the
  * hash map's boxed entries.
  *
  * Interpolation replicates Spark's `Percentile.getPercentile`
  * EXACTLY, bit for bit: `pos = p·(n−1)`, and for non-integral pos,
  * `v = a(lo)·(hi−pos) + a(hi)·(pos−lo)` — the weighted-average form,
  * NOT `lo + d·Δ` (they differ in floating point; the DuckDB pairing
  * was validated against Spark's form). Nulls are skipped; an empty
  * group returns null. */
case class ExactPercentiles(
    child: Expression,
    ps: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ExactPercentiles.Buffer] {

  require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
    s"exact_percentiles needs fractions in [0, 1], got $ps")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "exact_percentiles"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"exact_percentiles expects double, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): ExactPercentiles.Buffer =
    new ExactPercentiles.Buffer(new Array[Double](16), 0)

  override def update(buf: ExactPercentiles.Buffer, input: InternalRow): ExactPercentiles.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.append(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: ExactPercentiles.Buffer, b: ExactPercentiles.Buffer): ExactPercentiles.Buffer = {
    a.appendAll(b.values, b.n)
    a
  }

  override def eval(buf: ExactPercentiles.Buffer): Any = {
    if (buf.n == 0) return null
    val a = Arrays.copyOf(buf.values, buf.n)
    Arrays.sort(a)
    val out = new Array[Double](ps.length)
    var i = 0
    while (i < ps.length) {
      val pos = ps(i) * (buf.n - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      out(i) =
        if (lo == hi) a(lo)
        else a(lo) * (hi - pos) + a(hi) * (pos - lo)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: ExactPercentiles.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ExactPercentiles.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val vals = new Array[Double](math.max(n, 16))
    var i = 0
    while (i < n) { vals(i) = bb.getDouble(); i += 1 }
    new ExactPercentiles.Buffer(vals, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactPercentiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactPercentiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object ExactPercentiles {
  /** Growable primitive double buffer (amortized doubling). */
  final class Buffer(var values: Array[Double], var n: Int) {
    def append(v: Double): Unit = {
      if (n == values.length) values = Arrays.copyOf(values, values.length * 2)
      values(n) = v
      n += 1
    }
    def appendAll(vs: Array[Double], m: Int): Unit = {
      if (n + m > values.length)
        values = Arrays.copyOf(values, math.max(values.length * 2, n + m))
      System.arraycopy(vs, 0, values, n, m)
      n += m
    }
  }
}
