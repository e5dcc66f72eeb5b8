package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean of an `array<float>`/`array<double>` column — the
  * centroid aggregate for IVF/k-means training.
  *
  * Without this, per-cell centroids need `posexplode` + groupBy(cell, dim):
  * the shuffle carries n_vectors x dims rows. As a TypedImperativeAggregate
  * the buffer is one double[dims]+count per (cell x task), combined
  * map-side — shuffle bytes are |cells| x dims, independent of corpus size.
  *
  * Null/ragged handling: null vectors are skipped; the dimension is fixed
  * by the first vector seen, shorter/longer vectors contribute their
  * overlapping prefix (inputs are expected homogeneous).
  */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorAvg.Buffer] {

  // Resolved once, not per element in the update hot loop.
  @transient private lazy val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_avg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_avg expects array<float>/array<double>, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): VectorAvg.Buffer = new VectorAvg.Buffer(null, 0L)

  override def update(buf: VectorAvg.Buffer, input: org.apache.spark.sql.catalyst.InternalRow): VectorAvg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sums == null) buf.sums = new Array[Double](n)
      val m = math.min(n, buf.sums.length)
      var i = 0
      while (i < m) {
        buf.sums(i) += (if (childIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        i += 1
      }
      buf.count += 1
    }
    buf
  }

  override def merge(a: VectorAvg.Buffer, b: VectorAvg.Buffer): VectorAvg.Buffer = {
    if (b.sums != null) {
      if (a.sums == null) { a.sums = b.sums; a.count = b.count }
      else {
        val m = math.min(a.sums.length, b.sums.length)
        var i = 0
        while (i < m) { a.sums(i) += b.sums(i); i += 1 }
        a.count += b.count
      }
    }
    a
  }

  override def eval(buf: VectorAvg.Buffer): Any =
    if (buf.sums == null || buf.count == 0) null
    else new GenericArrayData(buf.sums.map(_ / buf.count))

  override def serialize(buf: VectorAvg.Buffer): Array[Byte] = {
    val n = if (buf.sums == null) 0 else buf.sums.length
    val bb = ByteBuffer.allocate(8 + 4 + 8 * n)
    bb.putLong(buf.count).putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorAvg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong()
    val n = bb.getInt()
    if (n == 0) new VectorAvg.Buffer(null, count)
    else {
      val sums = new Array[Double](n)
      var i = 0
      while (i < n) { sums(i) = bb.getDouble(); i += 1 }
      new VectorAvg.Buffer(sums, count)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VectorAvg {
  /** Mutable aggregation state: running element sums + vector count. */
  final class Buffer(var sums: Array[Double], var count: Long)
}
