package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** All `replicas` Poisson-bootstrap replica means in ONE aggregate pass:
  * per input row (x, h) the update derives every replica's deterministic
  * Poisson(1) weight from the row's single hash — `v = h + b`,
  * `u = ((v² mod p)·A + B mod p) / p`, thresholded through the inverse
  * CDF — and accumulates (Σw, Σw·x) per replica in a flat
  * `2·replicas`-double buffer. Output: `array<double>[replicas]` of
  * replica means, null where a replica's total weight is zero (the
  * all-zero-weight replica that both engines drop from the percentile).
  *
  * Why a native aggregate: the declarative form explodes
  * `rows × replicas` (60M rows at sf0.1 × 100) through a hash aggregate
  * keyed on (group, replica) — every replica row pays tuple
  * materialization plus a hash-map probe. Here the replica loop is
  * pure register arithmetic inside one pass over the ROWS; the buffer
  * is map-side combinable and `O(replicas)` per task, so the exchange
  * carries one small array per (group, partial) — same
  * fit-is-broadcast-sized discipline as [[MatrixGram]]. The integer
  * derivation is IDENTICAL to the column form (same p/A/B literals via
  * [[graft.operators.Stats]]), so the DuckDB oracle is untouched.
  */
case class BootstrapMeans(
    x: Expression,
    h: Expression,
    replicas: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  require(replicas >= 2 && replicas <= 100000,
    s"bootstrap_means replicas must be in [2, 100000], got $replicas")

  override def children: Seq[Expression] = Seq(x, h)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "bootstrap_means"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (x.dataType, h.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bootstrap_means expects (double, long), got $other")
    }

  // [0, R) = Σw per replica; [R, 2R) = Σw·x
  override def createAggregationBuffer(): Array[Double] = new Array[Double](2 * replicas)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val xv = x.eval(input)
    val hv = h.eval(input)
    if (xv != null && hv != null) {
      val xd = xv.asInstanceOf[Double]
      val h0 = hv.asInstanceOf[Long]
      val p = RollingHash.Mod
      val pd = p.toDouble
      val t0 = graft.operators.Stats.PoissonCdf1(0)
      val t1 = graft.operators.Stats.PoissonCdf1(1)
      val t2 = graft.operators.Stats.PoissonCdf1(2)
      val t3 = graft.operators.Stats.PoissonCdf1(3)
      val a = graft.operators.Stats.MixA
      val bAdd = graft.operators.Stats.MixB
      var b = 0
      while (b < replicas) {
        val v = h0 + b
        val u = (((v * v) % p) * a + bAdd) % p
        val ud = u.toDouble / pd
        val w =
          if (ud < t0) 0.0
          else if (ud < t1) 1.0
          else if (ud < t2) 2.0
          else if (ud < t3) 3.0
          else 4.0
        if (w > 0.0) {
          buf(b) += w
          buf(replicas + b) += w * xd
        }
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = {
    val out = new Array[Any](replicas)
    var b = 0
    while (b < replicas) {
      out(b) = if (buf(b) == 0.0) null else buf(replicas + b) / buf(b)
      b += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BootstrapMeans =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BootstrapMeans =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(x = newChildren(0), h = newChildren(1))
}
