package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Top-k (score DESC, id ASC) pairs per group as a map-side-combinable
  * aggregate — the scale-path replacement for the
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC) <= k` window.
  *
  * The window form shuffles and sorts EVERY row of every group; this
  * aggregate keeps a bounded k-slot buffer per (group x task), so partial
  * aggregation prunes before the exchange and shuffle bytes are
  * |groups| x k, independent of row count. SparkEntry q60 proves the two
  * forms row-identical through the DuckDB oracle.
  *
  * Output: array<struct<v: double, id: bigint>> ordered best-first. Rows
  * with a null score or id are ignored. Ties on score resolve to the
  * smaller id, so results are deterministic for unique ids.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Buffer] {

  // toIntExact: a Long literal beyond Int range must fail loudly here (and
  // is rejected in checkInputDataTypes), never silently truncate to a
  // wrapped-around buffer size.
  @transient private lazy val k: Int =
    Math.toIntExact(kExpr.eval(null).asInstanceOf[Number].longValue())

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable || !Seq(ByteType, ShortType, IntegerType, LongType)
      .contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure("k must be an integer literal")
    else if (kExpr.eval(null) == null ||
      kExpr.eval(null).asInstanceOf[Number].longValue() < 1 ||
      kExpr.eval(null).asInstanceOf[Number].longValue() > Int.MaxValue)
      TypeCheckResult.TypeCheckFailure(
        s"k must be a positive integer constant in [1, ${Int.MaxValue}]")
    else (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_by_score expects (double, bigint, int), got $other")
    }

  override def createAggregationBuffer(): TopKByScore.Buffer =
    new TopKByScore.Buffer(new Array[Double](k), new Array[Long](k), 0)

  override def update(buf: TopKByScore.Buffer, input: InternalRow): TopKByScore.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKByScore.Buffer, b: TopKByScore.Buffer): TopKByScore.Buffer = {
    var i = 0
    while (i < b.size) { a.insert(b.vs(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKByScore.Buffer): Any = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = InternalRow(buf.vs(i), buf.ids(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKByScore.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.vs(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKByScore.Buffer(new Array[Double](k), new Array[Long](k), 0)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

object TopKByScore {
  /** k-slot buffer kept sorted best-first ((v DESC, id ASC)); linear-shift
    * insertion — k is small, rows that can't beat the current worst exit
    * after one comparison. */
  final class Buffer(val vs: Array[Double], val ids: Array[Long], var size: Int) {
    // Match Spark SQL's double ordering (SQLOrderingUtil.compareDoubles):
    // NaN sorts greatest, but -0.0 == 0.0 — the IEEE `==` short-circuit
    // below is what keeps ±0.0 a tie (java.lang.Double.compare alone would
    // rank 0.0 above -0.0 and diverge from the window form).
    private def better(v: Double, id: Long, j: Int): Boolean = {
      val cmp = if (v == vs(j)) 0 else java.lang.Double.compare(v, vs(j))
      cmp > 0 || (cmp == 0 && id < ids(j))
    }

    def insert(v: Double, id: Long): Unit = {
      val k = vs.length
      if (size == k && !better(v, id, size - 1)) return
      var pos = if (size < k) size else size - 1
      // shift entries worse than (v, id) one slot down
      while (pos > 0 && better(v, id, pos - 1)) {
        vs(pos) = vs(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
      }
      vs(pos) = v; ids(pos) = id
      if (size < k) size += 1
    }
  }
}
