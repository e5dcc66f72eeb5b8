package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Double-hashing scheme shared by [[BloomFilterAgg]] (build) and
  * [[BloomMightContain]] (probe) — the two sides MUST agree bit-for-bit.
  *
  * Per key: h1/h2 are independent splitmix64 finalizer mixes of the key;
  * probe i sets/tests bit `(h1 + i*h2) & (numBits-1)` (Kirsch-Mitzenmacher
  * double hashing — k independent hash functions from two, the standard
  * construction). numBits is a power of two so the modulo is a mask.
  */
object BloomHash {
  /** splitmix64 finalizer — full-avalanche 64-bit mix (public domain). */
  def mix64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Second stream: decorrelate by mixing a rotated key; forced odd so
    * probe strides never collapse to 0 on the power-of-two bit space. */
  def mix64b(x: Long): Long = mix64(java.lang.Long.rotateLeft(x, 32) ^ 0x5851f42d4c957f2dL) | 1L

  def setBit(words: Array[Long], idx: Long): Unit = {
    words((idx >>> 6).toInt) |= (1L << (idx & 63))
  }

  def getBit(words: Array[Long], idx: Long): Boolean =
    (words((idx >>> 6).toInt) & (1L << (idx & 63))) != 0L

  def wordsToBytes(words: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * words.length)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def bytesToWords(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val words = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    words
  }
}

/** Bloom-filter build aggregate over a LONG key column → the filter as
  * BINARY (numBits/8 bytes).
  *
  * The 100-TB role: semi-join reduction. When the dimension side of a join
  * is too big to broadcast as a hash relation but its KEY SET fits a few
  * hundred KB of bits, aggregate the dim keys into a bloom (map-side
  * combinable — merge is bitwise OR, so the shuffle carries one filter per
  * partial, never the keys) and pre-filter the fact table with
  * [[BloomMightContain]] BEFORE the join's shuffle. False positives are
  * removed by the exact join that follows; false negatives cannot occur, so
  * the rewrite is result-preserving (see
  * [[graft.operators.Relational.bloomSemiJoin]]). Spark's own runtime
  * bloom-join (`spark.sql.optimizer.runtime.bloomFilter.enabled`) applies
  * the same idea opportunistically; this operator is the explicit,
  * plannable form.
  *
  * Sizing: fpp ~ (1 - e^(-kn/m))^k; at m/n = 10 bits/key and k = 5-7,
  * fpp < 1%. numBits must be a power of two (probe uses a mask, not a div).
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_agg expects a BIGINT key, got ${child.dataType.catalogString}")
    else if (numBits < 64 || (numBits & (numBits - 1)) != 0)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_agg numBits must be a power of two >= 64, got $numBits")
    else if (numHashes < 1 || numHashes > 16)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_agg numHashes must be in [1, 16], got $numHashes")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(words: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      val h1 = BloomHash.mix64(key)
      val h2 = BloomHash.mix64b(key)
      val mask = (numBits - 1).toLong
      var i = 0
      while (i < numHashes) {
        BloomHash.setBit(words, (h1 + i * h2) & mask)
        i += 1
      }
    }
    words
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(words: Array[Long]): Any = BloomHash.wordsToBytes(words)

  override def serialize(words: Array[Long]): Array[Byte] = BloomHash.wordsToBytes(words)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomHash.bytesToWords(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Bloom membership probe over a LONG key, with the filter riding INSIDE the
  * expression as driver-collected bytes (same broadcast-sized-constant
  * contract as [[NearestCentroid]]): the filter is one bounded aggregate row,
  * collected once, deserialized once into a transient word array, and the
  * probe is then a pure narrow projection — zero Exchange, no per-row binary
  * copy (a bloom carried as a joined BINARY column would be re-materialized
  * from the row for EVERY probe — a 16 KB copy per fact row).
  *
  * Guarantees no false negatives; false positives at the configured fpp —
  * callers must follow with an exact join (see
  * [[graft.operators.Relational.bloomSemiJoin]]).
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte],
                             numHashes: Int)
    extends UnaryExpression {

  @transient private lazy val words: Array[Long] = BloomHash.bytesToWords(bloomBytes)
  @transient private lazy val mask: Long = (words.length.toLong * 64L) - 1L

  // Array[Byte] equality is reference-based, which would make semantically
  // identical probes never compare equal — defeating canonicalization,
  // common-subexpression elimination, and exchange reuse. Compare contents.
  override def equals(other: Any): Boolean = other match {
    case o: BloomMightContain =>
      child == o.child && numHashes == o.numHashes &&
        java.util.Arrays.equals(bloomBytes, o.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child, Integer.valueOf(numHashes),
    Integer.valueOf(java.util.Arrays.hashCode(bloomBytes)))

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects a BIGINT key, got ${child.dataType.catalogString}")
    else if (bloomBytes.length < 8 || (bloomBytes.length & (bloomBytes.length - 1)) != 0)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain filter must be a power-of-two byte length >= 8, got ${bloomBytes.length}")
    else if (numHashes < 1 || numHashes > 16)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain numHashes must be in [1, 16], got $numHashes")
    else TypeCheckResult.TypeCheckSuccess

  def kernel(key: Long): Boolean = {
    val h1 = BloomHash.mix64(key)
    val h2 = BloomHash.mix64b(key)
    var i = 0
    while (i < numHashes) {
      if (!BloomHash.getBit(words, (h1 + i * h2) & mask)) return false
      i += 1
    }
    true
  }

  override protected def nullSafeEval(key: Any): Any = kernel(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, v => s"$ref.kernel($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
