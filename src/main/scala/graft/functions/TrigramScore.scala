package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Immutable open-addressing map from a packed character trigram (three
  * code points ≤ U+10FFFF, 21 bits each, packed into one long) to its
  * fitted log-probability. Built driver-side from the vocabulary-sized
  * trigram fit by [[graft.operators.TextAnalysis.charTrigramLogProb]]
  * and shipped to executors as a Spark broadcast — ONE copy per
  * executor, a handle (not the table) in the serialized plan.
  * Linear probing, power-of-two capacity, load ≤ 0.5; the packed key 0
  * (three NUL code points) cannot occur in fitted trigrams because the
  * fit's strings come from documents that [[CharEntropy]]-class
  * ingestion has already NUL-scrubbed — guarded at build time anyway. */
final class TrigramTable(val keys: Array[Long], val vals: Array[Double],
                         val mask: Int) extends Serializable {
  /** Log-prob for the packed trigram, or NaN when unseen. */
  def get(packed: Long): Double = {
    var slot = (TrigramTable.mix(packed) & mask).toInt
    while (true) {
      val k = keys(slot)
      if (k == packed) return vals(slot)
      if (k == 0L) return Double.NaN
      slot = (slot + 1) & mask
    }
    Double.NaN // unreachable
  }
}

object TrigramTable {
  private[functions] def mix(z0: Long): Long = {
    var z = z0
    z ^= (z >>> 30); z *= 0xbf58476d1ce4e5b9L
    z ^= (z >>> 27); z *= 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Pack a 3-code-point trigram string; -1 if the string is not exactly
    * three code points (a fit row that short is a bug upstream). */
  def pack(tri: String): Long = {
    var i = 0
    var out = 0L
    var n = 0
    while (i < tri.length && n < 4) {
      val cp = tri.codePointAt(i)
      out = (out << 21) | cp
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 3) out else -1L
  }

  /** None when any trigram packs to a non-positive key (only the
    * all-NUL trigram can) — the caller falls back to the join path
    * rather than silently mis-scoring that trigram. */
  def build(entries: Iterator[(String, Double)], sizeHint: Int): Option[TrigramTable] = {
    val cap = Integer.highestOneBit(math.max(sizeHint, 8)) * 4 // load <= 0.5
    val keys = new Array[Long](cap)
    val vals = new Array[Double](cap)
    val mask = cap - 1
    entries.foreach { case (tri, lp) =>
      val packed = pack(tri)
      if (packed <= 0L) return None
      var slot = (mix(packed) & mask).toInt
      while (keys(slot) != 0L && keys(slot) != packed) slot = (slot + 1) & mask
      keys(slot) = packed
      vals(slot) = lp
    }
    Some(new TrigramTable(keys, vals, mask))
  }
}

/** `char_trigrams(text)` → array of the document's code-point trigrams
  * in order — the fit-side explode input. The declarative form
  * (`transform(sequence(1, len-2), i -> substring(text, i, 3))`) pays an
  * interpreted lambda per position AND re-walks the string from offset 0
  * inside every `substring` call (code-point addressing has no random
  * access) — O(len²) per document. This kernel records code-point
  * boundaries once and slices: O(len). Same elements, same order. */
case class CharTrigrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_trigrams"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_trigrams expects string, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    CharTrigrams.trigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharTrigrams.trigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharTrigrams {
  def trigrams(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = text.toString
    // code-point boundary index (UTF-16 offsets), built in one walk
    val bounds = new Array[Int](s.length + 1)
    var n = 0
    var i = 0
    while (i < s.length) {
      bounds(n) = i
      n += 1
      i += Character.charCount(s.codePointAt(i))
    }
    bounds(n) = s.length
    if (n < 3) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 2)
    var t = 0
    while (t < n - 2) {
      out(t) = UTF8String.fromString(s.substring(bounds(t), bounds(t + 3)))
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `struct(n_tri, sum_lp)` — the fused score pass of the char-trigram
  * LM: one walk over the document's code points with a rolling trigram
  * window, probing the broadcast [[TrigramTable]] per position. Unseen
  * trigrams are skipped and not counted — exactly the inner-join
  * semantics of the declarative form (fit == corpus in every caller, so
  * nothing is unseen in practice). Replaces the corpus-sized
  * explode(transform(sequence…)) → broadcast-hash-join → doc-keyed
  * re-aggregate: one row per DOCUMENT crosses the plan instead of one
  * row per CHARACTER, and the per-position work is a packed-long table
  * probe instead of a substring allocation + UTF8String hash join probe.
  * The fit stays distributed and the shuffle-join fallback above the
  * broadcast bound is untouched — this kernel is the broadcast lane
  * only (same driver-memory budget the broadcast join already paid). */
case class TrigramLogProbSum(child: Expression, table: Broadcast[TrigramTable])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tri", LongType, nullable = false),
    StructField("sum_lp", DoubleType, nullable = false)))
  override def prettyName: String = "trigram_logprob_sum"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"trigram_logprob_sum expects string, got ${other.catalogString}")
    }

  def kernel(text: UTF8String): InternalRow = {
    val s = text.toString
    val t = table.value
    var c1 = -1
    var c2 = -1
    var n = 0L
    var sum = 0.0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (c1 >= 0) {
        val lp = t.get((c1.toLong << 42) | (c2.toLong << 21) | cp)
        if (!java.lang.Double.isNaN(lp)) { n += 1; sum += lp }
      }
      c1 = c2
      c2 = cp
      i += Character.charCount(cp)
    }
    InternalRow(n, sum)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("triScore", this, classOf[TrigramLogProbSum].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
