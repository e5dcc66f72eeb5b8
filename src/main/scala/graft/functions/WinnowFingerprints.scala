package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fingerprints(text)` → array<struct<pos:int, h:long>> — the
  * winnowed k-gram fingerprint selection (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", 2003) as
  * one fused walk. Semantics are EXACTLY the declarative form in
  * [[graft.operators.Dedup.winnowedFingerprints]]:
  * corpus-exact single-space tokens (`split(text, " ")`, empties kept),
  * gram `i` = tokens i..i+k-1 joined by " " (≡ the text substring
  * between those token boundaries), hashed with the poly-31
  * [[RollingHash]] (oracle lane) or `xxhash64` seed 42 (wide lane); one
  * window of `w` gram hashes per position, min selected with the
  * LEFTMOST position on ties (1-based gram positions); fewer than `w`
  * grams selects nothing. Per-position dedup happens IN the kernel (a
  * bit-set over gram positions — duplicate (pos, h) selections are
  * doc-local by the winnowing tie rule), so callers drop the global
  * `.distinct()` exchange the exploded form needed.
  *
  * Why native: the declarative selection paid an interpreted lambda per
  * gram building a w-slice + array_min + array_position each — O(len·w)
  * boxed work per document — plus a corpus-wide distinct shuffle. Here
  * the window min is a scan with O(len·w) PRIMITIVE compares (w = 4) and
  * nothing but the selected (pos, h) pairs leaves the expression. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int, wide: Boolean)
    extends UnaryExpression {
  require(k >= 1, s"gram size k must be >= 1, got $k")
  require(w >= 1, s"window size w must be >= 1, got $w")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints expects string, got ${other.catalogString}")
    }

  def kernel(text: UTF8String): GenericArrayData = {
    val s = text.toString
    // single-space token boundaries, empties kept (split(text, " ", -1));
    // gram i spans text[tokStart(i), tokEnd(i+k-1)) because the
    // separator is exactly one space
    var nTok = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') nTok += 1; i += 1 }
    val nGrams = nTok - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTok + 1) // starts(t) = UTF-16 offset of token t
    var t = 1
    i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTok) = s.length + 1 // phantom separator after the last token
    val gh = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      val from = starts(g)
      val until = starts(g + k) - 1 // end of token g+k-1
      if (wide) {
        gh(g) = XxHash64Function.hash(
          UTF8String.fromString(s.substring(from, until)), StringType, 42L)
      } else {
        var acc = 0L
        var j = from
        while (j < until) {
          val cp = s.codePointAt(j)
          acc = (acc * 31 + cp) % RollingHash.Mod
          j += Character.charCount(cp)
        }
        gh(g) = acc
      }
      g += 1
    }
    val emitted = new Array[Boolean](nGrams)
    val out = new scala.collection.mutable.ArrayBuffer[Any](nGrams - w + 2)
    var j0 = 0
    while (j0 <= nGrams - w) {
      var best = j0
      var p = j0 + 1
      while (p < j0 + w) {
        if (gh(p) < gh(best)) best = p // strict: leftmost wins ties
        p += 1
      }
      if (!emitted(best)) {
        emitted(best) = true
        out += InternalRow(best + 1, gh(best)) // 1-based gram position
      }
      j0 += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this, classOf[WinnowFingerprints].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
