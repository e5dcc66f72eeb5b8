package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Driver-prebuilt per-language trigram profiles for
  * [[graft.operators.TextAnalysis.trigramLangId]]'s fused lane: for
  * each fitted trigram, the k-vector of per-language log-probs (NaN =
  * unseen for that language → the language's smoothed floor applies),
  * plus the k floors. Languages are index-aligned with the operator's
  * SORTED language list — argmax-by-first-index then reproduces the
  * declarative `score desc, lang asc` tie-break. */
final class LangProfileTable(val lp: java.util.HashMap[String, Array[Double]],
                             val floors: Array[Double]) extends Serializable {
  def k: Int = floors.length
}

/** `struct(n_tri, scores)` — all `k` language scores of the
  * Cavnar–Trenkle generative classifier in ONE walk over the document's
  * code-point trigrams: `score_c = Σ_{seen} lp_c(tri) +
  * (n − nSeen_c) · floor_c`. Replaces the corpus explode → profile
  * join → (doc, lang) grid aggregate → argmax window with one row per
  * DOCUMENT ([[TrigramLogProbSum]]'s pattern, vectorized across
  * languages); the distributed lane above the broadcast bound is
  * untouched. Scores are raw — the caller rounds to 6 dp BEFORE the
  * argmax exactly like the declarative form, so the cross-engine
  * tie-break stays float-boundary-safe. */
case class LangIdScore(child: Expression, table: Broadcast[LangProfileTable])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tri", LongType, nullable = false),
    StructField("scores", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def prettyName: String = "lang_id_score"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lang_id_score expects string, got ${other.catalogString}")
    }

  def kernel(text: UTF8String): InternalRow = {
    val s = text.toString
    val t = table.value
    val k = t.k
    val lpSeen = new Array[Double](k)
    val nSeen = new Array[Long](k)
    var n = 0L
    // rolling 3-code-point window over the string, one substring per
    // position (the trigram is the map key; boundaries tracked directly)
    var b0 = -1 // UTF-16 start offset of the code point two back
    var b1 = -1
    var i = 0
    while (i < s.length) {
      val next = i + Character.charCount(s.codePointAt(i))
      if (b0 >= 0) {
        n += 1
        val v = t.lp.get(s.substring(b0, next))
        if (v != null) {
          var c = 0
          while (c < k) {
            val lp = v(c)
            if (!java.lang.Double.isNaN(lp)) { lpSeen(c) += lp; nSeen(c) += 1 }
            c += 1
          }
        }
      }
      b0 = b1
      b1 = i
      i = next
    }
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      scores(c) = lpSeen(c) + (n - nSeen(c)) * t.floors(c)
      c += 1
    }
    InternalRow(n, new GenericArrayData(scores))
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdScore", this, classOf[LangIdScore].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
