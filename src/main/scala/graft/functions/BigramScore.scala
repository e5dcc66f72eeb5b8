package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Driver-prebuilt stupid-backoff tables for
  * [[graft.operators.TextAnalysis.wordBigramLogProb]]'s fused lane:
  * seen log-probs keyed by the "w1 w2" bigram, backoff log-probs keyed
  * by w2, and the default backoff for an unseen unigram — every double
  * computed through the IDENTICAL formula the column form evaluates, so
  * the lanes are byte-identical after 6-dp rounding. */
final class BigramTable(val seenLp: java.util.HashMap[String, java.lang.Double],
                        val backoffLp: java.util.HashMap[String, java.lang.Double],
                        val defaultLp: Double) extends Serializable

/** `struct(n_bigrams, sum_lp, n_backoff)` — the fused score pass of the
  * word-bigram stupid-backoff LM: one walk over the document extracting
  * `[A-Za-z0-9]+` word tokens (exactly `wordTokens`'s regex language —
  * ASCII classes, so a manual scan is the same automaton) and probing
  * the broadcast [[BigramTable]] per adjacent pair. Replaces the
  * corpus-sized bigram explode → two probe joins → re-aggregate with
  * one row per DOCUMENT (same shape and rationale as
  * [[TrigramLogProbSum]]); the distributed shuffle-join lane above the
  * broadcast bound is untouched. */
case class WordBigramScore(child: Expression, table: Broadcast[BigramTable])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("sum_lp", DoubleType, nullable = false),
    StructField("n_backoff", LongType, nullable = false)))
  override def prettyName: String = "word_bigram_score"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_bigram_score expects string, got ${other.catalogString}")
    }

  def kernel(text: UTF8String): InternalRow = {
    val s = text.toString
    val t = table.value
    var prev: String = null
    var n = 0L
    var sum = 0.0
    var nBack = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        var j = i + 1
        while (j < len && {
          val cj = s.charAt(j)
          (cj >= 'A' && cj <= 'Z') || (cj >= 'a' && cj <= 'z') || (cj >= '0' && cj <= '9')
        }) j += 1
        val w = s.substring(i, j)
        if (prev != null) {
          val seen = t.seenLp.get(prev + " " + w)
          if (seen != null) { sum += seen.doubleValue() }
          else {
            val bo = t.backoffLp.get(w)
            sum += (if (bo != null) bo.doubleValue() else t.defaultLp)
            nBack += 1
          }
          n += 1
        }
        prev = w
        i = j
      } else i += 1
    }
    InternalRow(n, sum, nBack)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramScore", this, classOf[WordBigramScore].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
