package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `struct(n_tokens, n_distinct_tokens, n_grams, top_gram_count)` — the
  * integer counts behind the Gopher repetition rules
  * ([[graft.operators.TextAnalysis.repetitionStats]]) in ONE walk:
  * corpus-exact single-space tokens (`split(text, " ")`, empties kept),
  * distinct-token count via a hash set, and the modal n-gram count via
  * a per-document gram→count map (grams are the text substrings
  * between token boundaries, same as `concat_ws(" ", slice(...))`).
  * Replaces a token-array materialization + `array_distinct` +
  * n-gram `transform` + `array_sort` + interpreted run-length fold per
  * document. The fractions and thresholds stay in the operator so the
  * contract lives in one place; counts here are exact integers, so the
  * operator's 6-dp rounding is bit-identical to the declarative form. */
case class RepetitionCounts(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"repetition_counts gram size must be >= 1, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false),
    StructField("top_gram_count", LongType, nullable = false)))
  override def prettyName: String = "repetition_counts"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"repetition_counts expects string, got ${other.catalogString}")
    }

  def kernel(text: UTF8String): InternalRow = {
    val s = text.toString
    // token boundaries under the corpus-exact single-space split
    var nTok = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok + 1)
    var t = 1
    i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTok) = s.length + 1
    val distinct = new java.util.HashSet[String]()
    var ti = 0
    while (ti < nTok) {
      distinct.add(s.substring(starts(ti), starts(ti + 1) - 1))
      ti += 1
    }
    val nGrams = math.max(nTok - n + 1, 0)
    var best = 0L
    if (nGrams > 0) {
      val gramCounts = new java.util.HashMap[String, Int]()
      var g = 0
      while (g < nGrams) {
        val gram = s.substring(starts(g), starts(g + n) - 1)
        val c = gramCounts.merge(gram, 1, (a, b) => a + b)
        if (c > best) best = c
        g += 1
      }
    }
    InternalRow(nTok.toLong, distinct.size.toLong, nGrams.toLong, best)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repCounts", this, classOf[RepetitionCounts].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
