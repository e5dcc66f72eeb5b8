package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The integer counts behind the full Gopher rule set
  * ([[graft.operators.TextAnalysis.gopherQualityFlags]]) in ONE walk:
  * single-space tokens (word count, summed code-point length,
  * has-[A-Za-z] words, stopword hits), `#` and non-overlapping `...`
  * occurrences (left-to-right, the split-counting semantics), and
  * newline-split lines (bullet `- `/`* ` starts, `...` ends). The
  * declarative form bound a token array + a line array and ran five
  * interpreted HOF passes over them per document; this kernel walks
  * the string once. Fractions, rounding, and thresholds stay in the
  * operator — counts are exact integers, so the 6-dp values are
  * bit-identical. The stopword list rides as a constructor argument so
  * operator and kernel can never disagree on it. */
case class GopherCounts(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  require(stopwords.nonEmpty, "gopher_counts needs a stopword list")

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }
  @transient private lazy val maxStopLen: Int = stopwords.map(_.length).max

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_word_len", LongType, nullable = false),
    StructField("n_alpha_words", LongType, nullable = false),
    StructField("n_symbols", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_bullet_lines", LongType, nullable = false),
    StructField("n_ellipsis_lines", LongType, nullable = false),
    StructField("n_stopwords", LongType, nullable = false)))
  override def prettyName: String = "gopher_counts"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gopher_counts expects string, got ${other.catalogString}")
    }

  def kernel(text: UTF8String): InternalRow = {
    val s = text.toString
    val len = s.length
    var nWords = 1L
    var sumWordLen = 0L
    var nAlpha = 0L
    var nStop = 0L
    var tokStart = 0
    var tokHasAlpha = false
    var nHash = 0L
    var nLines = 1L
    var nBullet = 0L
    var nEllipsis = 0L
    var lineStart = 0
    def closeToken(end: Int): Unit = {
      if (tokHasAlpha) nAlpha += 1
      val tl = end - tokStart
      if (tl >= 1 && tl <= maxStopLen && stopSet.contains(s.substring(tokStart, end)))
        nStop += 1
    }
    def closeLine(end: Int): Unit = {
      val ll = end - lineStart
      if (ll >= 2) {
        val c0 = s.charAt(lineStart); val c1 = s.charAt(lineStart + 1)
        if ((c0 == '-' || c0 == '*') && c1 == ' ') nBullet += 1
      }
      if (ll >= 3 && s.charAt(end - 1) == '.' && s.charAt(end - 2) == '.' &&
        s.charAt(end - 3) == '.') nEllipsis += 1
    }
    // non-overlapping "..." count, left-to-right (split semantics)
    var nDots3 = 0L
    var e = 0
    while (e + 2 < len) {
      if (s.charAt(e) == '.' && s.charAt(e + 1) == '.' && s.charAt(e + 2) == '.') {
        nDots3 += 1
        e += 3
      } else e += 1
    }
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (c == ' ') {
        closeToken(i)
        nWords += 1
        tokStart = i + 1
        tokHasAlpha = false
        i += 1
      } else {
        if (c == '#') nHash += 1
        if (c == '\n') {
          closeLine(i)
          nLines += 1
          lineStart = i + 1
        }
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) tokHasAlpha = true
        // token length counts CODE POINTS (Spark length() semantics):
        // skip the low surrogate of a pair
        sumWordLen += 1
        if (Character.isHighSurrogate(c) && i + 1 < len &&
          Character.isLowSurrogate(s.charAt(i + 1))) {
          i += 2
        } else i += 1
      }
    }
    closeToken(len)
    closeLine(len)
    InternalRow(nWords, sumWordLen, nAlpha, nHash + nDots3, nLines,
      nBullet, nEllipsis, nStop)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherCounts", this, classOf[GopherCounts].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
