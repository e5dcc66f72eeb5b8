package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — canonical composition, the Dolma/CCNet
  * text-normalization tier BELOW [[graft.operators.TextAnalysis
  * .normalizeForDedup]]'s lossy punct/case fold: `e` + COMBINING ACUTE
  * (U+0065 U+0301) and the precomposed `é` (U+00E9) are the SAME text to
  * a reader but different byte sequences, so every downstream exact
  * operator — fingerprints, token counts, vocabulary, BPE — silently
  * splits on them unless the corpus is composed first. NFC is the
  * idempotent, meaning-preserving repair (NFKC also folds compatibility
  * forms like ligatures — deliberately not this kernel: it changes
  * visible text).
  *
  * Engine-portable by the Unicode standard itself: DuckDB's
  * `nfc_normalize` (utf8proc) and `java.text.Normalizer` implement the
  * same canonical composition algorithm (UAX #15), so normalized strings
  * hash-match across engines. The ASCII fast path (`Normalizer
  * .isNormalized` is O(n) and allocation-free for already-NFC text —
  * virtually all real corpora) makes the scan cost of running this
  * defensively near zero.
  *
  * Native expression + static kernel keeps it inside whole-stage codegen:
  * one virtual call per row, no Scala-closure UDF boxing. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def kernel(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
