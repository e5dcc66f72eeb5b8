package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** zlib compression ratio of a document's UTF-8 bytes:
  * `deflate(text).length / text.utf8Length`, DEFLATE level 6 (zlib's
  * default), raw-deflate framing (no zlib/gzip header, so tiny docs
  * aren't dominated by fixed header bytes).
  *
  * The Gopher/DCLM-class quality signal no token heuristic replaces:
  * near-duplicate boilerplate, template spam, and repeated-phrase SEO
  * junk compress far below prose (~0.2 vs ~0.6), while random bytes /
  * base64 blobs posing as text compress above 1.0 — one number brackets
  * both failure modes ([[graft.operators.TextAnalysis.charEntropy]]'s
  * bracket, but sensitive to long-range repetition entropy can't see).
  *
  * Native expression + static kernel: stays inside whole-stage codegen
  * as one static call per row (same discipline as [[RollingHash]]).
  * DEFLATE output bytes are implementation-dependent across zlib
  * versions, so the ratio is engine-deterministic but NOT
  * oracle-portable — queries over it take the rows-only check (the
  * q59 HLL++ contract); the spec pins the repetitive/prose/noise
  * ordering instead. Per-row work is O(len) with a per-call Deflater
  * (no shared state — thread-safe under codegen by construction);
  * empty strings return 1.0 (nothing to compress, nothing saved). */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override protected def nullSafeEval(input: Any): Any =
    DeflateRatio.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateRatio.kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateRatio {
  def kernel(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    // nowrap = raw deflate: no 2-byte zlib header + 4-byte adler trailer
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION,
      /* nowrap = */ true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8 * 1024)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / raw.length
    } finally d.end()
  }
}
