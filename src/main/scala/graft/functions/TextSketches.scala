package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass text-sketch kernels.
  *
  * Both sketches are defined over the portable poly-31 token/shingle hash
  * (see [[RollingHash]]) so every value is reproducible in the DuckDB
  * oracle. The composed higher-order-function form (split -> transform ->
  * 16x array passes) evaluates lambda bodies once per array element per
  * slot; these kernels do one pass over the text with zero intermediate
  * allocations, inside whole-stage codegen.
  *
  * MinHash correctness note: dedup of shingles is unnecessary for the
  * signature — min over a multiset equals min over its set — so the kernel
  * skips the `array_distinct` the SQL form needs for Jaccard.
  */
object TextSketches {
  final val Mod = 1000000007L

  /** Poly-31 hash of the word 3-shingle starting at token index i, i.e. of
    * the string `tok(i) + " " + tok(i+1) + " " + tok(i+2)`. */
  private def shingleHash(toks: Array[String], i: Int): Long = {
    var acc = 0L
    var t = i
    while (t < i + 3) {
      if (t > i) acc = (acc * 31 + ' '.toInt) % Mod
      val s = toks(t)
      var j = 0
      while (j < s.length) {
        val cp = s.codePointAt(j)
        acc = (acc * 31 + cp) % Mod
        j += Character.charCount(cp)
      }
      t += 1
    }
    acc
  }

  private def tokenHash(s: String): Long = {
    var acc = 0L
    var j = 0
    while (j < s.length) {
      val cp = s.codePointAt(j)
      acc = (acc * 31 + cp) % Mod
      j += Character.charCount(cp)
    }
    acc
  }

  /** k-slot MinHash signature over word 3-shingles; permutation i is
    * h -> ((2i+3)h + 7i+1) mod p. Matches graft.operators.Dedup.minhashFrag
    * value-for-value. Texts with <3 tokens hash the whole text (one
    * shingle), mirroring the SQL guard. */
  def minhashSig(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val mins = Array.fill(k)(Long.MaxValue)
    def update(h: Long): Unit = {
      var i = 0
      while (i < k) {
        val v = ((2L * i + 3) * h + (7L * i + 1)) % Mod
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    if (toks.length < 3) update(tokenHash(text.toString))
    else {
      var s = 0
      while (s <= toks.length - 3) { update(shingleHash(toks, s)); s += 1 }
    }
    new GenericArrayData(mins)
  }

  /** k-bit SimHash over (non-distinct) token hashes: bit b set iff the sum
    * of +/-1 votes from bit b of each token hash is >= 0. Matches
    * Dedup.simhashFrag value-for-value. */
  def simhash(text: UTF8String, k: Int): Long = {
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Int](k)
    var t = 0
    while (t < toks.length) {
      val h = tokenHash(toks(t))
      var b = 0
      while (b < k) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < k) { if (votes(b) >= 0) out |= (1L << b); b += 1 }
    out
  }

  /** Wide (full-64-bit-entropy) token hash: the poly-31 fold on wrapping
    * long arithmetic, finished with the splitmix64 avalanche so every one
    * of the 64 bits is uniform. NOT DuckDB-reproducible (wrapping-long
    * semantics) — this is the scale-path hash [[simhash64]] votes on;
    * [[tokenHash]]'s mod-1e9+7 value has only ~30 usable bits, which is
    * fine for the 16-bit oracle-parity fingerprint but starves a 64-bit
    * one. */
  private def tokenHash64(s: String): Long = {
    var acc = 1125899906842597L
    var j = 0
    while (j < s.length) {
      val cp = s.codePointAt(j)
      acc = acc * 31 + cp
      j += Character.charCount(cp)
    }
    var z = acc
    z ^= (z >>> 30); z *= 0xbf58476d1ce4e5b9L
    z ^= (z >>> 27); z *= 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Full-width 64-bit SimHash — the 100-TB fingerprint
    * ([[simhash]]'s 16-bit form keeps DuckDB-oracle parity; this one
    * feeds 16-bit-block Manku banding where a 4-bit block key would
    * collide constantly). Same vote rule over [[tokenHash64]] bits. */
  def simhash64(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = tokenHash64(toks(t))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) >= 0) out |= (1L << b); b += 1 }
    out
  }
}

/** `minhash_sig(text)` — 16-slot MinHash signature, fused kernel. */
case class MinHashSig(child: Expression, k: Int = 16) extends UnaryExpression {
  // construction-time, not analysis-time: the SQL path passes any literal
  // through, and a bad k would otherwise crash per-row inside codegen
  require(k >= 1 && k <= 1024, s"minhash_sig k must be in [1, 1024], got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    TextSketches.minhashSig(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketches.minhashSig($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash64(text)` — full-width 64-bit SimHash (scale-path fingerprint,
  * not oracle-reproducible; see [[TextSketches.simhash64]]). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    TextSketches.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketches.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash(text)` — 16-bit SimHash, fused kernel. */
case class SimHash(child: Expression, k: Int = 16) extends UnaryExpression {
  // > 64 would wrap the Long shifts (bit k's vote silently overwrites bit
  // k-64); validate at construction like MinHashSig
  require(k >= 1 && k <= 64, s"simhash k must be in [1, 64] bits, got $k")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"
  override protected def nullSafeEval(input: Any): Any =
    TextSketches.simhash(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketches.simhash($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
