package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint:
  * `h = fold(codepoints, 0)((acc, cp) => (acc * 31 + cp) mod 1_000_000_007)`.
  *
  * North-star "document fingerprinting (rolling hash)" operator. The exact
  * fold is chosen to be engine-portable: the DuckDB oracle reproduces it with
  * `list_reduce(list_prepend(0, list_transform(string_split(s,''), c ->
  * unicode(c))), (a,b) -> (a*31+b) % 1000000007)`, so fingerprints
  * hash-match across engines (unlike murmur3 `hash()`, which is
  * Spark-specific).
  *
  * Native expression + static kernel keeps it inside whole-stage codegen —
  * one virtual call per row, no Scala-closure UDF boxing.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  final val Mod: Long = 1000000007L

  def kernel(s: UTF8String): Long = {
    // Iterate unicode code points (ASCII fast path falls out naturally).
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
