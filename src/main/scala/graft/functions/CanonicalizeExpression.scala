package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text canonicalization for normalization-aware dedup.
  *
  * Semantics are EXACTLY
  * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))`
  * — the form the DuckDB oracle replays — but fused into one byte-level
  * loop: lowercase (Spark's own UTF8String.toLowerCase, so Unicode
  * case-folding matches the `lower()` builtin bit-for-bit), keep only
  * `[a-z0-9 ]`, collapse space runs, trim. The byte-level filter is exact
  * because every non-ASCII UTF-8 byte is >= 0x80 and therefore outside the
  * kept class, same as the char-level regex. Two regex engines' worth of
  * scanning and intermediate string allocation collapse into one pass.
  */
object CanonSupport {

  def canonAlnum(s: UTF8String): UTF8String = {
    val b = s.toLowerCase.getBytes
    val out = new Array[Byte](b.length)
    var len = 0
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        out(len) = c; len += 1
      } else if (c == ' ' && len > 0 && out(len - 1) != ' ') {
        out(len) = c; len += 1
      }
      i += 1
    }
    while (len > 0 && out(len - 1) == ' ') len -= 1
    UTF8String.fromBytes(out, 0, len)
  }
}

/** string → string canonical form; see [[CanonSupport.canonAlnum]].
  * Codegen-native: generated code calls the same loop as eval.
  */
case class CanonAlnum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"CanonAlnum expects string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    CanonSupport.canonAlnum(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CanonSupport.canonAlnum($c);")

  override protected def withNewChildInternal(newChild: Expression): CanonAlnum =
    copy(child = newChild)
}

object CanonicalizeExpressions {

  /** Fused lower + keep-[a-z0-9 ] + collapse-spaces + trim. */
  def canonAlnum(text: Column): Column =
    ColumnBridge.column(CanonAlnum(ColumnBridge.expression(text)))
}
