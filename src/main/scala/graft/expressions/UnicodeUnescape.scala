package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.functions.call_function

/** Custom Catalyst scalar: decode `\\uXXXX` / `\\xNN` escape sequences
  * embedded in strings (the reference's `_decode_unicode_sequences`,
  * src/utils/api_helpers.py:281-299 — G13). No Spark built-in exists for
  * this, so it is the one genuine custom-Expression in the function
  * library. Codegen delegates to the static decoder (single virtual call,
  * stays inside whole-stage codegen spans).
  */
case class UnicodeUnescape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(UnicodeUnescape.decode(v.toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.expressions.UnicodeUnescape.decode($c.toString()))")
  override protected def withNewChildInternal(c: Expression): UnicodeUnescape = copy(c)
  override def prettyName: String = "unicode_unescape"
}

object UnicodeUnescape {
  private val Re = "\\\\u([0-9a-fA-F]{4})|\\\\x([0-9a-fA-F]{2})".r

  /** Replace \\uXXXX and \\xNN sequences with their code points. */
  def decode(s: String): String =
    if (s.indexOf('\\') < 0) s
    else Re.replaceAllIn(s, m => {
      val hex = if (m.group(1) != null) m.group(1) else m.group(2)
      val cp = Integer.parseInt(hex, 16)
      java.util.regex.Matcher.quoteReplacement(new String(Character.toChars(cp)))
    })

  /** Register in the session's function registry. Idempotent: the
    * functionExists guard keeps per-query re-registration from spamming
    * "replaced a previously registered function" warnings.
    */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("unicode_unescape")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "unicode_unescape", exprs => UnicodeUnescape(exprs.head), "scala_udf")

  /** Column API (requires [[register]] to have been called). */
  def unicodeUnescape(c: Column): Column = call_function("unicode_unescape", c)
}

