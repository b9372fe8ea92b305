package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The one place the engine drops below `functions._`: a custom Catalyst
  * `Expression` with real codegen. SURVEY §7.3 concluded built-ins cover
  * parity, so this exists for the hot path where expression plumbing is
  * measurably the cost: token counting over 100 TB of documents. The
  * built-in form (`TextFunctions.tokenCount`) walks the string three times
  * through two regex engines; this is a single UTF-8 byte scan, fully
  * inside whole-stage codegen, no allocation.
  *
  * Semantics match `tokenCount` for `\s`-separated text: count of maximal
  * non-whitespace runs (ASCII whitespace classes, like the regex).
  */
case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_count needs a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    TokenCount.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenCount.countTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)

  override def prettyName: String = "fast_token_count"
}

object TokenCount {
  /** Single pass over UTF-8 bytes; `\s`-equivalent ASCII whitespace.
    * Called from generated code — must stay a static-forwardable method. */
  def countTokens(s: UTF8String): Int = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    var count = 0
    var inToken = false
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, offset + i)
      val ws = b == ' ' || b == '\t' || b == '\n' || b == '\r' ||
        b == '\f' || b == 0x0b
      if (!ws && !inToken) { count += 1; inToken = true }
      else if (ws) inToken = false
      i += 1
    }
    count
  }

  /** SQL + Column access: register once per session, then
    * `fast_token_count(col)` / `SELECT fast_token_count(text)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fast_token_count", exprs => TokenCount(exprs.head), "built-in")

  def fast_token_count(c: Column): Column = call_function("fast_token_count", c)
}
