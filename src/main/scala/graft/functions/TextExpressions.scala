package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling-hash expression (SURVEY.md §7.3 tier (b)): the
  * document-fingerprint fold
  * `aggregate(regexp_extract_all(text, '.'), 0L, (h, c) -> pmod(h * 31 +
  * ascii(c), 1000000007))` re-expressed as ONE codegen'd pass over the
  * string — no regexp, no per-character array materialization, no
  * interpreted lambda per character.
  *
  * Exact-equivalence contract (pinned by TextExpressionsSpec against the
  * HOF formulation): iterate code points, skipping the characters Java's
  * regex `.` does not match (\n, \r, U+0085, U+2028, U+2029), and fold
  * h = (h * 31 + codePoint) mod 1e9+7. No overflow: h < 1e9+7 so
  * h*31+cp < 2^35.
  */
object TextExpressions {

  /** Shared by interpreted eval and generated code. */
  def rollingHashImpl(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      if (cp != '\n' && cp != '\r' && cp != 0x85 && cp != 0x2028 && cp != 0x2029) {
        h = (h * 31L + cp) % 1000000007L
      }
    }
    h
  }

  case class RollingHash(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "rolling_hash"

    override def nullSafeEval(input: Any): Any =
      rollingHashImpl(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextExpressions.rollingHashImpl($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def rolling_hash(c: Column): Column =
    Bridge.column(RollingHash(Bridge.expression(c)))
}
