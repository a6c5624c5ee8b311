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

  // ---- simhash16: the dedup_simhash pipeline as ONE codegen'd pass ----

  private val TokenRegex =
    graft.ext.TextAnalytics.TokenPattern.r


  /** 16-bit SimHash of a document, bit-for-bit equal to the
    * explode/groupBy `dedup_simhash` formulation (TextExpressionsSpec
    * pins the equivalence): tokenize (the shared [[graft.ext.
    * TextAnalytics.TokenPattern]], ALL occurrences), 60-bit md5-prefix
    * hash per token (the `h60` construction), signed bit votes, sign
    * collapse. Returns null for token-less docs — the grouped form
    * emits no row for them. Boxed Long because the null case exists. */
  def simhash16Impl(s: UTF8String): java.lang.Long = {
    // lowercase through UTF8String — the SAME function Spark's lower()
    // applies in the grouped pipeline, so equivalence cannot depend on
    // the JVM default locale (String.toLowerCase would diverge on e.g.
    // Turkish dotted/dotless I whenever the input has non-ASCII bytes)
    val toks = TokenRegex.findAllIn(s.toLowerCase.toString).toArray
    if (toks.isEmpty) return null
    val sums = new Array[Int](16)
    toks.foreach { t =>
      // the shared 60-bit md5-prefix ([[Md5Hash.prefix60]]) — exactly
      // conv(substring(md5(tok), 1, 15), 16, 10)
      val h = Md5Hash.prefix60(t.getBytes("UTF-8"))
      var bit = 0
      while (bit < 16) {
        sums(bit) += (if (((h >>> bit) & 1L) == 1L) 1 else -1)
        bit += 1
      }
    }
    var sim = 0L
    var bit = 0
    while (bit < 16) {
      if (sums(bit) > 0) sim |= (1L << bit)
      bit += 1
    }
    java.lang.Long.valueOf(sim)
  }

  case class SimHash16(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
    }
    override def dataType: DataType = LongType
    override def nullable: Boolean = true // token-less docs
    override def prettyName: String = "simhash16"

    override def nullSafeEval(input: Any): Any =
      simhash16Impl(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // nullable result: can't use defineCodeGen (non-null contract)
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val childGen = child.genCode(ctx)
      val boxed = ctx.freshName("boxed")
      ev.copy(code =
        code"""
          ${childGen.code}
          boolean ${ev.isNull} = true;
          long ${ev.value} = 0L;
          if (!${childGen.isNull}) {
            java.lang.Long $boxed =
              graft.functions.TextExpressions.simhash16Impl(${childGen.value});
            if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
          }
        """)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def simhash16(c: Column): Column =
    Bridge.column(SimHash16(Bridge.expression(c)))
}
