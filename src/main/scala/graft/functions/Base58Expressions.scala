package graft.functions

import java.math.BigInteger
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Base58 encode/decode as native expressions (SURVEY.md §2.8 F17 — the
  * reference declares the bs58 dependency for Solana's address/signature
  * encoding, /root/reference/Cargo.toml:36, without ever calling it;
  * these close the row for engine users who DO decode raw key bytes).
  *
  * Standard Bitcoin/Solana alphabet, public algorithm: leading zero
  * bytes map to '1's, the remainder is positional base-58 of the
  * big-endian integer. Decode is null-safe: any character outside the
  * alphabet yields NULL (the engine's try_-function convention), never
  * an exception mid-pipeline.
  */
object Base58Expressions {

  private val Alphabet =
    "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private val Radix = BigInteger.valueOf(58L)
  private val Index: Array[Int] = {
    val a = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** bytes → base58 string (never null for non-null input). */
  def encodeImpl(input: Array[Byte]): UTF8String = {
    val zeros = input.takeWhile(_ == 0).length
    val sb = new StringBuilder
    var n = new BigInteger(1, input)
    while (n.signum() > 0) {
      val Array(q, r) = n.divideAndRemainder(Radix)
      sb.append(Alphabet.charAt(r.intValue()))
      n = q
    }
    (0 until zeros).foreach(_ => sb.append('1'))
    UTF8String.fromString(sb.reverseInPlace().toString)
  }

  /** base58 string → bytes; null for any out-of-alphabet character. */
  def decodeImpl(input: UTF8String): Array[Byte] = {
    val s = input.toString
    var n = BigInteger.ZERO
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toInt
      val v = if (c < 128) Index(c) else -1
      if (v < 0) return null
      n = n.multiply(Radix).add(BigInteger.valueOf(v.toLong))
      i += 1
    }
    val zeros = s.takeWhile(_ == '1').length
    val body =
      if (n.signum() == 0) Array.emptyByteArray
      else {
        val raw = n.toByteArray
        if (raw(0) == 0) raw.drop(1) else raw // strip BigInteger sign byte
      }
    val out = new Array[Byte](zeros + body.length)
    System.arraycopy(body, 0, out, zeros, body.length)
    out
  }

  case class Base58Encode(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got $t")
    }
    override def dataType: DataType = StringType
    override def prettyName: String = "base58_encode"
    override def nullSafeEval(input: Any): Any =
      encodeImpl(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.Base58Expressions.encodeImpl($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class Base58Decode(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
    }
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true // out-of-alphabet input → NULL
    override def prettyName: String = "base58_decode"
    override def nullSafeEval(input: Any): Any =
      decodeImpl(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.functions.Base58Expressions.decodeImpl($c);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def base58_encode(c: Column): Column = Bridge.column(Base58Encode(Bridge.expression(c)))
  def base58_decode(c: Column): Column = Bridge.column(Base58Decode(Bridge.expression(c)))
}
