package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst vector expressions (SURVEY.md §7.3 tier (b): a custom
  * `Expression` beats a UDF). Both implement `doGenCode`, so they compile
  * into the whole-stage-codegen'd loop instead of falling back to
  * interpreted per-element higher-order functions — the hot path of every
  * similarity/ANN operator.
  *
  * Numerical contract: accumulation is strictly left-to-right per
  * accumulator, the same operation sequence as a sequential fold — so
  * results are bit-identical to DuckDB's `list_dot_product`-based oracle
  * formulas.
  *
  * Null contract: the result is NULL when the lengths differ or any
  * element is NULL — exactly the `aggregate(zip_with(a, b, (x,y) ->
  * x*y), …)` HOF twin these expressions must stay interchangeable with
  * (zip_with pads the shorter side with NULL; the fold then propagates
  * it). Reading a NULL slot via `getDouble` would instead yield 0.0 and
  * a silently-finite wrong answer. When neither input's element type is
  * nullable the per-element check is compiled OUT (the common case: our
  * embedding loads build non-null elements), so the hot loop is
  * unchanged.
  */
object VectorExpressions {

  private def checkVecTypes(name: String, l: Expression, r: Expression): TypeCheckResult =
    (l.dataType, r.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (lt, rt) => TypeCheckResult.TypeCheckFailure(
        s"$name requires (array<double>, array<double>), got ($lt, $rt)")
    }

  private def elementsNullable(l: Expression, r: Expression): Boolean =
    (l.dataType, r.dataType) match {
      case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
      case _ => true
    }

  /** a · b over array<double>. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkVecTypes(prettyName, left, right)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true // ragged / null-element → NULL
    override def prettyName: String = "vector_dot"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (b.numElements() != n) return null
      val checkNulls = elementsNullable(left, right)
      var acc = 0.0; var i = 0
      while (i < n) {
        if (checkNulls && (a.isNullAt(i) || b.isNullAt(i))) return null
        acc += a.getDouble(i) * b.getDouble(i); i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
        val nullCheck = if (elementsNullable(left, right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |if ($b.numElements() != $n) {
           |  ${ev.isNull} = true;
           |} else {
           |  for (int $i = 0; $i < $n; $i++) {
           |    $nullCheck
           |    $acc += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** cos(a, b) = a·b / (‖a‖·‖b‖), all three accumulators in ONE pass over
    * the arrays (vs three separate folds). NaN when either norm is 0. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkVecTypes(prettyName, left, right)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true // ragged / null-element → NULL
    override def prettyName: String = "vector_cosine"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (b.numElements() != n) return null
      val checkNulls = elementsNullable(left, right)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        if (checkNulls && (a.isNullAt(i) || b.isNullAt(i))) return null
        val x = a.getDouble(i); val y = b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        val nullCheck = if (elementsNullable(left, right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
        s"""
           |int $n = $a.numElements();
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |if ($b.numElements() != $n) {
           |  ${ev.isNull} = true;
           |} else {
           |  for (int $i = 0; $i < $n; $i++) {
           |    $nullCheck
           |    double $x = $a.getDouble($i); double $y = $b.getDouble($i);
           |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |  }
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Column-level entry points. */
  def vector_dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def vector_cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
}
