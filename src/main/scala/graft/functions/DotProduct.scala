package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two Array[Double] columns.
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function formulation
  * in the similarity hot path: HOFs run interpreted (lambda frame per
  * element), this compiles to a tight fused loop inside whole-stage codegen.
  * Accumulation is strictly left-to-right, so results are bit-identical to
  * the HOF fold AND to DuckDB's `list_dot_product` — the oracle parity the
  * similarity queries rely on.
  */
case class DotProduct(left: Expression, right: Expression,
    strict: Boolean = false) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<double> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  // strict mode (used by DotProductRewrite) reproduces the HOF fold's null
  // semantics exactly: zip_with null-pads a length mismatch AND a null
  // element nulls its product — either nulls the whole sum
  override def nullable: Boolean = strict || super.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (strict && x.numElements() != y.numElements()) return null
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (strict && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      // CONTRACT: reference ev.isNull ONLY when this expression is
      // nullable — with non-nullable children (array() over range(), the
      // synthetic-vector paths) nullSafeCodeGen makes isNull a FalseLiteral
      // and never declares the variable, so naming it here fails Janino
      // compilation and silently drops the WHOLE STAGE to interpreted
      // execution (the round-14 ivfpq-rung fallback: `filter_isNull_x is
      // not an rvalue`, 19 stages interpreted at 1M rows). strict implies
      // nullable, so the strict branches may reference it.
      val nullCheck =
        if (strict)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
                ${ev.isNull} = true; break;
              }"""
        else ""
      val mismatch =
        if (strict)
          s"""if ($a.numElements() != $b.numElements()) {
                ${ev.isNull} = true;
              } else """
        else ""
      val setValue =
        if (nullable) s"if (!${ev.isNull}) { ${ev.value} = $s; }"
        else s"${ev.value} = $s;"
      s"""
        $mismatch{
          int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $nullCheck
            $s += $a.getDouble($i) * $b.getDouble($i);
          }
          $setValue
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
