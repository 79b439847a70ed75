package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd "how many of these needles appear in the text" counter
  * (each needle counted once).
  *
  * For n-gram profile scoring, |distinct_ngrams(text) ∩ profile| equals the
  * number of profile entries occurring in the text as substrings — so this
  * replaces the interpreted HOF pipeline (transform→substr per position →
  * array_distinct → array_intersect) with one fused UTF8String.contains loop
  * per needle, inside whole-stage codegen and with zero per-row allocation.
  */
case class SubstringSetScore(text: Expression, needles: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = needles

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, needles.dataType) match {
      case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case (t, n) => TypeCheckResult.TypeCheckFailure(
        s"substring_set_score expects (string, array<string>), got " +
          s"(${t.simpleString}, ${n.simpleString})")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val t = a.asInstanceOf[UTF8String]
    val arr = b.asInstanceOf[ArrayData]
    var c = 0
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i) && t.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
        int $c = 0;
        for (int $i = 0; $i < $b.numElements(); $i++) {
          if (!$b.isNullAt($i) && $a.contains($b.getUTF8String($i))) $c++;
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubstringSetScore =
    copy(text = newLeft, needles = newRight)
}
