package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd element-wise vector subtraction over two Array[Double]
  * columns, returning elements with containsNull = FALSE.
  *
  * Replaces `zip_with(a, b, _ - _)` in the residual hot path for two
  * reasons: the HOF runs interpreted (lambda frame per element), and —
  * far worse downstream — its result type carries containsNull = true,
  * which knocks every consumer of the residual off the primitive fast
  * path (measured 87 s vs 3.5 s for the identical PQ sub-encoding
  * projection over 1M×64 vectors with nullable vs non-nullable
  * elements). Element values are identical IEEE subtraction either way.
  *
  * Length contract: both arrays must have the same length (the vector
  * case); a mismatch yields NULL for the whole result rather than
  * zip_with's null-padding — padding would need nullable elements back.
  *
  * Null-element contract (like [[NearestCentroid]]): elements are read
  * with getDouble IGNORING per-element null flags — a null element reads
  * as 0.0, where zip_with would propagate a null element. Callers in
  * this repo always pass non-null-element vectors (embeddings,
  * centroids); the SQL-registered path (`graft_vec_sub`) REJECTS
  * nullable-element arrays at analysis time so external callers can't
  * silently hit the 0.0 reading.
  */
case class VecSub(left: Expression, right: Expression,
    strictNullElements: Boolean = false)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, cn) => !(strictNullElements && cn)
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_sub expects array<double> inputs" +
        (if (strictNullElements) " with non-nullable elements" else "") +
        s", got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = x.getDouble(i) - y.getDouble(i)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val arr = ctx.freshName("arr")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double[] $arr = new double[$n];
          for (int $i = 0; $i < $n; $i++) {
            $arr[$i] = $a.getDouble($i) - $b.getDouble($i);
          }
          ${ev.value} =
            org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($arr);
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSub =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_vec_sub"
}
