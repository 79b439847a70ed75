package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp polynomial rolling hash of a whole string:
  * h = Σ h·base + codePointOf(c_i)  (mod p), left to right.
  *
  * The document-fingerprinting primitive (and the building block for
  * substring winnowing). Codegen'd like DotProduct; the recurrence is
  * sequential by definition so results are engine-independent — the DuckDB
  * oracle replays the identical recurrence with a recursive CTE.
  * base/mod chosen so h·base + c stays far below Long overflow.
  */
case class RollingHash(child: Expression, base: Long = 257L,
    mod: Long = 1000000007L) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * base + s.charAt(i)) % mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
        java.lang.String $s = $c.toString();
        long $h = 0L;
        for (int $i = 0; $i < $s.length(); $i++) {
          $h = ($h * ${base}L + $s.charAt($i)) % ${mod}L;
        }
        ${ev.value} = $h;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}
