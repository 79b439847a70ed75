package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First 32 bits of md5(input) as an unsigned long — the codegen'd form of
  * `conv(substring(md5(x), 1, 8), 16, 10)` used throughout the dedup /
  * sharding / sampling paths.
  *
  * Bit-identical to the conv/substring chain (the first 8 hex chars ARE the
  * first 4 digest bytes), so every DuckDB oracle using
  * `CAST('0x' || substr(md5(x),1,8) AS BIGINT)` still matches; the win is
  * skipping the 32-char hex-string materialization and the base-16 reparse
  * on every row of every hash-heavy operator.
  */
case class Md5Long(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_long expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    Md5Long.hash32(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Long.hash32($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Md5Long =
    copy(child = newChild)
}

object Md5Long {
  // MessageDigest is stateful and not thread-safe; one per executor thread
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Unsigned int from the first 4 md5 digest bytes (big-endian, matching
    * the hex-prefix parse). Exposed for generated code.
    */
  def hash32(bytes: Array[Byte]): Long = {
    val d = digest.get()
    d.reset()
    val out = d.digest(bytes)
    ((out(0) & 0xffL) << 24) | ((out(1) & 0xffL) << 16) |
      ((out(2) & 0xffL) << 8) | (out(3) & 0xffL)
  }
}
