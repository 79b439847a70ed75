package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a text: compressed bytes / raw UTF-8 bytes
  * (empty string → 1.0). The Gopher/DCLM-style boilerplate-and-repetition
  * signal — templated or repetitive documents compress far below ~0.4,
  * high-entropy natural text sits near 0.6-0.8 — cheap to compute and
  * tokenizer-independent, where the n-gram repetition ratios only see
  * word-level duplication.
  *
  * A custom codegen Expression (not a UDF): the per-row work happens inside
  * whole-stage codegen via a static helper, so the curation projection stays
  * fused — no serialization boundary, no interpreted fallback in the hot
  * path. Deflater is JDK-only (no codec deps) with BEST_SPEED and a fresh
  * instance per row released in a finally — safe under codegen reuse across
  * rows and threads. Not oracled (no external engine reproduces deflate
  * bit-for-bit); behavior pinned in TextDedupSpec on ordering properties
  * (repetitive << natural < random) rather than exact bytes.
  */
case class CompressionRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"compression_ratio expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any): Any =
    CompressionRatio.ratio(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CompressionRatio.ratio($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): CompressionRatio =
    copy(child = newChild)
}

object CompressionRatio {
  /** Static so generated code can call it directly. */
  def ratio(raw: Array[Byte]): Double = {
    if (raw.isEmpty) return 1.0
    val deflater = new Deflater(Deflater.BEST_SPEED, true)
    try {
      deflater.setInput(raw)
      deflater.finish()
      val buf = new Array[Byte](8192)
      var compressed = 0L
      while (!deflater.finished())
        compressed += deflater.deflate(buf)
      compressed.toDouble / raw.length
    } finally deflater.end()
  }
}
