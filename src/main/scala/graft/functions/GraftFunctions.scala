package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration for graft's custom expressions, both paths:
  *  - `GraftFunctions.register(spark)` on a live session;
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at build time
  *    (the SparkSessionExtensions injection point).
  * After either, `SELECT graft_dot(a, b)` works in SQL text.
  */
object GraftFunctions {
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (exprs => DotProduct(exprs.head, exprs(1))),
    "graft_rolling_hash" -> (exprs => RollingHash(exprs.head)),
    "graft_substr_score" -> (exprs => SubstringSetScore(exprs.head, exprs(1))),
    "graft_compression_ratio" -> (exprs => CompressionRatio(exprs.head)),
    "graft_md5_long" -> (exprs => Md5Long(exprs.head)),
    "graft_jaro_winkler" -> (exprs => JaroWinkler(exprs.head, exprs(1))),
    // SQL path is STRICT about nullable elements (VecSub reads elements
    // ignoring null flags — internal callers guarantee non-null elements,
    // external SQL callers can't, so they're rejected at analysis time)
    "graft_vec_sub" ->
      (exprs => VecSub(exprs.head, exprs(1), strictNullElements = true)))

  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    // idempotent: extraOptimizations is tiny, Seq.contains is fine
    if (!spark.experimental.extraOptimizations.contains(DotProductRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DotProductRewrite
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DotProduct].getName, name),
        builder))
    }
    ext.injectOptimizerRule(_ => DotProductRewrite)
  }
}
