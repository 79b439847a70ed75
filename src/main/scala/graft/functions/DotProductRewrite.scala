package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * into the codegen'd [[DotProduct]] expression. HOF lambdas evaluate
  * interpreted (one lambda frame per element, outside whole-stage codegen);
  * the rewrite keeps user code declarative — anyone writing the textbook
  * formulation gets the fused loop (measured 27× on the similarity path).
  *
  * Null semantics are preserved exactly: zip_with pads a length mismatch
  * with nulls, which nulls the whole fold — so the rewrite emits DotProduct
  * in `strict` mode, which returns null on mismatched lengths instead of
  * folding the common prefix.
  *
  * Attach via `GraftFunctions.register` (experimental.extraOptimizations)
  * or the `GraftExtensions` session-extension entry point.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** (x, y) -> x * y over exactly the two lambda arguments. */
  private def isPairwiseMultiply(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (l.exprId == a.exprId && r.exprId == b.exprId) ||
        (l.exprId == b.exprId && r.exprId == a.exprId)
    case _ => false
  }

  /** (acc, v) -> acc + v over exactly the two lambda arguments. */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (l.exprId == a.exprId && r.exprId == b.exprId) ||
        (l.exprId == b.exprId && r.exprId == a.exprId)
    case _ => false
  }

  /** acc -> acc (the identity finish `aggregate` defaults to). */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
          ZipWith(a, b, mul), Literal(0.0, DoubleType), merge, finish)
          if isDoubleArray(a) && isDoubleArray(b) &&
            isPairwiseMultiply(mul) && isSumMerge(merge) &&
            isIdentityFinish(finish) && agg.deterministic =>
        DotProduct(a, b, strict = true)
    }
}
