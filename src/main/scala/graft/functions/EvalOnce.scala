package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that pins its (PURE) child to exactly ONE evaluation
  * site per row.
  *
  * Why it exists (guide §4.4, the JVM-expression flavor): when a projected
  * column is immediately filtered on — `withColumn("sim", expensive)
  * .filter($"sim" >= t)` — PushPredicateThroughNonJoin substitutes the
  * alias into the predicate and pushes it below the Project (or folds it
  * into a join condition), so every SURVIVING row evaluates `expensive`
  * twice: once in the pushed filter, once in the projection that outputs
  * the column. Whole-stage codegen's subexpression elimination is
  * per-operator and cannot merge the two sites. Measured on q192 (the
  * blocked Jaro–Winkler matcher, where most block pairs survive the 0.9
  * floor): the scorer ran ~2× per pair.
  *
  * Marking the expression non-deterministic is the documented way to tell
  * the optimizer "do not duplicate, reorder past, or constant-fold this"
  * (the guide's `asNondeterministic()` fix for Python UDFs). The child
  * here MUST in fact be pure — the flag is an optimizer barrier, not a
  * semantic claim: results are bit-identical to the unwrapped form, only
  * the evaluation count changes. Do not wrap anything whose value depends
  * on partitioning or row order.
  *
  * The trade-off is the one the guide names: the barrier also stops
  * legitimate pushes of OTHER cheap predicates through the same
  * projection, so wrap only genuinely expensive scorers (string DP,
  * similarity kernels), never routine arithmetic.
  */
case class EvalOnce(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  override def dataType: DataType = child.dataType

  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): EvalOnce =
    copy(child = newChild)
}
