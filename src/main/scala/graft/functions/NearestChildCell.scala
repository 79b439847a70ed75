package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructType}

/** Nearest-centroid assignment over a COLUMN-BORNE centroid table — the
  * [[NearestCentroid]] loop with the centroids arriving per row as
  * `array<struct<cell: long, cv: array<double>>>` instead of driver
  * literals. This is what makes a hierarchical (two-level) coarse
  * quantizer possible at scale: the driver and codegen constants hold only
  * the ~√k SUPER centroids, while the k child centroids stay a distributed
  * relation that equi-joins in (grouped to one sorted struct array per
  * super-cell), so assignment is O(n·√k) FLOPs with driver state O(√k) —
  * no n×k row materialization, no k-row driver collect.
  *
  * Contract mirrors [[NearestCentroid]] exactly, for oracle parity:
  * argmin over round(d²(v, cᵢ), 6), smaller cell breaks ties — REQUIRES
  * the struct array sorted ascending by cell (sort_array on the struct
  * gives lexicographic = cell order; the strict `<` then keeps the
  * smallest cell on rounded-d² ties). Every dot product is the strict
  * left-to-right fold; rounding is Spark's Round-on-double
  * (BigDecimal.valueOf → setScale(6, HALF_UP)). Unlike the literal
  * variant, dot(c,c) has no construction-time cache — it folds inline per
  * row with the same left-to-right order, which is bit-identical to what
  * constant folding produces for literal centroids. Null or empty child
  * array → null (the caller's fallback-cell branch handles childless
  * super-cells); null ELEMENTS inside the array are skipped. NaN
  * distances sort last (java.lang.Double.compare), matching the SQL
  * ORDER BY the oracle replays. One tight JIT-friendly loop in both
  * interpreted and generated paths.
  */
case class NearestChildCell(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(s: StructType, _))
          if s.length == 2 && s(0).dataType == LongType &&
            s(1).dataType.isInstanceOf[ArrayType] &&
            s(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "nearest_child_cell expects (array<double>, array<struct<cell: " +
          s"long, cv: array<double>>>), got (${l.simpleString(10)}, " +
          s"${r.simpleString(10)})")
    }

  override def dataType: DataType = LongType

  // empty child array yields null even though inputs are non-null
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any, children: Any): Any =
    NearestChildCell.assign(v.asInstanceOf[ArrayData],
      children.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, ch) => {
      // fresh local per instance (the DotProduct convention): two of these
      // expressions compiled into one generated method must not collide
      val ncc = ctx.freshName("ncc")
      s"""
        Object $ncc = graft.functions.NearestChildCell.assign($v, $ch);
        if ($ncc == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ((Long) $ncc).longValue(); }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): NearestChildCell =
    copy(left = newLeft, right = newRight)
}

object NearestChildCell {

  /** Spark's Round on double: BigDecimal.valueOf → setScale(6, HALF_UP);
    * NaN/Infinity pass through unchanged, exactly as Spark's RoundBase. */
  private def round6(v: Double): Double =
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
    else java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Shared by interpreted eval and codegen — one tight loop; returns a
    * boxed Long (null for an empty/degenerate child array). */
  def assign(v: ArrayData, children: ArrayData): java.lang.Long = {
    val nc = children.numElements()
    if (nc == 0) return null
    val n = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < n) { vv += v.getDouble(i) * v.getDouble(i); i += 1 }
    var best = 0L
    var bestD = 0.0
    var found = false
    var k = 0
    while (k < nc) {
      // containsNull=true arrays are legal input: a null struct element is
      // skipped, exactly like a null-field element
      if (!children.isNullAt(k)) {
        val row: InternalRow = children.getStruct(k, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val cell = row.getLong(0)
          val c = row.getArray(1)
          val m = math.min(n, c.numElements())
          var sc = 0.0
          var cc = 0.0
          i = 0
          while (i < m) { sc += v.getDouble(i) * c.getDouble(i); i += 1 }
          i = 0
          val cl = c.numElements()
          while (i < cl) { cc += c.getDouble(i) * c.getDouble(i); i += 1 }
          val d2 = round6(vv - 2.0 * sc + cc)
          // Double.compare, not `<`: NaN compares LARGER than every finite
          // distance (the SQL ORDER BY contract — NaN sorts last), so a
          // NaN-distance child can never shadow a finite one; round6 never
          // yields -0.0, so compare==`<` on everything else
          if (!found || java.lang.Double.compare(d2, bestD) < 0) {
            best = cell; bestD = d2; found = true
          }
        }
      }
      k += 1
    }
    if (found) java.lang.Long.valueOf(best) else null
  }
}
