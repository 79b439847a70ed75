package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Nearest-centroid assignment over a DRIVER-LITERAL centroid table as one
  * codegen'd expression: argmin over round(d²(v, cᵢ), 6) with the
  * smaller-cell tie-break.
  *
  * Replaces the `least(struct(round(dist2(v, lit cᵢ), 6), cellᵢ), …)`
  * construction: that tree inlines 3·nCells dot products into the
  * generated method, and with two or more assignment trees in one
  * projection the method blows past the JIT's huge-method threshold —
  * the stage silently runs in the bytecode interpreter (measured: one
  * 16-cell tree 1.3 s over 1M×16, two trees 39 s, four 69 s). This
  * expression is a ~30-line loop the JIT always compiles.
  *
  * Float parity (the oracle contract): d² = dot(v,v) − 2·dot(v,c) +
  * dot(c,c) with every dot a strict left-to-right fold — the dot(c,c)
  * term is precomputed per centroid at construction with the same fold,
  * exactly what constant folding produces for the literal-literal
  * DotProduct; rounding replicates Spark's Round-on-double
  * (BigDecimal.valueOf → setScale(6, HALF_UP)); centroids are visited in
  * ascending cell order with a strict `<`, which IS the lexicographic
  * (d2, cell) least. Null-element behavior matches the non-strict
  * DotProduct (element null flags ignored, value read as stored). A NaN
  * distance (NaN vector components) sorts LAST via Double.compare —
  * finite distances always win, matching the SQL ORDER BY the oracles
  * replay and the NearestChildCell twin.
  */
case class NearestCentroid(child: Expression, cells: Seq[Int],
    cents: Seq[Seq[Double]]) extends UnaryExpression {

  require(cells.nonEmpty && cells.size == cents.size,
    "NearestCentroid needs one cell id per centroid")
  require(cells.sliding(2).forall(p => p.size < 2 || p.head < p(1)),
    "NearestCentroid cells must be strictly ascending (tie-break order)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  private lazy val cellArr: Array[Int] = cells.toArray
  private lazy val centArr: Array[Array[Double]] = cents.map(_.toArray).toArray
  // dot(c, c) per centroid, same left-to-right fold as DotProduct
  private lazy val ccArr: Array[Double] = centArr.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    NearestCentroid.assign(v, cellArr, centArr, ccArr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("cells", cellArr, "int[]")
    val centsRef = ctx.addReferenceObj("cents", centArr, "double[][]")
    val ccRef = ctx.addReferenceObj("ccs", ccArr, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
        ${ev.value} = graft.functions.NearestCentroid.assign(
          $a, $cellsRef, $centsRef, $ccRef);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  /** Spark's Round on double: BigDecimal.valueOf → setScale(6, HALF_UP);
    * NaN/Infinity pass through unchanged, exactly as Spark's RoundBase. */
  private def round6(v: Double): Double =
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
    else java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Shared by interpreted eval and codegen — one tight JIT-friendly loop. */
  def assign(v: ArrayData, cells: Array[Int], cents: Array[Array[Double]],
      ccs: Array[Double]): Int = {
    val n = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < n) { vv += v.getDouble(i) * v.getDouble(i); i += 1 }
    var best = -1
    var bestD = 0.0
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      val m = math.min(n, c.length)
      var sc = 0.0
      i = 0
      while (i < m) { sc += v.getDouble(i) * c(i); i += 1 }
      val d2 = round6(vv - 2.0 * sc + ccs(k))
      // Double.compare, not `<`: NaN sorts LAST (the SQL ORDER BY contract,
      // and parity with NearestChildCell); round6 never yields -0.0, so
      // compare==`<` on everything else
      if (best < 0 || java.lang.Double.compare(d2, bestD) < 0) {
        best = cells(k); bestD = d2
      }
      k += 1
    }
    best
  }
}
