package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Jaro–Winkler similarity — the fuzzy-name scorer entity
  * matching uses where Levenshtein is too strict (it rewards shared
  * prefixes and tolerates transpositions). Semantics match DuckDB's
  * `jaro_winkler_similarity` exactly (verified by the q191 oracle):
  *  - operates on UTF-8 BYTES (multi-byte codepoints count per byte);
  *  - Jaro match window ⌊max(|a|,|b|)/2⌋−1 (floored at 0), transposition
  *    count halved as an integer;
  *  - Winkler prefix boost j + 0.1·ℓ·(1−j) with ℓ = common prefix bytes
  *    capped at 4, applied only when j > 0.7 (strict);
  *  - either side empty → 0.0 (DuckDB scores two empties 0, not 1).
  *
  * Spark has no built-in Jaro — `levenshtein` is its only edit metric —
  * so this is a genuine surface extension, not a rewrite. The per-row
  * scratch is two byte-length boolean arrays; strings in matching
  * pipelines are short keys, so allocation stays in the TLAB.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.score(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.score($a.getBytes(), $b.getBytes());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Static scorer shared by interpreted eval and generated code. */
  def score(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (la == lb && java.util.Arrays.equals(a, b)) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched bytes compared in order, mismatches halved
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val lMax = math.min(4, math.min(la, lb))
    while (l < lMax && a(l) == b(l)) l += 1
    jaro + 0.1 * l * (1.0 - jaro)
  }
}
