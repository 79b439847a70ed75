package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `sub`-codepoint sliding-window hashes of a string in ONE O(n) pass:
  * element i (0-based) is the hash of the window starting at codepoint
  * i — i.e. of `substring(s, i+1, sub)` in Spark semantics (both are
  * CODE-POINT indexed, so the windows line up with `substr` re-extraction
  * even across surrogate pairs). Length-< `sub` inputs yield an empty
  * array.
  *
  * This is the prune primitive of the exact-substring dedup family
  * ([[graft.text.DedupOps.exactSubstrSpans]], reference criterion in Lee
  * et al. 2022): the hash only PRUNES — candidates are re-verified on the
  * real gram text — so its exact function is engine-internal and
  * oracle-invisible. It replaces the per-position `md5(substr(s,i,sub))`
  * chain for two scale reasons:
  *
  *  - '''Cost class''': md5-per-position is O(n·sub) work plus a
  *    UTF8String allocation and digest per window; the rolling recurrence
  *    is O(n) total with zero allocation beyond the output array. Same
  *    asymptotics as the suffix-array family's linear scan.
  *  - '''Collision scaling''': a 32-bit hash space stops pruning at
  *    corpus scale — at ~1e14 positions (100 TB of text) EVERY 32-bit
  *    value has ~23k expected occurrences, so the "count ≥ 2" prune keeps
  *    every position and the verify stage degenerates to a full-corpus
  *    gram shuffle. Two independent Rabin-Karp recurrences (mods ~1e9/2^30)
  *    combined as h1·mod2+h2 give a ~60-bit space (max value
  *    (mod1−1)·mod2 + mod2−1 ≈ 1.07e18 < Long.MaxValue): expected
  *    spurious-candidate mass at 1e14 positions is n²/2·2⁻⁶⁰ ≈ 4e6 —
  *    noise, where 32 bits would be total prune collapse.
  *
  * Window recurrence per mod: h ← (h − cp_out·base^(sub−1))·base + cp_in,
  * all mod p with non-negative adjustment; magnitudes stay ≤ ~1.2e15 ≪
  * Long overflow. Codegen'd like [[DotProduct]]; the interpreted and
  * generated paths share [[WindowHashes.compute]] so they cannot diverge.
  */
case class WindowHashes(child: Expression, sub: Int)
    extends UnaryExpression {

  require(sub >= 2, s"window_hashes needs sub >= 2 (got $sub)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"window_hashes expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WindowHashes.compute(v.asInstanceOf[UTF8String], sub)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WindowHashes.compute($c, $sub);")

  override protected def withNewChildInternal(
      newChild: Expression): WindowHashes = copy(child = newChild)
}

object WindowHashes {
  // two independent Rabin-Karp parameter sets; combined value h1*MOD2+h2
  // fits a long: (MOD1-1)*MOD2 + (MOD2-1) ≈ 1.073e18 < 9.22e18
  final val BASE1 = 257L
  final val MOD1 = 1000000007L
  final val BASE2 = 263L
  final val MOD2 = 1073741789L // largest prime < 2^30

  /** Shared by interpreted eval and codegen (and [[GramHash]] for the
    * whole-string case): the two rolling recurrences over CODE POINTS. */
  def compute(s: UTF8String, sub: Int): ArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n < sub) return new GenericArrayData(Array.emptyLongArray)
    // base^(sub-1) mod p for the outgoing-codepoint term
    var pow1 = 1L; var pow2 = 1L
    var e = 1
    while (e < sub) { pow1 = pow1 * BASE1 % MOD1; pow2 = pow2 * BASE2 % MOD2; e += 1 }
    val out = new Array[Long](n - sub + 1)
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < sub) {
      h1 = (h1 * BASE1 + cps(i)) % MOD1
      h2 = (h2 * BASE2 + cps(i)) % MOD2
      i += 1
    }
    out(0) = h1 * MOD2 + h2
    var w = 1
    while (w <= n - sub) {
      val cOut = cps(w - 1)
      val cIn = cps(w + sub - 1)
      h1 = ((h1 - cOut * pow1 % MOD1 + MOD1) % MOD1 * BASE1 + cIn) % MOD1
      h2 = ((h2 - cOut * pow2 % MOD2 + MOD2) % MOD2 * BASE2 + cIn) % MOD2
      out(w) = h1 * MOD2 + h2
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Whole-string form of the same recurrences — BY CONSTRUCTION equal to
    * `compute(s, numCodePoints(s))(0)`: hashing gram text g yields the
    * value its source window produced, which is the build/probe agreement
    * the [[graft.text.ExactSubstrIndex]] relies on. */
  def computeWhole(s: UTF8String): Long = {
    val str = s.toString
    var h1 = 0L; var h2 = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h1 = (h1 * BASE1 + cp) % MOD1
      h2 = (h2 * BASE2 + cp) % MOD2
      i += Character.charCount(cp)
    }
    h1 * MOD2 + h2
  }
}

/** Whole-string sibling of [[WindowHashes]]: the combined two-mod
  * Rabin-Karp hash of the ENTIRE string — `gram_hash(g) ==
  * window_hashes(s, sub)[i]` whenever g is the `sub`-codepoint window of
  * s at i. The gram-side hash of the exact-substring index
  * ([[graft.text.ExactSubstrIndex.gramRelation]]) and of the streaming
  * decontamination probe. */
case class GramHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_hash expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    WindowHashes.computeWhole(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WindowHashes.computeWhole($c);")

  override protected def withNewChildInternal(
      newChild: Expression): GramHash = copy(child = newChild)
}
