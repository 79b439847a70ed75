package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding storage: per-vector symmetric
  * scale (max |x| / 127), elements rounded to [-127, 127]. The standard 4×
  * storage/IO reduction for a 100 TB embedding corpus — ANN candidate
  * generation runs on the int8 vectors, exact re-ranking on the (much
  * smaller) candidate set's full-precision originals.
  *
  * Reconstruction error is bounded by scale/2 per element, so relative
  * error shrinks as vectors grow peaky; recall impact is pinned in
  * SimilaritySpec. Pure HOF arithmetic (single pass per vector) — exactly
  * reproducible by any engine with list ops + the same rounding, which q84
  * pins against DuckDB.
  */
object Quantization {

  /** Per-vector symmetric scale: max |x| / 127 (0.0 for the zero vector). */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x))) / 127.0

  /** Quantize to int8 codes given the vector's scale (zero vector → zeros). */
  def quantizeInt8(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale > 0, round(x / scale, 0)).otherwise(0.0).cast("int"))

  /** Dequantize codes back to doubles. */
  def dequantizeInt8(codes: Column, scale: Column): Column =
    transform(codes, q => q.cast("double") * scale)

  /** Max absolute reconstruction error of a vector under its quantization. */
  def maxAbsError(vec: Column, codes: Column, scale: Column): Column =
    array_max(zip_with(vec, codes, (x, q) => abs(x - q.cast("double") * scale)))

  /** One packed sign word: bit j of the result is set when
    * `vec[start-1 + j] >= 0` (1-based `start`, `bits` ≤ 32). Bit values are
    * built as exact powers of two in double (2^j ≤ 2^31 « 2^53) and summed —
    * disjoint bits, so addition IS bitwise-or, and an external engine
    * reproduces the word with plain `pow` + truncating cast (no shift
    * builtin required).
    */
  private def packWord(vec: Column, start: Int, bits: Int): Column =
    aggregate(
      zip_with(slice(vec, start, bits), sequence(lit(0), lit(bits - 1)),
        (x, j) => when(x >= 0, pow(lit(2.0), j).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc + b)

  /** Binary (sign) quantization: `dim` elements packed into
    * ceil(dim/wordBits) longs of `wordBits` sign bits each — 32× smaller
    * than float32 storage (64× vs double), the coarsest rung of the
    * embedding-compression ladder ([[int8Scale]] is the 4× rung). Cosine of
    * sign vectors is monotone in Hamming distance, so candidate generation
    * runs entirely on the packed words (XOR + popcount per pair instead of
    * `dim` multiplies) and full-precision vectors are only fetched for the
    * k-bounded rerank. `wordBits` defaults to 32 so bit values stay exact in
    * double arithmetic cross-engine.
    */
  def signBits(vec: Column, dim: Int, wordBits: Int = 32): Column =
    array((0 until dim by wordBits).map(s =>
      packWord(vec, s + 1, math.min(wordBits, dim - s))): _*)

  /** Hamming distance between two packed sign-bit arrays: popcount of the
    * per-word XOR, summed. Whole-stage-codegen arithmetic (bit_count is a
    * native expression).
    */
  def hammingDistance(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, d) => acc + d)

  /** Matryoshka truncation (Kusupati et al. 2022): keep the first `dims`
    * components and L2-renormalize — MRL-trained embeddings pack most
    * signal into the prefix, so truncation is a 4–16× storage/compute cut
    * with bounded quality loss ([[prefixEnergy]] audits how bounded).
    * The zero prefix maps to the zero vector.
    *
    * The norm is paired with the elements through `array_repeat` BEFORE the
    * lambda: a direct `transform(t, x => x / n)` would re-evaluate `n` — an
    * O(dims) fold — per ELEMENT (higher-order-function lambdas re-evaluate
    * captured subexpressions each call), turning the projection quadratic
    * in dims.
    */
  def truncateRenorm(vec: Column, dims: Int): Column = {
    val t = slice(vec, 1, dims)
    val n = sqrt(Similarity.dot(t, t))
    zip_with(t, array_repeat(n, dims),
      (x, nn) => when(nn =!= 0.0, x / nn).otherwise(lit(0.0)))
  }

  /** Fraction of a vector's squared mass held by its first `dims`
    * components — the per-vector audit of how safe Matryoshka truncation
    * is (1.0 = lossless, MRL-trained corpora sit near 1; ~dims/dim on
    * isotropic vectors means truncation would destroy ranking).
    */
  def prefixEnergy(vec: Column, dims: Int): Column = {
    val t = slice(vec, 1, dims)
    Similarity.dot(t, t) / Similarity.dot(vec, vec)
  }
}
