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
}
