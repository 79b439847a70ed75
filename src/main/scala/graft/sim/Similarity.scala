package graft.sim

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis.md5Int32

/** One scored (corpus id, similarity) hit. */
case class ScoredHit(cid: Long, sim: Double)

/** Bounded top-k aggregate with MAP-SIDE partial reduction: each map task
  * keeps at most 2k hits per query and ships k, so the per-query merge
  * receives |map partitions|·k rows instead of the whole scored corpus —
  * the scale-safe replacement for a global `Window.partitionBy(qid)`
  * row_number, whose |Q| hot partitions each funnel the full corpus.
  * Ordering matches the window it replaces: sim DESC, cid ASC.
  */
class TopKAgg(k: Int) extends Aggregator[ScoredHit, Seq[ScoredHit], Seq[ScoredHit]] {
  private def ord: Ordering[ScoredHit] =
    Ordering.by((h: ScoredHit) => (-h.sim, h.cid))
  // amortized trim: let the buffer grow to 2k, then cut back to k
  private def trim(s: Seq[ScoredHit]): Seq[ScoredHit] =
    if (s.length <= 2 * k) s else s.sorted(ord).take(k)
  override def zero: Seq[ScoredHit] = Seq.empty
  override def reduce(b: Seq[ScoredHit], a: ScoredHit): Seq[ScoredHit] = trim(b :+ a)
  override def merge(x: Seq[ScoredHit], y: Seq[ScoredHit]): Seq[ScoredHit] =
    (x ++ y).sorted(ord).take(k)
  override def finish(r: Seq[ScoredHit]): Seq[ScoredHit] = r.sorted(ord).take(k)
  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[ScoredHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredHit]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[ScoredHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredHit]]()
}

/** Similarity search over embedding columns (Array[Float]).
  *
  * Brute-force cosine top-k is the correctness baseline: broadcast the (small)
  * query set, one streaming pass over the corpus, per-query top-k. The LSH
  * variant is the scale path: random-hyperplane sign buckets shrink the
  * candidate set so the corpus-side join is bucket-local.
  *
  * All dot products fold left-to-right over the array (functions.aggregate),
  * making the double sums reproducible.
  */
object Similarity {

  /** Cast Array[Float] → Array[Double] (exact). */
  def asDouble(c: Column): Column = c.cast("array<double>")

  /** Codegen'd left-to-right dot product (graft.functions.DotProduct) —
    * bit-identical to the HOF fold `aggregate(zip_with(a,b,_*_),0.0,_+_)`
    * it replaces, but runs inside whole-stage codegen.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Two-phase per-query top-k over a scored relation (qid, cid, sim):
    * map-side bounded heaps (TopKAgg partial) → one balanced shuffle of
    * |partitions|·|Q|·k partial states → per-qid merge → posexplode into
    * ranked rows. No |Q|-hot-partition window anywhere.
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k), Encoders.product[ScoredHit])
    scored.groupBy("qid")
      .agg(topk(col("cid").cast("long"), col("sim")).as("hits"))
      .select(col("qid"), posexplode(col("hits")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col.cid").as("cid"), col("col.sim").as("sim"))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself when ids collide). Output:
    * (qid, rank, cid, sim). The query side is broadcast; the corpus is
    * scanned once; per-query top-k is the two-phase partial aggregate
    * (map-side heaps), not a global window.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms precomputed per side: one fold per pair instead of three, same
    // doubles (sqrt(dot(v,v)) is identical wherever it's evaluated)
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    topKPerQuery(scored, k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane j, dim i):
    * md5-derived value in [-1, 1). Reproducible anywhere, no RNG state.
    */
  private def planeComponent(j: Int, i: Column): Column =
    (md5Int32(concat_ws("_", lit(j), i)) % 2001L - 1000L).cast("double") / 1000.0

  /** Sign bit of vector · hyperplane_j. */
  private def planeBit(vec: Column, j: Int): Column = {
    val proj = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x * planeComponent(j, i)),
      lit(0.0), (acc, x) => acc + x)
    when(proj >= 0, lit(1L << j)).otherwise(0L)
  }

  /** Random-hyperplane LSH bucket id (nPlanes sign bits packed in a long). */
  def lshBucket(vec: Column, nPlanes: Int): Column =
    (0 until nPlanes).map(j => planeBit(vec, j)).reduce(_ + _)

  /** Bucketed approximate top-k: queries join only corpus vectors in the SAME
    * hyperplane bucket. Recall < 1 by construction; at scale the bucket join
    * replaces the full cross product (shuffle keyed on bucket id).
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nPlanes: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), nPlanes))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), nPlanes))
      .withColumn("cn", norm(col("cv")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    topKPerQuery(scored, k)
  }

  /** Bucket id of band `l`: the packed sign bits of hyperplanes
    * [l·bandBits, (l+1)·bandBits). Bands use disjoint global plane indices,
    * so bit positions never collide across bands.
    */
  private def bandBucket(vec: Column, l: Int, bandBits: Int): Column =
    (l * bandBits until (l + 1) * bandBits).map(j => planeBit(vec, j))
      .reduce(_ + _)

  /** Number of bands L such that a pair at exactly `threshold` cosine is
    * caught by at least one band with probability ≥ recallTarget
    * (hyperplane collision probability p = 1 − θ/π, band match p^bandBits,
    * miss-all-bands (1 − p^bandBits)^L).
    */
  def bandingFor(threshold: Double, bandBits: Int, recallTarget: Double = 0.999): Int = {
    val p = 1.0 - math.acos(math.min(1.0, math.max(-1.0, threshold))) / math.Pi
    val pBand = math.pow(p, bandBits)
    math.max(1, math.ceil(math.log1p(-recallTarget) / math.log1p(-pBand)).toInt)
  }

  /** Near-duplicate pairs by embedding cosine — the "embedding-cosine
    * near-dup" dedup mode, NEVER as an all-pairs cross join: candidate pairs
    * come from banded hyperplane LSH (same shape as
    * `DedupOps.lshCandidatePairs` for text — explode bands → self-equi-join
    * on (band, bucket) → distinct), then ONLY candidates get the exact
    * cosine + threshold verify. The shuffles are keyed equi-joins, so the
    * plan scales with bucket occupancy, not n².
    *
    * Recall: a pair at cosine exactly `threshold` is caught with probability
    * 1−(1−p^bandBits)^bands (see [[bandingFor]]). The defaults (2, 24) give
    * per-pair miss ≈ 2.6e-5 at threshold 0.3 — exact on the test fixtures
    * (asserted in SimilaritySpec) — chosen for the LOW-threshold regime the
    * oracle pins. Real near-dup sweeps (threshold ≥ 0.8) should pass larger
    * bands, e.g. `bandBits = 8, bands = bandingFor(0.8, 8)`, which shrinks
    * buckets ~256× and makes candidate generation genuinely sub-quadratic.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bandBits: Int = 2, bands: Int = 24): DataFrame = {
    val vecs = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("n", norm(col("v")))
    val banded = vecs.select(col("id"),
      posexplode(array((0 until bands).map(l => bandBucket(col("v"), l, bandBits)): _*))
        .as(Seq("band", "bucket")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("d1"), col("y.id").as("d2"))
      .distinct()
    cand
      .join(vecs.select(col("id").as("d1"), col("v").as("v1"), col("n").as("n1")), Seq("d1"))
      .join(vecs.select(col("id").as("d2"), col("v").as("v2"), col("n").as("n2")), Seq("d2"))
      .withColumn("sim", round(dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 6))
      .filter(col("sim") >= threshold)
      .select("d1", "d2", "sim")
  }
}
