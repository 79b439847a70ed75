package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis.md5Int32

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

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself when ids collide). Output:
    * (qid, rank, cid, sim). The query side is broadcast; the corpus is
    * scanned once; the only shuffle is the per-query top-k window.
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
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid", "sim")
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
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid", "sim")
  }

  /** Near-duplicate pairs by embedding cosine over a bounded id range —
    * the "embedding-cosine near-dup" dedup mode.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("d1"), asDouble(col(vecCol)).as("v1"))
      .withColumn("n1", norm(col("v1")))
    val b = df.select(col(idCol).as("d2"), asDouble(col(vecCol)).as("v2"))
      .withColumn("n2", norm(col("v2")))
    a.crossJoin(b)
      .filter(col("d1") < col("d2"))
      .withColumn("sim", round(dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 6))
      .filter(col("sim") >= threshold)
      .select("d1", "d2", "sim")
  }
}
