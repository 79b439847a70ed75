package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OPQ-style learned pre-rotation for (IVF-)PQ — the FAISS
  * `PCAR<k>,IVF…,PQ…` pre-transform chain re-expressed on this repo's
  * deterministic PCA: product quantization splits the vector into m
  * independent subspaces, and on anisotropic embeddings (the realistic
  * case — a few dominant directions) a RAW split puts correlated,
  * wildly-unequal-variance coordinates into the same codebooks, wasting
  * their ksub centroids. The fix (Ge et al. 2013, "Optimized Product
  * Quantization"): rotate into a decorrelated basis and BALANCE variance
  * across subspaces before splitting.
  *
  * This is the deterministic OPQ-lite rung: the basis is the top-kOut
  * power-iteration deflation components ([[Pca.topKComponents]] — the
  * exactly-oracled q281 trajectory), and balance is ROUND-ROBIN
  * allocation of components (descending eigenvalue) across the m
  * subspaces — each subspace gets an even mix of high- and low-variance
  * directions. Round-robin serves the paper's balanced-variance objective
  * deterministically (their eigenvalue-bucket greedy is order-dependent),
  * so the whole rotation replays in external SQL (q295's oracle). kOut <
  * dim doubles as PCA dimensionality reduction, exactly as FAISS's PCAR
  * pre-transform.
  *
  * Scale shape: the rotation is a bounded kOut×dim driver matrix riding
  * the projection as codegen'd [[Similarity.dot]] literals — no join, no
  * shuffle; everything downstream is the unchanged IVF-PQ machinery, so
  * save/load/incremental-add compose verbatim ([[appendToSavedRotatedIndex]]).
  * Rotated components ROUND to 6 (the quantizer float contract), keeping
  * every downstream comparison bit-replayable.
  */
object Opq {

  /** A learned pre-rotation: `rows(p)` is the dense direction whose dot
    * with the input vector is output coordinate p; subspace-major order
    * (rows p·kOut/m … belong to subspace p). */
  final case class Rotation(rows: Seq[Seq[Double]], m: Int)

  /** Learn the rotation from a covariance matrix (use
    * [[Pca.covarianceMatrix]] + [[Pca.collectCovariance]]; at 100 TB,
    * [[Pca.covarianceMatrixFast]] over a sample). */
  def learnPcaRotation(cov: Array[Array[Double]], kOut: Int, m: Int,
      iters: Int = 12): Rotation = {
    require(kOut >= 1 && m >= 1 && kOut % m == 0,
      s"learnPcaRotation needs m | kOut (got m=$m, kOut=$kOut)")
    require(kOut <= cov.length,
      s"learnPcaRotation needs kOut <= dim (got $kOut > ${cov.length})")
    val dim = cov.length
    val comps = Pca.topKComponents(cov, kOut, iters)
    def dense(l: Seq[(Int, Double)]): Seq[Double] = {
      val a = Array.ofDim[Double](dim)
      l.foreach { case (i, x) => a(i) = x }
      a.toSeq
    }
    // component c (0-based extraction order = descending eigenvalue) goes
    // to subspace c % m; rows are subspace-major so the PQ slice boundaries
    // land between subspaces
    val bySub = (0 until m).map { j =>
      comps.zipWithIndex.collect { case (pc, c) if c % m == j => dense(pc.loading) }
    }
    Rotation(bySub.flatten, m)
  }

  /** Rotate a vector column: output p = round6(rows(p) · v) — one
    * codegen'd dot per output coordinate, literals only, no shuffle. */
  def rotate(vecCol: Column, rot: Rotation): Column =
    array(rot.rows.map(r =>
      round(Similarity.dot(typedlit(r), Similarity.asDouble(vecCol)), 6)): _*)

  /** Build an IVF-PQ index over the ROTATED corpus — everything after the
    * rotation projection is [[Pq.buildIvfPqIndex]] verbatim. */
  def buildRotatedIvfPqIndex(corpus: DataFrame, idCol: String,
      vecCol: String, rot: Rotation, nLists: Int = 8, ksub: Int = 8,
      iters: Int = 1, trainOn: Option[DataFrame] = None): Pq.IvfPqIndex =
    Pq.buildIvfPqIndex(
      corpus.withColumn("__rv", rotate(col(vecCol), rot)),
      idCol, "__rv", dim = rot.rows.size, nLists = nLists, m = rot.m,
      ksub = ksub, iters = iters,
      trainOn = trainOn.map(_.withColumn("__rv", rotate(col(vecCol), rot))))

  /** Query a rotated index: queries rotate through the SAME matrix, then
    * the unchanged ADC probe ([[Pq.queryIvfPqIndex]]). */
  def queryRotatedIndex(index: Pq.IvfPqIndex, rot: Rotation,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 2): DataFrame =
    Pq.queryIvfPqIndex(index,
      queries.withColumn("__rv", rotate(col(vecCol), rot)),
      idCol, "__rv", k, nProbe)

  def saveRotation(spark: SparkSession, rot: Rotation, dir: String): Unit = {
    import spark.implicits._
    rot.rows.zipWithIndex.map { case (r, p) => (p, rot.m, r) }
      .toDF("row", "m", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/rotation")
  }

  def loadRotation(spark: SparkSession, dir: String): Rotation = {
    val rows = spark.read.parquet(s"$dir/rotation")
      .orderBy("row").collect()
    Rotation(
      rows.map(_.getSeq[Double](2).toIndexedSeq.asInstanceOf[Seq[Double]]).toSeq,
      rows.head.getInt(1))
  }

  /** Persist rotation + index together (one dir, one load). */
  def saveRotatedIndex(spark: SparkSession, rot: Rotation,
      index: Pq.IvfPqIndex, dir: String): Unit = {
    Pq.saveIvfPqIndex(index, dir)
    saveRotation(spark, rot, dir)
  }

  def loadRotatedIndex(spark: SparkSession,
      dir: String): (Rotation, Pq.IvfPqIndex) =
    (loadRotation(spark, dir), Pq.loadIvfPqIndex(spark, dir))

  /** Incremental add against a SAVED rotated index: the batch rotates
    * through the STORED matrix, then the unchanged frozen-quantizer
    * append ([[Pq.appendToSavedIvfPqIndex]] — including its dimension
    * guard, which now checks the ROTATED width). Build-then-add equals
    * encode-union exactly, as for the unrotated index. */
  def appendToSavedRotatedIndex(spark: SparkSession, dir: String,
      batch: DataFrame, idCol: String, vecCol: String): Long = {
    val rot = loadRotation(spark, dir)
    Pq.appendToSavedIvfPqIndex(spark, dir,
      batch.withColumn("__rv", rotate(col(vecCol), rot)), idCol, "__rv")
  }
}
