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

  /** FULL OPQ alternation (Ge et al. 2013, the non-parametric solver) on
    * the PCA-reduced space — the quality rung above [[learnPcaRotation]]'s
    * round-robin "OPQ-lite": starting from the PCA basis P (kOut×dim,
    * round-robin subspace order = O₀ = I), alternate
    *   1. CODEBOOK step: train the m per-subspace Lloyd codebooks on the
    *      currently-rotated corpus y = O·z (z = P·x fixed, computed once);
    *   2. ROTATION step: with reconstructions ŷ (nearest sub-centroid per
    *      subspace, concatenated), solve the orthogonal Procrustes
    *      min_O Σ‖O·z − ŷ‖² → O = polar(M) for M = Σ ŷ·zᵀ, via the polar
    *      decomposition O = M·(MᵀM)^{−1/2} — MᵀM is a bounded kOut×kOut
    *      symmetric matrix eigendecomposed ON THE DRIVER with the same
    *      deterministic power-deflation PCA uses ([[Pca.topKComponents]],
    *      fixed iteration counts, round-6 trajectory), so re-runs and
    *      engines agree.
    * Determinism: z is round-6 at birth ([[rotate]]), every O entry
    * re-rounds to 6 per round, Lloyd inherits the q117 float contract —
    * the whole trajectory is fixed-step with no RNG. Scale shape: per
    * round, m bounded Lloyd passes + ONE kOut² aggregate over the corpus
    * (map-side combined); every driver matrix is ≤ kOut² doubles. The
    * result composes with save/load/append unchanged — it is just a
    * [[Rotation]] whose rows are O·P.
    *
    * When to use which rung (measured, OpqSpec + the round-12 probe): on
    * data whose latent factors are independent with similar variances —
    * where Ge et al.'s PARAMETRIC solution is provably near-optimal — the
    * round-robin [[learnPcaRotation]] already wins and alternation only
    * adapts to quantizer noise (MSE 218.8 → 191.8 while recall@5 did not
    * improve); on heteroscedastic/heavy-tailed data (the realistic
    * embedding case) the alternation lifts recall@5 0.60 → 0.66 over the
    * lite rung. Spec-pinned (OpqSpec): recall ≥ lite on the
    * heteroscedastic fixture, deterministic re-learn, save/load
    * round-trip.
    */
  def learnAlternatingRotation(corpus: DataFrame, idCol: String,
      vecCol: String, cov: Array[Array[Double]], kOut: Int, m: Int,
      ksub: Int = 8, rounds: Int = 2, powerIters: Int = 12,
      lloydIters: Int = 1): Rotation = {
    require(rounds >= 1, "learnAlternatingRotation needs rounds >= 1")
    val p0 = learnPcaRotation(cov, kOut, m, powerIters)
    val dim = cov.length
    // z = P·x once; reused by every round's codebook + Procrustes passes
    val z = corpus
      .filter(col(vecCol).isNotNull &&
        size(Similarity.asDouble(col(vecCol))) === dim)
      .select(col(idCol).as("__id"), rotate(col(vecCol), p0).as("__z"))
      .localCheckpoint(true)
    val sub = kOut / m
    // O as kOut×kOut rows; O0 = I
    var o: Array[Array[Double]] =
      Array.tabulate(kOut, kOut)((i, j) => if (i == j) 1.0 else 0.0)
    def rotateByO(c: Column): Column =
      array(o.toIndexedSeq.map(r =>
        round(Similarity.dot(typedlit(r.toIndexedSeq), c), 6)): _*)
    (1 to rounds).foreach { _ =>
      val y = z.withColumn("__y", rotateByO(col("__z")))
      val books = Pq.pqCodebooks(y, "__id", "__y", kOut, m, ksub, lloydIters)
      // ŷ: per subspace the NEAREST codebook centroid (the encode step's
      // assignment), concatenated back to kOut — pure codegen projection
      val yhat = concat((0 until m).map { j =>
        val sl = slice(col("__y"), j * sub + 1, sub)
        element_at(
          typedlit(books(j).map { case (c, v) => c -> v }.toMap),
          Similarity.nearestCell(sl, books(j)))
      }: _*)
      // M_pq = Σ ŷ_p·z_q — one kOut² aggregate, map-side combined
      val sums = y.withColumn("__yh", yhat)
        .select((for { p <- 0 until kOut; q <- 0 until kOut } yield
          sum(element_at(col("__yh"), p + 1) *
            element_at(col("__z"), q + 1)).as(s"m_${p}_$q")): _*)
        .head()
      val mm = Array.tabulate(kOut, kOut)((p, q) =>
        sums.getAs[Double](s"m_${p}_$q"))
      o = polarOrthogonal(mm, powerIters)
    }
    // final rotation rows = round6(O·P) — subspace-major order preserved
    // (O mixes coordinates WITHIN the learned basis; slice boundaries are
    // row positions, unchanged)
    val pArr = p0.rows.map(_.toArray).toArray
    val rows = (0 until kOut).map { i =>
      (0 until dim).map { d =>
        var s = 0.0
        var j = 0
        while (j < kOut) { s += o(i)(j) * pArr(j)(d); j += 1 }
        Pca.round6(s)
      }
    }
    Rotation(rows, m)
  }

  /** Orthogonal factor of the polar decomposition of a square matrix:
    * O = M·(MᵀM)^{−1/2}, with (MᵀM)^{−1/2} from a deterministic CYCLIC
    * JACOBI eigendecomposition — not the power-deflation solver: an
    * OPQ-round M from near-isotropic data has CLUSTERED singular values,
    * where power iteration cannot separate eigenvectors (measured: the
    * power-based polar produced a visibly non-orthogonal O on the
    * anisotropic fixture and the alternation LOST recall 0.68 → 0.58);
    * Jacobi sweeps zero the off-diagonals regardless of eigen-gaps and
    * are deterministic under the fixed cyclic order. Eigenvalues are
    * floored at a tiny positive epsilon so a rank-deficient M (degenerate
    * corpora) yields a finite — if no longer exactly orthogonal — factor
    * instead of NaNs. `powerIters` bounds the sweep count. */
  private[graft] def polarOrthogonal(mArr: Array[Array[Double]],
      powerIters: Int): Array[Array[Double]] = {
    val k = mArr.length
    val mtm = Array.tabulate(k, k) { (i, j) =>
      var s = 0.0
      var t = 0
      while (t < k) { s += mArr(t)(i) * mArr(t)(j); t += 1 }
      s
    }
    val (lams, vCols) = jacobiEigen(mtm, math.max(powerIters, 20))
    val vArr = (0 until k).map(c =>
      Array.tabulate(k)(i => vCols(i)(c))).toArray
    val inv = lams.map(l => 1.0 / math.sqrt(math.max(l, 1e-12)))
    // W = V·diag(λ^{-1/2})·Vᵀ, O = M·W
    val w = Array.tabulate(k, k) { (i, j) =>
      var s = 0.0
      var c = 0
      while (c < k) { s += vArr(c)(i) * inv(c) * vArr(c)(j); c += 1 }
      s
    }
    Array.tabulate(k, k) { (i, j) =>
      var s = 0.0
      var t = 0
      while (t < k) { s += mArr(i)(t) * w(t)(j); t += 1 }
      Pca.round6(s)
    }
  }

  /** Deterministic cyclic-Jacobi eigendecomposition of a small symmetric
    * matrix (driver-side, k ≤ a few dozen): returns (eigenvalues,
    * eigenvector matrix V with eigenvectors as COLUMNS, A = V·diag(λ)·Vᵀ).
    * Fixed sweep order (p ascending, q ascending) and a fixed sweep count
    * make the trajectory replayable; convergence for k=8 is reached in
    * ~6 sweeps (off-diagonal mass is squared each sweep). Unlike power
    * deflation this handles CLUSTERED eigenvalues exactly — any rotation
    * within an eigenspace is still an orthonormal eigenbasis, which is all
    * the polar factor needs. */
  private[graft] def jacobiEigen(a0: Array[Array[Double]],
      sweeps: Int): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var s = 0
    var done = false
    while (s < sweeps && !done) {
      var off = 0.0
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) { off += a(p)(q) * a(p)(q); q += 1 }
        p += 1
      }
      if (off < 1e-24) done = true
      else {
        p = 0
        while (p < n) {
          var q = p + 1
          while (q < n) {
            val apq = a(p)(q)
            if (math.abs(apq) > 1e-18) {
              val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
              // stable tan(φ) of the annihilating rotation; sign(0) = +1
              val sgn = if (theta >= 0.0) 1.0 else -1.0
              val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              val c = 1.0 / math.sqrt(t * t + 1.0)
              val sn = t * c
              var i = 0
              while (i < n) {
                val aip = a(i)(p); val aiq = a(i)(q)
                a(i)(p) = c * aip - sn * aiq
                a(i)(q) = sn * aip + c * aiq
                i += 1
              }
              i = 0
              while (i < n) {
                val api = a(p)(i); val aqi = a(q)(i)
                a(p)(i) = c * api - sn * aqi
                a(q)(i) = sn * api + c * aqi
                val vip = v(i)(p); val viq = v(i)(q)
                v(i)(p) = c * vip - sn * viq
                v(i)(q) = sn * vip + c * viq
                i += 1
              }
            }
            q += 1
          }
          p += 1
        }
        s += 1
      }
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

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
