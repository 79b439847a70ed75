package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sim.Similarity.asDouble

/** Principal-component analysis for embedding columns, built for the
  * cross-engine float contract: every data-sized reduction is a
  * DECIMAL(38,8)-cast sum (order-independent, so shuffle layout can't move
  * the result) and every derived statistic is rounded to 6 decimals before
  * reuse — the same discipline as [[Similarity.lloydCentroids]], which is
  * what lets a DuckDB oracle replay the full covariance → power-iteration →
  * projection trajectory CTE for CTE (q272/q273).
  *
  * Why PCA belongs in a training-data engine: embedding spaces from real
  * encoders are anisotropic (a few directions carry most variance), which
  * distorts cosine-based dedup/ANN; the standard fixes — dominant-direction
  * removal (Mu & Viswanath 2018, "All-but-the-Top") and whitening — need
  * exactly these primitives: the covariance matrix, its top eigenvectors,
  * and centered projections.
  *
  * Scale shape: ONE corpus pass produces the full Gram upper triangle plus
  * per-position sums (a flattened per-row product array → one
  * map-side-combined positional aggregate; shuffle volume is
  * partitions · (dim(dim+1)/2 + dim) partial sums, never rows). Everything
  * after that operates on the dim×dim covariance relation — bounded,
  * driver-holdable (64-dim → 2 080 upper-triangle entries). Power
  * iteration runs as `iters` tiny Spark jobs over that bounded relation,
  * mirroring the Lloyd build's iterate-and-collect structure.
  */
object Pca {

  /** Population covariance matrix of a `dim`-wide vector column: one row
    * per 0-based (i ≤ j) with `cov` rounded to 6. Rows whose vector is
    * NULL or of the wrong width are excluded (same contract as the dedup
    * families' non-null-id rule: a malformed vector is upstream's bug, not
    * a zero to average in).
    *
    * cov_ij = (Sxy_ij − Sx_i·Sx_j / n) / n with Sxy/Sx as DECIMAL-exact
    * sums — the one-pass textbook form; the cancellation risk it carries
    * is bounded here because embedding coordinates are O(1)-magnitude and
    * the sums are exact until the final double ops.
    */
  def covarianceMatrix(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val spark = df.sparkSession
    import spark.implicits._
    val pairCount = dim * (dim + 1) / 2
    val v = df.select(asDouble(col(vecCol)).as("v"))
      .filter(size(col("v")) === dim)
    // flattened upper-triangle products, enumeration (i asc, j in i..dim-1),
    // with the raw vector appended so ONE positional aggregate yields both
    // the Gram sums (pos < pairCount) and the per-position sums + n
    val prods = flatten(transform(col("v"), (x: Column, i: Column) =>
      transform(slice(col("v"), i + 1, lit(dim) - i), (y: Column) => x * y)))
    val agg = v.select(posexplode(concat(prods, col("v"))))
      .groupBy("pos")
      .agg(sum(col("col").cast("decimal(38,8)")).cast("double").as("s"),
        count(lit(1)).as("n"))
    // pos → (i, j) for the flattened enumeration; bounded dim²/2 rows
    val idx = (for { i <- 0 until dim; j <- i until dim }
      yield (i.toLong * dim - i.toLong * (i - 1) / 2 + (j - i), i, j))
      .toDF("pos", "i", "j")
    val sums = agg.filter(col("pos") >= pairCount)
      .select((col("pos") - pairCount).cast("int").as("k"), col("s").as("sx"),
        col("n"))
    agg.filter(col("pos") < pairCount)
      .join(broadcast(idx), Seq("pos"))
      .join(broadcast(sums.select(col("k").as("i"), col("sx").as("sxi"),
        col("n").as("nr"))), Seq("i"))
      .join(broadcast(sums.select(col("k").as("j"), col("sx").as("sxj"))),
        Seq("j"))
      .select(col("i"), col("j"),
        round((col("s") - col("sxi") * col("sxj") / col("nr")) / col("nr"), 6)
          .as("cov"))
  }

  /** Per-position round-6 means of the vector column — the centering
    * vector [[project]] subtracts. Same exclusion rule as
    * [[covarianceMatrix]]. */
  def positionMeans(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    df.select(asDouble(col(vecCol)).as("v"))
      .filter(size(col("v")) === dim)
      .select(posexplode(col("v")))
      .groupBy("pos")
      .agg(round(sum(col("col").cast("decimal(38,8)")).cast("double")
        / count(lit(1)), 6).as("m"))

  /** Dominant eigenvector of an upper-triangle covariance relation via
    * `iters` FIXED power-iteration steps, deterministic end to end:
    * v0 = round6(1/√dim) (all-positive, so the iterate cannot start
    * orthogonal to a non-negative dominant direction), each step is
    * w = C·v with DECIMAL-summed products of round-6 operands, then
    * v' = round6(w / ‖w‖). Correctness here means REPLAYABILITY, not
    * convergence: an external engine running the same `iters` steps gets
    * the same vector bit for bit (q273's oracle unrolls them), and
    * convergence quality is gated separately in the spec via Rayleigh
    * quotient growth.
    *
    * The covariance relation is bounded (dim² ≤ a few thousand rows), so
    * it is collected once and each step runs as one tiny local Spark job —
    * the [[Similarity.lloydCentroids]] iterate-and-collect shape. Returns
    * (0-based position → loading), ‖·‖ = 1 up to round-6.
    */
  /** Upper-triangle covariance relation → full symmetric (i, j, c),
    * driver-held (bounded dim² rows) so iterations never re-derive the
    * covariance from data. */
  private def mirrorFull(cov: DataFrame): DataFrame = {
    val spark = cov.sparkSession
    import spark.implicits._
    cov.select(col("i").cast("int"), col("j").cast("int"),
      col("cov").cast("double")).collect()
      .flatMap { r =>
        val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
        if (i == j) Seq((i, j, c)) else Seq((i, j, c), (j, i, c))
      }.toSeq.toDF("i", "j", "c")
  }

  def topComponent(cov: DataFrame, dim: Int, iters: Int): Seq[(Int, Double)] = {
    val spark = cov.sparkSession
    import spark.implicits._
    val full = mirrorFull(cov)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // HALF_UP at scale 6, matching Spark's round() and DuckDB's ROUND()
      // (all three round halves away from zero)
      val v0Elem = new java.math.BigDecimal(1.0 / math.sqrt(dim.toDouble))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val v0: Seq[(Int, Double)] = (0 until dim).map(i => (i, v0Elem))
      (1 to iters).foldLeft(v0) { (vk, _) =>
        val vdf = vk.toDF("j", "x")
        // DECIMAL(38,12), not (38,8): c and x are round-6, so their product
        // has EXACTLY ≤12 decimal digits — at scale 12 the cast is exact on
        // both engines, where scale 8 would cut at digit 8 and the ~1e-4
        // per-product chance of an exact .5000 tail makes Spark (HALF_UP on
        // the double's shortest decimal repr) and DuckDB (rounding the
        // binary value) disagree — measured as 1e-6 drift in q273 before
        // the widening. w·w below is a full-precision product (infinite
        // decimal tail), where a .5 boundary at the cut digit has measure
        // zero — the same class as every other raw-double cast in the repo.
        val w = full.join(broadcast(vdf), Seq("j"))
          .groupBy("i")
          .agg(sum((col("c") * col("x")).cast("decimal(38,12)"))
            .cast("double").as("w"))
        val nrm = w.agg(sqrt(sum((col("w") * col("w"))
          .cast("decimal(38,12)")).cast("double")).as("nrm"))
        w.crossJoin(broadcast(nrm))
          .select(col("i"), round(col("w") / col("nrm"), 6).as("x"))
          .collect().map(r => (r.getInt(0), r.getDouble(1)))
          .sortBy(_._1).toSeq
      }
    } finally { full.unpersist(blocking = false); () }
  }

  /** Isotropy audit — the diagnostic behind "All-but-the-Top": how much of
    * the total variance (trace) the dominant component carries. An
    * isotropic embedding space has explained_share ≈ 1/dim; a value far
    * above it says cosine similarities are dominated by one common
    * direction and dedup/ANN thresholds are miscalibrated until it is
    * removed. One row: (dim, trace, lambda1, explained_share), λ1 as the
    * Rayleigh quotient vᵀCv of the [[topComponent]] loading, computed as
    * w = C·v (the scale-12-exact power-step product) then Σ w·v — never a
    * three-factor product, whose 18 exact decimal digits would not survive
    * a double and would make the decimal casts engine-ambiguous.
    *
    * Bounded end to end: every input relation is dim²-sized.
    */
  def isotropyAudit(cov: DataFrame, loading: Seq[(Int, Double)]): DataFrame = {
    val spark = cov.sparkSession
    import spark.implicits._
    val dim = loading.length
    val full = mirrorFull(cov)
    val vdf = loading.toDF("j", "x")
    val w = full.join(broadcast(vdf), Seq("j"))
      .groupBy("i")
      .agg(sum((col("c") * col("x")).cast("decimal(38,12)"))
        .cast("double").as("w"))
    val lam = w.join(broadcast(loading.toDF("i", "x")), Seq("i"))
      .agg(sum((col("w") * col("x")).cast("decimal(38,12)"))
        .cast("double").as("l1"))
    val tr = cov.filter(col("i") === col("j"))
      .agg(sum(col("cov").cast("decimal(38,8)")).cast("double").as("trace"))
    lam.crossJoin(broadcast(tr))
      .select(lit(dim).as("dim"),
        round(col("trace"), 6).as("trace"),
        round(col("l1"), 6).as("lambda1"),
        round(col("l1") / col("trace"), 6).as("explained_share"))
  }

  /** Centered projection of each vector onto a loading: one row
    * (id, score) per input row, score = round6(Σ_i load_i·(x_i − m_i))
    * with the sum DECIMAL-cast per term. `loading`/`means` are bounded
    * driver tables (broadcast); the data side is one posexplode +
    * map-side-combined per-id aggregate.
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
      loading: Seq[(Int, Double)], means: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dim = loading.length
    val ldf = loading.toDF("pos", "x")
    df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .filter(size(col("v")) === dim)
      .select(col("id"), posexplode(col("v")))
      .join(broadcast(ldf), Seq("pos"))
      .join(broadcast(means), Seq("pos"))
      .groupBy("id")
      .agg(round(sum((col("x") * (col("col") - col("m")))
        .cast("decimal(38,12)")).cast("double"), 6).as("score"))
  }
}
