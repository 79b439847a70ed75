package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sim.Similarity.asDouble

/** Principal-component analysis for embedding columns, built for the
  * cross-engine float contract: every data-sized reduction is an
  * order-independent EXACT sum (scaled-long integers for the hot
  * covariance pass, DECIMAL casts elsewhere) and every derived statistic
  * is rounded to 6 decimals before reuse — the same discipline as
  * [[Similarity.lloydCentroids]], which is what lets a DuckDB oracle
  * replay the full covariance → power-iteration → projection trajectory
  * CTE for CTE (q272/q273).
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
  * iteration runs ON THE DRIVER over that bounded matrix, with decimal
  * accumulation that mirrors the engine's cast semantics bit for bit
  * (see [[dec12]]) — launching per-step Spark jobs over a dim²-row
  * relation was measured as pure scheduler overhead.
  */
object Pca {

  /** Shared (id, pos, col) prelude of the projection-family operators:
    * narrow (id, vector) projection → dim-arity filter →
    * under-partitioned-scan guard ([[graft.ops.Spread.forAmplification]];
    * the posexplode amplifies dim×, so a compact single-file embeddings
    * scan would otherwise serialize the whole pass on one core) →
    * posexplode. */
  private def explodedById(df: DataFrame, idCol: String, vecCol: String,
      dim: Int): DataFrame =
    graft.ops.Spread.forHeavyAmplification(
        df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
          .filter(size(col("v")) === dim), col("id"))
      .select(col("id"), posexplode(col("v")))

  /** The ONE data pass everything else derives from: flattened
    * upper-triangle products (enumeration i asc, j in i..dim-1) with the
    * raw vector appended, so one positional aggregate yields both the
    * Gram sums (pos < dim(dim+1)/2) and the per-position sums + n. */
  private def positionalSums(df: DataFrame, vecCol: String,
      dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    // the products explode is ~dim²/2 per row — the heaviest amplification
    // in the repo; spread an under-partitioned scan first. KEYLESS
    // round-robin, not hash-by-vector: this path has no row id, and
    // hashing the vector itself sends all duplicates of a repeated vector
    // (zero/padding embeddings are realistic) to ONE partition —
    // re-serializing exactly the explode the guard exists to parallelize.
    // Round-robin is safe here because every downstream is a positional
    // sum/count/max — partition-layout independent by construction.
    val v = graft.ops.Spread.forHeavyAmplification(
      df.select(asDouble(col(vecCol)).as("v"))
        .filter(size(col("v")) === dim))
    val prods = flatten(transform(col("v"), (x: Column, i: Column) =>
      transform(slice(col("v"), i + 1, lit(dim) - i), (y: Column) => x * y)))
    // exact-sum contract via SCALED LONGS, not DECIMAL casts: round each
    // value to 8 decimals as round(x·1e8) and sum the resulting integers —
    // value-wise this is the q194 `CAST(y*1e6 AS HUGEINT)` pattern, and it
    // keeps the 2·10⁹-element hot aggregate in whole-stage-codegen long
    // arithmetic instead of allocating a BigDecimal per element (measured
    // 78 s → 44 s on the 1M×64 ScaleSmoke — the residual cost is the
    // explode row volume itself, which is why the non-oracled
    // [[covarianceMatrixFast]] at 1.6 s is the 100 TB path). Range: O(1)
    // embedding products scale to ~1e8 per element; a LONG holds 9.2e18,
    // so overflow needs ~10¹⁰ rows per position — far beyond a single
    // aggregation's working set even at 100 TB (and the 100 TB path is
    // [[covarianceMatrixFast]] anyway).
    // overflow guard (plan-embedded, holtSmooth pattern): the long sum
    // wraps silently iff n·max|x|·1e8 can exceed Long.MaxValue≈9.22e18,
    // i.e. n·max|x| > ~9.2e10. max|x| rides in the same aggregate (no
    // extra pass); out-of-contract input raises instead of returning a
    // silently wrong covariance, in-bounds sums are untouched.
    v.select(posexplode(concat(prods, col("v"))))
      .groupBy("pos")
      .agg(sum(round(col("col") * 1e8, 0).cast("long")).as("__sl"),
        count(lit(1)).as("n"), max(abs(col("col"))).as("__mx"))
      .select(col("pos"),
        when(col("n").cast("double") * col("__mx") > 9.0e10,
          raise_error(lit("covarianceMatrix: input magnitude breaks the " +
            "scaled-long exact-sum contract (n * max|element-or-product| " +
            "> 9e10 would overflow the 1e8-scaled long sum) — normalize " +
            "the embedding column or use covarianceMatrixFast"))
            .cast("double"))
          .otherwise(col("__sl") / 1e8).as("s"),
        col("n"))
  }

  private def covFromSums(agg: DataFrame, dim: Int): DataFrame = {
    val spark = agg.sparkSession
    import spark.implicits._
    val pairCount = dim * (dim + 1) / 2
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

  private def meansFromSums(agg: DataFrame, dim: Int): DataFrame = {
    val pairCount = dim * (dim + 1) / 2
    agg.filter(col("pos") >= pairCount)
      .select((col("pos") - pairCount).cast("int").as("pos"),
        round(col("s") / col("n"), 6).as("m"))
  }

  /** Population covariance matrix of a `dim`-wide vector column: one row
    * per 0-based (i ≤ j) with `cov` rounded to 6. Rows whose vector is
    * NULL or of the wrong width are excluded (same contract as the dedup
    * families' non-null-id rule: a malformed vector is upstream's bug, not
    * a zero to average in).
    *
    * cov_ij = (Sxy_ij − Sx_i·Sx_j / n) / n with Sxy/Sx as scaled-long
    * exact sums (round(x·1e8) integers) — the one-pass textbook form; the
    * cancellation risk it carries is bounded here because embedding
    * coordinates are O(1)-magnitude and the sums are exact until the
    * final double ops.
    *
    * '''Input-magnitude contract''': elements must be O(1)-magnitude
    * (normalized-embedding scale). The scaled-long sum is exact while
    * n · max|element-or-product| ≤ ~9·10¹⁰ — ~10¹⁰ rows for unit-scale
    * vectors; a runtime guard in the aggregate raises past that bound
    * instead of wrapping silently. Un-normalized feature columns with
    * large magnitudes belong on [[covarianceMatrixFast]] (plain double
    * accumulation, no scaling).
    */
  def covarianceMatrix(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    covFromSums(positionalSums(df, vecCol, dim), dim)

  /** The SCALE path (the A7 exact-percentile / approx-quantile split
    * applied to covariance): per-partition primitive double accumulators —
    * one (dim(dim+1)/2 + dim + 1)-slot array per partition, upper-triangle
    * products + position sums + count in a single tight loop — then one
    * treeReduce. No explode, no decimal objects, no shuffle beyond
    * #partitions × ~dim²/2 doubles; measured 78.5 s → 1.6 s on the 1M×64
    * ScaleSmoke vs the exact path. Double accumulation is
    * partition-order-dependent and the output is unrounded, so this
    * variant is spec-gated against [[covarianceMatrix]] (agreement within
    * the round-6 quantum) rather than DuckDB-oracled — the exact path
    * stays the oracle surface, this is what you run at 100 TB.
    */
  def covarianceMatrixFast(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val spark = df.sparkSession
    import spark.implicits._
    val pairCount = dim * (dim + 1) / 2
    // ~dim²/2 FLOPs per row: spread an under-partitioned scan so the
    // accumulator pass parallelizes (and yields one partial per core).
    // Keyless round-robin — no row id here, and hash-by-vector would pile
    // duplicate vectors onto one partition (see positionalSums)
    val vecs = graft.ops.Spread.forHeavyAmplification(
      df.select(asDouble(col(vecCol)).as("v"))
        .filter(size(col("v")) === dim)).as[Seq[Double]]
    val partials = vecs.rdd.mapPartitions { it =>
      val acc = new Array[Double](pairCount + dim + 1)
      it.foreach { v =>
        val a = v.toArray
        var k = 0
        var i = 0
        while (i < dim) {
          val ai = a(i)
          acc(pairCount + i) += ai
          var j = i
          while (j < dim) { acc(k) += ai * a(j); k += 1; j += 1 }
          i += 1
        }
        acc(pairCount + dim) += 1.0
      }
      Iterator.single(acc)
    }
    val tot = partials.treeReduce { (x, y) =>
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    val n = tot(pairCount + dim)
    require(n > 0, "covarianceMatrixFast: empty input")
    val rows = for { i <- 0 until dim; j <- i until dim } yield {
      val k = i * dim - i * (i - 1) / 2 + (j - i)
      (i, j, (tot(k) - tot(pairCount + i) * tot(pairCount + j) / n) / n)
    }
    rows.toDF("i", "j", "cov")
  }

  /** Covariance + centering means off ONE materialized data pass — what a
    * full PCA pipeline (q273) should call instead of scanning the corpus
    * separately per statistic. The positional aggregate (≤dim(dim+1)/2+dim
    * rows) is materialized via localCheckpoint so both derivations read
    * it, not the data. */
  def covarianceWithMeans(df: DataFrame, vecCol: String,
      dim: Int): (DataFrame, DataFrame) = {
    val agg = positionalSums(df, vecCol, dim).localCheckpoint(true)
    (covFromSums(agg, dim), meansFromSums(agg, dim))
  }

  /** Per-position round-6 means of the vector column — the centering
    * vector [[project]] subtracts. Same exclusion rule as
    * [[covarianceMatrix]]; value-identical to [[covarianceWithMeans]]._2
    * (round6 of the DECIMAL sum / n). */
  def positionMeans(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    // keyless round-robin: id-less path, duplicate vectors must not
    // collapse onto one partition (see positionalSums)
    graft.ops.Spread.forHeavyAmplification(
        df.select(asDouble(col(vecCol)).as("v"))
          .filter(size(col("v")) === dim))
      .select(posexplode(col("v")))
      .groupBy("pos")
      .agg(round(sum(round(col("col") * 1e8, 0).cast("long")) / 1e8
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
    * it is collected ONCE and the steps run on the driver with
    * engine-identical decimal accumulation ([[dec12]]) — the
    * [[Similarity.lloydCentroids]] bounded-state shape, minus the
    * per-step job overhead. Returns (0-based position → loading),
    * ‖·‖ = 1 up to round-6.
    */
  /** Collect the bounded upper-triangle covariance into a full symmetric
    * driver matrix (dim² doubles) — the ONE data-derived barrier the
    * driver-side eigen-iteration needs. */
  private def collectFull(cov: DataFrame, dim: Int): Array[Array[Double]] = {
    val m = Array.ofDim[Double](dim, dim)
    cov.select(col("i").cast("int"), col("j").cast("int"),
      col("cov").cast("double")).collect() // bounded: dim(dim+1)/2 rows
      .foreach { r =>
        val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
        m(i)(j) = c; m(j)(i) = c
      }
    m
  }

  /** Spark's `cast(double AS DECIMAL(38,s))` on the driver: BigDecimal of
    * the double's SHORTEST decimal representation (valueOf), HALF_UP at
    * the target scale — bit-for-bit what the Cast expression does, so
    * driver-side sums replay identically to the engine-side decimal sums
    * they replace. Scale 12, not 8: a product of two round-6 values has
    * exactly ≤12 decimal digits, so the scale-12 cast is EXACT on Spark
    * and DuckDB alike, where scale 8 cuts inside the exact digits and a
    * ~1e-4-per-product .5000 tail rounds differently across engines
    * (measured as 1e-6 drift in q273 before the widening). Full-precision
    * double products (w·w) are safe too: their decimal tails pass digit
    * 12 with binary noise only at digit ~17, so both engines see the same
    * 12-digit value.
    */
  private def dec12(d: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(d).setScale(12, java.math.RoundingMode.HALF_UP)

  /** Spark's `round(double, 6)` on the driver (same shortest-repr +
    * HALF_UP semantics as [[dec12]]; DuckDB's ROUND agrees away from
    * binary-noise boundaries, the repo-wide round-6 contract). */
  private[sim] def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** [[collectFull]] for callers composing several driver-side steps
    * (topComponent + isotropyAudit) off one collect — see q274. */
  def collectCovariance(cov: DataFrame, dim: Int): Array[Array[Double]] =
    collectFull(cov, dim)

  def topComponent(cov: DataFrame, dim: Int, iters: Int): Seq[(Int, Double)] =
    topComponent(collectFull(cov, dim), iters)

  def topComponent(m: Array[Array[Double]], iters: Int): Seq[(Int, Double)] = {
    val dim = m.length
    // the iteration itself runs ON THE DRIVER: the matrix is dim² doubles
    // and a matvec is dim² multiply-adds — launching 2 Spark jobs per step
    // was pure scheduler overhead (measured: 13.6 s → ~4 s for q273 at
    // sf0.1, all of it fixed per-job cost, none of it data). Decimal
    // accumulation mirrors the engine cast exactly (see [[dec12]]), so the
    // q273 oracle trajectory is unchanged.
    val v0 = round6(1.0 / math.sqrt(dim.toDouble))
    var v = Array.fill(dim)(v0)
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(dim) { i =>
        var acc = java.math.BigDecimal.ZERO
        var j = 0
        while (j < dim) { acc = acc.add(dec12(m(i)(j) * v(j))); j += 1 }
        acc.doubleValue() // = cast(sum(DECIMAL(38,12)) AS DOUBLE)
      }
      var nacc = java.math.BigDecimal.ZERO
      w.foreach(x => nacc = nacc.add(dec12(x * x)))
      val nrm = math.sqrt(nacc.doubleValue())
      v = w.map(x => round6(x / nrm))
      it += 1
    }
    v.zipWithIndex.map { case (x, i) => (i, x) }.toSeq
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
  /** Unrounded Rayleigh quotient vᵀMv under the decimal-step contract
    * (w = M·v with dec12 sums, then Σ dec12(w·v)). */
  private def rayleigh(m: Array[Array[Double]], v: Array[Double]): Double = {
    val dim = m.length
    var lacc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < dim) {
      var wacc = java.math.BigDecimal.ZERO
      var j = 0
      while (j < dim) { wacc = wacc.add(dec12(m(i)(j) * v(j))); j += 1 }
      lacc = lacc.add(dec12(wacc.doubleValue() * v(i)))
      i += 1
    }
    lacc.doubleValue()
  }

  /** Scale-8 exact sum of the round-6 diagonal. */
  private def traceOf(m: Array[Array[Double]]): Double = {
    var tacc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < m.length) {
      tacc = tacc.add(java.math.BigDecimal.valueOf(m(i)(i))
        .setScale(8, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    tacc.doubleValue()
  }

  /** Hotelling deflation under the round-6 contract:
    * m'_ij = round6(m_ij − λ·v_i·v_j) with λ the ROUND-6 Rayleigh of the
    * first component — so the deflated matrix is itself replayable and the
    * next [[topComponent]] run finds the second eigenvector. */
  private def deflated(m: Array[Array[Double]], v: Array[Double],
      lam: Double): Array[Array[Double]] = {
    val dim = m.length
    Array.tabulate(dim, dim)((i, j) => round6(m(i)(j) - lam * v(i) * v(j)))
  }

  /** Top-2 principal components via power iteration + one Hotelling
    * deflation: per component, its Rayleigh eigenvalue against the
    * ORIGINAL covariance, its variance share, and (for the second) the
    * round-6 residual overlap with the first — the convergence/orthogonality
    * diagnostic. Everything driver-side on the collected matrix; the q277
    * oracle replays both 12-step runs, the deflation and the report. */
  def topTwoReport(spark: org.apache.spark.sql.SparkSession,
      m: Array[Array[Double]], iters: Int): DataFrame = {
    import spark.implicits._
    val dim = m.length
    def toArr(l: Seq[(Int, Double)]): Array[Double] = {
      val a = Array.ofDim[Double](dim); l.foreach { case (i, x) => a(i) = x }; a
    }
    val v1 = toArr(topComponent(m, iters))
    val l1 = rayleigh(m, v1)
    val m2 = deflated(m, v1, round6(l1))
    val v2 = toArr(topComponent(m2, iters))
    val l2 = rayleigh(m, v2) // eigenvalue against the ORIGINAL matrix
    val tr = traceOf(m)
    var dacc = java.math.BigDecimal.ZERO
    (0 until dim).foreach(i => dacc = dacc.add(dec12(v1(i) * v2(i))))
    val dot = round6(dacc.doubleValue())
    Seq(
      (1, round6(l1), round6(l1 / tr), Option.empty[Double]),
      (2, round6(l2), round6(l2 / tr), Some(dot)))
      .toDF("comp", "lambda", "var_share", "dot_prev")
  }

  /** One extracted principal component: the unit round-6 loading, its
    * Rayleigh eigenvalue against the ORIGINAL covariance (the reported /
    * whitening λ) and against the matrix it was extracted FROM (the
    * deflation λ — what the next Hotelling round subtracts). Both
    * unrounded; consumers round per the report contract. */
  final case class PcaComponent(loading: Seq[(Int, Double)],
      lambda: Double, lambdaDeflate: Double)

  /** Top-k principal components via the [[topTwoReport]] discipline
    * generalized to a deflation LOOP: component c is the 12-step (or
    * `iters`-step) power iterate of the (c−1)-times-deflated matrix,
    * m_c = round6(m_{c−1} − round6(λ^defl_{c−1})·v v ᵀ) — every
    * deflation uses the component's Rayleigh against the matrix it was
    * extracted from, so the trajectory is replayable round for round
    * (the q281 oracle unrolls k·iters power steps and k−1 deflations).
    * For k = 2 this IS topTwoReport's trajectory. Driver-side on the
    * bounded dim² matrix, like [[topComponent]].
    */
  def topKComponents(m: Array[Array[Double]], kComps: Int,
      iters: Int): Seq[PcaComponent] = {
    require(kComps >= 1 && kComps <= m.length,
      s"topKComponents needs 1 <= k <= dim (got $kComps, dim ${m.length})")
    val dim = m.length
    def toArr(l: Seq[(Int, Double)]): Array[Double] = {
      val a = Array.ofDim[Double](dim); l.foreach { case (i, x) => a(i) = x }; a
    }
    val out = Seq.newBuilder[PcaComponent]
    var cur = m
    var c = 0
    while (c < kComps) {
      val l = topComponent(cur, iters)
      val v = toArr(l)
      val lamD = rayleigh(cur, v)
      out += PcaComponent(l, rayleigh(m, v), lamD)
      c += 1
      if (c < kComps) cur = deflated(cur, v, round6(lamD))
    }
    out.result()
  }

  /** [[topTwoReport]] generalized to k components: per component its
    * round-6 eigenvalue against the ORIGINAL covariance, variance share,
    * and round-6 dot with the PREVIOUS component (orthogonality
    * diagnostic; null for the first). (comp, lambda, var_share,
    * dot_prev), comp 1-based. */
  def topKReport(spark: org.apache.spark.sql.SparkSession,
      m: Array[Array[Double]], kComps: Int, iters: Int): DataFrame = {
    import spark.implicits._
    val dim = m.length
    val comps = topKComponents(m, kComps, iters)
    val tr = traceOf(m)
    def toArr(l: Seq[(Int, Double)]): Array[Double] = {
      val a = Array.ofDim[Double](dim); l.foreach { case (i, x) => a(i) = x }; a
    }
    val rows = comps.zipWithIndex.map { case (pc, i) =>
      val dot = if (i == 0) Option.empty[Double] else {
        val (a, b) = (toArr(comps(i - 1).loading), toArr(pc.loading))
        var acc = java.math.BigDecimal.ZERO
        (0 until dim).foreach(j => acc = acc.add(dec12(a(j) * b(j))))
        Some(round6(acc.doubleValue()))
      }
      (i + 1, round6(pc.lambda), round6(pc.lambda / tr), dot)
    }
    rows.toDF("comp", "lambda", "var_share", "dot_prev")
  }

  /** PCA WHITENING of the top-k subspace — the transform that completes
    * All-but-the-Top: each vector's centered projection onto component c,
    * rescaled to unit variance, white = round6(score / √round6(λ_c))
    * with λ_c the component's eigenvalue against the ORIGINAL covariance
    * (score itself round-6, per [[project]]'s contract). Output one row
    * per (id, comp): (id, comp, score, white).
    *
    * Scale shape: the k loadings flatten to ONE bounded (comp, pos, x)
    * broadcast table, so all k projections ride a single posexplode +
    * map-side-combined (id, comp) aggregate — one data pass regardless
    * of k; λs join back per comp, broadcast.
    */
  def whitenedProjections(df: DataFrame, idCol: String, vecCol: String,
      comps: Seq[PcaComponent], means: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(comps.nonEmpty, "whitenedProjections needs >= 1 component")
    val dim = comps.head.loading.size
    // loadings must be DENSE over all dim positions: the broadcast (comp,
    // pos, x) table inner-joins each position, so a sparse/short loading
    // would silently undercount scores instead of erroring
    require(comps.forall(_.loading.size == dim),
      s"whitenedProjections: every loading must be dense over $dim " +
        s"positions (got sizes ${comps.map(_.loading.size).distinct.mkString(",")})")
    // whitening divides by sqrt(round6(lambda)) — a zero/negative round-6
    // eigenvalue (degenerate covariance direction) would yield NaN/null
    // 'white' values silently; callers must filter degenerate components
    require(comps.forall(c => round6(c.lambda) > 0),
      "whitenedProjections: non-positive round-6 eigenvalue — filter " +
        "degenerate components before whitening")
    val ldf = comps.zipWithIndex
      .flatMap { case (pc, i) => pc.loading.map { case (p, x) => (i + 1, p, x) } }
      .toDF("comp", "pos", "x")
    val lams = comps.zipWithIndex
      .map { case (pc, i) => (i + 1, round6(pc.lambda)) }
      .toDF("comp", "__lam")
    explodedById(df, idCol, vecCol, dim)
      .join(broadcast(ldf), Seq("pos"))
      .join(broadcast(means), Seq("pos"))
      .groupBy("id", "comp")
      .agg(round(sum((col("x") * (col("col") - col("m")))
        .cast("decimal(38,12)")).cast("double"), 6).as("score"))
      .join(broadcast(lams), Seq("comp"))
      .select(col("id"), col("comp"), col("score"),
        round(col("score") / sqrt(col("__lam")), 6).as("white"))
  }

  /** [[abttAudit]] generalized to a top-K subspace: remove ALL k dominant
    * directions from each centered embedding and report ‖centered‖ vs
    * ‖corrected‖. With P_c = v_c·cent (per-id DECIMAL-summed), Q = Σcent²
    * and the bounded k×k loading Gram R_cd = Σ v_c·v_d (driver-computed
    * under the same dec12 discipline as the deflation dots — the
    * loadings are NOT exactly orthonormal after round-6, so the cross
    * terms matter):
    *
    *   ‖corr‖² = Q − 2·ΣP_c² + Σ_{c≤d} coeff·P_c·P_d·R_cd   (coeff 1/2)
    *
    * — one data pass: ONE posexplode, the flattened (comp, pos, x)
    * broadcast, ONE per-id aggregate carrying Q and the k projections;
    * all k² cross terms are scalar arithmetic on the aggregate row. Term
    * order is pinned left-to-right per group (the q285 oracle replays the
    * identical parenthesization — full-precision double products are the
    * safe class, but ASSOCIATION must still match bit for bit). */
  def abttAuditK(df: DataFrame, idCol: String, vecCol: String,
      comps: Seq[PcaComponent], means: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(comps.nonEmpty, "abttAuditK needs >= 1 component")
    val k = comps.size
    val dim = comps.head.loading.size
    // same density contract as whitenedProjections: the Q column is gated
    // on comp=1 and the ldf join is inner, so a sparse loading undercounts
    // norms rather than erroring — reject it at the API boundary
    require(comps.forall(_.loading.size == dim),
      s"abttAuditK: every loading must be dense over $dim positions " +
        s"(got sizes ${comps.map(_.loading.size).distinct.mkString(",")})")
    def toArr(l: Seq[(Int, Double)]): Array[Double] = {
      val a = Array.ofDim[Double](dim); l.foreach { case (i, x) => a(i) = x }; a
    }
    val vs = comps.map(c => toArr(c.loading))
    def gram(a: Array[Double], b: Array[Double]): Double = {
      var acc = java.math.BigDecimal.ZERO
      (0 until dim).foreach(i => acc = acc.add(dec12(a(i) * b(i))))
      acc.doubleValue()
    }
    val ldf = comps.zipWithIndex
      .flatMap { case (pc, i) => pc.loading.map { case (p, x) => (i + 1, p, x) } }
      .toDF("comp", "pos", "x")
    def s12(c: Column): Column = sum(c.cast("decimal(38,12)")).cast("double")
    val pExprs = (1 to k).map(c =>
      s12(when(col("comp") === c, col("x") * col("cent"))).as(s"__p$c"))
    val aggd = explodedById(df, idCol, vecCol, dim)
      .join(broadcast(ldf), Seq("pos"))
      .join(broadcast(means), Seq("pos"))
      .withColumn("cent", col("col") - col("m"))
      .groupBy("id")
      // Q gated on comp=1: the ldf join fans each position out k times
      .agg(s12(when(col("comp") === 1, col("cent") * col("cent"))).as("__q"),
        pExprs: _*)
    val sumP2 = (1 to k).map(c => col(s"__p$c") * col(s"__p$c"))
      .reduce(_ + _)
    val cross = (for { c <- 1 to k; d <- c to k } yield {
      val r = gram(vs(c - 1), vs(d - 1))
      if (c == d) col(s"__p$c") * col(s"__p$c") * lit(r)
      else lit(2.0) * col(s"__p$c") * col(s"__p$d") * lit(r)
    }).reduce(_ + _)
    aggd.select(col("id"),
      round(sqrt(col("__q")), 6).as("centered_norm"),
      round(sqrt(greatest(lit(0.0),
        col("__q") - lit(2.0) * sumP2 + cross)), 6).as("corrected_norm"))
  }

  def isotropyAudit(cov: DataFrame, loading: Seq[(Int, Double)]): DataFrame =
    isotropyAudit(cov.sparkSession, collectFull(cov, loading.length), loading)

  def isotropyAudit(spark: org.apache.spark.sql.SparkSession,
      m: Array[Array[Double]], loading: Seq[(Int, Double)]): DataFrame = {
    import spark.implicits._
    val dim = loading.length
    val v = Array.ofDim[Double](dim)
    loading.foreach { case (i, x) => v(i) = x }
    // λ1 = vᵀ(Cv) under the same decimal discipline as topComponent;
    // trace = scale-8 exact sum of the round-6 diagonal
    val (l1, trace) = (rayleigh(m, v), traceOf(m))
    Seq((dim, round6(trace), round6(l1), round6(l1 / trace)))
      .toDF("dim", "trace", "lambda1", "explained_share")
  }

  /** All-but-the-Top correction audit (Mu & Viswanath 2018): per vector,
    * remove the dominant direction from the centered embedding —
    * c_i = (x_i − m_i) − score·v_i with score the centered projection —
    * and report ‖centered‖ vs ‖corrected‖ (both round-6, norms via
    * DECIMAL(38,12)-summed squares, the safe full-precision-product
    * class). corrected_norm ≪ centered_norm is the signature of a
    * common-direction-dominated space; together with [[isotropyAudit]]
    * this is the before/after pair for the correction.
    *
    * Scale shape: one posexplode + two bounded broadcast joins (means,
    * loading) + ONE map-side-combined per-id aggregate. The corrected norm
    * is computed ALGEBRAICALLY from three per-id sums — with P = Σ v·cent
    * (the unrounded score), Q = Σ cent², R = Σ v²:
    * ‖corr‖² = Q − 2P² + P²R — so no per-id rejoin of the score against
    * the exploded rows is needed; the contract IS this formula, replayed
    * verbatim by the oracle (clamped at 0 against float cancellation).
    */
  def abttAudit(df: DataFrame, idCol: String, vecCol: String,
      loading: Seq[(Int, Double)], means: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dim = loading.length
    val ldf = loading.toDF("pos", "x")
    def s12(c: Column): Column = sum(c.cast("decimal(38,12)")).cast("double")
    explodedById(df, idCol, vecCol, dim)
      .join(broadcast(ldf), Seq("pos"))
      .join(broadcast(means), Seq("pos"))
      .withColumn("cent", col("col") - col("m"))
      .groupBy("id")
      .agg(
        s12(col("x") * col("cent")).as("__p"),
        s12(col("cent") * col("cent")).as("__q"),
        s12(col("x") * col("x")).as("__r"))
      .select(col("id"),
        round(col("__p"), 6).as("score"),
        round(sqrt(col("__q")), 6).as("centered_norm"),
        round(sqrt(greatest(lit(0.0),
          col("__q") - lit(2.0) * col("__p") * col("__p")
            + col("__p") * col("__p") * col("__r"))), 6).as("corrected_norm"))
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
    explodedById(df, idCol, vecCol, dim)
      .join(broadcast(ldf), Seq("pos"))
      .join(broadcast(means), Seq("pos"))
      .groupBy("id")
      .agg(round(sum((col("x") * (col("col") - col("m")))
        .cast("decimal(38,12)")).cast("double"), 6).as("score"))
  }
}
