package graft

import org.apache.spark.sql.functions._

import graft.sim.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // 2-d cloud stretched along (1,1): the dominant component is the
  // analytic (1/√2, 1/√2) up to round-6
  private def cloud = Seq(
    (0L, Seq(1.0f, 0.9f)), (1L, Seq(2.0f, 2.1f)), (2L, Seq(3.0f, 3.0f)),
    (3L, Seq(-1.0f, -1.1f)), (4L, Seq(0.5f, 0.4f)), (5L, Seq(-2.0f, -1.9f)))
    .toDF("vec_id", "embedding")

  test("covarianceMatrix: matches the direct population formula; " +
      "malformed/null vectors are excluded, not zero-averaged") {
    val withBad = cloud.unionByName(
      Seq((6L, Seq(9.0f)), (7L, null.asInstanceOf[Seq[Float]]))
        .toDF("vec_id", "embedding"))
    val got = Pca.covarianceMatrix(withBad, "embedding", 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val xs = Seq(1.0, 2.0, 3.0, -1.0, 0.5, -2.0)
    val ys = Seq(0.9, 2.1, 3.0, -1.1, 0.4, -1.9)
    def cov(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.length
      val (ma, mb) = (a.sum / n, b.sum / n)
      a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum / n
    }
    assert(got.keySet == Set((0, 0), (0, 1), (1, 1)))
    assert(math.abs(got((0, 0)) - cov(xs, xs)) < 1e-5)
    assert(math.abs(got((0, 1)) - cov(xs, ys)) < 1e-5)
    assert(math.abs(got((1, 1)) - cov(ys, ys)) < 1e-5)
  }

  test("topComponent converges to the analytic dominant direction and the " +
      "Rayleigh quotient grows; projection is centered") {
    val covDf = Pca.covarianceMatrix(cloud, "embedding", 2)
    val pc = Pca.topComponent(covDf, dim = 2, iters = 20)
    val v = pc.sortBy(_._1).map(_._2)
    // analytic eigenvector of a near-symmetric 2x2 stretched along (1,1)
    assert(math.abs(math.abs(v(0)) - 0.7071) < 0.02 &&
      math.abs(math.abs(v(1)) - 0.7071) < 0.02 && v(0) * v(1) > 0,
      s"expected ~(±.707, ±.707) same-sign, got $v")
    // Rayleigh quotient at 20 iters >= at 1 iter (power iteration ascends)
    val c = covDf.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    def rayleigh(u: Seq[Double]): Double =
      (for { i <- 0 to 1; j <- 0 to 1 }
        yield u(i) * u(j) * c(if (i <= j) (i, j) else (j, i))).sum
    val v1 = Pca.topComponent(covDf, dim = 2, iters = 1).sortBy(_._1).map(_._2)
    assert(rayleigh(v) >= rayleigh(v1) - 1e-9)

    val means = Pca.positionMeans(cloud, "embedding", 2)
    val scores = Pca.project(cloud, "vec_id", "embedding", pc, means)
      .select("score").as[Double].collect()
    assert(scores.length == 6)
    assert(math.abs(scores.sum) < 1e-4, // centered projection sums to ~0
      s"projection not centered: sum=${scores.sum}")
  }

  test("covarianceMatrixFast agrees with the exact path within the round-6 " +
      "quantum on every entry (the scale-path contract)") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val exact = graft.sim.Pca.covarianceMatrix(emb, "embedding", 64)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val fast = graft.sim.Pca.covarianceMatrixFast(emb, "embedding", 64)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(fast.keySet == exact.keySet && exact.size == 64 * 65 / 2)
    // exact is round-6; fast is unrounded double accumulation — they may
    // differ by up to half the rounding quantum plus float noise
    val worst = exact.keys.map(k => math.abs(fast(k) - exact(k))).max
    assert(worst < 1e-6, s"fast path drifted from exact by $worst")
  }

  test("abttAudit: removing the dominant direction of a rank-~1 cloud " +
      "collapses the corrected norms; score matches project()") {
    val covDf = Pca.covarianceMatrix(cloud, "embedding", 2)
    val pc = Pca.topComponent(covDf, dim = 2, iters = 20)
    val means = Pca.positionMeans(cloud, "embedding", 2)
    val rows = Pca.abttAudit(cloud, "vec_id", "embedding", pc, means)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("score"), r.getAs[Double]("centered_norm"),
          r.getAs[Double]("corrected_norm"))).toMap
    assert(rows.size == 6)
    // rank-~1: the PC carries nearly all the centered ENERGY (per-point
    // ratios vary — near-centroid points are mostly off-axis noise)
    val centE = rows.values.map { case (_, cn, _) => cn * cn }.sum
    val corrE = rows.values.map { case (_, _, rn) => rn * rn }.sum
    assert(corrE < 0.05 * centE,
      s"corrected energy $corrE not << centered $centE")
    // the reported score is the same centered projection project() emits
    val proj = Pca.project(cloud, "vec_id", "embedding", pc, means)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score")).toMap
    rows.foreach { case (id, (s, _, _)) =>
      assert(math.abs(s - proj(id)) < 2e-6, s"id $id: $s vs ${proj(id)}") }
  }

  test("topTwoReport: deflation finds a near-orthogonal second component, " +
      "eigenvalues are ordered, and 2-d shares sum to ~1") {
    val covDf = Pca.covarianceMatrix(cloud, "embedding", 2)
    val m = Pca.collectCovariance(covDf, 2)
    val rows = Pca.topTwoReport(spark, m, iters = 20).orderBy("comp")
      .collect()
    val (l1, s1) = (rows(0).getAs[Double]("lambda"),
      rows(0).getAs[Double]("var_share"))
    val (l2, s2) = (rows(1).getAs[Double]("lambda"),
      rows(1).getAs[Double]("var_share"))
    assert(rows(0).isNullAt(rows(0).fieldIndex("dot_prev")))
    val dot = rows(1).getAs[Double]("dot_prev")
    assert(l1 >= l2 && l2 >= -1e-9, s"eigenvalues out of order: $l1, $l2")
    assert(math.abs(s1 + s2 - 1.0) < 1e-3, // 2-d: the two PCs are everything
      s"shares don't cover the 2-d trace: $s1 + $s2")
    assert(math.abs(dot) < 1e-3, s"components not orthogonal: dot=$dot")
  }

  // 4-d cloud with three planted variance scales (≈9 : 4 : 1) plus a tiny
  // 4th axis — deterministic, no RNG (sin/cos of the index)
  private def cloud3 = (0 until 40).map { i =>
    (i.toLong, Seq(
      (3.0 * math.sin(i * 1.7)).toFloat,
      (2.0 * math.cos(i * 2.3)).toFloat,
      (1.0 * math.sin(i * 3.1 + 1.0)).toFloat,
      (0.05 * math.cos(i * 0.9)).toFloat))
  }.toDF("vec_id", "embedding")

  test("topKComponents: k=2 reproduces the topTwoReport trajectory exactly; " +
      "k=3 report orders eigenvalues with near-orthogonal adjacent loadings") {
    val covDf = Pca.covarianceMatrix(cloud3, "embedding", 4)
    val m = Pca.collectCovariance(covDf, 4)
    // k=2 == topTwoReport (same deflation discipline, shared contract)
    val two = Pca.topTwoReport(spark, m, iters = 20).orderBy("comp").collect()
    val rep = Pca.topKReport(spark, m, kComps = 2, iters = 20)
      .orderBy("comp").collect()
    (0 to 1).foreach { i =>
      assert(rep(i).getAs[Double]("lambda") == two(i).getAs[Double]("lambda"))
      assert(rep(i).getAs[Double]("var_share") == two(i).getAs[Double]("var_share"))
    }
    assert(rep(1).getAs[Double]("dot_prev") == two(1).getAs[Double]("dot_prev"))
    // k=3: descending eigenvalues, shares bounded, adjacent dots ~0
    val three = Pca.topKReport(spark, m, kComps = 3, iters = 20)
      .orderBy("comp").collect()
    val ls = three.map(_.getAs[Double]("lambda"))
    assert(ls(0) >= ls(1) && ls(1) >= ls(2) && ls(2) > 0,
      s"eigenvalues out of order: ${ls.toSeq}")
    val shares = three.map(_.getAs[Double]("var_share"))
    assert(shares.forall(s => s > 0 && s <= 1) && shares.sum <= 1 + 1e-6)
    assert(three(0).isNullAt(three(0).fieldIndex("dot_prev")))
    (1 to 2).foreach { i =>
      val d = three(i).getAs[Double]("dot_prev")
      assert(math.abs(d) < 1e-3, s"comp ${i + 1} not orthogonal: dot=$d")
    }
  }

  test("whitenedProjections: each component's whitened coordinates have " +
      "~unit population variance, and white = round6(score/sqrt(round6(l)))") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val (covDf, means) = Pca.covarianceWithMeans(emb, "embedding", 64)
    val m = Pca.collectCovariance(covDf, 64)
    val comps = Pca.topKComponents(m, kComps = 2, iters = 12)
    val rows = Pca.whitenedProjections(emb, "vec_id", "embedding", comps,
      means).collect()
    val n = emb.filter(col("embedding").isNotNull &&
      size(col("embedding")) === 64).count()
    assert(rows.length == 2 * n)
    comps.zipWithIndex.foreach { case (pc, i) =>
      val ws = rows.filter(_.getAs[Int]("comp") == i + 1)
        .map(_.getAs[Double]("white"))
      // var(score) = v'Cv = the Rayleigh lambda by construction, so the
      // rescaled coordinates are unit-variance regardless of convergence
      val v = ws.map(w => w * w).sum / n
      assert(math.abs(v - 1.0) < 0.01,
        s"comp ${i + 1} whitened variance $v not ~1")
      // the rescale contract, spot-checked row for row
      val lam = rows.filter(_.getAs[Int]("comp") == i + 1)
      lam.foreach { r =>
        val expect = BigDecimal(r.getAs[Double]("score") /
          math.sqrt(BigDecimal(pc.lambda).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getAs[Double]("white") == expect)
      }
    }
  }

  test("abttAuditK: k=1 agrees with abttAudit within the round-6 quantum; " +
      "removing the top-2 subspace leaves no more energy than top-1") {
    val covDf = Pca.covarianceMatrix(cloud3, "embedding", 4)
    val m = Pca.collectCovariance(covDf, 4)
    val means = Pca.positionMeans(cloud3, "embedding", 4)
    val comps = Pca.topKComponents(m, kComps = 2, iters = 20)
    val k1 = Pca.abttAuditK(cloud3, "vec_id", "embedding", comps.take(1),
      means).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("centered_norm"), r.getAs[Double]("corrected_norm")))
      .toMap
    val ref = Pca.abttAudit(cloud3, "vec_id", "embedding",
      comps.head.loading, means).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("centered_norm"), r.getAs[Double]("corrected_norm")))
      .toMap
    assert(k1.keySet == ref.keySet && k1.nonEmpty)
    k1.foreach { case (id, (cn, rn)) =>
      // abttAudit's R term sums v^2 over DATA rows; abttAuditK's Gram is
      // the driver dec12 sum — identical values, different sum path, so
      // allow the rounding quantum
      assert(math.abs(cn - ref(id)._1) < 2e-6 &&
        math.abs(rn - ref(id)._2) < 2e-6, s"id $id: ($cn,$rn) vs ${ref(id)}")
    }
    val k2 = Pca.abttAuditK(cloud3, "vec_id", "embedding", comps, means)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("centered_norm"), r.getAs[Double]("corrected_norm")))
      .toMap
    // removing a LARGER (near-orthogonal) subspace cannot add energy
    k2.foreach { case (id, (cn, rn)) =>
      assert(rn <= k1(id)._2 + 2e-5,
        s"id $id: top-2 corrected $rn > top-1 ${k1(id)._2}")
      assert(rn <= cn + 1e-9)
    }
    // and the planted 2-strong-axes cloud loses MOST energy to top-2
    val centE = k2.values.map { case (cn, _) => cn * cn }.sum
    val corrE = k2.values.map { case (_, rn) => rn * rn }.sum
    assert(corrE < 0.35 * centE, s"top-2 removal left $corrE of $centE")
  }

  test("isotropyAudit: a rank-~1 cloud puts nearly all variance on the " +
      "dominant component; lambda1 never exceeds the trace") {
    val covDf = Pca.covarianceMatrix(cloud, "embedding", 2)
    val r = Pca.isotropyAudit(covDf, Pca.topComponent(covDf, 2, 20))
      .collect().head
    val (tr, l1, share) = (r.getAs[Double]("trace"),
      r.getAs[Double]("lambda1"), r.getAs[Double]("explained_share"))
    assert(r.getAs[Int]("dim") == 2)
    assert(l1 <= tr + 1e-9 && l1 > 0)
    assert(share > 0.99, s"rank-1-ish cloud should be ~1, got $share")
  }
}
