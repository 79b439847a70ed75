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
