package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Deterministic model-selection leaderboard — the exactly-oracled twin of
  * [[Models.selectBestModel]] (q64). The RNG leaderboard can only be
  * metric-gated (sklearn/Spark RNGs differ, SURVEY §7.4-6); this variant
  * pins every source of nondeterminism so the RANKING itself is replayable
  * in external SQL:
  *  - split membership: md5(seed|id) threshold (the q109 contract), never
  *    a seeded RNG;
  *  - the model zoo: closed-form fits (univariate OLS/ridge per feature +
  *    bivariate OLS on the first two) on DECIMAL-summed normal equations —
  *    moment sums are exact decimal arithmetic, so they are
  *    order-independent under any partitioning/AQE re-plan;
  *  - coefficients: computed from the (decimal-exact) moments in a fixed
  *    IEEE-double expression order, rounded to 6 — both engines replay the
  *    identical doubles;
  *  - test RMSE: per-row squared error rounded to 8 and DECIMAL-summed —
  *    again order-independent — then round-6.
  *
  * Scale shape: two scans of the base table (train-moment aggregate, test
  * scoring), both with map-side partial aggregation; the moments row and
  * the model table are 1 and ≤(|features|·|lambdas|+1) rows — bounded
  * driver barriers; scoring explodes M model structs per test row (M tiny)
  * and aggregates per model. The final ranking windows over M rows. No
  * data-sized shuffle anywhere; at 100 TB this is two pushed-down column
  * scans.
  */
object DetLeaderboard {

  private def rnd6(v: Double): Double =
    if (v.isNaN || v.isInfinite) v
    else BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** One fitted model: name, intercept, per-feature slopes. */
  final case class Fit(name: String, b0: Double, bs: Seq[(String, Double)])

  /** Train/test split + closed-form zoo fit + test-RMSE leaderboard.
    *
    * @param id        deterministic row identity (hashed for the split)
    * @param lambdas   univariate ridge penalties; 0.0 = OLS. Model names:
    *                  `ols_<f>` for 0.0, `ridge_<f>_<lam>` otherwise.
    * Output: (model, b0, b1, b2, n_train, n_test, rmse, rank, is_winner)
    * ordered by rank — rank 1 is the selected model (lowest test RMSE,
    * name tie-break). b2 is null for univariate models.
    */
  def leaderboard(df: DataFrame, features: Seq[String], target: String,
      id: Column, seed: String = "42",
      lambdas: Seq[Double] = Seq(0.0, 0.5)): DataFrame = {
    require(features.nonEmpty, "leaderboard needs >= 1 feature")
    require(lambdas.forall(_ >= 0.0), "ridge penalties must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._

    val u = (TextAnalysis.md5Int32(concat_ws("|", lit(seed),
      id.cast("string"))) + 0.5) / 4294967296.0
    val cols = (target +: features).distinct
    // r14: spread an under-partitioned scan before the per-row md5 split
    // draw and the 3|F|-term DECIMAL moment aggregate (guide §2.5/§2.6 —
    // a one-split input serializes the whole pass; Spread.forHeavyStage
    // is a no-op on well-split inputs). Keyed by the caller's row id: a
    // deterministic hash spread, and every downstream aggregate here is
    // order-independent by the DECIMAL-sum contract.
    val base = graft.ops.Spread.forHeavyStage(df, id)
      .select(u.as("__u") +: cols.map(c => col(c).cast("double").as(c)): _*)
      .filter(cols.map(col(_).isNotNull).reduce(_ && _))
    val train = base.filter(col("__u") < 0.8)
    val test = base.filter(col("__u") >= 0.8)

    // exact decimal moment sums (the crossCorr contract: round-8 the
    // double term, sum as DECIMAL — order-independent, replayable)
    def dsum(c: Column): Column =
      sum(round(c, 8).cast("decimal(38,8)")).cast("double")
    val y = col(target)
    val crossNeeded = features.size >= 2
    val aggs: Seq[Column] =
      Seq(count(lit(1)).cast("double").as("nd"), dsum(y).as("sy")) ++
      features.flatMap { f =>
        Seq(dsum(col(f)).as(s"sx_$f"), dsum(col(f) * col(f)).as(s"sxx_$f"),
          dsum(col(f) * y).as(s"sxy_$f"))
      } ++
      (if (crossNeeded)
        Seq(dsum(col(features(0)) * col(features(1))).as("sx12")) else Nil)
    // 1-row bounded barrier (like selectFeaturesByCorrelation)
    val m = train.agg(aggs.head, aggs.tail: _*).head()
    val nd = m.getAs[Double]("nd")
    if (nd < 2.0)
      return Seq.empty[(String, Double, Double, Option[Double], Long, Long,
        Double, Int, Boolean)]
        .toDF("model", "b0", "b1", "b2", "n_train", "n_test", "rmse",
          "rank", "is_winner")
    val sy = m.getAs[Double]("sy")
    val my = sy / nd
    def mom(k: String): Double = m.getAs[Double](k)

    // univariate ridge: b1 = Sxy_c / (Sxx_c + lam*n); OLS is lam = 0
    val uni = for {
      f <- features
      lam <- lambdas
      sx = mom(s"sx_$f"); sxx = mom(s"sxx_$f"); sxy = mom(s"sxy_$f")
      cx = sxx - sx * sx / nd
      cy = sxy - sx * sy / nd
      den = cx + lam * nd
      if den > 0
    } yield {
      val b1 = rnd6(cy / den)
      val b0 = rnd6(my - b1 * (sx / nd))
      val name = if (lam == 0.0) s"ols_$f" else s"ridge_${f}_$lam"
      Fit(name, b0, Seq(f -> b1))
    }
    // bivariate OLS on the first two features: 2x2 normal equations,
    // closed form via the centered determinant
    val bi = if (crossNeeded) {
      val (f1, f2) = (features(0), features(1))
      val sx1 = mom(s"sx_$f1"); val sx2 = mom(s"sx_$f2")
      val cx1 = mom(s"sxx_$f1") - sx1 * sx1 / nd
      val cx2 = mom(s"sxx_$f2") - sx2 * sx2 / nd
      val cy1 = mom(s"sxy_$f1") - sx1 * sy / nd
      val cy2 = mom(s"sxy_$f2") - sx2 * sy / nd
      val c12 = mom("sx12") - sx1 * sx2 / nd
      val det = cx1 * cx2 - c12 * c12
      if (det != 0.0) {
        val b1 = rnd6((cy1 * cx2 - cy2 * c12) / det)
        val b2 = rnd6((cy2 * cx1 - cy1 * c12) / det)
        val b0 = rnd6(my - b1 * (sx1 / nd) - b2 * (sx2 / nd))
        Seq(Fit(s"ols_${f1}_$f2", b0, Seq(f1 -> b1, f2 -> b2)))
      } else Nil
    } else Nil
    val fits = uni ++ bi

    // test scoring: M rounded-se structs exploded per row, partial-agg
    // per model — one scan regardless of zoo size
    val terms = fits.map { fit =>
      val pred = fit.bs.foldLeft(lit(fit.b0).cast("double")) {
        case (acc, (f, b)) => acc + lit(b) * col(f)
      }
      struct(lit(fit.name).as("model"),
        round((y - pred) * (y - pred), 8).as("se"))
    }
    val scored = test
      .select(explode(array(terms: _*)).as("t"))
      .groupBy(col("t.model").as("model"))
      .agg(count(lit(1)).as("n_test"),
        sum(col("t.se").cast("decimal(38,8)")).cast("double").as("sse"))
      .withColumn("rmse",
        round(sqrt(col("sse") / col("n_test").cast("double")), 6))
    val meta = fits.map { f =>
      (f.name, f.b0, f.bs.head._2,
        if (f.bs.size > 1) Some(f.bs(1)._2) else None)
    }.toDF("model", "b0", "b1", "b2")
    // bounded global window: M = |zoo| rows (the leaderboard itself).
    // meta LEFT-joins scored (not inner): with an empty test split the
    // scored aggregate has no rows, and an inner join would return an
    // empty leaderboard even though models WERE fitted — the caller
    // couldn't tell "no data" from "no models". Unscored fits surface
    // with n_test=0 and null rmse, ranked after every scored model
    // (nulls last, name tie-break).
    val w = Window.orderBy(col("rmse").asc_nulls_last, col("model"))
    meta.join(broadcast(scored), Seq("model"), "left")
      .withColumn("n_test", coalesce(col("n_test"), lit(0L)))
      .withColumn("n_train", lit(nd.toLong))
      .withColumn("rank", row_number().over(w))
      .withColumn("is_winner", col("rank") === 1)
      .select("model", "b0", "b1", "b2", "n_train", "n_test", "rmse",
        "rank", "is_winner")
      .orderBy("rank")
  }
}
