package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ml.Models
import graft.streaming.EventStreams

/** ML (M1-M8) and streaming operators on the driver surface. */
object MlStreamQueries extends QueryGroup {

  /** M1: correlation-threshold feature selection — the kept/score table is
    * fully SQL-expressible. */
  val q62FeatureCorr = QueryDef(
    "q62_feature_corr",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val target = "l_extendedprice"
      val candidates = Seq("l_quantity", "l_discount", "l_tax", "l_partkey", "l_suppkey")
      val aggs = candidates.map(c => round(corr(col(c), col(target)), 6).as(c))
      val row = li.agg(aggs.head, aggs.tail: _*).head()
      candidates.map(c => (c, row.getAs[Double](c)))
        .toDF("feature", "corr_with_target")
        .withColumn("kept", (abs(col("corr_with_target")) >= 0.10).cast("int"))
        .orderBy("feature")
    },
    Some {
      val cs = Seq("l_quantity", "l_discount", "l_tax", "l_partkey", "l_suppkey")
      val selects = cs.map(c =>
        s"SELECT '$c' AS feature, ROUND(corr($c, l_extendedprice), 6) AS corr_with_target FROM lineitem")
        .mkString(" UNION ALL ")
      s"""SELECT feature, corr_with_target,
        CAST(abs(corr_with_target) >= 0.10 AS INT) AS kept
      FROM ($selects) ORDER BY feature"""
    })

  /** Batch twin of the streaming sessionization (same gap semantics as the
    * flatMapGroupsWithState path tested in MlStreamingSpec). */
  val q63Sessionize = QueryDef(
    "q63_sessionize",
    (s, d) => EventStreams.sessionizeBatch(Tables.events(s, d), gapMs = 10 * 60 * 1000L)
      .select(
        col("user_id"),
        unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "start_us"),
    Some("""WITH g AS (SELECT user_id, event_id, ts, value,
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      s AS (SELECT *, CAST((prev_ts IS NULL OR
        epoch_us(ts) - epoch_us(prev_ts) > 600000000) AS INT) AS new_s FROM g),
      c AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING) AS sid FROM s)
      SELECT user_id, MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us,
        CAST(COUNT(*) AS INT) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
      FROM c GROUP BY user_id, sid ORDER BY user_id, start_us"""))

  /** M2-M8 smoke on the driver surface: CV-select over the linear families,
    * full-data refit of the winner (M8), sample-prediction report — the whole
    * selectBestModel path. Rows-only (model fitting is not SQL). Kept small
    * (2000 rows, 2 folds, linear zoo) for verify runtime. */
  val q64MlLeaderboard = QueryDef(
    "q64_ml_leaderboard",
    (s, d) => {
      val df = Tables.lineitem(s, d).limit(2000)
        .select(
          col("l_quantity").as("x1"), col("l_discount").as("x2"),
          col("l_tax").as("x3"), col("l_extendedprice").as("y"))
      val feats = Models.selectFeaturesByCorrelation(df, "y", 0.01) match {
        case Nil => Seq("x1", "x2", "x3")
        case f => f
      }
      val (winner, all) = Models.selectBestModel(df, feats, "y",
        numFolds = 2, nIter = 2, parallelism = 2,
        zoo = Models.modelZoo("y").take(3)) // linear, ridge, lasso — fast
      val sampleRows = Models.samplePredictions(winner.model, df, "y", n = 3).count()
      import s.implicits._
      all.map { r =>
        (r.name, r.testRmse > 0.0, r.name == winner.name, sampleRows)
      }.toDF("model", "rmse_positive", "is_winner", "sample_rows")
        .orderBy("model")
    },
    None)

  /** Deterministic model-selection leaderboard (DetLeaderboard.leaderboard)
    * — the exactly-oracled twin of q64: md5-threshold split (q109
    * contract), closed-form univariate OLS/ridge + bivariate OLS fits on
    * DECIMAL-summed normal equations, test RMSE ranking. Unlike q64
    * (RNG-trained, metric-gated), the RANKING itself replays CTE-for-CTE
    * in DuckDB: split membership, every moment sum, every coefficient,
    * every squared error. */
  val q265DetLeaderboard = QueryDef(
    "q265_det_leaderboard",
    (s, d) => graft.ml.DetLeaderboard.leaderboard(
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("x1"), col("l_discount").as("x2"),
          col("l_tax").as("x3"), col("l_extendedprice").as("y")),
      features = Seq("x1", "x2", "x3"), target = "y",
      id = concat_ws("|", col("l_orderkey"), col("l_linenumber")),
      lambdas = Seq(0.0, 0.5)),
    Some(detLeaderboardOracle))

  /** q265's oracle, generated per (feature, lambda) so the model list and
    * the Spark zoo can't drift apart. Every arithmetic step mirrors
    * DetLeaderboard.leaderboard's expression ORDER (IEEE doubles are only
    * replayable when the op order matches). */
  private def detLeaderboardOracle: String = {
    val feats = Seq("x1", "x2", "x3")
    val lams = Seq("0.0", "0.5")
    // per (feature, lambda) rows feeding the shared slope formula
    val uniRows = (for { f <- feats; lam <- lams } yield {
      val name = if (lam == "0.0") s"ols_$f" else s"ridge_${f}_$lam"
      s"""SELECT '$name' AS model, '$f' AS f, $lam AS lam,
          cy$f AS cyv, cx$f AS cxv, m$f AS mf, nd, my FROM c"""
    }).mkString("\n        UNION ALL ")
    s"""WITH b AS (SELECT
          (CAST(('0x' || substr(md5('42|' || CAST(l_orderkey AS VARCHAR)
            || '|' || CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT)
            + 0.5) / 4294967296.0 AS u,
          CAST(l_extendedprice AS DOUBLE) AS y,
          CAST(l_quantity AS DOUBLE) AS x1,
          CAST(l_discount AS DOUBLE) AS x2,
          CAST(l_tax AS DOUBLE) AS x3
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
          AND l_discount IS NOT NULL AND l_tax IS NOT NULL),
      tr AS (SELECT * FROM b WHERE u < 0.8),
      te AS (SELECT * FROM b WHERE u >= 0.8),
      m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
          CAST(SUM(CAST(ROUND(y, 8) AS DECIMAL(38,8))) AS DOUBLE) AS sy,
          ${feats.map(f =>
            s"""CAST(SUM(CAST(ROUND($f, 8) AS DECIMAL(38,8))) AS DOUBLE) AS s$f,
          CAST(SUM(CAST(ROUND($f * $f, 8) AS DECIMAL(38,8))) AS DOUBLE) AS sxx$f,
          CAST(SUM(CAST(ROUND($f * y, 8) AS DECIMAL(38,8))) AS DOUBLE) AS sxy$f""")
            .mkString(",\n          ")},
          CAST(SUM(CAST(ROUND(x1 * x2, 8) AS DECIMAL(38,8))) AS DOUBLE) AS s12
        FROM tr),
      c AS (SELECT nd, sy, sy / nd AS my,
          ${feats.map(f => s"s$f / nd AS m$f").mkString(", ")},
          ${feats.map(f => s"sxx$f - s$f * s$f / nd AS cx$f").mkString(",\n          ")},
          ${feats.map(f => s"sxy$f - s$f * sy / nd AS cy$f").mkString(",\n          ")},
          s12 - sx1 * sx2 / nd AS c12
        FROM m),
      mu AS ($uniRows),
      mu2 AS (SELECT model, f, ROUND(cyv / (cxv + lam * nd), 6) AS b1,
          my, mf FROM mu WHERE cxv + lam * nd > 0),
      uni AS (SELECT model, f, ROUND(my - b1 * mf, 6) AS b0, b1,
          CAST(NULL AS DOUBLE) AS b2 FROM mu2),
      bid AS (SELECT c.*, cxx1 * cxx2 - c12 * c12 AS det FROM c),
      bis AS (SELECT ROUND((cyx1 * cxx2 - cyx2 * c12) / det, 6) AS b1,
          ROUND((cyx2 * cxx1 - cyx1 * c12) / det, 6) AS b2,
          my, mx1 AS mf1, mx2 AS mf2 FROM bid WHERE det <> 0),
      bi AS (SELECT 'ols_x1_x2' AS model,
          ROUND(my - b1 * mf1 - b2 * mf2, 6) AS b0, b1, b2 FROM bis),
      models AS (SELECT model, b0, b1, b2 FROM uni
        UNION ALL SELECT model, b0, b1, b2 FROM bi),
      nte AS (SELECT CAST(COUNT(*) AS DOUBLE) AS ntd,
          CAST(COUNT(*) AS BIGINT) AS n_test FROM te),
      su AS (SELECT u.model,
          ROUND((te.y - (u.b0 + u.b1 * (CASE u.f WHEN 'x1' THEN te.x1
              WHEN 'x2' THEN te.x2 ELSE te.x3 END)))
            * (te.y - (u.b0 + u.b1 * (CASE u.f WHEN 'x1' THEN te.x1
              WHEN 'x2' THEN te.x2 ELSE te.x3 END))), 8) AS se
        FROM te, uni u),
      sb AS (SELECT b.model,
          ROUND((te.y - (b.b0 + b.b1 * te.x1 + b.b2 * te.x2))
            * (te.y - (b.b0 + b.b1 * te.x1 + b.b2 * te.x2)), 8) AS se
        FROM te, bi b),
      ag AS (SELECT model,
          CAST(SUM(CAST(se AS DECIMAL(38,8))) AS DOUBLE) AS sse
        FROM (SELECT model, se FROM su UNION ALL
              SELECT model, se FROM sb) GROUP BY model),
      r AS (SELECT a.model, mo.b0, mo.b1, mo.b2,
          (SELECT CAST(nd AS BIGINT) FROM c) AS n_train,
          (SELECT n_test FROM nte) AS n_test,
          ROUND(SQRT(a.sse / (SELECT ntd FROM nte)), 6) AS rmse
        FROM ag a JOIN models mo USING (model)),
      fr AS (SELECT r.*, CAST(ROW_NUMBER()
          OVER (ORDER BY rmse, model) AS INT) AS rank FROM r)
      SELECT model, b0, b1, b2, n_train, n_test, rmse, rank,
        rank = 1 AS is_winner
      FROM fr ORDER BY rank"""
  }

  /** Interval join (range join on an equi key): views within 10 minutes
    * after a click by the same user — the batch twin of the stream-stream
    * join in EventStreams.clickViewJoin. Scalar roll-up keeps the oracle
    * compact; the microsecond gap sum is integer-exact.
    */
  val q66IntervalJoin = QueryDef(
    "q66_interval_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("v_ts"))
      graft.ops.AsofJoin.intervalJoin(clicks, views, "user_id", "c_ts", "v_ts",
        "10 minutes")
        .agg(
          count(lit(1)).as("n_pairs"),
          countDistinct(col("user_id")).cast("bigint").as("n_users"),
          sum(unix_micros(col("v_ts")) - unix_micros(col("c_ts")))
            .cast("bigint").as("gap_us_total"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS n_users,
        CAST(SUM(epoch_us(v.ts) - epoch_us(c.ts)) AS BIGINT) AS gap_us_total
      FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
        ON c.user_id = v.user_id
        AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 10 MINUTE"""))

  /** Backward as-of join (AsofJoin.asofBackward): each click is annotated
    * with the user's most recent view at-or-before it. DuckDB's native
    * ASOF LEFT JOIN is the oracle — an independent implementation of the
    * same semantics. The view side is pre-aggregated to unique
    * (user_id, ts) so tie-resolution is engine-independent.
    */
  val q67AsofJoin = QueryDef(
    "q67_asof_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts").agg(max(col("value")).as("v_value"))
      graft.ops.AsofJoin.asofBackward(clicks, views, "user_id", "ts", "ts",
        Seq("v_value"))
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"), col("value"),
          unix_micros(col("asof_ts")).as("asof_ts_us"), col("asof_v_value"))
        .orderBy("event_id")
    },
    Some("""WITH clicks AS (SELECT event_id, user_id, ts, value FROM events
              WHERE event_type = 'click'),
      views AS (SELECT user_id, ts, MAX(value) AS v_value FROM events
              WHERE event_type = 'view' GROUP BY user_id, ts)
      SELECT c.event_id, epoch_us(c.ts) AS ts_us, c.value,
        epoch_us(v.ts) AS asof_ts_us, v.v_value AS asof_v_value
      FROM clicks c ASOF LEFT JOIN views v
        ON c.user_id = v.user_id AND v.ts <= c.ts
      ORDER BY c.event_id"""))

  override val defs: Seq[QueryDef] = Seq(q62FeatureCorr, q63Sessionize,
    q64MlLeaderboard, q66IntervalJoin, q67AsofJoin, q265DetLeaderboard)
}
