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
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events),
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
    q64MlLeaderboard, q66IntervalJoin, q67AsofJoin)
}
