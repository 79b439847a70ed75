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

  override val defs: Seq[QueryDef] = Seq(q62FeatureCorr, q63Sessionize, q64MlLeaderboard)
}
