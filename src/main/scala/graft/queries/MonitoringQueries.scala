package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Drift, EventAnalytics}
import graft.text.Curation

/** Round-5 monitoring operators: the checks a production training-data
  * pipeline runs BETWEEN releases — distribution drift (PSI), trailing
  * activity (rolling event-time windows), content novelty vs the previous
  * corpus, and conversion attribution. All one-or-two keyed shuffles, no
  * driver barriers; windows over data rows are keyed, windows over report
  * rows are ≤#buckets.
  */
object MonitoringQueries extends QueryGroup {

  /** Population Stability Index between two corpus snapshots (ops/Drift):
    * per-bucket doc-length histograms + PSI contributions. Snapshots are
    * the even/odd doc_id halves; buckets are 50-char-wide length bins
    * capped at 10. Each snapshot collapses to its ≤12-row histogram before
    * ANY ratio math — the global windows run over that report table. */
  val q144PsiDrift = QueryDef(
    "q144_psi_drift",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Drift.psiReport(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        least((col("n_chars") / 50).cast("bigint"), lit(10L)))
    },
    Some("""WITH t AS (SELECT LEAST(n_chars // 50, 10) AS bucket,
          CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS side
        FROM documents),
      h AS (SELECT bucket,
          CAST(SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
          CAST(SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        FROM t GROUP BY bucket),
      p AS (SELECT bucket, n_a, n_b,
          GREATEST(CAST(n_a AS DOUBLE) / SUM(n_a) OVER (), 1e-6) AS pa,
          GREATEST(CAST(n_b AS DOUBLE) / SUM(n_b) OVER (), 1e-6) AS pb
        FROM h)
      SELECT bucket, n_a, n_b, ROUND(pa, 6) AS p_a, ROUND(pb, 6) AS p_b,
        ROUND((pa - pb) * LN(pa / pb), 6) AS psi_term,
        ROUND(SUM(ROUND((pa - pb) * LN(pa / pb), 6)) OVER (), 6) AS psi_total
      FROM p ORDER BY bucket"""))

  /** 7-day rolling activity per user (EventAnalytics.rollingRange): for
    * every event, the count and DECIMAL-summed value of the user's events
    * in the trailing week. RANGE frame over epoch-µs, so ts ties are frame
    * peers — identical row sets cross-engine regardless of tie order. */
  val q145RollingWindow = QueryDef(
    "q145_rolling_window",
    (s, d) => EventAnalytics.rollingRange(
        Tables.events(s, d), "user_id", "ts", "value", windowSec = 7L * 86400L)
      .select("event_id", "user_id", "n_window", "sum_window")
      .orderBy("user_id", "event_id"),
    Some("""SELECT event_id, user_id,
        CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
        ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) OVER w AS DOUBLE), 6)
          AS sum_window
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id"""))

  /** n-gram novelty vs a reference corpus (Curation.noveltyScore): per odd
    * doc, the fraction of its distinct word trigrams absent from the even
    * half. Corpus-scale reference → shuffle-on-shingle LEFT join (contrast
    * q85's broadcast probe against a small eval set). */
  val q146Novelty = QueryDef(
    "q146_novelty",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Curation.noveltyScore(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0),
        "doc_id", col("text"), n = 3)
        .orderBy("doc_id")
    },
    Some("""WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
          range(1, len(words) - 1),
          i -> array_to_string(words[i:i+2], ' ')))) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        WHERE len(words) >= 3),
      d AS (SELECT * FROM sh WHERE doc_id % 2 = 1),
      r AS (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 0)
      SELECT d.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        CAST(SUM(CASE WHEN r.s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        ROUND(CAST(SUM(CASE WHEN r.s IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*), 6) AS novelty
      FROM d LEFT JOIN r ON d.s = r.s
      GROUP BY d.doc_id ORDER BY d.doc_id"""))

  /** Last-touch attribution (EventAnalytics.lastTouchAttribution): each
    * purchase credits the user's most recent strictly-preceding
    * non-purchase event type; (ts, event_id) ordering makes "most recent"
    * deterministic under timestamp ties. */
  val q147Attribution = QueryDef(
    "q147_attribution",
    (s, d) => EventAnalytics.lastTouchAttribution(
        Tables.events(s, d), "user_id", "ts", "event_type", "value",
        tieCol = "event_id", convType = "purchase")
      .orderBy("channel"),
    Some("""WITH t AS (SELECT *,
        last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
            IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        FROM events)
      SELECT COALESCE(touch, '(none)') AS channel,
        CAST(COUNT(*) AS BIGINT) AS n_conversions,
        ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6)
          AS attributed_value
      FROM t WHERE event_type = 'purchase'
      GROUP BY 1 ORDER BY 1"""))

  /** Pairwise Jensen-Shannon divergence between source unigram
    * distributions (Drift.jsdPairs): the corpus-similarity matrix for mix
    * planning — which sources add diversity vs duplicate each other.
    * Per-term contributions rounded to 8 and DECIMAL-summed per pair. */
  val q148JsdSources = QueryDef(
    "q148_jsd_sources",
    (s, d) => Drift.jsdPairs(Tables.documents(s, d), col("source"), col("text")),
    Some("""WITH tk AS (SELECT source AS g, unnest(string_split(text, ' ')) AS t
          FROM documents),
      tf AS (SELECT g, t, COUNT(*) AS c FROM tk WHERE len(t) > 0 GROUP BY g, t),
      tot AS (SELECT g, SUM(c) AS n FROM tf GROUP BY g),
      p AS (SELECT tf.g, t, CAST(c AS DOUBLE) / n AS p FROM tf JOIN tot USING (g)),
      pr AS (SELECT x.g AS a, y.g AS b FROM (SELECT DISTINCT g FROM p) x,
        (SELECT DISTINCT g FROM p) y WHERE x.g < y.g),
      l AS (SELECT a, b, t, p AS pa FROM pr JOIN p ON p.g = pr.a),
      r AS (SELECT a, b, t, p AS pb FROM pr JOIN p ON p.g = pr.b),
      f AS (SELECT COALESCE(l.a, r.a) AS a, COALESCE(l.b, r.b) AS b,
          COALESCE(pa, 0.0) AS pa, COALESCE(pb, 0.0) AS pb
        FROM l FULL JOIN r ON l.a = r.a AND l.b = r.b AND l.t = r.t),
      c AS (SELECT a, b, ROUND(
          0.5 * (CASE WHEN pa > 0 THEN pa * LN(pa / ((pa + pb) / 2)) ELSE 0.0 END)
        + 0.5 * (CASE WHEN pb > 0 THEN pb * LN(pb / ((pa + pb) / 2)) ELSE 0.0 END),
          8) AS term
        FROM f)
      SELECT a, b, ROUND(CAST(SUM(CAST(term AS DECIMAL(28,8))) AS DOUBLE), 6) AS jsd
      FROM c GROUP BY a, b ORDER BY a, b"""))

  /** Two-sample Kolmogorov-Smirnov drift statistic (Drift.ksStatistic) on
    * event values, even vs odd event ids — the bucketing-free complement
    * to q144's PSI. The Spark side computes the ECDF with range-partitioned
    * prefix sums (no single-partition global window); the oracle replays
    * the same CDF with a global window, which DuckDB can afford at oracle
    * scale. */
  val q149KsDrift = QueryDef(
    "q149_ks_drift",
    (s, d) => {
      val ev = Tables.events(s, d)
      Drift.ksStatistic(
        ev.filter(col("event_id") % 2 === 0),
        ev.filter(col("event_id") % 2 === 1),
        col("value"))
    },
    Some("""WITH t AS (SELECT value AS v,
          CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS ia
        FROM events WHERE value IS NOT NULL),
      h AS (SELECT v, CAST(SUM(ia) AS BIGINT) AS ca,
          CAST(SUM(1 - ia) AS BIGINT) AS cb FROM t GROUP BY v),
      c AS (SELECT v, SUM(ca) OVER (ORDER BY v) AS fa_n,
          SUM(cb) OVER (ORDER BY v) AS fb_n FROM h),
      tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM h)
      SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        MAX(ROUND(ABS(CAST(fa_n AS DOUBLE) / na - CAST(fb_n AS DOUBLE) / nb),
          6)) AS ks_stat
      FROM c, tot GROUP BY na, nb"""))

  /** Drift timeline (Drift.psiTimeline): per-DAY PSI of the event-value
    * distribution vs the whole-period reference, one data pass, densified
    * window×bucket grid. Day = epoch-seconds div 86400 (the q33/q140
    * integer-time convention); buckets are 25-wide value bins capped at
    * 10. */
  val q153PsiTimeline = QueryDef(
    "q153_psi_timeline",
    (s, d) => Drift.psiTimeline(
        Tables.events(s, d),
        floor(col("ts").cast("long") / lit(86400)).cast("long"),
        least(floor(col("value") / 25).cast("long"), lit(10L)))
      .withColumnRenamed("w", "day"),
    Some("""WITH e AS (SELECT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS w,
          LEAST(CAST(FLOOR(value / 25) AS BIGINT), 10) AS bucket FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL),
      h AS (SELECT w, bucket, CAST(COUNT(*) AS BIGINT) AS n FROM e
        GROUP BY w, bucket),
      r AS (SELECT bucket, SUM(n) AS n_ref FROM h GROUP BY bucket),
      r2 AS (SELECT bucket, GREATEST(CAST(n_ref AS DOUBLE)
          / (SELECT SUM(n_ref) FROM r), 1e-6) AS q FROM r),
      dense AS (SELECT w, bucket, q FROM (SELECT DISTINCT w FROM h), r2),
      j AS (SELECT dense.w, dense.bucket, dense.q, COALESCE(h.n, 0) AS n
        FROM dense LEFT JOIN h ON dense.w = h.w AND dense.bucket = h.bucket),
      p AS (SELECT w, n, GREATEST(CAST(n AS DOUBLE)
          / SUM(n) OVER (PARTITION BY w), 1e-6) AS p, q FROM j),
      t AS (SELECT w, n, ROUND((p - q) * LN(p / q), 6) AS term FROM p)
      SELECT w AS day, CAST(SUM(n) AS BIGINT) AS n_events,
        ROUND(CAST(SUM(CAST(term AS DECIMAL(28,6))) AS DOUBLE), 6) AS psi
      FROM t GROUP BY w ORDER BY day"""))

  /** Rolling z-score anomalies (EventAnalytics.rollingAnomalies): events
    * whose value sits > 3σ from the same user's trailing-10-event
    * mean/std — the per-entity metric-anomaly sweep. Exact-decimal
    * trailing sums; the oracle replays the identical frame and variance
    * form. */
  val q154RollingAnomaly = QueryDef(
    "q154_rolling_anomaly",
    (s, d) => EventAnalytics.rollingAnomalies(
        Tables.events(s, d), "user_id", "ts", "value", tieCol = "event_id")
      .select("event_id", "user_id", "value", "z")
      .orderBy("user_id", "event_id"),
    Some("""WITH t AS (SELECT event_id, user_id, value,
          COUNT(value) OVER w AS n,
          CAST(SUM(CAST(value AS DECIMAL(28,8))) OVER w AS DOUBLE) AS s,
          CAST(SUM(CAST(value * value AS DECIMAL(38,8))) OVER w AS DOUBLE) AS s2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
      v AS (SELECT event_id, user_id, value, n, s / n AS mean,
          (s2 - s * s / n) / (n - 1) AS var FROM t)
      SELECT event_id, user_id, value,
        ROUND((value - mean) / sqrt(var), 6) AS z
      FROM v
      WHERE n >= 5 AND var > 0 AND ABS(value - mean) > 3 * sqrt(var)
      ORDER BY user_id, event_id"""))

  /** Categorical PSI with a NULL bucket (Drift.psiReport): buckets are raw
    * lang values with 'en' nulled out, so the null-bucket grouping path of
    * psiReport is exercised end-to-end (nulls group as one real bucket;
    * output renders them '(null)' so both engines order rows identically). */
  val q165PsiCategorical = QueryDef(
    "q165_psi_categorical",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Drift.psiReport(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          when(col("lang") === "en", lit(null)).otherwise(col("lang")))
        .withColumn("bucket", coalesce(col("bucket"), lit("(null)")))
        .orderBy("bucket")
    },
    Some("""WITH t AS (SELECT NULLIF(lang, 'en') AS bucket,
          CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS side
        FROM documents),
      h AS (SELECT bucket,
          CAST(SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
          CAST(SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        FROM t GROUP BY bucket),
      p AS (SELECT bucket, n_a, n_b,
          GREATEST(CAST(n_a AS DOUBLE) / SUM(n_a) OVER (), 1e-6) AS pa,
          GREATEST(CAST(n_b AS DOUBLE) / SUM(n_b) OVER (), 1e-6) AS pb
        FROM h)
      SELECT COALESCE(bucket, '(null)') AS bucket, n_a, n_b,
        ROUND(pa, 6) AS p_a, ROUND(pb, 6) AS p_b,
        ROUND((pa - pb) * LN(pa / pb), 6) AS psi_term,
        ROUND(SUM(ROUND((pa - pb) * LN(pa / pb), 6)) OVER (), 6) AS psi_total
      FROM p ORDER BY bucket"""))

  /** PSI per day against a FROZEN reference distribution — day 0's value
    * histogram (Drift.psiAgainstReference, the scoring core the streaming
    * monitor DriftStreams.psiSink reuses per micro-batch). Contrast q153,
    * whose reference is the all-period distribution: this is the
    * "drift vs what the model was trained on" view, and day 0 scoring 0.0
    * against itself is the built-in sanity row. */
  val q172PsiVsReference = QueryDef(
    "q172_psi_vs_reference",
    (s, d) => {
      val hist = Tables.events(s, d)
        .select(
          floor(col("ts").cast("long") / lit(86400)).cast("long").as("w"),
          least(floor(col("value") / 25).cast("long"), lit(10L)).as("bucket"))
        // null ts/value → no grid cell (the psiTimeline null contract)
        .filter(col("w").isNotNull && col("bucket").isNotNull)
        .groupBy("w", "bucket").agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // read 3x: min-day, ref slice, scoring
      val minW = hist.agg(min(col("w")).as("w0"))
      val refCounts = hist.join(broadcast(minW), col("w") === col("w0"))
        .select(col("bucket"), col("n").cast("double").as("nb"))
      val refDist = refCounts
        .crossJoin(broadcast(refCounts.agg(sum(col("nb")).as("tot"))))
        .select(col("bucket"), (col("nb") / col("tot")).as("q"))
      Drift.psiAgainstReference(hist, refDist)
        .withColumnRenamed("w", "day")
    },
    Some("""WITH e AS (SELECT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS w,
          LEAST(CAST(FLOOR(value / 25) AS BIGINT), 10) AS bucket FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL),
      h AS (SELECT w, bucket, CAST(COUNT(*) AS BIGINT) AS n FROM e
        GROUP BY w, bucket),
      r AS (SELECT bucket, CAST(n AS DOUBLE) /
          (SELECT SUM(n) FROM h WHERE w = (SELECT MIN(w) FROM h)) AS q
        FROM h WHERE w = (SELECT MIN(w) FROM h)),
      dense AS (SELECT w, bucket, q FROM (SELECT DISTINCT w FROM h), r),
      j AS (SELECT COALESCE(dense.w, h.w) AS w,
          COALESCE(h.n, 0) AS n, COALESCE(dense.q, 1e-6) AS q
        FROM dense FULL JOIN h ON dense.w = h.w AND dense.bucket = h.bucket),
      p AS (SELECT w, n,
          GREATEST(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY w), 1e-6) AS p,
          GREATEST(q, 1e-6) AS q FROM j),
      t AS (SELECT w, n, ROUND((p - q) * LN(p / q), 6) AS term FROM p)
      SELECT w AS day, CAST(SUM(n) AS BIGINT) AS n_events,
        ROUND(CAST(SUM(CAST(term AS DECIMAL(28,6))) AS DOUBLE), 6) AS psi
      FROM t GROUP BY w ORDER BY day"""))

  /** Multi-feature PSI sweep (Drift.psiMultiReport): doc-length buckets AND
    * language scored between the even/odd snapshot halves in ONE pass per
    * side — the F-feature release audit that per-feature psiReport loops
    * would charge 2·F scans for. */
  val q173PsiMulti = QueryDef(
    "q173_psi_multi",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Drift.psiMultiReport(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        Seq(
          "len" -> least((col("n_chars") / 50).cast("bigint"), lit(10L)),
          "lang" -> col("lang")))
    },
    Some("""WITH t AS (SELECT f.feature AS feature, f.bucket AS bucket,
          CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS side
        FROM (SELECT doc_id, unnest(ARRAY[
            struct_pack(feature := 'len',
              bucket := CAST(LEAST(n_chars // 50, 10) AS VARCHAR)),
            struct_pack(feature := 'lang', bucket := lang)]) AS f
          FROM documents) q),
      h AS (SELECT feature, bucket,
          CAST(SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
          CAST(SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        FROM t GROUP BY feature, bucket),
      p AS (SELECT feature, bucket, n_a, n_b,
          GREATEST(CAST(n_a AS DOUBLE)
            / SUM(n_a) OVER (PARTITION BY feature), 1e-6) AS pa,
          GREATEST(CAST(n_b AS DOUBLE)
            / SUM(n_b) OVER (PARTITION BY feature), 1e-6) AS pb
        FROM h)
      SELECT feature, COALESCE(bucket, '(null)') AS bucket, n_a, n_b,
        ROUND(pa, 6) AS p_a, ROUND(pb, 6) AS p_b,
        ROUND((pa - pb) * LN(pa / pb), 6) AS psi_term,
        ROUND(CAST(SUM(CAST(ROUND((pa - pb) * LN(pa / pb), 6) AS DECIMAL(28,6)))
          OVER (PARTITION BY feature) AS DOUBLE), 6) AS psi_total
      FROM p ORDER BY feature, bucket"""))

  /** Data-contract report between the even/odd snapshot halves
    * (Drift.contractReport): per column — rows, null rate, EXACT distinct
    * count, numeric mean, both sides, from ONE stacked pass per side. The
    * schema-level gate a corpus swap runs before any distribution math. */
  val q175Contract = QueryDef(
    "q175_contract_report",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Drift.contractReport(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        Seq("doc_id", "lang", "n_chars", "source"))
    },
    Some("""WITH st AS (SELECT side, t.c AS c, t.vs AS vs, t.vd AS vd FROM (
          SELECT CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS side,
            unnest(ARRAY[
              struct_pack(c := 'doc_id', vs := CAST(doc_id AS VARCHAR),
                vd := TRY_CAST(doc_id AS DOUBLE)),
              struct_pack(c := 'lang', vs := lang,
                vd := TRY_CAST(lang AS DOUBLE)),
              struct_pack(c := 'n_chars', vs := CAST(n_chars AS VARCHAR),
                vd := TRY_CAST(n_chars AS DOUBLE)),
              struct_pack(c := 'source', vs := source,
                vd := TRY_CAST(source AS DOUBLE))]) AS t
          FROM documents) q),
      pv AS (SELECT side, c, vs, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(CAST(vd AS DECIMAL(28,8))) AS sd,
          CAST(COUNT(vd) AS BIGINT) AS cd
        FROM st GROUP BY side, c, vs),
      pc AS (SELECT side, c, SUM(n) AS nrows,
          SUM(CASE WHEN vs IS NULL THEN n ELSE 0 END) AS nulls,
          COUNT(CASE WHEN vs IS NOT NULL THEN 1 END) AS ndv,
          SUM(sd) AS sd, SUM(cd) AS cd
        FROM pv GROUP BY side, c)
      SELECT c AS "column",
        CAST(MAX(CASE WHEN side = 'a' THEN nrows END) AS BIGINT) AS rows_a,
        CAST(MAX(CASE WHEN side = 'b' THEN nrows END) AS BIGINT) AS rows_b,
        ROUND(MAX(CASE WHEN side = 'a'
          THEN CAST(nulls AS DOUBLE) / nrows END), 6) AS null_rate_a,
        ROUND(MAX(CASE WHEN side = 'b'
          THEN CAST(nulls AS DOUBLE) / nrows END), 6) AS null_rate_b,
        CAST(MAX(CASE WHEN side = 'a' THEN ndv END) AS BIGINT) AS ndv_a,
        CAST(MAX(CASE WHEN side = 'b' THEN ndv END) AS BIGINT) AS ndv_b,
        ROUND(MAX(CASE WHEN side = 'a'
          THEN CAST(sd AS DOUBLE) / cd END), 6) AS mean_a,
        ROUND(MAX(CASE WHEN side = 'b'
          THEN CAST(sd AS DOUBLE) / cd END), 6) AS mean_b
      FROM pc GROUP BY c ORDER BY c"""))

  /** Exact 1-D Wasserstein distance between returned and non-returned
    * line items' price distributions (Drift.wasserstein1d): the
    * magnitude-aware drift number beside q149's KS — same distributed-ECDF
    * scaffold, with each partition's boundary successor supplied from the
    * ≤#partitions min-value table so the ∫dx gap never needs a
    * single-partition window. */
  val q186Wasserstein = QueryDef(
    "q186_wasserstein",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      Drift.wasserstein1d(
        li.filter(col("l_returnflag") === "R"),
        li.filter(col("l_returnflag") =!= "R"),
        col("l_extendedprice"))
    },
    Some("""WITH s AS (SELECT l_extendedprice AS v,
          CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ia,
          CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END AS ib
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL),
      h AS (SELECT v, CAST(SUM(ia) AS BIGINT) AS ca,
          CAST(SUM(ib) AS BIGINT) AS cb FROM s GROUP BY v),
      tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
          CAST(SUM(cb) AS BIGINT) AS nb FROM h),
      c AS (SELECT v,
          CAST(SUM(ca) OVER (ORDER BY v) AS DOUBLE) AS cca,
          CAST(SUM(cb) OVER (ORDER BY v) AS DOUBLE) AS ccb,
          LEAD(v) OVER (ORDER BY v) AS nv FROM h),
      t AS (SELECT ROUND(ABS(cca / CAST(na AS DOUBLE)
            - ccb / CAST(nb AS DOUBLE)) * (nv - v), 8) AS term
        FROM c, tot WHERE nv IS NOT NULL)
      SELECT (SELECT na FROM tot) AS n_a, (SELECT nb FROM tot) AS n_b,
        ROUND(CAST(SUM(CAST(term AS DECIMAL(28,8))) AS DOUBLE), 6) AS w1
      FROM t"""))

  /** Classical seasonal decomposition of the daily event-volume curve
    * (TimeSeries.seasonalDecompose): centered 7-day trend, zero-sum
    * weekday seasonal, residual — the monitoring view separating weekly
    * rhythm from real drift. One data pass collapses events to ≤#days. */
  val q193Seasonal = QueryDef(
    "q193_seasonal",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("y"))
      graft.ops.TimeSeries.seasonalDecompose(daily, col("day"), col("y"),
        pmod(datediff(col("day"), to_date(lit("1970-01-01"))), lit(7)),
        period = 7)
    },
    Some("""WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS t,
          CAST(COUNT(*) AS DOUBLE) AS y FROM events
        WHERE ts IS NOT NULL GROUP BY 1),
      tr AS (SELECT t, y,
          (t - DATE '1970-01-01') % 7 AS phase,
          CASE WHEN COUNT(*) OVER w = 7 THEN AVG(y) OVER w END AS trend
        FROM daily
        WINDOW w AS (ORDER BY t ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      det AS (SELECT t, y, phase, trend, y - trend AS d FROM tr),
      pm AS (SELECT phase, AVG(d) AS pm FROM det GROUP BY phase),
      c AS (SELECT AVG(pm) AS c FROM pm)
      SELECT t, y, ROUND(trend, 6) AS trend,
        ROUND(pm - c, 6) AS seasonal,
        ROUND(y - trend - (pm - c), 6) AS residual
      FROM det LEFT JOIN pm USING (phase), c ORDER BY t"""))

  /** CUSUM changepoint locator on the daily event-volume curve
    * (TimeSeries.cusumChangepoint): the day where cumulative deviation
    * from the mean peaks — integer-exact argmax in micro-units, so the
    * winning day and its tie-break never depend on float summation. */
  val q194Cusum = QueryDef(
    "q194_cusum",
    (s, d) => graft.ops.TimeSeries.cusumChangepoint(
      Tables.events(s, d).groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("y")),
      col("day"), col("y")),
    Some("""WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS t,
          CAST(COUNT(*) AS DOUBLE) AS y FROM events
        WHERE ts IS NOT NULL GROUP BY 1),
      b AS (SELECT t, CAST(y * 1000000 AS HUGEINT) AS y6 FROM daily),
      s AS (SELECT t, y6,
          COUNT(*) OVER () AS n, SUM(y6) OVER () AS sa,
          SUM(y6) OVER (ORDER BY t) AS p,
          ROW_NUMBER() OVER (ORDER BY t) AS i FROM b),
      sc AS (SELECT t, n, sa, n * p - i * sa AS numer FROM s)
      SELECT CAST(n AS BIGINT) AS n,
        ROUND(CAST(sa AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6) AS mean,
        t AS t_at_max,
        ROUND(ABS(CAST(numer AS DOUBLE)) / CAST(n AS DOUBLE) / 1000000.0, 6)
          AS max_cusum,
        CAST(CASE WHEN numer > 0 THEN -1 WHEN numer < 0 THEN 1 ELSE 0 END
          AS INTEGER) AS direction
      FROM sc ORDER BY ABS(numer) DESC, t LIMIT 1"""))

  /** Holt linear smoothing of the daily event volume
    * (TimeSeries.holtSmooth): per-day level + trend state via the q160
    * list-fold contract with a (level, trend) struct — the capacity
    * planner's forecasting state, exact on both engines. */
  val q196Holt = QueryDef(
    "q196_holt",
    (s, d) => graft.ops.TimeSeries.holtSmooth(
      Tables.events(s, d).groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("y")),
      col("day"), col("y"), alpha = 0.5, beta = 0.3),
    Some("""WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS t,
          CAST(COUNT(*) AS DOUBLE) AS y FROM events
        WHERE ts IS NOT NULL GROUP BY 1),
      l AS (SELECT t, y, list(y) OVER (ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vs FROM daily),
      f AS (SELECT t, y, list_reduce(
          list_prepend([vs[1], 0.0], list_transform(vs[2:], v -> [v, 0.0])),
          (acc, x) -> [x[1] * 0.5 + (acc[1] + acc[2]) * 0.5,
            ((x[1] * 0.5 + (acc[1] + acc[2]) * 0.5) - acc[1]) * 0.3
              + acc[2] * 0.7]) AS st
        FROM l)
      SELECT t, y, ROUND(st[1], 6) AS level, ROUND(st[2], 6) AS trend
      FROM f ORDER BY t"""))

  /** Pairwise vocabulary Jaccard between sources
    * (Drift.vocabJaccardPairs): the set-overlap complement to q148's JSD —
    * term-keyed intersection join, |∪| from the size identity. */
  val q197VocabJaccard = QueryDef(
    "q197_vocab_jaccard",
    (s, d) => Drift.vocabJaccardPairs(Tables.documents(s, d),
      col("source"), col("text")),
    Some("""WITH v AS (SELECT DISTINCT g, t FROM (
          SELECT source AS g, unnest(string_split(text, ' ')) AS t
          FROM documents) raw WHERE len(t) > 0),
      sizes AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS nv FROM v GROUP BY g),
      inter AS (SELECT x.g AS a, y.g AS b, CAST(COUNT(*) AS BIGINT) AS n_common
        FROM v x JOIN v y ON x.t = y.t AND x.g < y.g GROUP BY 1, 2)
      SELECT a, b, sa.nv AS n_a, sb.nv AS n_b, n_common,
        ROUND(CAST(n_common AS DOUBLE)
          / CAST(sa.nv + sb.nv - n_common AS DOUBLE), 6) AS jaccard
      FROM inter JOIN sizes sa ON sa.g = inter.a
        JOIN sizes sb ON sb.g = inter.b
      ORDER BY a, b"""))

  /** Two-sample Cramér–von Mises drift statistic on event values, even vs
    * odd event ids (Drift.cvmStatistic): the L² member of the EDF family
    * beside q149's KS-sup and q186's Wasserstein-L¹ — same distributed-
    * ECDF scaffold, terms weighted by tie multiplicity. */
  val q204Cvm = QueryDef(
    "q204_cvm",
    (s, d) => {
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
      Drift.cvmStatistic(
        ev.filter(col("event_id") % 2 === 0),
        ev.filter(col("event_id") % 2 === 1),
        col("value"))
    },
    Some("""WITH s AS (SELECT value AS v,
          CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS ia,
          CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END AS ib
        FROM events WHERE value IS NOT NULL),
      h AS (SELECT v, CAST(SUM(ia) AS BIGINT) AS ca,
          CAST(SUM(ib) AS BIGINT) AS cb FROM s GROUP BY v),
      tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
          CAST(SUM(cb) AS BIGINT) AS nb FROM h),
      c AS (SELECT v, ca, cb,
          CAST(SUM(ca) OVER (ORDER BY v) AS DOUBLE) AS cca,
          CAST(SUM(cb) OVER (ORDER BY v) AS DOUBLE) AS ccb FROM h),
      t AS (SELECT ROUND(
          (cca / CAST(na AS DOUBLE) - ccb / CAST(nb AS DOUBLE))
          * (cca / CAST(na AS DOUBLE) - ccb / CAST(nb AS DOUBLE))
          * CAST(ca + cb AS DOUBLE), 8) AS term
        FROM c, tot),
      sc AS (SELECT CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
          / ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
             * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))) AS scale
        FROM tot)
      SELECT (SELECT na FROM tot) AS n_a, (SELECT nb FROM tot) AS n_b,
        ROUND(CAST(SUM(CAST(term AS DECIMAL(28,8))) AS DOUBLE)
          * (SELECT scale FROM sc), 6) AS cvm
      FROM t"""))

  /** Theil–Sen robust slope of the daily volume curve
    * (TimeSeries.theilSen): median of pairwise slopes + median-residual
    * intercept — the outlier-proof trend line. */
  val q215TheilSen = QueryDef(
    "q215_theil_sen",
    (s, d) => graft.ops.TimeSeries.theilSen(
      Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).cast("double").as("y")),
      col("day"), col("y")),
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS t,
          CAST(COUNT(*) AS DOUBLE) AS y FROM events
        WHERE ts IS NOT NULL GROUP BY 1),
      p AS (SELECT (b.y - a.y)
            / (CAST(b.t AS DOUBLE) - CAST(a.t AS DOUBLE)) AS sl
        FROM daily a JOIN daily b ON a.t < b.t),
      sl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
          quantile_cont(sl, 0.5) AS slope FROM p),
      r AS (SELECT d.y - sl.slope * CAST(d.t AS DOUBLE) AS resid
        FROM daily d, sl)
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n,
        (SELECT n_pairs FROM sl) AS n_pairs,
        (SELECT ROUND(slope, 6) FROM sl) AS slope,
        ROUND(quantile_cont(resid, 0.5), 6) AS intercept
      FROM r"""))

  /** Mann–Kendall trend test on the daily volume curve
    * (TimeSeries.mannKendall): integer-exact S with tie-corrected
    * variance and continuity-corrected z — Theil–Sen's standard partner. */
  val q216MannKendall = QueryDef(
    "q216_mann_kendall",
    (s, d) => graft.ops.TimeSeries.mannKendall(
      Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).cast("double").as("y")),
      col("day"), col("y")),
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS t,
          CAST(COUNT(*) AS DOUBLE) AS y FROM events
        WHERE ts IS NOT NULL GROUP BY 1),
      sr AS (SELECT COALESCE(CAST(SUM(SIGN(b.y - a.y)) AS BIGINT), 0) AS s
        FROM daily a JOIN daily b ON a.t < b.t),
      ties AS (SELECT COALESCE(SUM(tg * (tg - 1) * (2 * tg + 5)), 0)
          AS tie_term
        FROM (SELECT COUNT(*) AS tg FROM daily GROUP BY y) g),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
      v AS (SELECT n, s,
          (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
            * (2.0 * CAST(n AS DOUBLE) + 5)
            - CAST(tie_term AS DOUBLE)) / 18.0 AS vs
        FROM sr, ties, nn)
      SELECT n, s, ROUND(vs, 6) AS var_s,
        CASE WHEN vs > 0 THEN ROUND(
          CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1) / SQRT(vs)
               WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1) / SQRT(vs)
               ELSE 0.0 END, 6) END AS z
      FROM v"""))

  /** Kendall tau-b between the daily event volume and the daily mean
    * event value (TimeSeries.kendallTau): tie-corrected rank concordance
    * — "do busier days run hotter values?" without assuming linearity.
    * C−D and the tie counts are integer-exact over the ≤#days series;
    * the daily mean is a decimal-sum average rounded 6 BEFORE pairing so
    * pair signs are engine-stable. */
  val q218KendallTau = QueryDef(
    "q218_kendall_tau",
    (s, d) => graft.ops.TimeSeries.kendallTau(
      Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).cast("double").as("x"),
          round(sum(col("value").cast("decimal(28,8)")).cast("double")
            / count(lit(1)), 6).as("y")),
      col("x"), col("y")),
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          CAST(COUNT(*) AS DOUBLE) AS x,
          ROUND(CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE)
            / COUNT(*), 6) AS y
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      cd AS (SELECT CAST(COALESCE(SUM(CAST(SIGN(b.x - a.x) * SIGN(b.y - a.y)
            AS BIGINT)), 0) AS BIGINT) AS c_minus_d
        FROM daily a JOIN daily b ON a.day < b.day),
      tx AS (SELECT CAST(COALESCE(SUM(tg * (tg - 1)), 0) // 2 AS BIGINT)
          AS tie_x_pairs
        FROM (SELECT COUNT(*) AS tg FROM daily GROUP BY x) g),
      ty AS (SELECT CAST(COALESCE(SUM(tg * (tg - 1)), 0) // 2 AS BIGINT)
          AS tie_y_pairs
        FROM (SELECT COUNT(*) AS tg FROM daily GROUP BY y) g),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
      v AS (SELECT n, c_minus_d, tie_x_pairs, tie_y_pairs,
          CAST(n * (n - 1) AS DOUBLE) / 2 AS n0
        FROM cd, tx, ty, nn)
      SELECT n, c_minus_d, tie_x_pairs, tie_y_pairs,
        CASE WHEN SQRT((n0 - CAST(tie_x_pairs AS DOUBLE))
              * (n0 - CAST(tie_y_pairs AS DOUBLE))) > 0
          THEN ROUND(CAST(c_minus_d AS DOUBLE)
            / SQRT((n0 - CAST(tie_x_pairs AS DOUBLE))
              * (n0 - CAST(tie_y_pairs AS DOUBLE))), 6) END AS tau_b
      FROM v"""))

  /** Multi-window SLO burn rate over the event stream
    * (EventAnalytics.sloBurnRate): hourly error-budget burn paired with
    * the enclosing 6-hour window's burn, alert only when BOTH exceed 1 —
    * the SRE-handbook shape (fast detection, blip suppression). One
    * data pass; rollup + join run over the ≤#hours report frame. */
  val q220SloBurn = QueryDef(
    "q220_slo_burn",
    (s, d) => graft.ops.EventAnalytics.sloBurnRate(Tables.events(s, d),
      col("ts"), col("event_type") === "error", budget = 0.25),
    Some("""WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hour,
          CAST(COUNT(*) AS BIGINT) AS total,
          CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS errors
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      l AS (SELECT hour // 6 AS blk, CAST(SUM(total) AS BIGINT) AS lt,
          CAST(SUM(errors) AS BIGINT) AS le FROM h GROUP BY 1)
      SELECT hour, total, errors,
        ROUND(CAST(errors AS DOUBLE) / CAST(total AS DOUBLE) / 0.25, 6)
          AS burn_short,
        ROUND(CAST(le AS DOUBLE) / CAST(lt AS DOUBLE) / 0.25, 6)
          AS burn_long,
        ROUND(CAST(errors AS DOUBLE) / CAST(total AS DOUBLE) / 0.25, 6) > 1.0
          AND ROUND(CAST(le AS DOUBLE) / CAST(lt AS DOUBLE) / 0.25, 6) > 1.0
          AS alert
      FROM h JOIN l ON hour // 6 = l.blk ORDER BY hour"""))

  /** Durbin–Watson serial-correlation check of the daily-volume OLS
    * residuals (TimeSeries.durbinWatson): DW ≈ 2 means the q215-style
    * trend's error bars are trustworthy; DW → 0 says the residuals trend
    * together (seasonality/level shift under-modeled). */
  val q228DurbinWatson = QueryDef(
    "q228_durbin_watson",
    (s, d) => graft.ops.TimeSeries.durbinWatson(
      Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).cast("double").as("y")),
      col("day"), col("y")),
    Some("""WITH daily AS (SELECT CAST(epoch_us(ts) // 86400000000 AS DOUBLE)
          AS t, CAST(COUNT(*) AS DOUBLE) AS y
        FROM events WHERE ts IS NOT NULL
        GROUP BY epoch_us(ts) // 86400000000),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(t AS DECIMAL(38,8))) AS DOUBLE) AS st,
          CAST(SUM(CAST(y AS DECIMAL(38,8))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(t * t AS DECIMAL(38,8))) AS DOUBLE) AS stt,
          CAST(SUM(CAST(t * y AS DECIMAL(38,8))) AS DOUBLE) AS sty
        FROM daily),
      d AS (SELECT n, CAST(n AS DOUBLE) AS nd, st, sy, stt, sty,
          CAST(n AS DOUBLE) * stt - st * st AS sttc FROM m),
      s AS (SELECT n, nd, st, sy, sttc,
          (nd * sty - st * sy) / sttc AS slope FROM d),
      s2 AS (SELECT n, nd, sttc, slope,
          (sy - slope * st) / nd AS inter FROM s),
      r AS (SELECT daily.t, daily.y - (inter + slope * daily.t) AS e
        FROM daily, s2),
      l AS (SELECT e, e - LAG(e) OVER (ORDER BY t) AS de FROM r),
      agg AS (SELECT
          CAST(SUM(CAST(ROUND(de * de, 8) AS DECIMAL(38,8))) AS DOUBLE)
            AS num,
          CAST(SUM(CAST(ROUND(e * e, 8) AS DECIMAL(38,8))) AS DOUBLE)
            AS den FROM l)
      SELECT n,
        CASE WHEN sttc > 0 THEN ROUND(slope, 6) END AS slope,
        CASE WHEN den > 0 THEN ROUND(num / den, 6) END AS dw,
        CASE WHEN den > 0 THEN ROUND(1.0 - num / den / 2.0, 6) END AS rho1
      FROM s2, agg"""))

  /** Per-day OLS influence diagnostics of the daily volume trend
    * (TimeSeries.olsInfluence): fitted/residual/leverage/Cook's distance
    * — which single day bent the trend line. */
  val q229OlsInfluence = QueryDef(
    "q229_ols_influence",
    (s, d) => graft.ops.TimeSeries.olsInfluence(
      Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).cast("double").as("y")),
      col("day"), col("y")),
    Some("""WITH daily AS (SELECT CAST(epoch_us(ts) // 86400000000 AS DOUBLE)
          AS t, CAST(COUNT(*) AS DOUBLE) AS y
        FROM events WHERE ts IS NOT NULL
        GROUP BY epoch_us(ts) // 86400000000),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(t AS DECIMAL(38,8))) AS DOUBLE) AS st,
          CAST(SUM(CAST(y AS DECIMAL(38,8))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(t * t AS DECIMAL(38,8))) AS DOUBLE) AS stt,
          CAST(SUM(CAST(t * y AS DECIMAL(38,8))) AS DOUBLE) AS sty
        FROM daily),
      d AS (SELECT n, CAST(n AS DOUBLE) AS nd, st, sy, stt, sty,
          CAST(n AS DOUBLE) * stt - st * st AS sttc FROM m),
      s AS (SELECT n, nd, st, sttc,
          (nd * sty - st * sy) / sttc AS slope, sy FROM d),
      s2 AS (SELECT n, nd, st, sttc, slope,
          (sy - slope * st) / nd AS inter FROM s),
      f AS (SELECT t, y, n, nd, sttc, st,
          inter + slope * t AS fit,
          y - (inter + slope * t) AS e,
          1.0 / nd + (t - st / nd) * (t - st / nd) / (sttc / nd) AS h
        FROM daily, s2),
      w AS (SELECT t, y, n, sttc, fit, e, h,
          CAST(SUM(CAST(ROUND(e * e, 8) AS DECIMAL(38,8))) OVER ()
            AS DOUBLE) / (CAST(n AS DOUBLE) - 2) AS mse
        FROM f)
      SELECT t, y,
        CASE WHEN n > 2 AND sttc > 0 THEN ROUND(fit, 6) END AS fitted,
        CASE WHEN n > 2 AND sttc > 0 THEN ROUND(e, 6) END AS resid,
        CASE WHEN n > 2 AND sttc > 0 THEN ROUND(h, 6) END AS leverage,
        CASE WHEN n > 2 AND sttc > 0 AND h < 1 AND mse > 0 THEN
          ROUND((e * e / (mse * (1.0 - h))) * h / (2.0 * (1.0 - h)), 6)
        END AS cooks_d
      FROM w ORDER BY t"""))

  /** Day-over-day top-10 user leaderboard churn
    * (EventAnalytics.topKChurn): consecutive-day Jaccard of the activity
    * leaderboard — ranking-stability monitoring. */
  val q235LeaderboardChurn = QueryDef(
    "q235_leaderboard_churn",
    (s, d) => graft.ops.EventAnalytics.topKChurn(Tables.events(s, d),
      col("ts"), col("user_id")),
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          user_id AS s, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        GROUP BY 1, 2),
      board AS (SELECT day, s FROM (SELECT day, s,
          ROW_NUMBER() OVER (PARTITION BY day
            ORDER BY cnt DESC, s) AS rn FROM daily) WHERE rn <= 10),
      sizes AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS size
        FROM board GROUP BY day),
      shared AS (SELECT a.day AS day_a, b.day AS day_b,
          CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM board a JOIN board b ON b.day = a.day + 1 AND a.s = b.s
        GROUP BY 1, 2),
      pairs AS (SELECT a.day AS day_a, b.day AS day_b,
          a.size AS size_a, b.size AS size_b
        FROM sizes a JOIN sizes b ON b.day = a.day + 1)
      SELECT day_a, day_b, size_a, size_b,
        COALESCE(n_shared, 0) AS n_shared,
        ROUND(CAST(COALESCE(n_shared, 0) AS DOUBLE)
          / CAST(size_a + size_b - COALESCE(n_shared, 0) AS DOUBLE), 6)
          AS jaccard
      FROM pairs LEFT JOIN shared USING (day_a, day_b)
      ORDER BY day_a"""))

  /** Daily value fan chart: per day the exact interpolated p10/p50/p90 of
    * event value plus the count — the percentile-band monitoring view
    * (is the MEDIAN moving, or just the tail?). One keyed aggregation;
    * the q05 exact-percentile cross-engine contract. */
  val q237QuantileBands = QueryDef(
    "q237_quantile_bands",
    // ONE array percentile per day-group (r15, the q05 fusion): three
    // scalar percentile calls each kept a full per-group value buffer —
    // the array form keeps one and reads three points off it,
    // bit-identically.
    (s, d) => Tables.events(s, d)
      .filter(col("value").isNotNull)
      .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("n"),
        percentile(col("value"),
          array(lit(0.1), lit(0.5), lit(0.9))).as("__q"))
      .select(col("day"), col("n"),
        round(element_at(col("__q"), 1), 6).as("p10"),
        round(element_at(col("__q"), 2), 6).as("p50"),
        round(element_at(col("__q"), 3), 6).as("p90"))
      .orderBy("day"),
    Some("""SELECT epoch_us(ts) // 86400000000 AS day,
        CAST(COUNT(*) AS BIGINT) AS n,
        ROUND(quantile_cont(value, 0.1), 6) AS p10,
        ROUND(quantile_cont(value, 0.5), 6) AS p50,
        ROUND(quantile_cont(value, 0.9), 6) AS p90
      FROM events WHERE value IS NOT NULL
      GROUP BY 1 ORDER BY day"""))

  /** Per-event-type Theil–Sen trend sweep (TimeSeries.theilSenByGroup):
    * one robust slope per segment over its daily volume — "which event
    * types are actually growing". Pair join equi on the group, pair work
    * Σ_g(days_g)², hash-partitioned by group. */
  val q241TheilSenByType = QueryDef(
    "q241_theil_sen_by_type",
    (s, d) => graft.ops.TimeSeries.theilSenByGroup(
      Tables.events(s, d).filter(col("event_type").isNotNull)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).cast("double").as("y")),
      "event_type", col("day"), col("y")),
    Some("""WITH daily AS (SELECT event_type AS g,
          epoch_us(ts) // 86400000000 AS t, CAST(COUNT(*) AS DOUBLE) AS y
        FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
      p AS (SELECT a.g,
          (b.y - a.y) / (CAST(b.t AS DOUBLE) - CAST(a.t AS DOUBLE)) AS sl
        FROM daily a JOIN daily b ON a.g = b.g AND a.t < b.t),
      sl AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          quantile_cont(sl, 0.5) AS slope FROM p GROUP BY g),
      r AS (SELECT d.g, d.y - sl.slope * CAST(d.t AS DOUBLE) AS resid
        FROM daily d LEFT JOIN sl USING (g))
      SELECT r.g AS event_type,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(COALESCE(MAX(sl.n_pairs), 0) AS BIGINT) AS n_pairs,
        ROUND(MAX(sl.slope), 6) AS slope,
        ROUND(quantile_cont(resid, 0.5), 6) AS intercept
      FROM r LEFT JOIN sl ON r.g = sl.g
      GROUP BY r.g ORDER BY event_type"""))

  /** Seasonal-adjusted anomaly flags: q193's decomposition residuals
    * scored by the robust z (median/MAD, 1.4826 consistency constant) —
    * the "alert AFTER removing the weekly rhythm" completion of the
    * decomposition. Two tiny percentile frames broadcast back; |z| > 3
    * flags; edge days (null trend) carry null z/flag. */
  val q242SeasonalAnomaly = QueryDef(
    "q242_seasonal_anomaly",
    (s, d) => {
      def nzd(c: Column) = when(c =!= 0.0, c)
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("y"))
      val dec = graft.ops.TimeSeries.seasonalDecompose(daily, col("day"),
        col("y"), pmod(datediff(col("day"), to_date(lit("1970-01-01"))),
          lit(7)), period = 7)
      val med = dec.filter(col("residual").isNotNull)
        .agg(percentile(col("residual"), lit(0.5)).as("__med"))
      val withMed = dec.crossJoin(broadcast(med))
      val mad = withMed.filter(col("residual").isNotNull)
        .agg(percentile(abs(col("residual") - col("__med")), lit(0.5))
          .as("__mad"))
      withMed.crossJoin(broadcast(mad))
        .withColumn("robust_z",
          when(col("residual").isNotNull && col("__mad") > 0,
            round((col("residual") - col("__med"))
              / nzd(lit(1.4826) * col("__mad")), 6)))
        .withColumn("is_anomaly",
          when(col("robust_z").isNotNull, abs(col("robust_z")) > 3.0))
        .select("t", "y", "residual", "robust_z", "is_anomaly")
        .orderBy("t")
    },
    Some("""WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS t,
          CAST(COUNT(*) AS DOUBLE) AS y FROM events
        WHERE ts IS NOT NULL GROUP BY 1),
      tr AS (SELECT t, y,
          (t - DATE '1970-01-01') % 7 AS phase,
          CASE WHEN COUNT(*) OVER w = 7 THEN AVG(y) OVER w END AS trend
        FROM daily
        WINDOW w AS (ORDER BY t ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      det AS (SELECT t, y, phase, trend, y - trend AS d FROM tr),
      pm AS (SELECT phase, AVG(d) AS pm FROM det GROUP BY phase),
      cc AS (SELECT AVG(pm) AS c FROM pm),
      dec AS (SELECT t, y,
          ROUND(y - trend - (pm - c), 6) AS residual
        FROM det LEFT JOIN pm USING (phase), cc),
      med AS (SELECT quantile_cont(residual, 0.5) AS med FROM dec
        WHERE residual IS NOT NULL),
      mad AS (SELECT quantile_cont(ABS(residual - (SELECT med FROM med)),
          0.5) AS mad FROM dec WHERE residual IS NOT NULL),
      z AS (SELECT t, y, residual,
          CASE WHEN residual IS NOT NULL AND (SELECT mad FROM mad) > 0
            THEN ROUND((residual - (SELECT med FROM med))
              / (1.4826 * (SELECT mad FROM mad)), 6) END AS robust_z
        FROM dec)
      SELECT t, y, residual, robust_z,
        CASE WHEN robust_z IS NOT NULL THEN ABS(robust_z) > 3.0 END
          AS is_anomaly
      FROM z ORDER BY t"""))

  /** Cross-correlation at lags −5..5 between daily volume and daily mean
    * value (Stats.crossCorrByLag): does one metric LEAD the other? The
    * lead/lag completion of q185's self-paired ACF. */
  val q243CrossCorr = QueryDef(
    "q243_cross_corr", {
      (s, d) => graft.ops.Stats.crossCorrByLag(
        Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
          .agg(count(lit(1)).cast("double").as("x"),
            round(sum(col("value").cast("decimal(28,8)")).cast("double")
              / count(lit(1)), 6).as("y")),
        col("day"), col("x"), col("y"), maxLag = 5)
    },
    Some {
      val branches = (-5 to 5).map { k =>
        val prod =
          if (k > 0) s"dx * ly$k" else if (k < 0) s"dy * lx${-k}"
          else "dx * dy"
        s"SELECT $k AS lag, $prod AS prod FROM l"
      }.mkString(" UNION ALL ")
      val leads = (1 to 5).map(k =>
        s"LEAD(dy, $k) OVER w AS ly$k, LEAD(dx, $k) OVER w AS lx$k")
        .mkString(", ")
      s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS t,
          CAST(COUNT(*) AS DOUBLE) AS x,
          ROUND(CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE)
            / COUNT(*), 6) AS y
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      m AS (SELECT
          CAST(SUM(CAST(x AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*) AS mx,
          CAST(SUM(CAST(y AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*) AS my
        FROM daily),
      d AS (SELECT t, x - mx AS dx, y - my AS dy FROM daily, m),
      den AS (SELECT SQRT(
          CAST(SUM(CAST(ROUND(dx * dx, 8) AS DECIMAL(28,8))) AS DOUBLE)
          * CAST(SUM(CAST(ROUND(dy * dy, 8) AS DECIMAL(28,8))) AS DOUBLE))
          AS denom FROM d),
      l AS (SELECT t, dx, dy, $leads FROM d WINDOW w AS (ORDER BY t)),
      terms AS ($branches),
      g AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          ROUND(CAST(SUM(CAST(ROUND(prod, 8) AS DECIMAL(28,8))) AS DOUBLE)
            / (SELECT denom FROM den), 6) AS ccf
        FROM terms WHERE prod IS NOT NULL
        GROUP BY lag),
      axis AS (SELECT CAST(range AS INTEGER) AS lag FROM range(-5, 6))
      SELECT axis.lag, COALESCE(n_pairs, 0) AS n_pairs, ccf
      FROM axis LEFT JOIN g ON axis.lag = g.lag ORDER BY axis.lag"""
    })

  /** Holt one-step-ahead backtest (forecast_t = level_{t−1} + trend_{t−1}
    * on q196's smoother): MAPE + RMSE over the daily volume curve — the
    * "is the forecast any good" accuracy card that has to accompany a
    * forecasting operator. One summary row. */
  val q244HoltBacktest = QueryDef(
    "q244_holt_backtest",
    (s, d) => {
      def nzd(c: Column) = when(c =!= 0.0, c)
      val sm = graft.ops.TimeSeries.holtSmooth(
        Tables.events(s, d).groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).cast("double").as("y")),
        col("day"), col("y"), alpha = 0.5, beta = 0.3)
      val w = org.apache.spark.sql.expressions.Window.orderBy("t")
      sm.withColumn("__f",
          lag(col("level"), 1).over(w) + lag(col("trend"), 1).over(w))
        .filter(col("__f").isNotNull && col("y") =!= 0.0)
        .agg(
          count(lit(1)).as("n_forecasts"),
          round(sum(round(abs(col("y") - col("__f")) / abs(col("y")), 8)
              .cast("decimal(38,8)")).cast("double")
            / nzd(count(lit(1)).cast("double")), 6).as("mape"),
          round(sqrt(sum(round((col("y") - col("__f"))
              * (col("y") - col("__f")), 8).cast("decimal(38,8)"))
              .cast("double") / nzd(count(lit(1)).cast("double"))), 6)
            .as("rmse"))
    },
    Some("""WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS t,
          CAST(COUNT(*) AS DOUBLE) AS y FROM events
        WHERE ts IS NOT NULL GROUP BY 1),
      l AS (SELECT t, y, list(y) OVER (ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vs FROM daily),
      f AS (SELECT t, y, list_reduce(
          list_prepend([vs[1], 0.0], list_transform(vs[2:], v -> [v, 0.0])),
          (acc, x) -> [x[1] * 0.5 + (acc[1] + acc[2]) * 0.5,
            ((x[1] * 0.5 + (acc[1] + acc[2]) * 0.5) - acc[1]) * 0.3
              + acc[2] * 0.7]) AS st
        FROM l),
      r AS (SELECT t, y, ROUND(st[1], 6) AS level, ROUND(st[2], 6) AS trend
        FROM f),
      fc AS (SELECT t, y, LAG(level) OVER (ORDER BY t)
          + LAG(trend) OVER (ORDER BY t) AS fcst FROM r),
      a AS (SELECT y, fcst FROM fc WHERE fcst IS NOT NULL AND y != 0)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_forecasts,
        ROUND(CAST(SUM(CAST(ROUND(ABS(y - fcst) / ABS(y), 8)
          AS DECIMAL(38,8))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
          AS mape,
        ROUND(SQRT(CAST(SUM(CAST(ROUND((y - fcst) * (y - fcst), 8)
          AS DECIMAL(38,8))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)), 6)
          AS rmse
      FROM a"""))

  /** Q–Q comparison table of doc length, English vs non-English: both
    * distributions at the 19 vigintiles plus the per-quantile gap — the
    * "where exactly do the distributions diverge" view that a single KS
    * statistic (q149) summarizes away. Two 1-row exact-percentile frames,
    * zipped; everything report-sized. */
  val q247QqTable = QueryDef(
    "q247_qq_table",
    (s, d) => {
      val docs = Tables.documents(s, d).filter(col("n_chars").isNotNull)
      val qs = (1 until 20).map(_.toDouble / 20)
      def side(f: Column): DataFrame = docs.filter(f)
        .agg(percentile(col("n_chars").cast("double"), typedlit(qs)))
      val a = side(col("lang") === "en").toDF("qa")
      val b = side(col("lang") =!= "en").toDF("qb")
      a.crossJoin(broadcast(b))
        .select(posexplode(arrays_zip(col("qa"), col("qb")))
          .as(Seq("i", "z")))
        .select(
          round((col("i") + 1) * 0.05, 2).as("q"),
          round(col("z.qa"), 6).as("q_a"),
          round(col("z.qb"), 6).as("q_b"),
          round(col("z.qa") - col("z.qb"), 6).as("diff"))
        .orderBy("q")
    },
    Some("""WITH a AS (SELECT quantile_cont(CAST(n_chars AS DOUBLE),
          [0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5, 0.55,
           0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95]) AS qa
        FROM documents WHERE n_chars IS NOT NULL AND lang = 'en'),
      b AS (SELECT quantile_cont(CAST(n_chars AS DOUBLE),
          [0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5, 0.55,
           0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95]) AS qb
        FROM documents WHERE n_chars IS NOT NULL AND lang != 'en'),
      z AS (SELECT unnest(range(19)) AS i,
          unnest((SELECT qa FROM a)) AS qa,
          unnest((SELECT qb FROM b)) AS qb)
      SELECT CAST(ROUND((i + 1) * 0.05, 2) AS DOUBLE) AS q,
        ROUND(qa, 6) AS q_a,
        ROUND(qb, 6) AS q_b, ROUND(qa - qb, 6) AS diff
      FROM z ORDER BY q"""))

  /** Distributed exact ECDF of order value (Drift.ecdfTable): the
    * percentile-rank transform on the range-partitioned prefix-sum
    * scaffold — no global sort, ≤#partitions driver barrier. The oracle
    * replays it as a cumulative window, so every prefix sum and offset
    * must line up exactly. */
  val q250Ecdf = QueryDef(
    "q250_ecdf",
    (s, d) => graft.ops.Drift.ecdfTable(Tables.orders(s, d),
      col("o_totalprice")),
    Some("""WITH c AS (SELECT CAST(o_totalprice AS DOUBLE) AS v,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
      s AS (SELECT v, c,
          CAST(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW) AS BIGINT) AS cum,
          CAST(SUM(c) OVER () AS BIGINT) AS n FROM c)
      SELECT v AS value, c AS n_rows,
        ROUND(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ecdf
      FROM s ORDER BY value"""))

  /** Exact equi-depth histogram of extended price, 10 buckets
    * (Drift.equiDepthHistogram): the optimizer-statistics / binning
    * primitive on the q250 ECDF scaffold — integer-exact bucket cuts
    * ((cum·k + n − 1) DIV n), ties never split, no global window. */
  val q253EquiDepth = QueryDef(
    "q253_equi_depth",
    (s, d) => graft.ops.Drift.equiDepthHistogram(Tables.lineitem(s, d),
      col("l_extendedprice"), nBuckets = 10),
    Some("""WITH h AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
      t AS (SELECT v, c,
          CAST(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW) AS BIGINT) AS cum,
          CAST(SUM(c) OVER () AS BIGINT) AS n FROM h)
      SELECT CAST((cum * 10 + n - 1) // n AS INTEGER) AS bucket,
        MIN(v) AS lo, MAX(v) AS hi, CAST(SUM(c) AS BIGINT) AS n_rows
      FROM t GROUP BY 1 ORDER BY bucket"""))

  /** Per-event-type OLS trend of daily volume (TimeSeries.olsByGroup):
    * which segment is growing, how fast, and how well a line fits —
    * slope/intercept/r2 per type from one keyed decimal-moment
    * aggregation (the classical per-segment companion to q241's robust
    * Theil-Sen slopes). */
  val q254OlsByType = QueryDef(
    "q254_ols_by_type",
    (s, d) => graft.ops.TimeSeries.olsByGroup(
      Tables.events(s, d).filter(col("ts").isNotNull)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).cast("double").as("y")),
      "event_type", col("day"), col("y")),
    Some("""WITH daily AS (SELECT event_type AS g,
          CAST(epoch_us(ts) // 86400000000 AS DOUBLE) AS t,
          CAST(COUNT(*) AS DOUBLE) AS y
        FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, epoch_us(ts) // 86400000000),
      m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(t AS DECIMAL(38,8))) AS DOUBLE) AS st,
          CAST(SUM(CAST(y AS DECIMAL(38,8))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(t * t AS DECIMAL(38,8))) AS DOUBLE) AS stt,
          CAST(SUM(CAST(t * y AS DECIMAL(38,8))) AS DOUBLE) AS sty,
          CAST(SUM(CAST(y * y AS DECIMAL(38,8))) AS DOUBLE) AS syy
        FROM daily GROUP BY 1),
      c AS (SELECT g, n, CAST(n AS DOUBLE) AS nd, st, sy,
          CAST(n AS DOUBLE) * stt - st * st AS sttc,
          CAST(n AS DOUBLE) * syy - sy * sy AS syyc,
          CAST(n AS DOUBLE) * sty - st * sy AS cov
        FROM m)
      SELECT g AS event_type, n,
        CASE WHEN n >= 2 AND sttc > 0
          THEN ROUND(cov / sttc, 6) END AS slope,
        CASE WHEN n >= 2 AND sttc > 0
          THEN ROUND((sy - (cov / sttc) * st) / nd, 6) END AS intercept,
        CASE WHEN n >= 2 AND sttc > 0 AND syyc > 0
          THEN ROUND(cov * cov / (sttc * syyc), 6) END AS r2
      FROM c ORDER BY event_type"""))

  /** Broken trend of the daily event volume (TimeSeries.brokenTrend):
    * CUSUM-split the series at the q194 changepoint, OLS-fit each side —
    * slope before vs after the break in one row. */
  val q260BrokenTrend = QueryDef(
    "q260_broken_trend",
    (s, d) => graft.ops.TimeSeries.brokenTrend(
      Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).cast("double").as("y")),
      col("day"), col("y")),
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS t,
          CAST(COUNT(*) AS DOUBLE) AS y FROM events
        WHERE ts IS NOT NULL GROUP BY 1),
      b AS (SELECT t, y, CAST(y * 1000000 AS HUGEINT) AS y6 FROM daily),
      s AS (SELECT t, y6,
          COUNT(*) OVER () AS cn, SUM(y6) OVER () AS sa,
          SUM(y6) OVER (ORDER BY t) AS p,
          ROW_NUMBER() OVER (ORDER BY t) AS i FROM b),
      sp AS (SELECT t AS tsplit FROM
        (SELECT t, cn * p - i * sa AS numer FROM s)
        ORDER BY ABS(numer) DESC, t LIMIT 1),
      tagged AS (SELECT CASE WHEN t <= (SELECT tsplit FROM sp)
            THEN 'before' ELSE 'after' END AS g,
          CAST(t AS DOUBLE) AS t, y FROM daily),
      m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(t AS DECIMAL(38,8))) AS DOUBLE) AS st,
          CAST(SUM(CAST(y AS DECIMAL(38,8))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(t * t AS DECIMAL(38,8))) AS DOUBLE) AS stt,
          CAST(SUM(CAST(t * y AS DECIMAL(38,8))) AS DOUBLE) AS sty,
          CAST(SUM(CAST(y * y AS DECIMAL(38,8))) AS DOUBLE) AS syy
        FROM tagged GROUP BY 1),
      c AS (SELECT g, n,
          CAST(n AS DOUBLE) * stt - st * st AS sttc,
          CAST(n AS DOUBLE) * syy - sy * sy AS syyc,
          CAST(n AS DOUBLE) * sty - st * sy AS cov
        FROM m),
      f AS (SELECT g, n,
          CASE WHEN n >= 2 AND sttc > 0
            THEN ROUND(cov / sttc, 6) END AS slope,
          CASE WHEN n >= 2 AND sttc > 0 AND syyc > 0
            THEN ROUND(cov * cov / (sttc * syyc), 6) END AS r2
        FROM c)
      SELECT (SELECT tsplit FROM sp) AS t_split,
        COALESCE(MAX(CASE WHEN g = 'before' THEN n END), 0) AS n_before,
        COALESCE(MAX(CASE WHEN g = 'after' THEN n END), 0) AS n_after,
        MAX(CASE WHEN g = 'before' THEN slope END) AS slope_before,
        MAX(CASE WHEN g = 'after' THEN slope END) AS slope_after,
        ROUND(MAX(CASE WHEN g = 'after' THEN slope END)
          - MAX(CASE WHEN g = 'before' THEN slope END), 6) AS slope_delta,
        MAX(CASE WHEN g = 'before' THEN r2 END) AS r2_before,
        MAX(CASE WHEN g = 'after' THEN r2 END) AS r2_after
      FROM f"""))

  override val defs: Seq[QueryDef] = Seq(
    q144PsiDrift, q145RollingWindow, q146Novelty, q147Attribution,
    q148JsdSources, q149KsDrift, q153PsiTimeline, q154RollingAnomaly,
    q165PsiCategorical, q172PsiVsReference, q173PsiMulti, q175Contract,
    q186Wasserstein, q193Seasonal, q194Cusum, q196Holt, q197VocabJaccard,
    q204Cvm, q215TheilSen, q216MannKendall, q218KendallTau, q220SloBurn,
    q228DurbinWatson, q229OlsInfluence, q235LeaderboardChurn,
    q237QuantileBands, q241TheilSenByType, q242SeasonalAnomaly,
    q243CrossCorr, q244HoltBacktest, q247QqTable, q250Ecdf,
    q253EquiDepth, q254OlsByType, q260BrokenTrend)
}
