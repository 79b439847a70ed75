package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{EventAnalytics, PageRank}

/** Event-stream analytics (resample+ffill, funnel, cohorts) and graph
  * centrality (PageRank) — the warehouse-side operators a training-data
  * pipeline leans on for activity signals and domain-authority weighting.
  */
object AnalyticsQueries extends QueryGroup {

  /** PageRank (ops/PageRank.scala) over the part↔supplier bipartite graph
    * from lineitem (both directions emitted, so no dangling nodes), 3
    * iterations, damping 0.85. Determinism: per-edge contributions round
    * to 12 decimals and sum as DECIMAL — the oracle unrolls the same 3
    * iterations in SQL and must match to the hash. */
  val q137PageRank = QueryDef(
    "q137_pagerank",
    (s, d) => {
      // r14 (guide §2.3, narrower types): the graph runs on LONG node ids
      // (part p → 2p, supplier s → 2s+1 — injective, so the distinct edge
      // set is 1:1 with the old string-keyed one) and the label strings are
      // minted only for the 20-row result. Rank arithmetic is key-type
      // independent (same n, deg, decimal contribution sums), so the output
      // is bit-identical to the string-keyed run — same oracle. The distinct
      // now shuffles two longs instead of two concat'd strings, and every
      // in-loop shuffle/broadcast carries 8-byte keys.
      val e0 = Tables.lineitem(s, d).select(
        col("l_partkey").cast("long").as("pk"),
        col("l_suppkey").cast("long").as("sk")).distinct()
      val edges = e0.select((col("pk") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        .union(e0.select((col("sk") * 2 + 1).as("src"), (col("pk") * 2).as("dst")))
      PageRank.run(edges, iterations = 3)
        .select(
          when(col("node") % 2 === 0, concat(lit("p"), shiftright(col("node"), 1)))
            .otherwise(concat(lit("s"), shiftright(col("node"), 1))).as("node"),
          round(col("rank"), 8).as("rank"))
        .orderBy(desc("rank"), col("node"))
        .limit(20)
    },
    Some("""WITH e0 AS (SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
          's' || CAST(l_suppkey AS VARCHAR) AS dst FROM lineitem),
      edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      nodes AS (SELECT DISTINCT node FROM
        (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
      nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
      deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
      r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
      c1 AS (SELECT e.dst AS node,
          CAST(ROUND(r.rank / d.deg, 12) AS DECIMAL(28,12)) AS c
        FROM edges e JOIN deg d ON e.src = d.src JOIN r0 r ON e.src = r.node),
      r1 AS (SELECT n.node, ROUND((1.0 - 0.85) / (SELECT n FROM nn)
          + 0.85 * COALESCE(CAST(s.m AS DOUBLE), 0.0), 12) AS rank
        FROM nodes n LEFT JOIN
          (SELECT node, SUM(c) AS m FROM c1 GROUP BY node) s ON n.node = s.node),
      c2 AS (SELECT e.dst AS node,
          CAST(ROUND(r.rank / d.deg, 12) AS DECIMAL(28,12)) AS c
        FROM edges e JOIN deg d ON e.src = d.src JOIN r1 r ON e.src = r.node),
      r2 AS (SELECT n.node, ROUND((1.0 - 0.85) / (SELECT n FROM nn)
          + 0.85 * COALESCE(CAST(s.m AS DOUBLE), 0.0), 12) AS rank
        FROM nodes n LEFT JOIN
          (SELECT node, SUM(c) AS m FROM c2 GROUP BY node) s ON n.node = s.node),
      c3 AS (SELECT e.dst AS node,
          CAST(ROUND(r.rank / d.deg, 12) AS DECIMAL(28,12)) AS c
        FROM edges e JOIN deg d ON e.src = d.src JOIN r2 r ON e.src = r.node),
      r3 AS (SELECT n.node, ROUND((1.0 - 0.85) / (SELECT n FROM nn)
          + 0.85 * COALESCE(CAST(s.m AS DOUBLE), 0.0), 12) AS rank
        FROM nodes n LEFT JOIN
          (SELECT node, SUM(c) AS m FROM c3 GROUP BY node) s ON n.node = s.node)
      SELECT node, ROUND(rank, 8) AS rank FROM r3
      ORDER BY rank DESC, node LIMIT 20"""))

  /** pandas resample('1h').max().ffill() distributed (ops/EventAnalytics):
    * hourly cells per user, dense grid between the user's first and last
    * cell, empty cells forward-filled. Buckets are epoch-second longs —
    * integer math end to end. The %20 user slice bounds verify output. */
  val q138ResampleFfill = QueryDef(
    "q138_resample_ffill",
    (s, d) => EventAnalytics.resampleFfill(
        Tables.events(s, d).filter(col("user_id") % 20 === 0),
        "user_id", "ts", "value", bucketSec = 3600L)
      .orderBy("user_id", "bucket"),
    Some("""WITH f AS (SELECT user_id, ts, value FROM events WHERE user_id % 20 = 0),
      cells AS (SELECT user_id, (epoch_us(ts) // 3600000000) * 3600 AS bucket,
          MAX(value) AS v
        FROM f GROUP BY 1, 2),
      grid AS (SELECT user_id, unnest(generate_series(mn, mx, 3600)) AS bucket
        FROM (SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx
              FROM cells GROUP BY 1))
      SELECT grid.user_id, grid.bucket, cells.v,
        last_value(cells.v IGNORE NULLS) OVER (
          PARTITION BY grid.user_id ORDER BY grid.bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
      FROM grid LEFT JOIN cells
        ON grid.user_id = cells.user_id AND grid.bucket = cells.bucket
      ORDER BY grid.user_id, grid.bucket"""))

  /** Ordered-step funnel view→click→purchase: step i counts only strictly
    * after step i-1 (min-qualifying-ts chaining); one report row per step
    * with entity counts and step-over-step conversion. */
  val q139Funnel = QueryDef(
    "q139_funnel",
    (s, d) => EventAnalytics.funnel(Tables.events(s, d),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .orderBy("step"),
    Some("""WITH t1 AS (SELECT user_id,
          MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
      t2 AS (SELECT e.user_id,
          MIN(CASE WHEN e.event_type = 'click' AND e.ts > t1.t1 THEN e.ts END) AS t2
        FROM events e JOIN t1 ON e.user_id = t1.user_id GROUP BY 1),
      t3 AS (SELECT e.user_id,
          MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > t2.t2 THEN e.ts END) AS t3
        FROM events e JOIN t2 ON e.user_id = t2.user_id GROUP BY 1),
      c AS (SELECT COUNT(*) AS nk,
          SUM(CASE WHEN t1.t1 IS NOT NULL THEN 1 ELSE 0 END) AS n1,
          SUM(CASE WHEN t2.t2 IS NOT NULL THEN 1 ELSE 0 END) AS n2,
          SUM(CASE WHEN t3.t3 IS NOT NULL THEN 1 ELSE 0 END) AS n3
        FROM t1 JOIN t2 ON t1.user_id = t2.user_id
                JOIN t3 ON t1.user_id = t3.user_id)
      SELECT * FROM (
        SELECT 1 AS step, 'view' AS event_type, CAST(n1 AS BIGINT) AS n_entities,
          ROUND(CAST(n1 AS DOUBLE) / nk, 6) AS conversion FROM c
        UNION ALL SELECT 2, 'click', CAST(n2 AS BIGINT),
          ROUND(CAST(n2 AS DOUBLE) / n1, 6) FROM c
        UNION ALL SELECT 3, 'purchase', CAST(n3 AS BIGINT),
          ROUND(CAST(n3 AS DOUBLE) / n2, 6) FROM c)
      ORDER BY step"""))

  /** Cohort retention matrix: cohort = first-activity epoch-week, offset =
    * activity week − cohort week, distinct entities per cell. */
  val q140Cohorts = QueryDef(
    "q140_cohorts",
    (s, d) => EventAnalytics.cohortRetention(Tables.events(s, d), "user_id", "ts")
      .orderBy("cohort_week", "offset_weeks"),
    Some("""WITH w AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      c AS (SELECT user_id, week,
          MIN(week) OVER (PARTITION BY user_id) AS cohort_week FROM w)
      SELECT cohort_week, week - cohort_week AS offset_weeks,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_entities
      FROM c GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Entity growth curve (EventAnalytics.growthCurve): per day — DAU, new
    * users (first-seen that day), cumulative users. Two keyed aggregations
    * over data; the prefix sum is a window over the ≤#days report table. */
  val q176GrowthCurve = QueryDef(
    "q176_growth_curve",
    (s, d) => EventAnalytics.growthCurve(Tables.events(s, d), "user_id", "ts"),
    Some("""WITH e AS (SELECT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
          user_id AS k FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      dau AS (SELECT day, CAST(COUNT(DISTINCT k) AS BIGINT) AS dau FROM e
        GROUP BY day),
      fs AS (SELECT k, MIN(day) AS day FROM e GROUP BY k),
      nw AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users FROM fs
        GROUP BY day)
      SELECT dau.day AS day, dau, COALESCE(new_users, 0) AS new_users,
        CAST(SUM(COALESCE(new_users, 0)) OVER (ORDER BY dau.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_users
      FROM dau LEFT JOIN nw ON dau.day = nw.day ORDER BY day"""))

  /** Market-basket lift over orders (Baskets.pairLift): top-20 part pairs
    * co-ordered more than independence predicts — support/confidence/lift
    * with the quadratic pair step keyed per order and capped by basket
    * size. Total-ordered after rounding so the cutoff is engine-stable. */
  val q189BasketLift = QueryDef(
    "q189_basket_lift",
    (s, d) => graft.ops.Baskets.pairLift(Tables.lineitem(s, d),
      col("l_orderkey"), col("l_partkey"), minCount = 2L, k = 20),
    Some("""WITH pres AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      bs AS (SELECT b FROM (SELECT b, COUNT(*) AS c FROM pres GROUP BY b) t
        WHERE c <= 1000),
      sized AS (SELECT pres.b, pres.i FROM pres JOIN bs USING (b)),
      n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM bs),
      sup AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n_i FROM sized GROUP BY i),
      pairs AS (SELECT a.i AS item_a, b2.i AS item_b,
          CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM sized a JOIN sized b2 USING (b) WHERE a.i < b2.i
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      j AS (SELECT item_a, item_b, n_ab, sa.n_i AS n_a, sb.n_i AS n_b, nd
        FROM pairs JOIN sup sa ON sa.i = pairs.item_a
          JOIN sup sb ON sb.i = pairs.item_b, n)
      SELECT item_a, item_b, n_ab, n_a, n_b,
        ROUND(CAST(n_ab AS DOUBLE) / nd, 6) AS support,
        ROUND(CAST(n_ab AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS confidence,
        ROUND(nd * CAST(n_ab AS DOUBLE)
          / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS lift
      FROM j ORDER BY lift DESC, item_a, item_b LIMIT 20"""))

  /** Triangle count of the co-order part graph (Graphs.triangleCount):
    * edges = part pairs co-ordered ≥2 times, counted once per triangle at
    * its lowest-(degree, id) corner — the arboricity-bounded wedge join,
    * never the node-ordered hub square. */
  val q198Triangles = QueryDef(
    "q198_triangles",
    (s, d) => {
      // r14: spread the one-split scan before the presence distinct and
      // the b-keyed wedge self-join (no-op on well-split inputs)
      val pres = graft.ops.Spread.forHeavyStage(
          Tables.lineitem(s, d)
            .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
            .select(col("l_orderkey").as("b"), col("l_partkey").as("i")),
          col("b"), col("i"))
        .distinct()
      val edges = pres.as("x").join(pres.as("y"), Seq("b"))
        .filter(col("x.i") < col("y.i"))
        .groupBy(col("x.i").as("u"), col("y.i").as("v"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)
      graft.ops.Graphs.triangleCount(edges, col("u"), col("v"))
    },
    Some("""WITH pres AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      e AS (SELECT x.i AS u, y.i AS v FROM pres x JOIN pres y USING (b)
        WHERE x.i < y.i GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      nodes AS (SELECT COUNT(*) AS n_nodes FROM
        (SELECT u AS n FROM e UNION SELECT v FROM e) t),
      tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
          JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
      SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
        n_triangles
      FROM nodes, tri"""))

  /** Bounded-round k-core peel (Graphs.kCorePeel) over the q198
    * co-purchase graph: 4 fixed rounds of "drop degree<3 nodes, then
    * orphaned edges", one (round, n_nodes, n_edges) row per round — the
    * community-structure screen (which parts survive the 3-core?) under
    * the same fixed-iteration determinism contract as the Lloyd and
    * power-iteration operators; the oracle chains the rounds CTE for
    * CTE. */
  val q278KCore = QueryDef(
    "q278_k_core",
    (s, d) => {
      // r14: spread the one-split scan before the presence distinct and
      // the b-keyed wedge self-join (no-op on well-split inputs)
      val pres = graft.ops.Spread.forHeavyStage(
          Tables.lineitem(s, d)
            .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
            .select(col("l_orderkey").as("b"), col("l_partkey").as("i")),
          col("b"), col("i"))
        .distinct()
      val edges = pres.as("x").join(pres.as("y"), Seq("b"))
        .filter(col("x.i") < col("y.i"))
        .groupBy(col("x.i").as("u"), col("y.i").as("v"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)
      graft.ops.Graphs.kCorePeel(edges, col("u"), col("v"), k = 3, rounds = 4)
        .orderBy("round")
    },
    Some {
      val peel = (1 to 4).map { r =>
        s"""k$r AS MATERIALIZED (SELECT n FROM (SELECT u AS n FROM e${r - 1}
              UNION ALL SELECT v FROM e${r - 1}) t
            GROUP BY n HAVING COUNT(*) >= 3),
          e$r AS MATERIALIZED (SELECT e.u, e.v FROM e${r - 1} e
            JOIN k$r a ON a.n = e.u JOIN k$r b2 ON b2.n = e.v)"""
      }.mkString(",\n      ")
      val rows = (1 to 4).map { r =>
        s"""SELECT CAST($r AS INT),
            (SELECT CAST(COUNT(*) AS BIGINT) FROM k$r),
            (SELECT CAST(COUNT(*) AS BIGINT) FROM e$r)"""
      }.mkString("\n        UNION ALL ")
      s"""WITH pres AS MATERIALIZED (SELECT DISTINCT l_orderkey AS b,
            l_partkey AS i FROM lineitem
          WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        e0 AS MATERIALIZED (SELECT x.i AS u, y.i AS v FROM pres x
          JOIN pres y USING (b) WHERE x.i < y.i
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        $peel
        SELECT * FROM (
          SELECT CAST(0 AS INT) AS round,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM
              (SELECT u AS n FROM e0 UNION SELECT v FROM e0) t) AS n_nodes,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM e0) AS n_edges
        UNION ALL $rows)
        ORDER BY round"""
    })

  /** RFM segmentation of users (EventAnalytics.rfm): recency/frequency/
    * monetary with deterministic NTILE(5) quintile scores (total order
    * with id tie-break) and the concatenated segment label. */
  val q202Rfm = QueryDef(
    "q202_rfm",
    (s, d) => EventAnalytics.rfm(Tables.events(s, d), "user_id", "ts",
      col("value"), col("event_type") === "purchase"),
    Some("""WITH per AS (SELECT user_id,
          MAX(epoch_us(ts)) AS last_us,
          CAST(COUNT(*) AS BIGINT) AS frequency,
          CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
            THEN CAST(value AS DECIMAL(28,6)) END), 0) AS DOUBLE) AS monetary
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      g AS (SELECT MAX(last_us) AS gmax FROM per),
      b AS (SELECT user_id,
          (gmax - last_us) // 86400000000 AS recency_days,
          frequency, monetary FROM per, g),
      sc AS (SELECT user_id, recency_days, frequency, monetary,
          CAST(NTILE(5) OVER (ORDER BY recency_days DESC, user_id)
            AS INTEGER) AS r,
          CAST(NTILE(5) OVER (ORDER BY frequency, user_id) AS INTEGER) AS f,
          CAST(NTILE(5) OVER (ORDER BY monetary, user_id) AS INTEGER) AS m
        FROM b)
      SELECT user_id, recency_days, frequency, monetary, r, f, m,
        CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR) AS rfm
      FROM sc ORDER BY user_id"""))

  /** View→purchase conversion latency (EventAnalytics.funnelLatency):
    * exact interpolated p50/p90 seconds from each user's first view to
    * their first subsequent purchase — the latency beside q139's counts. */
  val q203FunnelLatency = QueryDef(
    "q203_funnel_latency",
    (s, d) => EventAnalytics.funnelLatency(Tables.events(s, d), "user_id",
      "ts", "event_type", fromStep = "view", toStep = "purchase"),
    Some("""WITH ff AS (SELECT user_id, MIN(epoch_us(ts)) AS from_us
        FROM events WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY 1),
      ta AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS to_us,
          MIN(ff.from_us) AS from_us
        FROM events e JOIN ff USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts IS NOT NULL
          AND epoch_us(e.ts) > ff.from_us
        GROUP BY 1),
      d AS (SELECT CAST(to_us - from_us AS DOUBLE) / 1000000.0 AS delta_s
        FROM ta)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
        ROUND(quantile_cont(delta_s, 0.5), 6) AS p50_s,
        ROUND(quantile_cont(delta_s, 0.9), 6) AS p90_s
      FROM d"""))

  /** Inter-arrival fingerprint per event type
    * (EventAnalytics.interArrival): gap count / mean / CV / exact median
    * within each (type, user) stream — CV≈1 memoryless, ≪1 heartbeat,
    * ≫1 bursty. */
  val q205InterArrival = QueryDef(
    "q205_interarrival",
    (s, d) => EventAnalytics.interArrival(Tables.events(s, d), "user_id",
      "ts", "event_type", tieCol = "event_id"),
    Some("""WITH dd AS (SELECT event_type,
          epoch_us(ts) - LAG(epoch_us(ts)) OVER (
            PARTITION BY event_type, user_id ORDER BY ts, event_id) AS gap_us
        FROM events WHERE ts IS NOT NULL),
      g AS (SELECT event_type, CAST(gap_us AS DOUBLE) / 1000000.0 AS d
        FROM dd WHERE gap_us IS NOT NULL),
      a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
          CAST(SUM(CAST(d AS DECIMAL(38,12))) AS DOUBLE) AS s,
          CAST(SUM(CAST(d * d AS DECIMAL(38,12))) AS DOUBLE) AS s2,
          quantile_cont(d, 0.5) AS p50 FROM g GROUP BY 1)
      SELECT event_type, n_gaps,
        ROUND(s / CAST(n_gaps AS DOUBLE), 6) AS mean_s,
        CASE WHEN n_gaps >= 2 AND s / CAST(n_gaps AS DOUBLE) > 0
            AND (s2 - s * s / CAST(n_gaps AS DOUBLE))
              / (CAST(n_gaps AS DOUBLE) - 1) > 0
          THEN ROUND(SQRT((s2 - s * s / CAST(n_gaps AS DOUBLE))
            / (CAST(n_gaps AS DOUBLE) - 1))
            / (s / CAST(n_gaps AS DOUBLE)), 6) END AS cv,
        ROUND(p50, 6) AS p50_s
      FROM a ORDER BY event_type"""))

  /** Markov entropy rate of session flows
    * (EventAnalytics.markovEntropyRate): one number for "how predictable
    * are sessions" — the scalar roll-up of q161's transition matrix, with
    * ln(n_states) as the uniform ceiling. */
  val q206EntropyRate = QueryDef(
    "q206_entropy_rate",
    (s, d) => EventAnalytics.markovEntropyRate(Tables.events(s, d),
      "user_id", "ts", "event_type", tieCol = "event_id"),
    Some("""WITH seq AS (SELECT user_id, event_type,
          LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS prev
        FROM events),
      pairs AS (SELECT prev AS a, event_type AS b,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2),
      t AS (SELECT a, b, n,
          CAST(SUM(n) OVER () AS DOUBLE) AS ntot,
          CAST(SUM(n) OVER (PARTITION BY a) AS DOUBLE) AS na FROM pairs),
      terms AS (SELECT ROUND(-(na / ntot) * (CAST(n AS DOUBLE) / na)
            * LN(CAST(n AS DOUBLE) / na), 8) AS term,
          CAST(ntot AS BIGINT) AS ntr FROM t),
      k AS (SELECT CAST(COUNT(DISTINCT a) AS BIGINT) AS k FROM pairs)
      SELECT (SELECT MAX(ntr) FROM terms) AS n_transitions,
        (SELECT k FROM k) AS n_states,
        ROUND(CAST(SUM(CAST(term AS DECIMAL(28,8))) AS DOUBLE), 6)
          AS entropy_rate,
        (SELECT ROUND(LN(CAST(k AS DOUBLE)), 6) FROM k) AS max_entropy
      FROM terms"""))

  /** Directly-follows performance graph
    * (EventAnalytics.transitionLatency): per (prev→next) event-type edge,
    * count + mean + exact median gap seconds — q161's Markov structure
    * annotated with timing (the bottleneck-edge view). */
  val q213TransitionLatency = QueryDef(
    "q213_transition_latency",
    (s, d) => EventAnalytics.transitionLatency(Tables.events(s, d),
      "user_id", "ts", "event_type", tieCol = "event_id"),
    Some("""WITH g AS (SELECT event_type,
          LAG(event_type) OVER w AS prev_t,
          epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
        FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      d AS (SELECT prev_t AS prev_type, event_type AS next_type,
          CAST(gap_us AS DOUBLE) / 1000000.0 AS ds
        FROM g WHERE prev_t IS NOT NULL)
      SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n,
        ROUND(CAST(SUM(CAST(ds AS DECIMAL(38,12))) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE), 6) AS mean_s,
        ROUND(quantile_cont(ds, 0.5), 6) AS p50_s
      FROM d GROUP BY 1, 2 ORDER BY prev_type, next_type"""))

  /** Process-variant table (EventAnalytics.processVariants) over each
    * user's first five steps: which session openings dominate — the
    * behavioral-regression fingerprint a release dashboard watches. */
  val q214Variants = QueryDef(
    "q214_variants",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val first5 = Tables.events(s, d)
        .withColumn("__rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
        .filter(col("__rn") <= 5)
      EventAnalytics.processVariants(first5, "user_id", "ts", "event_type",
        tieCol = "event_id", k = 10)
    },
    Some("""WITH first5 AS (SELECT user_id, ts, event_id, event_type
        FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        QUALIFY row_number() OVER (PARTITION BY user_id
          ORDER BY ts, event_id) <= 5),
      seqs AS (SELECT user_id,
          string_agg(event_type, '>' ORDER BY ts, event_id) AS variant
        FROM first5 GROUP BY user_id)
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_subjects,
        CAST(len(string_split(variant, '>')) AS BIGINT) AS n_steps
      FROM seqs GROUP BY variant
      ORDER BY n_subjects DESC, variant LIMIT 10"""))

  /** HITS hubs & authorities (ops/Hits.scala) over the DIRECTED
    * part→supplier graph from lineitem, 2 iterations, L1-normalized:
    * parts score as hubs ("orders from good suppliers"), suppliers as
    * authorities. Top-10 per side; the oracle unrolls both iterations
    * with the same round-12/DECIMAL-sum contract as q137. */
  val q223Hits = QueryDef(
    "q223_hits",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // r14: long node ids through the iterations (the q137 treatment —
      // p → 2k, s → 2k+1, injective), labels minted only for the ≤20-row
      // report. Scores are key-type independent; same oracle. The rank
      // window tie-breaks on the LABEL, so the string is minted before it.
      val e0 = Tables.lineitem(s, d).select(
        col("l_partkey").cast("long").as("pk"),
        col("l_suppkey").cast("long").as("sk")).distinct()
      val edges = e0.select((col("pk") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
      val w = Window.partitionBy("side")
        .orderBy(col("score").desc, col("node"))
      graft.ops.Hits.run(edges, iterations = 2)
        .withColumn("node",
          when(col("node") % 2 === 0, concat(lit("p"), shiftright(col("node"), 1)))
            .otherwise(concat(lit("s"), shiftright(col("node"), 1))))
        .withColumn("score", round(col("score"), 8))
        .withColumn("rank", row_number().over(w).cast("bigint"))
        .filter(col("rank") <= 10)
        .select("side", "rank", "node", "score")
        .orderBy("side", "rank")
    },
    Some("""WITH e AS (SELECT DISTINCT
          'p' || CAST(l_partkey AS VARCHAR) AS src,
          's' || CAST(l_suppkey AS VARCHAR) AS dst FROM lineitem),
      h1r AS (SELECT src AS node,
          CAST(SUM(CAST(1.0 AS DECIMAL(28,12))) AS DOUBLE) AS h
        FROM e GROUP BY src),
      h1t AS (SELECT CAST(SUM(CAST(h AS DECIMAL(28,12))) AS DOUBLE) AS tot
        FROM h1r),
      h1 AS (SELECT node, ROUND(h / (SELECT tot FROM h1t), 12) AS h
        FROM h1r),
      a1r AS (SELECT e.dst AS node,
          CAST(SUM(CAST(h1.h AS DECIMAL(28,12))) AS DOUBLE) AS a
        FROM e JOIN h1 ON e.src = h1.node GROUP BY e.dst),
      a1t AS (SELECT CAST(SUM(CAST(a AS DECIMAL(28,12))) AS DOUBLE) AS tot
        FROM a1r),
      a1 AS (SELECT node, ROUND(a / (SELECT tot FROM a1t), 12) AS a
        FROM a1r),
      h2r AS (SELECT e.src AS node,
          CAST(SUM(CAST(a1.a AS DECIMAL(28,12))) AS DOUBLE) AS h
        FROM e JOIN a1 ON e.dst = a1.node GROUP BY e.src),
      h2t AS (SELECT CAST(SUM(CAST(h AS DECIMAL(28,12))) AS DOUBLE) AS tot
        FROM h2r),
      h2 AS (SELECT node, ROUND(h / (SELECT tot FROM h2t), 12) AS h
        FROM h2r),
      a2r AS (SELECT e.dst AS node,
          CAST(SUM(CAST(h2.h AS DECIMAL(28,12))) AS DOUBLE) AS a
        FROM e JOIN h2 ON e.src = h2.node GROUP BY e.dst),
      a2t AS (SELECT CAST(SUM(CAST(a AS DECIMAL(28,12))) AS DOUBLE) AS tot
        FROM a2r),
      a2 AS (SELECT node, ROUND(a / (SELECT tot FROM a2t), 12) AS a
        FROM a2r),
      stacked AS (
        SELECT 'hub' AS side, node, ROUND(h, 8) AS score FROM h2
        UNION ALL SELECT 'auth', node, ROUND(a, 8) FROM a2),
      r AS (SELECT side, node, score,
          CAST(ROW_NUMBER() OVER (PARTITION BY side
            ORDER BY score DESC, node) AS BIGINT) AS rank
        FROM stacked)
      SELECT side, rank, node, score FROM r
      WHERE rank <= 10 ORDER BY side, rank"""))

  /** Top-15 contiguous event-type trigrams with distinct-user support
    * (EventAnalytics.topSequences): the sequential-pattern step up from
    * q213's directly-follows pairs. One user-partitioned window + one
    * aggregation; TakeOrdered top-k. */
  val q224TopSequences = QueryDef(
    "q224_top_sequences",
    (s, d) => EventAnalytics.topSequences(Tables.events(s, d),
      "user_id", "ts", "event_type", tieCol = "event_id"),
    Some("""WITH g AS (SELECT user_id, event_type AS s1,
          LEAD(event_type, 1) OVER w AS s2,
          LEAD(event_type, 2) OVER w AS s3
        FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT s1, s2, s3, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_subjects
      FROM g WHERE s2 IS NOT NULL AND s3 IS NOT NULL
      GROUP BY s1, s2, s3
      ORDER BY n_occurrences DESC, s1, s2, s3 LIMIT 15"""))

  /** Audience overlap matrix across event types
    * (EventAnalytics.audienceOverlap): exact pairwise shared-user counts
    * + Jaccard, grid densified so zero-overlap pairs report 0. Keyed
    * self-join on the subject — per-subject C(k,2) fan-out, never a
    * subject cross-product. */
  val q227AudienceOverlap = QueryDef(
    "q227_audience_overlap",
    (s, d) => EventAnalytics.audienceOverlap(Tables.events(s, d),
      col("user_id"), col("event_type")),
    Some("""WITH p AS (SELECT DISTINCT user_id AS k, event_type AS c
          FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      pc AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY c),
      i AS (SELECT a.c AS cat_a, b.c AS cat_b,
          CAST(COUNT(*) AS BIGINT) AS n_both
        FROM p a JOIN p b ON a.k = b.k AND a.c < b.c GROUP BY 1, 2),
      g AS (SELECT a.c AS cat_a, b.c AS cat_b, a.n AS n_a, b.n AS n_b
        FROM pc a JOIN pc b ON a.c < b.c)
      SELECT cat_a, cat_b, n_a, n_b,
        COALESCE(n_both, 0) AS n_both,
        ROUND(CAST(COALESCE(n_both, 0) AS DOUBLE)
          / CAST(n_a + n_b - COALESCE(n_both, 0) AS DOUBLE), 6) AS jaccard
      FROM g LEFT JOIN i USING (cat_a, cat_b)
      ORDER BY cat_a, cat_b"""))

  /** Daily Herfindahl–Hirschman concentration of user activity: per day
    * HHI = Σ share² over users (1/n ≤ HHI ≤ 1) plus the 0-1 normalized
    * form — "is today's traffic a broad base or three whales". Squared
    * shares round-10 then DECIMAL-sum (order-independent); one combined
    * (day, user) count shuffle, per-day rollup. */
  val q239Hhi = QueryDef(
    "q239_hhi",
    (s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("ts").isNotNull && col("user_id").isNotNull)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"),
          col("user_id"))
        .agg(count(lit(1)).as("cnt"))
      val per = daily.groupBy("day")
        .agg(count(lit(1)).as("n_users"), sum(col("cnt")).as("__tot"))
      daily.join(per, Seq("day"))
        .withColumn("__sh",
          col("cnt").cast("double") / col("__tot").cast("double"))
        .groupBy(col("day"), col("n_users"))
        .agg(sum(round(col("__sh") * col("__sh"), 10)
          .cast("decimal(28,10)")).cast("double").as("__hhi"))
        .withColumn("hhi", round(col("__hhi"), 6))
        .withColumn("hhi_norm",
          when(col("n_users") > 1, round(
            (col("__hhi") - lit(1.0) / col("n_users").cast("double"))
              / (lit(1.0) - lit(1.0) / col("n_users").cast("double")), 6)))
        .select("day", "n_users", "hhi", "hhi_norm")
        .orderBy("day")
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        GROUP BY 1, 2),
      per AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_users,
          CAST(SUM(cnt) AS BIGINT) AS tot FROM daily GROUP BY day),
      h AS (SELECT daily.day, n_users,
          CAST(SUM(CAST(ROUND((CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
            * (CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)), 10)
            AS DECIMAL(28,10))) AS DOUBLE) AS hhi_raw
        FROM daily JOIN per USING (day) GROUP BY daily.day, n_users)
      SELECT day, n_users, ROUND(hhi_raw, 6) AS hhi,
        CASE WHEN n_users > 1 THEN ROUND(
          (hhi_raw - 1.0 / CAST(n_users AS DOUBLE))
            / (1.0 - 1.0 / CAST(n_users AS DOUBLE)), 6) END AS hhi_norm
      FROM h ORDER BY day"""))

  /** DAU / trailing-7-day WAU / stickiness per day: each (day, user)
    * presence is exploded to the 7 target days it supports, so the
    * rolling distinct count is two keyed shuffles — no per-day rescan, no
    * window-distinct (which Spark can't do) and no range self-join blowup.
    * Trailing days with no activity of their own are excluded (join on
    * the DAU day list). stickiness = dau/wau (the DAU/MAU cousin). */
  val q248Stickiness = QueryDef(
    "q248_stickiness",
    (s, d) => {
      val du = Tables.events(s, d)
        .filter(col("ts").isNotNull && col("user_id").isNotNull)
        .select(expr("unix_micros(ts) DIV 86400000000").as("day"),
          col("user_id")).distinct()
      val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = du
        .select(explode(sequence(col("day"), col("day") + 6)).as("day"),
          col("user_id"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("wau"))
      dau.join(wau, Seq("day"))
        .withColumn("stickiness", round(
          col("dau").cast("double") / col("wau").cast("double"), 6))
        .select("day", "dau", "wau", "stickiness")
        .orderBy("day")
    },
    Some("""WITH du AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
          user_id FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL),
      dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du
        GROUP BY day),
      wau AS (SELECT d.day,
          CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS wau
        FROM dau d JOIN du ON du.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day)
      SELECT day, dau, wau,
        ROUND(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 6) AS stickiness
      FROM dau JOIN wau USING (day) ORDER BY day"""))

  /** Inter-event regularity screen ("bot cadence detector"): per user the
    * coefficient of variation of inter-event gaps — humans are bursty
    * (CV ≈ 1 for Poisson arrivals), schedulers are metronomes (CV → 0).
    * Gap moments are DECIMAL-exact in µs (µs² products stay inside
    * DECIMAL(38)); one user-keyed window + one combined aggregation.
    * Flag: ≥ 20 gaps and CV < 0.1. */
  val q249BotCadence = QueryDef(
    "q249_bot_cadence",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      def nzd(c: Column) = when(c =!= 0.0, c)
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val gaps = Tables.events(s, d)
        .filter(col("ts").isNotNull && col("user_id").isNotNull)
        .withColumn("__gap",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .filter(col("__gap").isNotNull)
      val per = gaps.groupBy("user_id").agg(
        count(lit(1)).as("n_gaps"),
        sum(col("__gap").cast("decimal(38,0)")).cast("double").as("__s"),
        sum(col("__gap").cast("decimal(19,0)")
          * col("__gap").cast("decimal(19,0)")).cast("double").as("__s2"))
      val nD = col("n_gaps").cast("double")
      val mean = col("__s") / nzd(nD)
      val varG = greatest((col("__s2") - col("__s") * col("__s") / nzd(nD))
        / nzd(nD - 1), lit(0.0))
      per
        .withColumn("mean_gap_s", round(mean / 1000000.0, 6))
        .withColumn("cv",
          when(col("n_gaps") >= 2 && col("__s") > 0,
            round(sqrt(varG) / nzd(mean), 6)))
        .withColumn("is_regular",
          col("n_gaps") >= 20 && col("cv").isNotNull && col("cv") < 0.1)
        .select("user_id", "n_gaps", "mean_gap_s", "cv", "is_regular")
        .orderBy("user_id")
    },
    Some("""WITH g AS (SELECT user_id,
          epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS gap
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
      p AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
          CAST(SUM(CAST(gap AS DECIMAL(38,0))) AS DOUBLE) AS s,
          CAST(SUM(CAST(gap AS DECIMAL(19,0)) * CAST(gap AS DECIMAL(19,0)))
            AS DOUBLE) AS s2
        FROM g WHERE gap IS NOT NULL GROUP BY user_id),
      c AS (SELECT user_id, n_gaps, s,
          s / CAST(n_gaps AS DOUBLE) AS mean,
          GREATEST((s2 - s * s / CAST(n_gaps AS DOUBLE))
            / (CAST(n_gaps AS DOUBLE) - 1), 0.0) AS varg
        FROM p)
      SELECT user_id, n_gaps,
        ROUND(mean / 1000000.0, 6) AS mean_gap_s,
        CASE WHEN n_gaps >= 2 AND s > 0
          THEN ROUND(SQRT(varg) / mean, 6) END AS cv,
        n_gaps >= 20 AND (CASE WHEN n_gaps >= 2 AND s > 0
          THEN ROUND(SQRT(varg) / mean, 6) END) IS NOT NULL
          AND (CASE WHEN n_gaps >= 2 AND s > 0
          THEN ROUND(SQRT(varg) / mean, 6) END) < 0.1 AS is_regular
      FROM c ORDER BY user_id"""))

  /** Weekday × hour activity punch card: events per (dow, hour) cell with
    * the cell's share of all traffic — the classic seasonality heatmap
    * input. One combined aggregation; the share window runs over the
    * ≤168-cell report frame. Day 0 = Thursday (epoch day 0), matching
    * integer epoch-day arithmetic on both engines. */
  val q251PunchCard = QueryDef(
    "q251_punch_card",
    (s, d) => {
      val all = org.apache.spark.sql.expressions.Window
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      Tables.events(s, d).filter(col("ts").isNotNull)
        .groupBy(expr("(unix_micros(ts) DIV 86400000000) % 7").as("dow"),
          expr("(unix_micros(ts) DIV 3600000000) % 24").as("hour"))
        .agg(count(lit(1)).as("n"))
        .withColumn("share", round(
          col("n").cast("double") / sum(col("n")).over(all).cast("double"), 6))
        .select("dow", "hour", "n", "share")
        .orderBy("dow", "hour")
    },
    Some("""WITH c AS (SELECT (epoch_us(ts) // 86400000000) % 7 AS dow,
          (epoch_us(ts) // 3600000000) % 24 AS hour,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)
      SELECT dow, hour, n,
        ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE), 6)
          AS share
      FROM c ORDER BY dow, hour"""))

  /** 2-D skyline of the event stream (Skyline.skyline2d): the
    * Pareto-frontier events no other event beats on BOTH "earlier" and
    * "lower value" — distributed per-x min + range-partitioned exclusive
    * prefix min, never all-pairs; the oracle brute-forces dominance with
    * NOT EXISTS, so a pruning false negative/positive hash-mismatches. */
  val q256Skyline = QueryDef(
    "q256_skyline",
    (s, d) => graft.ops.Skyline.skyline2d(Tables.events(s, d),
      expr("unix_micros(ts)"), col("value")),
    Some("""WITH p AS (SELECT CAST(epoch_us(ts) AS DOUBLE) AS x,
          CAST(value AS DOUBLE) AS y, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2)
      SELECT x, y, n_rows FROM p a
      WHERE NOT EXISTS (SELECT 1 FROM p b
        WHERE b.x <= a.x AND b.y <= a.y AND (b.x < a.x OR b.y < a.y))
      ORDER BY x"""))

  override val defs: Seq[QueryDef] = Seq(
    q137PageRank, q138ResampleFfill, q139Funnel, q140Cohorts, q176GrowthCurve,
    q189BasketLift, q198Triangles, q278KCore, q202Rfm, q203FunnelLatency,
    q205InterArrival, q206EntropyRate, q213TransitionLatency, q214Variants,
    q223Hits, q224TopSequences, q227AudienceOverlap, q239Hhi,
    q248Stickiness, q249BotCadence, q251PunchCard, q256Skyline)
}
