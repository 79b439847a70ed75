package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Aggregates, Dedup, GeoOps, TextOps}
import graft.enrich.CityProximity

/** Join operators (SURVEY §2.3 J1-J8) + set ops (§2.6).
  *
  * Scale notes baked into the plans: the dim side of every equi join here is
  * broadcast (customer/orders at these SFs; at 100 TB the same hint holds for
  * genuine dimension tables); the 10-city theta join is a broadcast
  * nested-loop whose inner side is 10 rows — the big side never shuffles.
  */
object JoinQueries extends QueryGroup {

  import Aggregates.{decAvg, decSum}

  /** J6: 3-way equi join + groupBy revenue. */
  val q16Join3Revenue = QueryDef(
    "q16_join3_revenue",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(28,6)"))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_lines
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** J1/J3: anti join — customers with no high-value order (every customer
    * has SOME order in the test data, so the anti side is a filtered set). */
  val q17AntiJoin = QueryDef(
    "q17_anti_join",
    (s, d) => Tables.customer(s, d)
      .join(
        Tables.orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
      .orderBy("c_mktsegment"),
    Some("""SELECT c_mktsegment, COUNT(*) AS cnt FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST"""))

  /** J2: semi join — customers with at least one high-value order. */
  val q18SemiJoin = QueryDef(
    "q18_semi_join",
    (s, d) => Tables.customer(s, d)
      .join(
        Tables.orders(s, d).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
      .orderBy("c_mktsegment"),
    Some("""SELECT c_mktsegment, COUNT(*) AS cnt FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** J5/F20/F21/W3: Mercator-distance theta join against the 10-city dim with
    * keep-first-city assignment. Coordinates synthesized deterministically
    * from the customer key (the test tables have no lat/lon). */
  val q19GeoThetaJoin = QueryDef(
    "q19_geo_theta_join",
    (s, d) => {
      val pts = Tables.customer(s, d)
        .withColumn("lat", lit(50.0) + (col("c_custkey") % 140).cast("double") / 100.0)
        .withColumn("lon", lit(3.0) + (col("c_custkey") % 250).cast("double") / 100.0)
      CityProximity.assignCity(pts, "c_custkey", "lat", "lon", 15.0)
        .groupBy("city").agg(count(lit(1)).as("cnt"))
        .orderBy("city")
    },
    Some {
      val cityValues = CityProximity.Cities
        .map { case (i, n, la, lo) => s"($i, '$n', $la, $lo)" }.mkString(", ")
      """WITH pts AS (
        SELECT c_custkey, 50.0 + CAST(c_custkey % 140 AS DOUBLE) / 100.0 AS lat,
               3.0 + CAST(c_custkey % 250 AS DOUBLE) / 100.0 AS lon FROM customer),
      cities(city_index, city, city_lat, city_lon) AS (VALUES """ + cityValues + """),
      joined AS (
        SELECT c_custkey, city, city_index,
          ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY city_index) AS rn
        FROM pts JOIN cities ON
          sqrt(pow(radians(lon) * 6378137.0 - radians(city_lon) * 6378137.0, 2) +
               pow(ln(tan(pi() / 4 + radians(lat) / 2)) * 6378137.0 -
                   ln(tan(pi() / 4 + radians(city_lat) / 2)) * 6378137.0, 2)) <= 15000.0)
      SELECT city, COUNT(*) AS cnt FROM joined WHERE rn = 1
      GROUP BY city ORDER BY city"""
    })

  /** J8: remap-with-fallback (pandas .map(m).fillna(col)) as a when-chain. */
  val q20RemapFallback = QueryDef(
    "q20_remap_fallback",
    (s, d) => Tables.orders(s, d)
      .withColumn("prio",
        TextOps.remapWithFallback(col("o_orderpriority"),
          Map("1-URGENT" -> "URGENT", "2-HIGH" -> "HIGH")))
      .groupBy("prio").agg(count(lit(1)).as("cnt"))
      .orderBy("prio"),
    Some("""SELECT (CASE o_orderpriority WHEN '1-URGENT' THEN 'URGENT'
        WHEN '2-HIGH' THEN 'HIGH' ELSE o_orderpriority END) AS prio,
      COUNT(*) AS cnt FROM orders GROUP BY prio ORDER BY prio NULLS FIRST"""))

  /** §2.6: intersect / except / union-distinct over key sets. */
  val q24SetOps = QueryDef(
    "q24_set_ops",
    (s, d) => {
      val cust = Tables.customer(s, d).select(col("c_custkey").as("k"))
      val ord = Tables.orders(s, d).select(col("o_custkey").as("k"))
      val nBoth = cust.intersect(ord).agg(count(lit(1)).as("n_both"))
      val nCustOnly = cust.except(ord).agg(count(lit(1)).as("n_cust_only"))
      val nUnion = cust.union(ord).distinct().agg(count(lit(1)).as("n_union"))
      nBoth.crossJoin(nCustOnly).crossJoin(nUnion)
    },
    Some("""SELECT
      (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)) AS n_both,
      (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)) AS n_cust_only,
      (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer UNION SELECT o_custkey FROM orders)) AS n_union"""))

  /** J4: broadcast map-lookup join (the geocode-cache pattern) — inline
    * key→value dim joined onto normalized keys, misses stay null. */
  val q25CacheLookup = QueryDef(
    "q25_cache_lookup",
    (s, d) => {
      import s.implicits._
      val cache = Seq(
        ("nation_0", 50.85, 4.35), ("nation_1", 51.22, 4.40),
        ("nation_2", 51.05, 3.72), ("nation_17", 50.63, 5.33))
        .toDF("norm_name", "lat", "lon")
      Tables.nation(s, d)
        .withColumn("norm_name", TextOps.normalizeAddress(col("n_name")))
        .join(broadcast(cache), Seq("norm_name"), "left")
        .select(col("n_nationkey"), col("norm_name"),
          col("lat"), col("lon"),
          col("lat").isNotNull.cast("int").as("cache_hit"))
        .orderBy("n_nationkey")
    },
    Some("""WITH cache(norm_name, lat, lon) AS (VALUES
        ('nation_0', 50.85, 4.35), ('nation_1', 51.22, 4.40),
        ('nation_2', 51.05, 3.72), ('nation_17', 50.63, 5.33))
      SELECT n_nationkey,
        regexp_replace(lower(trim(n_name)), '\s+', ' ', 'g') AS norm_name,
        CAST(lat AS DOUBLE) AS lat, CAST(lon AS DOUBLE) AS lon,
        CAST(lat IS NOT NULL AS INT) AS cache_hit
      FROM nation LEFT JOIN cache ON
        regexp_replace(lower(trim(n_name)), '\s+', ' ', 'g') = cache.norm_name
      ORDER BY n_nationkey"""))

  /** MERGE INTO emulation (ops/Merge.scala): one full-outer equi join
    * applies updates (matched, source wins), deletes (matched + predicate)
    * and inserts (source-only) in a single shuffle. Source is derived
    * deterministically from customer itself: custkey%3==0 rows are updates
    * (+1000 acctbal; the %15==0 subset is tagged for delete), custkey%7==0
    * rows re-keyed +1_000_000 are inserts. */
  val q132MergeUpsert = QueryDef(
    "q132_merge_upsert",
    (s, d) => {
      import graft.ops.Merge
      val c = Tables.customer(s, d)
      val updates = c.filter(col("c_custkey") % 3 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 1000.0)
        .withColumn("c_mktsegment",
          when(col("c_custkey") % 15 === 0, lit("__DELETE__"))
            .otherwise(col("c_mktsegment")))
      val inserts = c.filter(col("c_custkey") % 7 === 0)
        .withColumn("c_custkey", col("c_custkey") + 1000000L)
        .withColumn("c_acctbal", lit(0.0))
        .withColumn("c_mktsegment", lit("NEW"))
      Merge.merge(c, updates.unionByName(inserts), Seq("c_custkey"),
          deleteWhen = Merge.s("c_mktsegment") === "__DELETE__")
        .orderBy("c_custkey")
    },
    Some("""WITH src AS (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000.0 AS c_acctbal,
          CASE WHEN c_custkey % 15 = 0 THEN '__DELETE__' ELSE c_mktsegment END
            AS c_mktsegment
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey + 1000000, c_name, c_nationkey, 0.0, 'NEW'
        FROM customer WHERE c_custkey % 7 = 0)
      SELECT
        COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
        CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
        CASE WHEN s.c_custkey IS NOT NULL THEN s.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
        CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
        CASE WHEN s.c_custkey IS NOT NULL THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
      FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
      WHERE NOT (t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
                 AND COALESCE(s.c_mktsegment = '__DELETE__', FALSE))
      ORDER BY c_custkey"""))

  /** Entity resolution (ops/EntityMatch.scala): fuzzy-match a "dirty"
    * customer list (even custkeys get their name's last char corrupted to
    * '~') back to the clean list. Blocking on the 16-char prefix keeps
    * blocks at ≤100 names at any SF (the 2 stripped digits bound the block)
    * so the levenshtein scoring never goes quadratic in |customer|. The
    * near-identical name space makes dist-1 ties inherent; bestMatch's
    * (dist, r_key) ordering resolves them deterministically. */
  val q134FuzzyMatch = QueryDef(
    "q134_fuzzy_match",
    (s, d) => {
      import graft.ops.EntityMatch
      val clean = Tables.customer(s, d)
      val dirty = clean.select(col("c_custkey"),
        when(col("c_custkey") % 2 === 0,
          concat(substring(col("c_name"), 1, 17), lit("~")))
          .otherwise(col("c_name")).as("dirty_name"))
      EntityMatch.bestMatch(dirty, clean,
          "c_custkey", "dirty_name", "c_custkey", "c_name",
          t => substring(t, 1, 16), maxDist = 2)
        .orderBy("l_key")
    },
    Some("""WITH dirty AS (
        SELECT c_custkey AS l_key,
          CASE WHEN c_custkey % 2 = 0 THEN substr(c_name, 1, 17) || '~'
               ELSE c_name END AS l_text
        FROM customer),
      pairs AS (
        SELECT l_key, c_custkey AS r_key, levenshtein(l_text, c_name) AS dist
        FROM dirty JOIN customer ON substr(l_text, 1, 16) = substr(c_name, 1, 16)
        WHERE levenshtein(l_text, c_name) <= 2)
      SELECT l_key, r_key, dist FROM pairs
      QUALIFY row_number() OVER (PARTITION BY l_key ORDER BY dist, r_key) = 1
      ORDER BY l_key"""))

  /** Entity resolution with the Jaro–Winkler scorer
    * (EntityMatch.bestMatchJaroWinkler + the codegen JaroWinkler
    * expression): same dirty-name setup as q134, but similarity-scored —
    * the prefix boost keeps a last-char corruption at ≥0.95 while
    * Levenshtein treats it like any other edit. Blocking identical to
    * q134 (16-char prefix); the oracle replays DuckDB's NATIVE
    * jaro_winkler_similarity inside the same blocked join. */
  val q192JwMatch = QueryDef(
    "q192_jw_match",
    (s, d) => {
      import graft.ops.EntityMatch
      val clean = Tables.customer(s, d)
      val dirty = clean.select(col("c_custkey"),
        when(col("c_custkey") % 2 === 0,
          concat(substring(col("c_name"), 1, 17), lit("~")))
          .otherwise(col("c_name")).as("dirty_name"))
      EntityMatch.bestMatchJaroWinkler(dirty, clean,
          "c_custkey", "dirty_name", "c_custkey", "c_name",
          t => substring(t, 1, 16), minSim = 0.9)
        .orderBy("l_key")
    },
    Some("""WITH dirty AS (
        SELECT c_custkey AS l_key,
          CASE WHEN c_custkey % 2 = 0 THEN substr(c_name, 1, 17) || '~'
               ELSE c_name END AS l_text
        FROM customer),
      pairs AS (
        SELECT l_key, c_custkey AS r_key,
          ROUND(jaro_winkler_similarity(l_text, c_name), 6) AS sim
        FROM dirty JOIN customer ON substr(l_text, 1, 16) = substr(c_name, 1, 16)
        WHERE ROUND(jaro_winkler_similarity(l_text, c_name), 6) >= 0.9)
      SELECT l_key, r_key, sim FROM pairs
      QUALIFY row_number() OVER (PARTITION BY l_key ORDER BY sim DESC, r_key) = 1
      ORDER BY l_key"""))

  /** TPC-H-Q5-style 6-table star: local-supplier revenue per nation
    * within one region — lineitem⋈orders on the fact keys, customer/
    * supplier/nation/region as BROADCAST dims, the c_nationkey =
    * s_nationkey local-supplier predicate applied post-join. The classic
    * Catalyst star-planning showcase: one fact-fact shuffle, every dim a
    * broadcast hash join, filters pushed to the dim scans. */
  val q211StarRevenue = QueryDef(
    "q211_star_revenue",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(
          round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(38,8)")).cast("double"), 6).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name,
        ROUND(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(38,8))) AS DOUBLE), 6) AS revenue,
        CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
      GROUP BY n_name ORDER BY n_name"""))

  /** Relational consistency audit of the orders↔lineitem contract: orphan
    * counts on both sides (FK integrity as data, not just a unit check)
    * and how many orders' header total disagrees with the recomputed
    * line total Σ round(extprice·(1+tax)·(1−disc), 4) — one summary row
    * (n_orders, n_orphan_orders, n_orphan_items, n_mismatch,
    * max_abs_diff). Per-line terms round-4 then DECIMAL-sum
    * (order-independent); the header comparison uses the round-4 diff so
    * the mismatch verdict is engine-stable. One join + one anti join,
    * both keyed on the order key. */
  val q238ConsistencyAudit = QueryDef(
    "q238_consistency_audit",
    (s, d) => {
      val orders = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val perOrder = li.groupBy(col("l_orderkey"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) + col("l_tax"))
            * (lit(1.0) - col("l_discount")), 4).cast("decimal(28,4)"))
          .cast("double").as("__computed"))
      val joined = orders.join(perOrder,
          orders("o_orderkey") === perOrder("l_orderkey"), "left")
        .withColumn("__diff",
          round(abs(col("o_totalprice") - col("__computed")), 4))
      val orphanItems = li.join(orders,
          li("l_orderkey") === orders("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_orphan_items"))
      joined.agg(
          count(lit(1)).as("n_orders"),
          count(when(col("__computed").isNull, 1)).as("n_orphan_orders"),
          count(when(col("__diff") > 0.01, 1)).as("n_mismatch"),
          round(coalesce(max(col("__diff")), lit(0.0)), 4)
            .as("max_abs_diff"))
        .crossJoin(broadcast(orphanItems))
        .select("n_orders", "n_orphan_orders", "n_orphan_items",
          "n_mismatch", "max_abs_diff")
    },
    Some("""WITH per AS (SELECT l_orderkey,
          CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 + l_tax)
            * (1.0 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE)
            AS computed
        FROM lineitem GROUP BY l_orderkey),
      j AS (SELECT o.o_orderkey, computed,
          ROUND(ABS(o.o_totalprice - computed), 4) AS diff
        FROM orders o LEFT JOIN per ON o.o_orderkey = per.l_orderkey),
      oi AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orphan_items
        FROM lineitem l LEFT JOIN orders o
          ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
        CAST(COUNT(*) FILTER (computed IS NULL) AS BIGINT)
          AS n_orphan_orders,
        (SELECT n_orphan_items FROM oi) AS n_orphan_items,
        CAST(COUNT(*) FILTER (diff > 0.01) AS BIGINT) AS n_mismatch,
        ROUND(COALESCE(MAX(diff), 0.0), 4) AS max_abs_diff
      FROM j"""))

  override val defs: Seq[QueryDef] = Seq(
    q16Join3Revenue, q17AntiJoin, q18SemiJoin, q19GeoThetaJoin,
    q20RemapFallback, q24SetOps, q25CacheLookup, q132MergeUpsert,
    q134FuzzyMatch, q192JwMatch, q211StarRevenue, q238ConsistencyAudit)
}
