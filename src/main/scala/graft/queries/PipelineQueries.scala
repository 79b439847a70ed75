package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{Preprocessing, Tables}
import graft.ingest.LinkState

/** End-to-end domain pipelines driven from the test tables (rows-only checks:
  * the multi-stage pipelines are not single-SQL-expressible).
  */
object PipelineQueries extends QueryGroup {

  /** The full immo preprocessing chain over an export-shaped frame derived
    * deterministically from the customer table. Exercises: keep-first dedup,
    * null-keeping filters, capitalize/title text ops, postal-length filter,
    * data-dependent prune, try_cast coercion, province range map, geocode
    * cache cascade, Mercator city proximity, subtype regroup, rare-category
    * remap, mode fill, target encoding, winsorize, bounds filter.
    */
  val q60ImmoPipeline = QueryDef(
    "q60_immo_pipeline",
    (s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d)
      val export = c.select(
        col("c_custkey").as("id"),
        concat(lit("city_"), col("c_nationkey"), lit(" (9000)")).as("locality_name"),
        concat(lit("9"), lpad((col("c_custkey") % 999).cast("string"), 3, "0"))
          .as("Postal_code"),
        when(col("c_custkey") % 41 === 0, lit(null))
          .otherwise((col("c_acctbal") * 100 + 150000).cast("string")).as("Price"),
        when(col("c_custkey") % 4 === 0, "VILLA")
          .when(col("c_custkey") % 4 === 1, "TOWN_HOUSE")
          .when(col("c_custkey") % 4 === 2, "DUPLEX").otherwise("HOUSE").as("Subtype"),
        when(col("c_custkey") % 37 === 0, "true").otherwise(lit(null).cast("string"))
          .as("sale_annuity"),
        // unique per row: keep-first dedup must be a no-op here — which row
        // survives a dup group depends on partition layout, and this query's
        // output must be stable across SPARK_GRAFT_CPUS settings (dup
        // semantics themselves are pinned by PreprocessingSpec's fixture)
        concat(lit("straat "), col("c_custkey")).as("street"),
        col("c_custkey").cast("string").as("number"),
        (lit(50.0) + (col("c_custkey") % 140).cast("double") / 100.0).cast("string")
          .as("latitude"),
        (lit(3.0) + (col("c_custkey") % 250).cast("double") / 100.0).cast("string")
          .as("longitude"),
        lit(null).cast("string").as("gardenSurface"),
        when(col("c_custkey") % 5 === 0, "NOT_INSTALLED").otherwise("INSTALLED")
          .as("Kitchen_type"),
        when(col("c_custkey") % 7 === 0, "TO_RESTORE").otherwise("GOOD")
          .as("State_of_building"),
        element_at(array(lit("A"), lit("B"), lit("C"), lit("D"), lit("A+"), lit("G")),
          (col("c_custkey") % 6 + 1).cast("int")).as("epc"),
        (col("c_custkey") % 400 + 50).cast("string").as("Living_area"))
        .withColumn("Furnished", lit(null).cast("boolean"))
      val cache = s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.enrich.Geocode.cacheSchema)
      // Subtype is consumed and dropped inside the chain (preprocessing.py:517)
      Preprocessing.run(export, cache)
        .groupBy("Province", "State_of_building")
        .agg(count(lit(1)).as("n"),
          round(avg(col("epc_encoded")), 2).as("avg_epc_encoded"),
          round(avg(col("State_of_building_encoded")), 2).as("avg_state_encoded"))
        .orderBy("Province", "State_of_building")
    },
    // An INDEPENDENT derivation, not a replay of the Spark plan: on this
    // fixture the geocode fill, city flags, stat fills, and winsorize clips
    // provably cannot change the grouped output (no nulls to fill; clips
    // happen after the encodings are learned; flags add columns only), so
    // the oracle reduces the chain to its output-relevant core — the
    // sale_annuity/Price filters, category cleanup + remaps, subtype
    // regroup + House filter, province range map, and the two target
    // encodings learned on the House-only frame.
    Some("""WITH base AS (SELECT
        c_custkey % 4 AS sub4,
        c_custkey % 37 AS ann37,
        CASE WHEN c_custkey % 41 = 0 THEN NULL
             ELSE c_acctbal * 100 + 150000 END AS price,
        CAST('9' || lpad(CAST(c_custkey % 999 AS VARCHAR), 3, '0') AS INT)
          AS postal,
        CASE WHEN c_custkey % 7 = 0 THEN 'To renovate' ELSE 'Good' END
          AS state,
        CASE CAST(c_custkey % 6 AS INT) WHEN 0 THEN 'A' WHEN 1 THEN 'B'
             WHEN 2 THEN 'C' WHEN 3 THEN 'D' WHEN 4 THEN 'A' ELSE 'F' END
          AS epc
      FROM customer),
      f AS (SELECT * FROM base
        WHERE ann37 <> 0 AND price IS NOT NULL AND sub4 <> 2),
      ee AS (SELECT epc, AVG(price) AS epc_encoded FROM f GROUP BY epc),
      es AS (SELECT state, AVG(price) AS st_encoded FROM f GROUP BY state),
      j AS (SELECT f.postal, f.state, e.epc_encoded, s2.st_encoded
        FROM f JOIN ee e USING (epc) JOIN es s2 USING (state))
      SELECT CASE WHEN postal >= 9000 AND postal < 10000 THEN 'East Flanders'
             WHEN postal >= 8000 AND postal < 9000 THEN 'West Flanders'
             END AS Province,
        state AS State_of_building,
        CAST(COUNT(*) AS BIGINT) AS n,
        ROUND(AVG(epc_encoded), 2) AS avg_epc_encoded,
        ROUND(AVG(st_encoded), 2) AS avg_state_encoded
      FROM j GROUP BY 1, 2 ORDER BY Province, State_of_building"""))

  /** Link-state lifecycle over two synthetic sitemap snapshots (urls derived
    * from the orders table): snapshot diff, inactive transition, scrape
    * transitions, idempotent re-apply. Output: status counts after replay.
    */
  val q61LinkLifecycle = QueryDef(
    "q61_link_lifecycle",
    (s, d) => {
      val base = "https://www.immoweb.be/en/classified/house/for-sale/x/1000/"
      val o = Tables.orders(s, d)
      val snap1 = o.filter(col("o_orderkey") % 3 =!= 0)
        .select(concat(lit(base), col("o_orderkey")).as("url"))
      val snap2 = o.filter(col("o_orderkey") % 2 =!= 0)
        .select(concat(lit(base), col("o_orderkey")).as("url"))
      val t1 = Timestamp.valueOf("2024-06-01 00:00:00")
      val t2 = Timestamp.valueOf("2024-06-08 00:00:00")
      // r14 (the q223 lesson): each applySnapshot references its `links`
      // input THREE times (insert anti, touch semi, deactivate anti) and
      // the lifecycle chains four of them, so the one lazy tree re-derived
      // every earlier state multiplicatively (the 137 KB before-plan,
      // plans/r14/q61_link_lifecycle_before.txt). Snapshot each state —
      // input-bounded rows; applySnapshot itself stays a pure plan (the
      // operator contract), only this carrier pins the evaluation points.
      def snap(df: org.apache.spark.sql.DataFrame) = df.localCheckpoint(true)
      val s1 = snap(LinkState.applySnapshot(LinkState.emptyLinks(s), snap1, t1))
      // scrape half of the pending set
      val results = LinkState.pending(s1)
        .select(col("url"), (col("classified_id") % 5 =!= 0).as("ok"))
      val s1b = snap(LinkState.applyScrapeResults(s1, results, t1))
      // second snapshot: some disappear (inactive), some appear (pending);
      // applied twice to pin idempotence in the checked output
      val s2 = snap(LinkState.applySnapshot(s1b, snap2, t2))
      val s2again = LinkState.applySnapshot(s2, snap2, t2)
      s2again.groupBy("status").agg(count(lit(1)).as("cnt")).orderBy("status")
    },
    // Independent derivation of the lifecycle: snap1 = keys %3<>0 (all become
    // pending, then scraped/error by the %5 rule), snap2 = keys %2<>0
    // (present -> keep, absent -> inactive, new -> pending). The second
    // applySnapshot with the same snapshot must be a no-op, so the counts
    // reduce to pure key arithmetic over DISTINCT order keys.
    Some("""WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders),
      s AS (SELECT CASE
          WHEN k % 2 <> 0 AND k % 3 = 0 THEN 'pending'
          WHEN k % 3 <> 0 AND k % 2 <> 0 AND k % 5 <> 0 THEN 'scraped'
          WHEN k % 3 <> 0 AND k % 2 <> 0 AND k % 5 = 0 THEN 'error'
          WHEN k % 3 <> 0 AND k % 2 = 0 THEN 'inactive'
          END AS status FROM k)
      SELECT status, COUNT(*) AS cnt FROM s
      WHERE status IS NOT NULL GROUP BY status ORDER BY status"""))

  override val defs: Seq[QueryDef] = Seq(q60ImmoPipeline, q61LinkLifecycle)
}
