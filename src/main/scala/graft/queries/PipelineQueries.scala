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
    None)

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
      val s1 = LinkState.applySnapshot(LinkState.emptyLinks(s), snap1, t1)
      // scrape half of the pending set
      val results = LinkState.pending(s1)
        .select(col("url"), (col("classified_id") % 5 =!= 0).as("ok"))
      val s1b = LinkState.applyScrapeResults(s1, results, t1)
      // second snapshot: some disappear (inactive), some appear (pending);
      // applied twice to pin idempotence in the checked output
      val s2 = LinkState.applySnapshot(s1b, snap2, t2)
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
