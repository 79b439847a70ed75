package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** The link-state lifecycle: status ∈ {pending, scraped, error, inactive}
  * driven by sitemap snapshots.
  *
  * Reference semantics (/root/reference/scraper/scraper.py):
  *  - :174-176 new urls       → INSERT with status='pending'        (anti join)
  *  - :177     still-active   → touch updated_at                    (semi join)
  *  - :178     disappeared    → status='inactive', touch updated_at (reverse anti)
  *  - :374-385 scrape result  → status='scraped' | 'error', last_checked
  *
  * The reference mutates SQLite row-at-a-time inside one transaction; the
  * Spark-native design recomputes the links table as ONE declarative plan per
  * snapshot (set-ops + union) and overwrites atomically — idempotent by
  * construction: applying the same snapshot twice is a no-op (pinned in
  * LinkStateSpec). At 100 TB-scale link tables this is a pair of hash joins
  * on url — no driver loop, no per-row writes.
  */
object LinkState {

  /** Extract the numeric classified id from the URL tail (scraper.py:152-156). */
  def classifiedId(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    TextOps.urlTail(url).try_cast("long")

  /** Empty links table with the declared schema. */
  def emptyLinks(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], graft.schema.Schemas.links)

  /** Apply one sitemap snapshot (a DataFrame with a single `url` column) to
    * the current links table. Pure plan; `now` is injected for determinism.
    */
  def applySnapshot(links: DataFrame, snapshotUrls: DataFrame,
      now: java.sql.Timestamp): DataFrame = {
    val urls = snapshotUrls.select(col("url")).distinct()
    val nowLit = lit(now)

    // new urls → pending rows (INSERT OR IGNORE ≡ anti join, scraper.py:174-176, 186-188)
    val inserted = urls.join(links, Seq("url"), "left_anti")
      .select(
        lit(null).cast("long").as("id"),
        col("url"),
        classifiedId(col("url")).as("classified_id"),
        lit("pending").as("status"),
        lit(null).cast("timestamp").as("last_checked"),
        nowLit.as("created_at"),
        nowLit.as("updated_at"))

    // still present → touch updated_at (scraper.py:177, 193-197)
    val touched = links.join(urls, Seq("url"), "left_semi")
      .withColumn("updated_at", nowLit)
      // a re-appearing inactive link becomes pending again
      .withColumn("status", when(col("status") === "inactive", "pending")
        .otherwise(col("status")))

    // disappeared → inactive (scraper.py:178, 199-205); already-inactive stays put
    val deactivated = links.join(urls, Seq("url"), "left_anti")
      .withColumn("updated_at",
        when(col("status") =!= "inactive", nowLit).otherwise(col("updated_at")))
      .withColumn("status", lit("inactive"))

    touched.unionByName(deactivated).unionByName(inserted)
  }

  /** Record scrape outcomes: urls that parsed → scraped, urls that failed
    * validation → error (scraper.py:374-385). `results` columns:
    * (url, ok boolean).
    */
  def applyScrapeResults(links: DataFrame, results: DataFrame,
      now: java.sql.Timestamp): DataFrame = {
    val r = results.select(col("url"), col("ok")).dropDuplicates("url")
    links.join(r, Seq("url"), "left")
      .withColumn("status",
        when(col("ok").isNull, col("status"))
          .when(col("ok"), lit("scraped"))
          .otherwise(lit("error")))
      .withColumn("last_checked", when(col("ok").isNotNull, lit(now))
        .otherwise(col("last_checked")))
      .withColumn("updated_at", when(col("ok").isNotNull, lit(now))
        .otherwise(col("updated_at")))
      .drop("ok")
  }

  /** The scrape-eligible set (scraper.py:230). */
  def pending(links: DataFrame): DataFrame = links.filter(col("status") === "pending")

  /** J9: the FOREIGN KEY properties.link_id → links.classified_id is
    * documentation-only in the reference (SQLite doesn't enforce it either
    * way it's used); our integrity check is the anti join — rows violating
    * the FK. Empty result ⇒ referential integrity holds.
    */
  def orphanProperties(properties: DataFrame, links: DataFrame): DataFrame =
    properties.join(links,
      properties("link_id") === links("classified_id"), "left_anti")
}
