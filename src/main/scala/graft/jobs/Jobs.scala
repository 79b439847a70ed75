package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Preprocessing, Tables}
import graft.enrich.Geocode
import graft.ingest.{LinkState, ScrapeParse, Sitemap}
import graft.io.ExportCsv
import graft.ml.Models

/** The four DAG tasks of the reference's Airflow pipeline
  * (/root/reference/docker-airflow/dags/airflow_auto_model.py:23-47), each as
  * a spark-submit-able main — the DAG stays four BashOperators calling
  * `spark-submit --class graft.jobs.<Job>` (SURVEY §3.4; see
  * airflow/immo_pipeline_dag.py in this repo).
  *
  * Every job is idempotent (safe under Airflow catchup replays): reads are
  * snapshots, writes are overwrite-by-path or dedup-then-union.
  */
object JobSession {
  def build(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
  }
}

/** Task 1 — scrape: sitemap snapshot → link diff → scrape pending → parse →
  * properties append + link status update.
  * Args: linksDir propertiesDir sitemapIndexUrl
  */
object ScrapeJob {
  def run(spark: SparkSession, linksDir: String, propertiesDir: String,
      indexXml: String, fetcher: Sitemap.Fetcher,
      now: java.sql.Timestamp): Unit = {
    val links0 =
      if (pathExists(spark, linksDir)) spark.read.parquet(linksDir)
      else LinkState.emptyLinks(spark)
    val snapshot = Sitemap.listingUrls(spark, indexXml, fetcher)
    val links1 = LinkState.applySnapshot(links0, snapshot, now)

    val pending = LinkState.pending(links1)
      .repartition(20) // the reference's max_workers=20 (scraper.py:327)
    val pages = pending.select(col("url"))
      .withColumn("html", htmlFetchUdfFree(fetcher)(col("url")))
    val parsed = ScrapeParse.parseScrapedPages(pages)

    val okRows = parsed.filter(col("ok")).drop("ok", "url")
      .withColumn("scraped_at", lit(now))
    appendDedup(spark, okRows, propertiesDir, "link_id")
    val links2 = LinkState.applyScrapeResults(
      links1, parsed.select("url", "ok"), now)
    overwriteAtomic(spark, links2, linksDir)
  }

  /** Fetch as a plain Scala closure over the pluggable fetcher (the fetcher's
    * retry policy applies per call; partition parallelism = the repartition
    * above, mirroring the reference's 20-thread pool).
    */
  private def htmlFetchUdfFree(
      fetcher: Sitemap.Fetcher): org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    val f = org.apache.spark.sql.functions.udf((u: String) => fetcher.fetch(u))
    c => f(c)
  }

  private[jobs] def pathExists(spark: SparkSession, p: String): Boolean =
    new java.io.File(p).exists()

  /** INSERT OR IGNORE ≡ dedup on key then union (SURVEY §2.1 S12). */
  private[jobs] def appendDedup(spark: SparkSession, rows: DataFrame,
      dir: String, key: String): Unit = {
    val merged =
      if (pathExists(spark, dir)) {
        val existing = spark.read.parquet(dir)
        rows.join(existing, Seq(key), "left_anti").unionByName(existing)
      } else rows
    overwriteAtomic(spark, merged, dir)
  }

  /** Overwrite via temp-dir swap (parquet overwrite of a dir being read). */
  private[jobs] def overwriteAtomic(spark: SparkSession, df: DataFrame, dir: String): Unit = {
    val tmp = dir + "__tmp"
    df.write.mode("overwrite").parquet(tmp)
    val target = new java.io.File(dir)
    if (target.exists()) {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(del)); f.delete()
      }
      del(target)
    }
    new java.io.File(tmp).renameTo(target)
  }
}

/** Task 2 — export: properties table → 26-column interchange CSV. */
object ExportJob {
  def main(args: Array[String]): Unit = {
    val Array(propertiesDir, csvOut) = args.take(2)
    val spark = JobSession.build("graft-export")
    ExportCsv.write(spark.read.parquet(propertiesDir), csvOut)
    spark.stop()
  }
}

/** Task 3 — preprocess: export CSV → cleaned/enriched/encoded parquet+csv. */
object PreprocessJob {
  def main(args: Array[String]): Unit = {
    val Array(csvIn, cacheDir, outDir) = args.take(3)
    val spark = JobSession.build("graft-preprocess")
    val export = ExportCsv.read(spark, csvIn)
    val cache =
      if (ScrapeJob.pathExists(spark, cacheDir)) spark.read.parquet(cacheDir)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        Geocode.cacheSchema)
    val out = Preprocessing.run(export, cache)
    out.write.mode("overwrite").parquet(s"$outDir/clean.parquet")
    out.coalesce(1).write.mode("overwrite").option("header", "true")
      .csv(s"$outDir/clean_csv")
    spark.stop()
  }
}

/** Task 4 — model selection: cleaned parquet → leaderboard + saved best model. */
object ModelJob {
  def main(args: Array[String]): Unit = {
    val Array(cleanDir, modelOut) = args.take(2)
    val spark = JobSession.build("graft-model")
    val df = spark.read.parquet(s"$cleanDir/clean.parquet")
      .drop("price_per_sqm", "price_per_sqm_land", "epc", "Postal_code") // P10
    val features = Models.selectFeaturesByCorrelation(df, "Price")
    val (winner, all) = Models.selectBestModel(df, features, "Price")
    Models.leaderboard(spark, all)
      .coalesce(1).write.mode("overwrite").option("header", "true")
      .csv(s"$modelOut/leaderboard")
    winner.model.write.overwrite().save(s"$modelOut/best_model")
    spark.stop()
  }
}
