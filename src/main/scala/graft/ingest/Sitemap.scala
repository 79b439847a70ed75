package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Filters

/** Sitemap ingestion: index → sub-sitemaps containing "classified" →
  * `<xhtml:link hreflang="en-BE" href="..."/>` hrefs → listing-url filter →
  * distinct.
  *
  * Reference: /root/reference/scraper/scraper.py:101-150. The reference loops
  * sub-sitemaps sequentially on one thread; here the fetch fans out as a
  * Dataset flatMap so each partition pulls its share (the HTTP client is
  * pluggable — tests use canned XML, production wires a real fetcher with the
  * scraper.py:25-35 retry policy).
  */
object Sitemap {

  /** Pluggable fetcher (url → body), so the parse pipeline is testable
    * offline and the retry/backoff policy stays in one place.
    */
  trait Fetcher extends Serializable {
    def fetch(url: String): String
  }

  /** Retrying fetcher mirroring scraper.py:25-35: 3 attempts, exponential
    * backoff 2^attempt + jitter(1..3)s, 10 s timeout.
    */
  final class HttpFetcher(timeoutMs: Int = 10000, retries: Int = 3) extends Fetcher {
    def fetch(url: String): String = {
      var attempt = 0
      var last: Throwable = null
      while (attempt < retries) {
        try {
          val conn = new java.net.URL(url).openConnection()
          conn.setConnectTimeout(timeoutMs)
          conn.setReadTimeout(timeoutMs)
          val src = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8")
          try return src.mkString finally src.close()
        } catch {
          case e: Throwable =>
            last = e
            attempt += 1
            val backoff = (math.pow(2, attempt) + 1 + scala.util.Random.nextInt(3)) * 1000
            Thread.sleep(backoff.toLong)
        }
      }
      throw last
    }
  }

  private val LocRe = "<loc>\\s*(.*?)\\s*</loc>".r
  private val HrefRe =
    "(?s)<xhtml:link[^>]*hreflang=\"en-BE\"[^>]*href=\"(.*?)\"".r

  /** Parse sub-sitemap locations out of a sitemap index body. */
  def parseIndexLocs(xml: String): Seq[String] =
    LocRe.findAllMatchIn(xml).map(_.group(1)).toSeq

  /** Parse en-BE listing hrefs out of one sub-sitemap body. */
  def parseHrefs(xml: String): Seq[String] =
    HrefRe.findAllMatchIn(xml).map(_.group(1)).toSeq

  /** Full pipeline from a fetched index body: filter "classified" sub-maps
    * (scraper.py:115), fan out fetches across partitions, extract hrefs,
    * keep for-sale house/apartment urls (scraper.py:139), distinct.
    */
  def listingUrls(spark: SparkSession, indexXml: String, fetcher: Fetcher,
      fanout: Int = 20): DataFrame = {
    import spark.implicits._
    val subs = parseIndexLocs(indexXml).filter(_.contains("classified"))
    val subDs: Dataset[String] = spark.createDataset(subs)
    val urls = subDs
      .repartition(math.min(fanout, math.max(1, subs.size)))
      .flatMap(u => parseHrefs(fetcher.fetch(u)))
      .toDF("url")
    urls.filter(Filters.listingUrlFilter(col("url"))).distinct()
  }
}
