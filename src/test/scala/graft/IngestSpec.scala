package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ingest.{LinkState, ScrapeParse, Sitemap}

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-06-01 00:00:00")
  private val t1 = Timestamp.valueOf("2024-06-08 00:00:00")

  private def urls(us: String*) = us.toDF("url")

  private val u1 = "https://www.immoweb.be/en/classified/house/for-sale/gent/9000/11111111"
  private val u2 = "https://www.immoweb.be/en/classified/apartment/for-sale/luik/4000/22222222"
  private val u3 = "https://www.immoweb.be/en/classified/house/for-sale/mons/7000/33333333"

  test("snapshot on empty table inserts pending rows with extracted ids") {
    val links = LinkState.applySnapshot(LinkState.emptyLinks(spark), urls(u1, u2), t0)
    val rows = links.select("url", "classified_id", "status")
      .as[(String, Long, String)].collect().sortBy(_._2)
    assert(rows.map(_._3).forall(_ == "pending"))
    assert(rows.map(_._2).toSeq == Seq(11111111L, 22222222L))
  }

  test("snapshot re-apply is a no-op (idempotent upsert)") {
    val once = LinkState.applySnapshot(LinkState.emptyLinks(spark), urls(u1, u2), t0)
    val twice = LinkState.applySnapshot(once, urls(u1, u2), t0)
    val a = once.select("url", "classified_id", "status").collect().toSet
    val b = twice.select("url", "classified_id", "status").collect().toSet
    assert(a == b && twice.count() == 2)
  }

  test("disappeared links go inactive; reappearing links go pending again") {
    val s1 = LinkState.applySnapshot(LinkState.emptyLinks(spark), urls(u1, u2), t0)
    val s2 = LinkState.applySnapshot(s1, urls(u2, u3), t1)
    val st = s2.select("url", "status").as[(String, String)].collect().toMap
    assert(st(u1) == "inactive" && st(u2) == "pending" && st(u3) == "pending")
    val s3 = LinkState.applySnapshot(s2, urls(u1), t1)
    assert(s3.filter($"url" === u1).select("status").as[String].head() == "pending")
  }

  test("scrape results drive scraped/error transitions") {
    val s1 = LinkState.applySnapshot(LinkState.emptyLinks(spark), urls(u1, u2, u3), t0)
    val results = Seq((u1, true), (u2, false)).toDF("url", "ok")
    val after = LinkState.applyScrapeResults(s1, results, t1)
    val st = after.select("url", "status").as[(String, String)].collect().toMap
    assert(st(u1) == "scraped" && st(u2) == "error" && st(u3) == "pending")
    assert(LinkState.pending(after).count() == 1)
  }

  private def page(inner: String): String =
    s"""<html><head></head><body><script>
       |window.classified = $inner;
       |</script></body></html>""".stripMargin

  test("scrape parse: payload fields, EPC bucketing, validation") {
    val html = Seq(
      // valid epcScore wins over kwh
      (u1, page("""{"property":{"type":"HOUSE","subtype":"VILLA","bedroomCount":3,
        "location":{"locality":"Gent","postalCode":"9000","latitude":51.05,"longitude":3.72}},
        "transaction":{"sale":{"price":420000},
        "certificates":{"epcScore":"B","primaryEnergyConsumptionPerSqm":450}}}""")),
      // invalid epcScore, kwh 450 → E
      (u2, page("""{"property":{"type":"APARTMENT","subtype":"FLAT_STUDIO"},
        "transaction":{"sale":{"price":199000},
        "certificates":{"epcScore":"X","primaryEnergyConsumptionPerSqm":450}}}""")),
      // both null → rejected
      (u3, page("""{"property":{"type":"HOUSE"},
        "transaction":{"sale":{"price":1},"certificates":{}}}"""))
    ).toDF("url", "html")
    val out = ScrapeParse.parseScrapedPages(html)
    val byUrl = out.collect().map(r => r.getAs[String]("url") -> r).toMap
    assert(byUrl(u1).getAs[String]("epc") == "B")
    assert(byUrl(u1).getAs[String]("price") == "420000.0")
    assert(byUrl(u1).getAs[Long]("link_id") == 11111111L)
    assert(byUrl(u2).getAs[String]("epc") == "E")
    assert(byUrl(u1).getAs[Boolean]("ok") && byUrl(u2).getAs[Boolean]("ok"))
    assert(!byUrl(u3).getAs[Boolean]("ok"))
  }

  test("EPC bucket boundaries match scraper.py:274-287") {
    val cases = Seq(-100.0 -> "A+", -1.0 -> "A+", 0.0 -> "A", 99.0 -> "A",
      100.0 -> "B", 199.0 -> "B", 200.0 -> "C", 300.0 -> "D", 400.0 -> "E",
      499.0 -> "E", 500.0 -> "F", 900.0 -> "F")
    val df = cases.map(_._1).toDF("kwh")
      .withColumn("epc", ScrapeParse.deriveEpc(lit(null).cast("string"), $"kwh"))
    val got = df.select("kwh", "epc").as[(Double, String)].collect().toMap
    cases.foreach { case (k, e) => assert(got(k) == e, s"kwh=$k") }
  }

  test("sitemap parse: index fan-out, classified filter, listing-url filter") {
    val index = """<sitemapindex>
      <sitemap><loc>https://x.be/sitemap-classified-1.xml</loc></sitemap>
      <sitemap><loc>https://x.be/sitemap-other.xml</loc></sitemap>
      </sitemapindex>"""
    val sub = s"""<urlset>
      <url><xhtml:link rel="alternate" hreflang="en-BE" href="$u1"/></url>
      <url><xhtml:link rel="alternate" hreflang="en-BE" href="$u1"/></url>
      <url><xhtml:link rel="alternate" hreflang="en-BE"
        href="https://www.immoweb.be/en/classified/garage/for-rent/gent/9000/99"/></url>
      </urlset>"""
    val fetched = scala.collection.mutable.ArrayBuffer[String]()
    val fetcher = new Sitemap.Fetcher {
      def fetch(url: String): String = { sub }
    }
    val got = Sitemap.listingUrls(spark, index, fetcher).as[String].collect().toSeq
    assert(got == Seq(u1)) // distinct + for-sale house/apartment only
  }

  test("readJsonTolerant: good rows flow, corrupt lines quarantined with accounting") {
    import graft.ingest.JsonIngest
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    val lines = Seq(
      """{"id": 1, "text": "ok one"}""",
      """{"id": 2, "text": "ok two"}""",
      """{"id": 3, "text": "truncated""",            // malformed
      """not json at all""",                         // malformed
      """{"id": 5, "text": "ok three"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "feed.jsonl"),
      lines.mkString("\n").getBytes)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val t = JsonIngest.readJsonTolerant(spark, s"$dir/feed.jsonl", schema)
    assert(t.good.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 5L))
    val quarantined = t.corrupt.as[String].collect()
    assert(quarantined.length == 2 && quarantined.exists(_.contains("not json")))
    val stats = JsonIngest.ingestStats(t).as[(Long, Long, Double)].head()
    assert(stats == ((3L, 2L, 0.4)))
    t.release()
  }
}
