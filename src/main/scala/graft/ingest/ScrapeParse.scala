package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.schema.Schemas

/** Scrape-payload parsing: embedded-JSON extraction, null-safe nested access,
  * EPC derivation, row validation.
  *
  * Reference: /root/reference/scraper/scraper.py —
  *  :247-253 regex for `window.classified = {...};` (DOTALL, non-greedy)
  *  :255, 210-220 json parse + safe_get (≡ from_json + dotted access)
  *  :262-271 validation: reject when both epcScore and kwh null, or kwh < -100
  *  :274-287 EPC bucketing from kWh when epcScore invalid
  */
object ScrapeParse {

  private val ClassifiedRe = "(?s)window\\.classified\\s*=\\s*(\\{.*?\\});"

  /** F2: pull the embedded JSON object out of raw HTML (empty string → null). */
  def extractClassifiedJson(html: Column): Column = {
    val m = regexp_extract(html, ClassifiedRe, 1)
    when(m === "", lit(null)).otherwise(m)
  }

  /** F3: parse to the declared nested schema (null-safe access for free). */
  def parseClassified(json: Column): Column = from_json(json, Schemas.classified)

  val ValidEpcScores: Seq[String] = Seq("A+", "A", "B", "C", "D", "E", "F", "G")

  /** F4: EPC letter from primary energy use, applied only when epcScore is
    * absent/invalid (scraper.py:274-287).
    */
  def deriveEpc(epcScore: Column, kwh: Column): Column =
    when(epcScore.isin(ValidEpcScores: _*), epcScore)
      .otherwise(
        when(kwh.isNull, lit(null))
          .when(kwh < 0, "A+").when(kwh < 100, "A").when(kwh < 200, "B")
          .when(kwh < 300, "C").when(kwh < 400, "D").when(kwh < 500, "E")
          .otherwise("F"))

  /** P11: scrape-level validation (scraper.py:262-271). */
  def isValidScrape(epcScore: Column, kwh: Column): Column =
    !(epcScore.isNull && kwh.isNull) && !(kwh.isNotNull && kwh < -100)

  /** Full parse stage: html → properties-shaped rows + `ok` flag.
    * Input: (url, html). Output: properties columns (weakly typed, matching
    * Schemas.properties) + url + ok.
    */
  def parseScrapedPages(pages: DataFrame): DataFrame = {
    val parsed = pages
      .withColumn("payload", parseClassified(extractClassifiedJson(col("html"))))
    val p = col("payload.property")
    val cert = col("payload.transaction.certificates")
    parsed.select(
      col("url"),
      LinkState.classifiedId(col("url")).as("link_id"),
      p.getField("location").getField("locality").as("locality_name"),
      p.getField("location").getField("postalCode").as("postal_code"),
      p.getField("location").getField("street").as("street"),
      p.getField("location").getField("number").as("number"),
      col("payload.transaction.sale.price").cast("string").as("price"),
      p.getField("type").as("property_type"),
      p.getField("subtype").as("property_subtype"),
      p.getField("bedroomCount").as("number_of_bedrooms"),
      p.getField("netHabitableSurface").cast("string").as("living_area"),
      p.getField("kitchen").getField("type").as("kitchen_type"),
      p.getField("fireplaceExists").cast("string").as("open_fire"),
      p.getField("hasSwimmingPool").cast("string").as("swimming_pool"),
      p.getField("hasTerrace").cast("string").as("hasTerrace"),
      p.getField("terraceSurface").cast("string").as("terraceSurface"),
      p.getField("hasGarden").cast("string").as("hasGarden"),
      p.getField("gardenSurface").cast("string").as("gardenSurface"),
      p.getField("building").getField("facadeCount").as("number_of_facades"),
      p.getField("building").getField("condition").as("state_of_building"),
      p.getField("building").getField("constructionYear").as("construction_year"),
      deriveEpc(cert.getField("epcScore"),
        cert.getField("primaryEnergyConsumptionPerSqm")).as("epc"),
      p.getField("location").getField("latitude").cast("string").as("latitude"),
      p.getField("location").getField("longitude").cast("string").as("longitude"),
      p.getField("land").getField("surface").cast("string").as("landSurface"),
      isValidScrape(cert.getField("epcScore"),
        cert.getField("primaryEnergyConsumptionPerSqm")).as("ok"))
  }
}
