package graft.schema

import org.apache.spark.sql.types._

/** Declared schemas for the immo pipeline tables.
  *
  * links / properties DDL: /root/reference/scraper/scraper.py:45-55, 67-97.
  * The reference's deliberate weak typing (numerics as TEXT) is preserved at
  * ingest and resolved downstream with try_cast (SURVEY §1.2).
  */
object Schemas {

  val links: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("url", StringType, nullable = false),
    StructField("classified_id", LongType),
    StructField("status", StringType),          // pending | scraped | error | inactive
    StructField("last_checked", TimestampType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType)))

  val LinkStatuses: Seq[String] = Seq("pending", "scraped", "error", "inactive")

  val properties: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("link_id", LongType),
    StructField("locality_name", StringType),
    StructField("postal_code", StringType),
    StructField("street", StringType),
    StructField("number", StringType),
    StructField("price", StringType),           // TEXT in the reference
    StructField("property_type", StringType),
    StructField("property_subtype", StringType),
    StructField("number_of_bedrooms", IntegerType),
    StructField("living_area", StringType),
    StructField("kitchen_type", StringType),
    StructField("open_fire", StringType),
    StructField("swimming_pool", StringType),
    StructField("hasTerrace", StringType),
    StructField("terraceSurface", StringType),
    StructField("hasGarden", StringType),
    StructField("gardenSurface", StringType),
    StructField("number_of_facades", IntegerType),
    StructField("state_of_building", StringType),
    StructField("construction_year", IntegerType),
    StructField("epc", StringType),
    StructField("latitude", StringType),
    StructField("longitude", StringType),
    StructField("landSurface", StringType),
    StructField("scraped_at", TimestampType)))

  /** The nested `window.classified` JSON payload (scraper.py:258-313). */
  private val location = StructType(Seq(
    StructField("locality", StringType),
    StructField("postalCode", StringType),
    StructField("street", StringType),
    StructField("number", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType)))

  private val propertyStruct = StructType(Seq(
    StructField("type", StringType),
    StructField("subtype", StringType),
    StructField("bedroomCount", IntegerType),
    StructField("netHabitableSurface", DoubleType),
    StructField("fireplaceExists", BooleanType),
    StructField("hasSwimmingPool", BooleanType),
    StructField("hasTerrace", BooleanType),
    StructField("terraceSurface", DoubleType),
    StructField("hasGarden", BooleanType),
    StructField("gardenSurface", DoubleType),
    StructField("location", location),
    StructField("kitchen", StructType(Seq(StructField("type", StringType)))),
    StructField("building", StructType(Seq(
      StructField("facadeCount", IntegerType),
      StructField("condition", StringType),
      StructField("constructionYear", IntegerType)))),
    StructField("land", StructType(Seq(StructField("surface", DoubleType))))))

  private val transactionStruct = StructType(Seq(
    StructField("sale", StructType(Seq(StructField("price", DoubleType)))),
    StructField("certificates", StructType(Seq(
      StructField("epcScore", StringType),
      StructField("primaryEnergyConsumptionPerSqm", DoubleType))))))

  val classified: StructType = StructType(Seq(
    StructField("property", propertyStruct),
    StructField("transaction", transactionStruct)))

  /** The 26-column export header IN ORDER (scraper.py:409-446); `None` source
    * means the reference emits the literal string "NULL" (scraper.py:460).
    */
  val exportHeader: Seq[(String, Option[String])] = Seq(
    "id" -> Some("id"),
    "locality_name" -> Some("locality_name"),
    "Postal_code" -> Some("postal_code"),
    "Price" -> Some("price"),
    "Subtype" -> Some("property_subtype"),
    "Number_of_rooms" -> None,
    "Number_of_bedrooms" -> Some("number_of_bedrooms"),
    "Living_area" -> Some("living_area"),
    "sale_annuity" -> None,
    "Type_of_sale" -> None,
    "street" -> Some("street"),
    "number" -> Some("number"),
    "latitude" -> Some("latitude"),
    "longitude" -> Some("longitude"),
    "Open_fire" -> Some("open_fire"),
    "Swimming_Pool" -> Some("swimming_pool"),
    "hasTerrace" -> Some("hasTerrace"),
    "terraceSurface" -> Some("terraceSurface"),
    "hasGarden" -> Some("hasGarden"),
    "gardenSurface" -> Some("gardenSurface"),
    "Kitchen_type" -> Some("kitchen_type"),
    "Number_of_facades" -> Some("number_of_facades"),
    "State_of_building" -> Some("state_of_building"),
    "Starting_price" -> None,
    "epc" -> Some("epc"),
    "landSurface" -> Some("landSurface"))
}
