package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.encode.TargetEncoder
import graft.enrich.{CityProximity, Geocode, Province}
import graft.ops._

/** The reference's full preprocessing chain
  * (/root/reference/Preprocessing/preprocessing.py:429-595, traced in SURVEY
  * §3.2) re-expressed as a small number of lazy Catalyst plans.
  *
  * The reference materializes a pandas frame per step (~30 times); here
  * everything between the four unavoidable materialization barriers —
  * (1) data-dependent column prune, (2) geocode residual, (3) encode/mode
  * fits, (3') quantile clips — fuses into single whole-stage-codegen plans.
  * The barriers collect only TINY aggregates (null fractions, modes,
  * quantiles, the encoding map) to the driver; row data never leaves
  * executors, so the shape holds at 100 TB.
  */
object Preprocessing {

  /** preprocessing.py:506-511 — subtype grouping. */
  val SubtypeGroups: Map[String, Seq[String]] = Map(
    "House" -> Seq("House", "Town_house", "Bungalow", "Chalet", "Country_cottage",
      "Farmhouse", "Manor_house", "Mansion", "Villa"),
    "Apartment" -> Seq("Apartment", "Duplex", "Triplex", "Penthouse", "Flat_studio",
      "Loft", "Ground_floor", "Service_flat", "Kot"),
    "Mixed_use_building" -> Seq("Mixed_use_building", "Apartment_block", "Castle",
      "Exceptional_property", "Other_property"))

  /** preprocessing.py:526-537 — rare-category remaps with fallback (all THREE
    * State_of_building mappings, including 'Just renovated' -> 'Good').
    */
  val StateRemap: Map[String, String] = Map(
    "To_restore" -> "To_renovate", "To_be_done_up" -> "To_renovate",
    "Just_renovated" -> "Good")
  val EpcRemap: Map[String, String] = Map(
    "A+" -> "A", "A++" -> "A", "G" -> "F")

  /** Stage 1 (one fused plan): structural cleanup — drops, filters, dedup,
    * text cleanup. preprocessing.py:438-473.
    */
  def cleanStage(export: DataFrame): DataFrame = {
    val withOrd = Dedup.withIngestOrdinal(export)       // pandas "first" = file order
    val filtered = withOrd
      .drop("Url")                                      // :438 (no-op if absent)
      .transform(d => Filters.filterRows(d, "sale_annuity", "not_true"))   // :441
      .transform(d => Filters.filterRows(d, "Price", "not_null"))          // :441
      .withColumn("Furnished",
        if (withOrd.columns.contains("Furnished"))
          CastOps.nullToFalse(col("Furnished")) else lit(false))           // :444 intent
      .na.fill(Map("gardenSurface" -> 0))                                  // :459
    val deduped = Dedup.keepFirst(
      Dedup.keepFirst(filtered, Seq("id"), Seq("__ingest_ord")),           // :462
      Seq("street", "number", "Postal_code", "latitude", "longitude"),
      Seq("__ingest_ord"))                                                 // :463
    deduped
      .withColumn("Subtype", TextOps.cleanCategory(col("Subtype")))        // :466 / :58-60
      .withColumn("Kitchen_type", TextOps.cleanCategory(col("Kitchen_type")))
      .withColumn("State_of_building", TextOps.cleanCategory(col("State_of_building")))
      .withColumn("locality_name",
        TextOps.titleCase(TextOps.stripParenZip(col("locality_name"))))    // :62-67
      .withColumn("street", TextOps.titleCase(col("street")))
      .filter(Filters.lengthEquals(col("Postal_code"), 4))                 // :469
      .transform(d => Filters.dropAllNull(d,
        Seq("street", "number", "longitude", "latitude")))                 // :473
      .drop("__ingest_ord")
  }

  /** Barrier 1: data-dependent column prune (null fraction > threshold).
    * preprocessing.py:476, :520 → 79-85 — both reference calls use 0.3.
    */
  def pruneStage(df: DataFrame, threshold: Double = 0.3): (DataFrame, Seq[String]) =
    MissingData.cleanMissingData(df, threshold)

  /** Stage 2: casts + province (fused). preprocessing.py:480-483. */
  def typeStage(df: DataFrame): DataFrame =
    df.withColumn("Price", CastOps.toNumericCoerce(col("Price")))
      .withColumn("Living_area", CastOps.toNumericCoerce(col("Living_area")))
      .withColumn("latitude", CastOps.toNumericCoerce(col("latitude")))
      .withColumn("longitude", CastOps.toNumericCoerce(col("longitude")))
      .withColumn("Province", Province.fromPostalCode(col("Postal_code")))

  /** Barrier 2: geocode fill — cache join first, residual through the
    * rate-limited client, cache appended once. preprocessing.py:486.
    */
  def geocodeStage(df: DataFrame, cache: DataFrame,
      geocoder: Option[Geocode.Geocoder] = None): (DataFrame, DataFrame) = {
    val filled = Geocode.fillFromCache(df, cache,
      street = "street", number = "number",
      locality = "locality_name", postal = "Postal_code")
    geocoder match {
      case None => (filled, cache)
      case Some(g) =>
        val newEntries = Geocode.geocodeResidual(filled, g,
          street = "street", number = "number",
          locality = "locality_name", postal = "Postal_code")
        val grown = cache.unionByName(newEntries).dropDuplicates("norm_addr")
        (Geocode.fillFromCache(filled, grown,
          street = "street", number = "number",
          locality = "locality_name", postal = "Postal_code"), grown)
    }
  }

  /** Stage 3: city proximity flags ×3 radii + subtype regroup + House filter.
    * preprocessing.py:499-516.
    */
  def enrichStage(df: DataFrame, keepSubtype: String = "House"): DataFrame = {
    val withCities = CityProximity.withCityFlags(
      df.filter(col("latitude").isNotNull && col("longitude").isNotNull),
      "id", "latitude", "longitude")
    val grouped = SubtypeGroups.foldLeft(withCities) { case (acc, (to, from)) =>
      acc.withColumn("Subtype",
        TextOps.replaceValues(col("Subtype"),
          from.map(_.replace("_", " ")).map(s =>
            s.head.toUpper + s.tail.toLowerCase), to))
    }
    grouped.filter(col("Subtype") === keepSubtype)
  }

  /** preprocessing.py:556-580 — the reference's five per-column quantile clip
    * pairs (Price is the tightest at 5/95; counts the loosest at 1/99).
    */
  val ClipBounds: Seq[(String, Double, Double)] = Seq(
    ("Price", 0.05, 0.95),
    ("Living_area", 0.10, 0.90),
    ("gardenSurface", 0.10, 0.90),
    ("landSurface", 0.10, 0.90),
    ("Number_of_bedrooms", 0.01, 0.99))

  /** Barrier 3: categorical fills + target encoding + stat fills + winsorize.
    * preprocessing.py:526-580, step for step:
    *   remaps (:526-537) → mode fill of State_of_building AND epc (:541) →
    *   target-encode BOTH against Price (:544) → mode fill Number_of_facades /
    *   median fill landSurface+Living_area (:546-547, method defaults to
    *   'mode' for the facades call) → per-column quantile clips (:556-580).
    */
  def encodeStage(df: DataFrame,
      clipCols: Seq[(String, Double, Double)] = ClipBounds): DataFrame = {
    val remapped = df
      .withColumn("State_of_building",
        TextOps.remapWithFallback(col("State_of_building"),
          StateRemap.map { case (k, v) => k.replace("_", " ").capitalize ->
            v.replace("_", " ").capitalize }))
      .withColumn("epc", TextOps.remapWithFallback(col("epc"), EpcRemap))
    // mode fill (pandas tie-break) for the two encoded categoricals        :541
    val modeFilled =
      MissingData.fillWithStat(remapped, Seq("State_of_building", "epc"), "mode")
    // target-encode State_of_building AND epc against Price                :544
    val encoded = Seq("State_of_building", "epc").foldLeft(modeFilled) { (acc, c) =>
      val enc = new TargetEncoder()
        .setInputCol(c).setTargetCol("Price").setOutputCol(s"${c}_encoded")
      enc.fit(acc).transform(acc)
    }
    // numeric stat fills                                                   :546-547
    val statFilled = MissingData.fillWithStat(
      MissingData.fillWithStat(encoded, Seq("Number_of_facades"), "mode"),
      Seq("landSurface", "Living_area"), "median")
    // winsorize numeric columns to learned quantile bounds                 :556-580
    // — ALL bounds in one aggregate pass, all clips in one projection
    val present = clipCols.filter(c => statFilled.columns.contains(c._1))
    val casted = present.foldLeft(statFilled) { case (acc, (c, _, _)) =>
      acc.withColumn(c, col(c).cast("double"))
    }
    CastOps.winsorizeMany(casted, present)
  }

  /** Final filter: coordinate sanity (preprocessing.py:583). */
  def finalStage(df: DataFrame): DataFrame =
    df.filter(Filters.validCoordinates(col("latitude"), col("longitude")))

  /** The whole chain with default parameters (geocoder absent — cache-only,
    * as in offline tests).
    *
    * The cleaned frame is persisted across the barriers: the prune, mode,
    * quantile, and encoding aggregates each re-traverse it, and without a
    * persist every one of those tiny collects re-runs the full clean plan
    * from the scan (at 100 TB that is 4+ extra table scans).
    */
  def run(export: DataFrame, geocodeCache: DataFrame): DataFrame = {
    val cleaned = cleanStage(export)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (pruned, _) = pruneStage(cleaned)
      val typed = typeStage(pruned)
      val (geocoded, _) = geocodeStage(typed, geocodeCache)
      // Subtype is consumed by the House filter and then dropped (:517), and
      // the prune re-runs on the filtered frame (:520) — the House subset can
      // exceed the null threshold on columns the full data did not.
      val enriched = enrichStage(geocoded).drop("Subtype")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val (pruned2, _) = pruneStage(enriched)
        finalStage(encodeStage(pruned2))
      } finally enriched.unpersist(blocking = false)
    } finally cleaned.unpersist(blocking = false)
  }
}
