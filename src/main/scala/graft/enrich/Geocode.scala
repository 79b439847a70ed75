package graft.enrich

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.TextOps

/** Geocoding enrichment: cache-first broadcast join, 4-format address
  * cascade, rate-limited residual lookups.
  *
  * Reference: /root/reference/Preprocessing/preprocessing.py:138-213 — a dict
  * cache consulted per row, then Nominatim HTTP with sleep(1), then a
  * write-through cache update per hit (:174-177).
  *
  * Spark-native shape (SURVEY §7.4-4): join the ENTIRE cache once (broadcast),
  * geocode only the residual misses inside a single small `mapPartitions`
  * with the 1 req/s budget, and append cache entries ONCE per batch — never
  * the reference's write-per-row, which cannot exist in a distributed job.
  */
object Geocode {

  /** Pluggable external geocoder (tests use a canned map; production wires
    * Nominatim with the courtesy rate limit).
    */
  trait Geocoder extends Serializable {
    def lookup(normalizedAddress: String): Option[(Double, Double)]
  }

  val cacheSchema: StructType = StructType(Seq(
    StructField("norm_addr", StringType, nullable = false),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType)))

  /** S9 source: the reference's cache artifact is one JSON object
    * `{normalized_address: [lat, lon], ...}` (geocode_cache.json, 957 keys).
    * Parsed Spark-native: whole-file read → from_json MapType → explode.
    */
  def loadCacheJson(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, MapType}
    spark.read.option("wholetext", "true").text(path)
      .select(from_json(col("value"),
        MapType(StringType, ArrayType(DoubleType))).as("m"))
      .select(explode(col("m")).as(Seq("norm_addr", "coords")))
      .select(col("norm_addr"),
        element_at(col("coords"), 1).as("lat"),
        element_at(col("coords"), 2).as("lon"))
  }

  /** S9 sink: write the cache back in the reference's artifact shape — ONCE
    * per batch (never per row; SURVEY §7.4-4). The cache is bounded by
    * distinct addresses, so a driver-side render is safe.
    */
  def saveCacheJson(cache: DataFrame, path: String): Unit = {
    val entries = cache.select("norm_addr", "lat", "lon").collect()
      .sortBy(_.getString(0))
      .map { r =>
        val k = r.getString(0).replace("\\", "\\\\").replace("\"", "\\\"")
        s""""$k": [${r.getDouble(1)}, ${r.getDouble(2)}]"""
      }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      entries.mkString("{", ", ", "}"))
  }

  /** The 4 fallback address formats (preprocessing.py:191-196), most→least
    * specific, already normalized.
    */
  def addressCandidates(street: Column, number: Column, locality: Column,
      postal: Column): Seq[Column] = Seq(
    concat_ws(" ", street, number, locality, postal),
    concat_ws(" ", street, locality, postal),
    concat_ws(" ", locality, postal),
    postal.cast("string")).map(TextOps.normalizeAddress)

  /** Fill null lat/lon from the cache via a cascade of broadcast left joins +
    * coalesce — one join per address format, misses fall through.
    */
  def fillFromCache(df: DataFrame, cache: DataFrame,
      street: String = "street", number: String = "number",
      locality: String = "locality_name", postal: String = "postal_code",
      lat: String = "latitude", lon: String = "longitude"): DataFrame = {
    val candidates = addressCandidates(col(street), col(number), col(locality), col(postal))
    candidates.zipWithIndex.foldLeft(df) { case (acc, (addrExpr, i)) =>
      val c = broadcast(cache.select(
        col("norm_addr").as(s"__addr_$i"),
        col("lat").as(s"__lat_$i"), col("lon").as(s"__lon_$i")))
      acc.withColumn(s"__addr_$i", addrExpr)
        .join(c, Seq(s"__addr_$i"), "left")
        .withColumn(lat, coalesce(col(lat), col(s"__lat_$i")))
        .withColumn(lon, coalesce(col(lon), col(s"__lon_$i")))
        .drop(s"__addr_$i", s"__lat_$i", s"__lon_$i")
    }
  }

  /** Geocode the residual misses (rows still lacking coordinates) through the
    * external geocoder on a SINGLE partition (the 1 req/s budget makes more
    * parallelism pointless and impolite). Returns new cache rows
    * (norm_addr, lat, lon) to append to the cache table — once, batch-level.
    */
  def geocodeResidual(df: DataFrame, geocoder: Geocoder,
      street: String = "street", number: String = "number",
      locality: String = "locality_name", postal: String = "postal_code",
      lat: String = "latitude", lon: String = "longitude",
      rateLimitMs: Long = 1000L): DataFrame = {
    val misses = df.filter(col(lat).isNull || col(lon).isNull)
      .select(addressCandidates(col(street), col(number), col(locality), col(postal))
        .zipWithIndex.map { case (c, i) => c.as(s"addr_$i") }: _*)
      .distinct()
    val spark = df.sparkSession
    // A14: the reference's running completed/failed counters
    // (preprocessing.py:185-213) as Spark accumulators (diagnostic)
    val completed = spark.sparkContext.longAccumulator("geocode.completed")
    val failed = spark.sparkContext.longAccumulator("geocode.failed")
    val enc = org.apache.spark.sql.Encoders.row(cacheSchema)
    misses.coalesce(1).mapPartitions { rows =>
      rows.flatMap { r =>
        val candidates = (0 until 4).map(i => Option(r.getString(i)).getOrElse(""))
          .filter(_.nonEmpty)
        val hit = candidates.iterator.map { a =>
          Thread.sleep(rateLimitMs)
          a -> geocoder.lookup(a)
        }.collectFirst { case (a, Some((la, lo))) => Row(a, la, lo) }
        if (hit.isDefined) completed.add(1) else failed.add(1)
        hit.iterator
      }
    }(enc)
  }
}
