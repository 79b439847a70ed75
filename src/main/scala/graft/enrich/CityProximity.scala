package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, GeoOps}

/** City-proximity assignment: the reference's geopandas buffer+sjoin
  * (preprocessing.py:220-248) as a broadcast nested-loop theta join.
  *
  * 10 cities ⇒ the dim side is always broadcast; the big side never shuffles.
  * Keep-first per row follows the cities-table order (geopandas preserves it —
  * SURVEY §2.5 W3), hence the explicit city_index order column.
  */
object CityProximity {

  /** (index, name, lat, lon) — preprocessing.py:489-493, in table order. */
  val Cities: Seq[(Int, String, Double, Double)] = Seq(
    (0, "Brussels", 50.8503, 4.3517),
    (1, "Antwerp", 51.2194, 4.4025),
    (2, "Ghent", 51.0543, 3.7174),
    (3, "Bruges", 51.2093, 3.2247),
    (4, "Liège", 50.6293, 5.3345),
    (5, "Namur", 50.4811, 4.8708),
    (6, "Leuven", 50.8794, 4.7004),
    (7, "Mons", 50.4542, 3.9460),
    (8, "Aalst", 50.9402, 4.0710),
    (9, "Sint-Niklaas", 51.2170, 4.4155))

  def citiesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Cities.toDF("city_index", "city", "city_lat", "city_lon")
  }

  /** For each input row (keyed by `idCol`, with `latCol`/`lonCol`), attach the
    * FIRST city (in table order) within `radiusKm` Mercator-km, or no row if
    * none. Distance is EPSG:3395 planar — replicating the reference, see
    * GeoOps.
    */
  def assignCity(
      df: DataFrame,
      idCol: String,
      latCol: String,
      lonCol: String,
      radiusKm: Double): DataFrame = {
    val cities = broadcast(citiesDf(df.sparkSession))
    val joined = df.join(
      cities,
      GeoOps.dist3395(col(latCol), col(lonCol), col("city_lat"), col("city_lon"))
        <= radiusKm * 1000,
      "inner")
    Dedup.keepFirst(joined, Seq(idCol), Seq("city_index"))
  }

  /** The reference's full enrichment: one Assigned_City_{r} column per radius
    * (preprocessing.py:242-248) — computed in a SINGLE pass: one broadcast
    * theta join against the max radius, one aggregate with a per-radius
    * `min(struct(city_index, city))` (struct min orders by city_index first ⇒
    * the keep-first-city semantics), one left join back. The reference (and
    * the naive translation) does 3 joins + 3 window dedups; at scale that is
    * 3 shuffles of the big side vs 1 here.
    */
  def withCityFlags(
      df: DataFrame,
      idCol: String,
      latCol: String,
      lonCol: String,
      radiiKm: Seq[Double] = Seq(5, 10, 15)): DataFrame = {
    val maxR = radiiKm.max
    val cities = broadcast(citiesDf(df.sparkSession))
    val withDist = df.select(col(idCol), col(latCol), col(lonCol))
      .join(cities,
        GeoOps.dist3395(col(latCol), col(lonCol), col("city_lat"), col("city_lon"))
          <= maxR * 1000, "inner")
      .withColumn("__dist",
        GeoOps.dist3395(col(latCol), col(lonCol), col("city_lat"), col("city_lon")))
    val aggs = radiiKm.map { r =>
      min(when(col("__dist") <= r * 1000, struct(col("city_index"), col("city"))))
        .as(s"__first_${r.toLong}")
    }
    val assigned = withDist.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    val joined = df.join(assigned, Seq(idCol), "left")
    radiiKm.foldLeft(joined) { (acc, r) =>
      val rl = r.toLong
      acc.withColumn(s"Assigned_City_$rl", col(s"__first_$rl").getField("city"))
        .withColumn(s"Assigned_City_${rl}_flag",
          col(s"Assigned_City_$rl").isNotNull.cast("int"))
        .drop(s"__first_$rl")
    }
  }
}
