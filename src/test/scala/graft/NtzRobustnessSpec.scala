package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Guards against driver-side parquet timestamp encoding changes (the round-6
  * regression): the driver has shipped `events.parquet` as TIMESTAMP(NANOS)
  * (read as a nanos LongType under nanosAsLong=true), then as
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ in
  * Spark 4). `Tables.load` must normalize EVERY encoding to the
  * instant-bearing TimestampType, or every event-time operator (`window()`,
  * `withWatermark`, `unix_micros`) dies at analysis. This spec re-encodes the
  * sf0.001 events fixture both ways and runs the event-time query plans that
  * broke in round 6 against each — so the next encoding change fails ONE
  * targeted test with a clear message instead of 9 opaque query errors.
  */
class NtzRobustnessSpec extends SparkSpec {

  /** The event-time queries that died on the NTZ testdata in round 6 (one per
    * failure family: window(), sessionize unix_micros, RANGE window).
    */
  private val eventTimeQueries =
    Seq("q33_tumbling_window", "q63_sessionize", "q145_rolling_window")

  private def writeFixture(encode: org.apache.spark.sql.Column): String = {
    val dir = java.nio.file.Files.createTempDirectory("ntz").toString
    Tables.events(spark, sf001).limit(2000)
      .withColumn("ts", encode)
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  private def runAll(dir: String, label: String): Unit = {
    val loaded = Tables.events(spark, dir)
    assert(loaded.schema("ts").dataType == TimestampType,
      s"[$label] Tables.load left ts as ${loaded.schema("ts").dataType} — " +
        "add the encoding to Tables.normalizeTs or event-time operators will " +
        "fail at analysis (round-6 NTZ regression shape)")
    eventTimeQueries.foreach { q =>
      val n = SparkEntry.queries(q)(spark, dir).count()
      assert(n > 0, s"[$label] $q returned no rows")
    }
  }

  test("event-time queries run on an LTZ (plain timestamp) events fixture") {
    runAll(writeFixture(col("ts").cast(TimestampType)), "LTZ")
  }

  test("event-time queries run on a TIMESTAMP_NTZ events fixture (round-6 driver encoding)") {
    val dir = writeFixture(col("ts").cast(TimestampNTZType))
    // sanity: the fixture really is NTZ on disk before normalization
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType, "fixture not NTZ")
    runAll(dir, "NTZ")
  }

  test("NTZ normalization preserves the instant (UTC session): epoch equals LTZ epoch") {
    val ltz = Tables.events(spark, writeFixture(col("ts").cast(TimestampType)))
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val ntz = Tables.events(spark, writeFixture(col("ts").cast(TimestampNTZType)))
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    assert(ltz.exceptAll(ntz).count() == 0 && ntz.exceptAll(ltz).count() == 0,
      "NTZ->timestamp cast shifted instants — session timezone not UTC?")
  }
}
