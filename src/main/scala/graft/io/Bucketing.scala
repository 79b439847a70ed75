package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table helpers: pre-shuffling a fact table ONCE into hash buckets
  * on its join/aggregation key so every later equi-join or groupBy on that
  * key is co-located — Spark plans no Exchange on the bucketed side(s).
  *
  * This is the storage-level answer to the "repeated big join on the same
  * key" pattern (properties ⋈ links on classified_id, lineitem ⋈ orders on
  * orderkey): at 100 TB the one-time bucketed write amortizes a per-query
  * shuffle away. Bucket counts should match downstream parallelism
  * (`spark.sql.shuffle.partitions`) so AQE keeps partition sizes even.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (sorted within buckets
    * so sort-merge joins also skip their per-task sort).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — shuffle-free when
    * bucket counts match (assert via plan: no Exchange above either scan).
    */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
