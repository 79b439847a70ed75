package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.ingest.JdbcStore

/** S4 JDBC interchange path against a file-backed embedded Derby database —
  * the same `spark.read.jdbc` call a SQLite migration would use (URL/driver
  * swap only).
  */
class JdbcStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshDb(): String = {
    val dir = java.nio.file.Files.createTempDirectory("jdbc").toString
    s"jdbc:derby:$dir/links_db;create=true"
  }

  test("S4: links table round-trips through spark.read.jdbc / write.jdbc") {
    val url = freshDb()
    // seed the store out-of-band, as the reference's scraper does with SQLite
    val con = DriverManager.getConnection(url)
    try {
      val st = con.createStatement()
      st.execute("""CREATE TABLE links (
        id BIGINT, url VARCHAR(512), classified_id BIGINT,
        status VARCHAR(16), last_checked TIMESTAMP,
        created_at TIMESTAMP, updated_at TIMESTAMP)""")
      val ins = con.prepareStatement(
        "INSERT INTO links VALUES (?, ?, ?, ?, NULL, ?, ?)")
      val t = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
      (1 to 25).foreach { i =>
        ins.setLong(1, i.toLong)
        ins.setString(2, s"https://x.be/classified/house/for-sale/a/1000/$i")
        ins.setLong(3, i.toLong)
        ins.setString(4, if (i % 3 == 0) "scraped" else "pending")
        ins.setTimestamp(5, t)
        ins.setTimestamp(6, t)
        ins.executeUpdate()
      }
      ins.close(); st.close()
    } finally con.close()

    // unpartitioned read
    val links = JdbcStore.readTable(spark, url, "links")
    assert(links.count() == 25)
    assert(links.filter(lower(col("status")) === "pending").count() == 17)

    // partitioned range read fans out without changing the result
    val ranged = JdbcStore.readTable(spark, url, "links",
      partitionCol = Some("classified_id"), lowerBound = 1, upperBound = 26,
      numPartitions = 4)
    assert(ranged.rdd.getNumPartitions == 4)
    assert(ranged.select("classified_id").as[Long].collect().sorted.toSeq ==
      (1L to 25L))

    // no explicit bounds: min/max are probed, so the strides cover the real
    // id range instead of degenerating into one hot partition
    val probed = JdbcStore.readTable(spark, url, "links",
      partitionCol = Some("classified_id"), numPartitions = 4)
    assert(probed.rdd.getNumPartitions == 4)
    val perPart = probed.rdd
      .mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.max <= 13, s"degenerate stride: $perPart")
    assert(probed.count() == 25)

    // write path: append new rows, read back through the same interface
    val more = Seq((26L, "https://x.be/classified/house/for-sale/a/1000/26",
      26L, "pending")).toDF("id", "url", "classified_id", "status")
      .withColumn("last_checked", lit(null).cast("timestamp"))
      .withColumn("created_at", lit(java.sql.Timestamp.valueOf("2024-06-02 00:00:00")))
      .withColumn("updated_at", lit(java.sql.Timestamp.valueOf("2024-06-02 00:00:00")))
    JdbcStore.writeTable(more, url, "links")
    assert(JdbcStore.readTable(spark, url, "links").count() == 26)
  }
}
