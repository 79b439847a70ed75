package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(name).resolve("out").toString

  test("clusteredWrite yields pairwise-disjoint per-file ranges (data skipping)") {
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    val path = tmp("layout")
    Layout.clusteredWrite(docs, path, numFiles = 8, "doc_id")
    val stats = Layout.fileStats(spark, path, "doc_id")
      .as[(String, Long, Long, Long)].collect()
    assert(stats.length == 8)
    assert(stats.map(_._2).sum == docs.count())
    // sort files by their min; each file's range must end before the next begins
    val ranges = stats.map(s => (s._3, s._4)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("compact reduces file count to the byte-derived target and keeps clustering") {
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    val fragmented = tmp("frag")
    // simulate incremental appends: 64 tiny files
    docs.repartition(64).write.parquet(fragmented)
    val sizeBytes = {
      val p = new org.apache.hadoop.fs.Path(fragmented)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
    }
    val compacted = tmp("compact")
    // target half the directory size -> expect 2 output files
    Layout.compact(spark, fragmented, compacted, sizeBytes / 2 + 1, "doc_id")
    val stats = Layout.fileStats(spark, compacted, "doc_id")
      .as[(String, Long, Long, Long)].collect()
    assert(stats.length == 2)
    assert(stats.map(_._2).sum == docs.count())
    val Array((_, hi1), (lo2, _)) = stats.map(s => (s._3, s._4)).sortBy(_._1)
    assert(hi1 < lo2)
    // round-trip content equality
    val back = spark.read.parquet(compacted)
    assert(back.select(sum($"doc_id")).as[Long].head() ==
      docs.select(sum($"doc_id")).as[Long].head())
  }
}
