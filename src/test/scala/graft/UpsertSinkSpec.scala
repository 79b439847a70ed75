package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.UpsertSink

/** Streaming upsert sink: foreachBatch + MERGE, idempotent under replay. */
class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshDirs(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("upsert").toString
    (s"$base/target", s"$base/ckpt")
  }

  test("applyBatch merges updates + inserts; replaying a batch is a no-op") {
    val (target, _) = freshDirs()
    val b1 = Seq((1L, "a", 10L), (2L, "b", 11L)).toDF("k", "v", "seq")
    UpsertSink.applyBatch(spark, b1, target, Seq("k"), "seq")

    // batch 2: update k=1 (two versions in-batch, later seq wins), insert k=3
    val b2 = Seq((1L, "a1", 20L), (1L, "a2", 21L), (3L, "c", 22L))
      .toDF("k", "v", "seq")
    UpsertSink.applyBatch(spark, b2, target, Seq("k"), "seq")
    val afterOnce = spark.read.parquet(target).orderBy("k")
      .as[(Long, String, Long)].collect().toSeq
    assert(afterOnce == Seq((1L, "a2", 21L), (2L, "b", 11L), (3L, "c", 22L)))

    // replay batch 2 (at-least-once delivery): state must not change
    UpsertSink.applyBatch(spark, b2, target, Seq("k"), "seq")
    val afterReplay = spark.read.parquet(target).orderBy("k")
      .as[(Long, String, Long)].collect().toSeq
    assert(afterReplay == afterOnce, "replayed batch changed the target")
  }

  test("applyBatch on an empty batch leaves a missing target absent") {
    val (target, _) = freshDirs()
    UpsertSink.applyBatch(spark, Seq.empty[(Long, String, Long)]
      .toDF("k", "v", "seq"), target, Seq("k"), "seq")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(target)))
  }

  test("attach drains a MemoryStream through the merge sink") {
    val (target, ckpt) = freshDirs()
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    mem.addData((1L, "x", 1L), (2L, "y", 2L), (1L, "x2", 3L))
    val q = UpsertSink.attach(mem.toDF().toDF("k", "v", "seq"),
      target, ckpt, Seq("k"), "seq")
    try q.awaitTermination(60000) finally q.stop()
    val got = spark.read.parquet(target).orderBy("k")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "x2", 3L), (2L, "y", 2L)))
  }
}
