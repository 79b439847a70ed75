package graft.jobs

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JobsSpec extends SparkSpec {
  import spark.implicits._

  test("S12: appendDedup is an idempotent INSERT-OR-IGNORE (dedup-then-union)") {
    val dir = java.nio.file.Files.createTempDirectory("props").toString + "/t"
    val a = Seq((1L, "x"), (2L, "y")).toDF("link_id", "v")
    ScrapeJob.appendDedup(spark, a, dir, "link_id")
    // second batch overlaps on key 2 — existing row wins, only key 3 appends
    val b = Seq((2L, "y2"), (3L, "z")).toDF("link_id", "v")
    ScrapeJob.appendDedup(spark, b, dir, "link_id")
    val got = spark.read.parquet(dir).orderBy("link_id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "x"), (2L, "y"), (3L, "z")))
    // replaying the same batch is a no-op
    ScrapeJob.appendDedup(spark, b, dir, "link_id")
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("overwriteAtomic swaps the directory without partial states") {
    val dir = java.nio.file.Files.createTempDirectory("ow").toString + "/t"
    ScrapeJob.overwriteAtomic(spark, Seq(1, 2, 3).toDF("v"), dir)
    assert(spark.read.parquet(dir).count() == 3)
    ScrapeJob.overwriteAtomic(spark, Seq(4).toDF("v"), dir)
    assert(spark.read.parquet(dir).as[Int].collect().toSeq == Seq(4))
  }

  test("graft_dot is callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(got == 11.0)
  }

  test("A13: correlationMatrix computes all pairs in one pass") {
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.1, -4.2))
      .toDF("a", "b", "c")
    val m = graft.ops.Aggregates.correlationMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m.size == 3)
    assert(m(("a", "b")) > 0.999 && m(("a", "c")) < -0.99)
  }
}
