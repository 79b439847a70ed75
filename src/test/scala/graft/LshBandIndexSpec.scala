package graft

import org.apache.spark.sql.functions._

import graft.text.{DedupOps, LshBandIndex}

/** Persistable LSH band index: build + add must equal a from-scratch build
  * of the union corpus, probes must return exactly the cross-corpus band
  * matches, the bucket cap must be deterministic, and the on-disk layout
  * must be the (band_id, bucket) partition tree.
  */
class LshBandIndexSpec extends SparkSpec {
  import spark.implicits._

  // near-dup families: docs sharing a template collide in every band;
  // unique docs collide in none (fixture asserted non-vacuous below)
  private def corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 1
    (3L, "totally different text with its own words here"),
    (4L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 1
    (5L, "totally different text with its own words here"), // dup of 3
    (6L, "a third family of words unrelated to both others")
  ).toDF("doc_id", "text")

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"lshidx_$tag").toFile
    d.delete(); d.getAbsolutePath
  }

  test("build(A) + add(B) == build(A union B) as the stored relation") {
    val a = corpus.filter(col("doc_id") <= 3)
    val b = corpus.filter(col("doc_id") > 3)
    val incDir = tmpDir("inc")
    val fullDir = tmpDir("full")
    LshBandIndex.build(a, "doc_id", col("text"), incDir, buckets = 4)
    val added = LshBandIndex.add(spark, incDir, b, "doc_id", col("text"))
    assert(added == 3 * 3) // 3 docs x 3 bands
    LshBandIndex.build(corpus, "doc_id", col("text"), fullDir, buckets = 4)
    def rel(dir: String) = LshBandIndex.loadBands(spark, dir)
      .select("doc", "band_id", "band_val", "bucket").collect().toSet
    assert(rel(incDir) == rel(fullDir))
  }

  test("add is idempotent: re-adding docs (whole or overlapping batches) " +
      "appends nothing and the relation still equals a from-scratch build") {
    val a = corpus.filter(col("doc_id") <= 3)
    val b = corpus.filter(col("doc_id") > 3)
    val incDir = tmpDir("idem")
    val fullDir = tmpDir("idemfull")
    LshBandIndex.build(a, "doc_id", col("text"), incDir, buckets = 4)
    // re-adding the already-indexed half is a no-op
    assert(LshBandIndex.add(spark, incDir, a, "doc_id", col("text")) == 0L)
    // an overlapping batch (one old doc, three new) appends only the new
    val overlap = corpus.filter(col("doc_id") >= 3) // doc 3 already indexed
    assert(LshBandIndex.add(spark, incDir, overlap, "doc_id",
      col("text")) == 3 * 3)
    // a crash-retry of the same batch appends nothing
    assert(LshBandIndex.add(spark, incDir, b, "doc_id", col("text")) == 0L)
    LshBandIndex.build(corpus, "doc_id", col("text"), fullDir, buckets = 4)
    def rel(dir: String) = LshBandIndex.loadBands(spark, dir)
      .select("doc", "band_id", "band_val", "bucket").collect().toSet
    def cnt(dir: String) = LshBandIndex.loadBands(spark, dir).count()
    assert(rel(incDir) == rel(fullDir))
    assert(cnt(incDir) == cnt(fullDir)) // no duplicate band rows either
  }

  test("add of a CONTENT-CHANGED doc fails loudly (idempotent, not upsert)") {
    val dir = tmpDir("mut")
    LshBandIndex.build(corpus, "doc_id", col("text"), dir, buckets = 4)
    // doc 1 re-added with different text: stale band rows would otherwise
    // silently survive the (doc, band_id) dedup — must raise instead
    val mutated = Seq((1L, "completely rewritten body for document one"))
      .toDF("doc_id", "text")
    val err = intercept[IllegalStateException] {
      LshBandIndex.add(spark, dir, mutated, "doc_id", col("text"))
    }
    assert(err.getMessage.contains("rebuild"), err.getMessage)
    // and the stored relation is untouched by the failed add
    val full = tmpDir("mutfull")
    LshBandIndex.build(corpus, "doc_id", col("text"), full, buckets = 4)
    def rel(d: String) = LshBandIndex.loadBands(spark, d)
      .select("doc", "band_id", "band_val", "bucket").collect().toSet
    assert(rel(dir) == rel(full))
  }

  test("probePairs returns exactly the cross-corpus band matches") {
    val dir = tmpDir("probe")
    val indexed = corpus.filter(col("doc_id") <= 4)
    val batch = corpus.filter(col("doc_id") > 4)
    LshBandIndex.build(indexed, "doc_id", col("text"), dir, buckets = 4)
    val got = LshBandIndex.probePairs(spark, dir, batch,
      "doc_id", col("text")).orderBy("idx_doc", "probe_doc")
      .as[(Long, Long)].collect().toSeq
    // expected: batch doc 5 (dup of indexed 3); doc 6 matches nothing;
    // derived independently from the batch operator on the union corpus,
    // restricted to (indexed, batch) cross pairs
    val sig = DedupOps.minhashSignatures(corpus, "doc_id", col("text"), 2)
    val expected = DedupOps.lshCandidatePairs(sig, "doc_id")
      .as[(Long, Long)].collect().toSeq
      .flatMap { case (d1, d2) => Seq((d1, d2), (d2, d1)) }
      .filter { case (i, p) => i <= 4 && p > 4 }
      .sorted
    assert(got == expected)
    assert(got.contains((3L, 5L))) // non-vacuous
    assert(!got.exists(_._2 == 6L))
  }

  test("maxBucket cap keeps the smallest doc ids, deterministically") {
    val dir = tmpDir("cap")
    LshBandIndex.build(corpus.filter(col("doc_id") <= 4), "doc_id",
      col("text"), dir, buckets = 4)
    // docs 1,2,4 share every band; cap 2 keeps {1,2} per bucket
    val probe = Seq((9L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val capped = LshBandIndex.probePairs(spark, dir, probe,
      "doc_id", col("text"), maxBucket = 2)
      .as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 9L), (2L, 9L)))
    val uncapped = LshBandIndex.probePairs(spark, dir, probe,
      "doc_id", col("text")).as[(Long, Long)].collect().toSet
    assert(uncapped == Set((1L, 9L), (2L, 9L), (4L, 9L)))
  }

  test("on-disk layout is the (band_id, bucket) partition tree") {
    val dir = tmpDir("layout")
    LshBandIndex.build(corpus, "doc_id", col("text"), dir, buckets = 4)
    val bandDirs = new java.io.File(s"$dir/bands").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(bandDirs.forall(_.startsWith("band_id=")))
    assert(bandDirs.nonEmpty)
    val bucketDirs = new java.io.File(s"$dir/bands/${bandDirs.head}")
      .listFiles().filter(_.isDirectory).map(_.getName)
    assert(bucketDirs.forall(_.startsWith("bucket=")))
    // meta round-trip
    val meta = LshBandIndex.loadMeta(spark, dir)
    assert(meta == LshBandIndex.Meta(2, 2, 4))
  }
}
