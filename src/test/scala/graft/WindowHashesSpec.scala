package graft

import graft.text.TextAnalysis.{gramHash64, windowHashes64}

import org.apache.spark.sql.functions._

/** [[graft.functions.WindowHashes]] / [[graft.functions.GramHash]] — the
  * prune hash of the exact-substring family. Contracts under test:
  * (1) window/gram agreement: windowHashes64(s, sub)[i] equals
  * gramHash64(substring(s, i+1, sub)) for every position — the invariant
  * the ExactSubstrIndex build/probe split relies on (probe hashes windows,
  * the index stores whole-gram hashes); (2) both are CODE-POINT indexed so
  * the alignment survives surrogate pairs (non-BMP chars), exactly like
  * Spark's substring; (3) short/empty inputs yield an empty array, never
  * null elements; (4) the codegen'd path equals the interpreted path
  * (both delegate to WindowHashes.compute, but the plan shapes differ —
  * pin it anyway against a future split).
  */
class WindowHashesSpec extends SparkSpec {

  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaaaaaaaaaa", // max self-overlap
    "abcabcabcabcabc",
    "naïve café — déjà vu; ñandú", // 2-byte UTF-8
    "emoji 😀 pair 😁 and 🤖 tail", // surrogate pairs
    "short",
    "",
    "exactly8" // == sub for sub=8
  )

  test("windowHashes64(s, sub)[i] == gramHash64(substring(s, i+1, sub)), " +
      "incl. surrogate pairs") {
    for (sub <- Seq(3, 8)) {
      val df = texts.toDF("t")
        .select(col("t"),
          posexplode(windowHashes64(col("t"), sub)).as(Seq("p0", "h")))
        .select(col("h"),
          gramHash64(col("t").substr(col("p0") + 1, lit(sub))).as("g"))
      assert(df.filter(col("h") =!= col("g")).count() === 0,
        s"window/gram hash disagreement at sub=$sub")
      // and the window COUNT matches numCodePoints - sub + 1
      val counts = texts.toDF("t")
        .select(length(col("t")).as("n"),
          size(windowHashes64(col("t"), sub)).as("m")).collect()
      counts.foreach { r =>
        val expected = math.max(r.getAs[Int]("n") - sub + 1, 0)
        assert(r.getAs[Int]("m") === expected)
      }
    }
  }

  test("null text -> null array; short text -> empty array") {
    val df = Seq(Some("ab"), None).toDF("t")
      .select(windowHashes64(col("t"), 8).as("w"))
    val rows = df.collect()
    assert(rows.exists(_.isNullAt(0)))
    assert(rows.exists(r => !r.isNullAt(0) && r.getSeq[Long](0).isEmpty))
  }

  test("distinct grams hash distinctly on a real corpus sample (no " +
      "catastrophic collisions) and equal grams hash equal") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val grams = docs.filter(col("text").isNotNull && length(col("text")) >= 24)
      .select(explode(transform(
        sequence(lit(1), least(length(col("text")) - 23, lit(40))),
        i => col("text").substr(i, lit(24)))).as("g"))
    val agg = grams.groupBy("g").agg(count(lit(1)).as("n"))
      .select(gramHash64(col("g")).as("h"), col("g"))
    val nGrams = agg.count()
    val nHashes = agg.select("h").distinct().count()
    // ~60-bit space over a few thousand grams: any collision at all would
    // be a 1-in-1e13 event — treat it as an implementation bug
    assert(nHashes === nGrams, s"$nGrams distinct grams, $nHashes hashes")
  }

  test("interpreted eval equals the codegen'd column path") {
    import org.apache.spark.unsafe.types.UTF8String
    val s = "emoji 😀 pair 😁 rolling hash check"
    val interp = graft.functions.WindowHashes
      .compute(UTF8String.fromString(s), 8).toLongArray().toSeq
    val viaPlan = Seq(s).toDF("t")
      .select(windowHashes64(col("t"), 8).as("w"))
      .head().getSeq[Long](0)
    assert(interp === viaPlan)
  }
}
