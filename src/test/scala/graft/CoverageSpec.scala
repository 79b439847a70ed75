package graft

import org.apache.spark.sql.functions._

import graft.enrich.Geocode
import graft.ingest.LinkState
import graft.text.{DedupOps, TextAnalysis}

/** Coverage for the remaining SURVEY §2 rows: S9 JSON cache artifact, J9 FK
  * integrity, the Spark-ML LSH variant, BPE-ish tokens.
  */
class CoverageSpec extends SparkSpec {
  import spark.implicits._

  test("S9: geocode cache JSON artifact roundtrips through the reference shape") {
    val cache = Seq(("evere 1140", 50.8720096, 4.4034182),
      ("chaumont-gistoux 1325", 50.6839808, 4.6974182))
      .toDF("norm_addr", "lat", "lon")
    val p = java.nio.file.Files.createTempFile("cache", ".json").toString
    Geocode.saveCacheJson(cache, p)
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(p))
    assert(txt.startsWith("{\"chaumont-gistoux 1325\": [50.6839808, 4.6974182]"))
    val back = Geocode.loadCacheJson(spark, p)
      .orderBy("norm_addr").as[(String, Double, Double)].collect().toSeq
    assert(back == Seq(("chaumont-gistoux 1325", 50.6839808, 4.6974182),
      ("evere 1140", 50.8720096, 4.4034182)))
  }

  test("J9: orphanProperties flags FK violations, empty when integrity holds") {
    val links = Seq((11111111L, "scraped"), (22222222L, "pending"))
      .toDF("classified_id", "status")
    val props = Seq((1L, 11111111L), (2L, 99999999L)).toDF("id", "link_id")
    val orphans = LinkState.orphanProperties(props, links)
    assert(orphans.select("id").as[Long].collect().toSeq == Seq(2L))
    val clean = props.filter($"link_id" =!= 99999999L)
    assert(LinkState.orphanProperties(clean, links).isEmpty)
  }

  test("Spark-ML MinHashLSH variant finds the identical pair") {
    val docs = Seq(
      (1L, "x y z w v u t s r q"), (2L, "x y z w v u t s r q"),
      (3L, "completely different words here with no overlap at all ok"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.minhashLshML(docs, "doc_id", $"text", 2, 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("BPE-ish tokens split on word boundaries and digit/letter transitions") {
    val got = Seq("abc123-def, ghi").toDF("t")
      .select(TextAnalysis.bpeIshTokens($"t")).as[Seq[String]].head()
    assert(got == Seq("abc", "123", "-", "def", ",", "ghi"))
  }

  test("salted aggregate equals the direct aggregate on skewed data") {
    // 90% of rows share one hot key
    val rows = Seq.tabulate(2000)(i => (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toDouble))
    val df = rows.toDF("k", "v").repartition(8)
    val direct = df.groupBy("k")
      .agg(sum($"v".cast("decimal(28,2)")).cast("double").as("sum_value"),
        count(lit(1)).as("cnt"))
      .orderBy("k").collect().toSeq
    val salted = graft.ops.Skew.saltedSumCount(df, "k", "v")
      .orderBy("k").collect().toSeq
    assert(salted == direct)
  }

  test("salted join equals the direct join") {
    val big = Seq.tabulate(500)(i => (if (i % 5 == 0) "a" else "b", i)).toDF("k", "v")
    val small = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "w")
    val direct = big.join(small, Seq("k")).agg(sum($"v" * $"w")).head().getDouble(0)
    val salted = graft.ops.Skew.saltedJoin(big, small, "k")
      .agg(sum($"v" * $"w")).head().getDouble(0)
    assert(salted == direct)
  }

  test("A8: df.summary provides the describe() statistics") {
    val s = Tables.orders(spark, sf001).select("o_totalprice").summary()
    val stats = s.select("summary").as[String].collect().toSeq
    assert(Seq("count", "mean", "stddev", "min", "25%", "50%", "75%", "max")
      .forall(stats.contains))
  }
}
