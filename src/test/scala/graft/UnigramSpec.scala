package graft

import org.apache.spark.sql.functions._

import graft.text.Unigram

/** Unigram-LM tokenizer: hand-computed learn fixture, Viterbi tie-break
  * contract, native-Column vs imperative path equivalence, and the
  * segmentation-is-a-partition invariant on real data.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("learn: hand-computed trajectory on a one-word corpus") {
    // corpus "ab ab ab" -> words {ab: 3}; seeds a/b/ab all count 3,
    // T0 = 9, every seed score = round6(ln(1/3)) = -1.098612.
    // Viterbi("ab"): best piece is "ab" (one piece beats two at equal
    // per-piece score) -> usage {ab: 3}; chars kept at usage 0 with the
    // +1 floor -> adj {ab: 3, a: 1, b: 1}, T = 5.
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val pieces = Unigram.learn(docs, col("text"), maxPieceLen = 2,
      seedSize = 10, vocabSize = 8, rounds = 1, maxWordLen = 8)
    assert(pieces == Seq(
      Unigram.Piece("a", 0L, math.rint(math.log(1.0 / 5) * 1e6) / 1e6),
      Unigram.Piece("ab", 3L, math.rint(math.log(3.0 / 5) * 1e6) / 1e6),
      Unigram.Piece("b", 0L, math.rint(math.log(1.0 / 5) * 1e6) / 1e6)))
  }

  test("viterbi ties prefer the longest piece, both paths") {
    // score(aa) = 2*score(a): every segmentation of "aaaa"/"aaa" ties; the
    // longest-LAST-piece rule (ties resolved per DP cell, backtrack from
    // the end) must yield ["aa","aa"] and ["a","aa"], never char spans
    val vocab = Seq(Unigram.Piece("a", 1L, -1.0), Unigram.Piece("aa", 1L, -2.0))
    val docs = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val native = Unigram.encode(docs, col("text"), vocab, maxPieceLen = 2,
      maxWordLen = 8).select("unigram_tokens").as[Seq[String]].head()
    assert(native == Seq("aa", "aa", "a", "aa"))
    val imperative = Unigram.encode(docs, col("text"), vocab,
      maxPieceLen = 2, maxWordLen = 8, maxNativeVocab = 0)
      .select("unigram_tokens").as[Seq[String]].head()
    assert(imperative == native)
  }

  test("native and mapPartitions encode agree on real documents") {
    val docs = Tables.documents(spark, sf001)
    val vocab = Unigram.learn(docs, col("text"))
    val native = Unigram.encode(docs, col("text"), vocab)
      .select(col("doc_id"), col("unigram_tokens"))
      .as[(Long, Seq[String])].collect().toMap
    val imp = Unigram.encode(docs, col("text"), vocab, maxNativeVocab = 0)
      .select(col("doc_id"), col("unigram_tokens"))
      .as[(Long, Seq[String])].collect().toMap
    assert(native == imp)
    assert(native.values.exists(_.nonEmpty))
  }

  test("segmentations partition each word; OOV and long words char-split") {
    val docs = Tables.documents(spark, sf001)
    val vocab = Unigram.learn(docs, col("text"))
    val bad = docs.limit(20)
      .withColumn("text", concat(col("text"), lit(" zz9q longwordexceedingthebound")))
    val rows = Unigram.encode(bad, col("text"), vocab)
      .select(col("text"), col("unigram_tokens"))
      .as[(String, Seq[String])].collect()
    rows.foreach { case (text, toks) =>
      // concatenating tokens reproduces the text without spaces
      assert(toks.mkString("") == text.split(" ").filter(_.nonEmpty).mkString(""))
    }
    // the vocab normalizes: sum of exp(logp) ~ 1 over learned pieces
    val mass = vocab.map(p => math.exp(p.logp)).sum
    assert(math.abs(mass - 1.0) < 1e-3)
  }
}
