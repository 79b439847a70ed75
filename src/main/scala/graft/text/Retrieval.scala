package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse retrieval over the corpus: BM25 scoring and the inverted-index
  * build behind it — corpus search is how curation pipelines find near-topic
  * documents, build hard negatives, and spot-check dedup output.
  *
  * Scale shape: token explode is filtered to the query's terms BEFORE any
  * shuffle (the term list is a broadcast literal set), so per-query work is
  * proportional to the query terms' posting lists, not the corpus. Term
  * statistics (df per query term) are a tiny aggregate joined back by
  * broadcast. For repeated querying, [[buildInvertedIndex]] materializes
  * (term, doc, tf) postings partitioned by term hash once.
  */
object Retrieval {

  /** BM25 top scores for a bag-of-words query. Returns (idCol, score)
    * rounded to 6 decimals — deterministic total order with the id
    * tiebreak. k1/b are the standard Robertson defaults.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: Column,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val withLen = graft.ops.Spread.forAmplification(docs, col(idCol))
      .select(col(idCol), TextAnalysis.tokens(textCol).as("__toks"))
      .withColumn("__dl", size(col("__toks")))
    // per-(doc, term) term frequency — only rows matching query terms shuffle
    val tf = withLen
      .select(col(idCol), col("__dl"), explode(col("__toks")).as("__term"))
      .filter(col("__term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    // corpus stats: N docs, average doc length (ALL docs, not just matches)
    val statsRow = withLen.agg(
      count(lit(1)).as("n"), sum(col("__dl")).as("sumdl")).head()
    val n = statsRow.getLong(0)
    // empty corpus: sum() is null and avgdl would be 0/0 — return the empty
    // score table rather than NPE (a new source with no documents yet)
    if (n == 0L) return tf.select(col(idCol), lit(0.0).as("score")).limit(0)
    val avgdl = statsRow.getLong(1).toDouble / n
    // document frequency per query term (matched rows only — tiny)
    val dfT = tf.groupBy("__term").agg(count(lit(1)).as("__df"))
    // Lucene-style non-negative idf: ln((N - df + 0.5)/(df + 0.5) + 1)
    val idf = log((lit(n.toDouble) - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0)
    val scored = tf.join(broadcast(
        dfT.select(col("__term"), idf.as("__idf"))), Seq("__term"))
      .withColumn("__s",
        col("__idf") * (col("__tf") * (k1 + 1)) /
          (col("__tf") + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / avgdl)))
    scored.groupBy(col(idCol))
      .agg(round(sum(col("__s")), 6).as("score"))
  }

  /** Reciprocal-rank fusion of ranked retrieval lists (Cormack et al. 2009):
    * each list contributes 1/(k + rank) per document; the summed score
    * fuses heterogeneous rankers (BM25 + dense ANN being the standard
    * hybrid-retrieval pair) without calibrating their score scales.
    * Inputs are (id, rank) frames whose size is the per-ranker top-k, so
    * everything after the rankers is bounded-by-k work: a union of tiny
    * frames, one aggregate. Contributions are decimal-cast before summing
    * (order-independent), total rounded to 6.
    *
    * Each input list is first deduplicated on id keeping its BEST (minimum)
    * rank: a ranker that emits the same id twice would otherwise silently
    * double-count its contribution and inflate `n_lists` past the number of
    * rankers. The dedup is a groupBy over an already-k-bounded frame — free.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    rankings
      .map(_.groupBy(col(idCol)).agg(min(col(rankCol)).as(rankCol))
        .select(col(idCol),
          (lit(1.0) / (lit(kRrf) + col(rankCol))).as("__contrib")))
      .reduce(_.unionByName(_))
      .groupBy(col(idCol))
      .agg(
        round(sum(col("__contrib").cast("decimal(38,12)")).cast("double"), 6)
          .as("rrf"),
        count(lit(1)).as("n_lists"))
  }

  /** Inverted index: (term, doc, tf) postings, written partitioned by a
    * bounded term-hash bucket (a raw term partition column would create one
    * directory per vocabulary word). Query-time: bucket pruning narrows the
    * read to the query terms' buckets, then the in-bucket term filter is a
    * pushed parquet predicate.
    */
  def buildInvertedIndex(docs: DataFrame, idCol: String, textCol: Column,
      path: String, buckets: Int = 64): Unit =
    graft.ops.Spread.forAmplification(docs, col(idCol))
      .select(col(idCol), explode(TextAnalysis.tokens(textCol)).as("term"))
      .groupBy(col("term"), col(idCol)).agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(hash(col("term")), lit(buckets)))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Posting lookup against a stored index: reads only the terms' hash
    * buckets (partition pruning) and pushes the term filter into the scan.
    */
  def lookupPostings(spark: org.apache.spark.sql.SparkSession, path: String,
      terms: Seq[String], buckets: Int = 64): DataFrame = {
    import spark.implicits._
    // bucket ids via Spark's own hash() so they always match the writer
    val wanted = terms.toDF("t")
      .select(pmod(hash(col("t")), lit(buckets))).as[Int].collect().distinct
    spark.read.parquet(path)
      .filter(col("bucket").isin(wanted.toSeq: _*))
      .filter(col("term").isin(terms: _*))
  }

}
