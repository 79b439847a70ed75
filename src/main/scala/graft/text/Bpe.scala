package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — a REAL
  * learned subword tokenizer, the production counterpart of
  * [[TextAnalysis.bpeIshTokens]]'s regex proxy. Training is the part that
  * must scale with the corpus, and it does: the corpus collapses once into
  * a (word, freq) table (one groupBy — distinct words, not documents), and
  * every merge round is ONE distributed aggregate over that table's
  * adjacent symbol pairs plus one projection applying the winning merge.
  * The driver holds only the learned merge list (nMerges rows) and the
  * 1-row argmax per round; documents are never re-scanned after the first
  * collapse.
  *
  * Encoding (applying learned merges to new text) is inherently an
  * imperative per-word loop; it runs as a JVM UDF over a broadcast merge
  * table (see [[encode]]).
  */
object Bpe {

  /** End-of-word marker, as in the original BPE formulation (lets the
    * tokenizer distinguish word-final subwords). */
  val Eow = "</w>"

  /** Greedy left-to-right application of ONE merge as a Column fold — the
    * distributed twin of [[applyMerge]], shared by learnMerges' per-round
    * projection and [[encodeColumn]]'s merge chain. Column DSL + lit(),
    * NOT SQL-string splicing: symbols containing quotes/backslashes must
    * never be parsed as SQL text. (Spark's And short-circuits, so
    * element_at on the empty acc never runs.)
    */
  private[text] def applyMergeColumn(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** NATIVE bpe encode of a text column with a BOUNDED learned merge list:
    * per word, the character+EOW symbols run through the merges in learned
    * order as a chain of [[applyMergeColumn]] folds — expression depth =
    * |merges|, all inside whole-stage codegen, no UDF, no broadcast
    * variable. The bound exists because a 30k-merge production table would
    * build a 30k-deep expression; [[encode]] dispatches to a mapPartitions
    * path beyond the bound.
    */
  def encodeColumn(textCol: Column, merges: Seq[(String, String)]): Column = {
    // null text → empty token list (matching the imperative path), not null
    val words = filter(split(coalesce(textCol, lit("")), " "), w => length(w) > 0)
    flatten(transform(words, w =>
      merges.foldLeft(concat(split(w, ""), array(lit(Eow)))) {
        case (syms, (a, b)) => applyMergeColumn(syms, a, b)
      }))
  }

  /** Split a word into initial symbols: characters plus the EOW marker. */
  private def initialSymbols(word: String): Seq[String] =
    word.map(_.toString) :+ Eow

  /** Greedy left-to-right application of ONE merge to a symbol sequence —
    * the same fold the distributed projection uses, exposed for encode. */
  private[text] def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, s) =>
      if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
      else acc :+ s
    }

  /** Encode one word with a learned merge list (applied in learned order). */
  private[text] def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(initialSymbols(word)) { case (syms, (a, b)) =>
      applyMerge(syms, a, b)
    }

  /** Learn `nMerges` BPE merges from the corpus. Returns (left, right,
    * pairFreq) in merge order. Deterministic: the argmax tie-breaks on
    * (freq desc, left asc, right asc), so re-runs and engines agree.
    */
  def learnMerges(df: DataFrame, textCol: Column, nMerges: Int): Seq[(String, String, Long)] = {
    val spark = df.sparkSession
    // corpus → (word, freq): the one document-scale pass
    var words = graft.ops.Spread.forAmplification(df)
      .select(explode(TextAnalysis.tokens(textCol)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        concat(split(col("w"), ""), array(lit(Eow))).as("syms"))
      .localCheckpoint(true)

    val merges = Seq.newBuilder[(String, String, Long)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      // adjacent (overlapping) pair counts weighted by word frequency
      val top = words
        // IF guards fully-merged single-symbol words: sequence(1, 0) would
        // DESCEND (Spark gotcha), fabricating a null pair
        .select(col("freq"), explode(expr(
          "IF(size(syms) < 2, array(), transform(sequence(1, size(syms) - 1), " +
            "i -> struct(syms[i - 1] AS a, syms[i] AS b)))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      top.headOption match {
        case None => done = true
        case Some(r: Row) =>
          val (a, b, n) = (r.getString(0), r.getString(1), r.getLong(2))
          merges += ((a, b, n))
          // apply the merge everywhere: greedy left-to-right fold per word;
          // checkpoint keeps the plan flat across rounds (iterative-DF trap)
          words = words.select(col("freq"),
            applyMergeColumn(col("syms"), a, b).as("syms"))
            .localCheckpoint(true)
          i += 1
      }
    }
    merges.result()
  }

  /** Persist a learned merge table as a tiny ordered parquet artifact —
    * learn once on the corpus, encode many batches/streams later without
    * retraining (the tokenizer-release shape). Rank preserves application
    * order across the round-trip.
    */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String, Long)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b, n), i) => (i + 1, a, b, n) }
      .toDF("rank", "left", "right", "pair_freq")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String, Long)] =
    spark.read.parquet(path).orderBy("rank")
      .select("left", "right", "pair_freq")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq

  /** Distributed encode: tokenize each document and segment every word with
    * the learned merges. Bounded merge lists (the common analytic case)
    * compile to the pure-Column [[encodeColumn]] chain — whole-stage
    * codegen, no UDF. Production-size tables (30k+ merges) would build an
    * unusably deep expression, so beyond `maxNativeMerges` the encode runs
    * as per-partition imperative code with the merge table broadcast once
    * per executor (`mapPartitions` — the documented rung for genuinely
    * imperative work; no per-row SerDe of the table, no Scala UDF).
    * Output: (original columns..., bpe_tokens array, n_bpe_tokens).
    * Both paths produce identical rows (spec-pinned).
    */
  def encode(df: DataFrame, textCol: Column,
      merges: Seq[(String, String, Long)], maxNativeMerges: Int = 64): DataFrame = {
    val mergeList = merges.map(m => (m._1, m._2))
    if (mergeList.size <= maxNativeMerges) {
      df.withColumn("bpe_tokens", encodeColumn(textCol, mergeList))
        .withColumn("n_bpe_tokens", size(col("bpe_tokens")))
    } else {
      import org.apache.spark.sql.{Encoders, Row => SqlRow}
      import org.apache.spark.sql.types._
      val spark = df.sparkSession
      val bc = spark.sparkContext.broadcast(mergeList)
      // a UNIQUE scratch name: withColumn on an existing name replaces it
      // IN PLACE, which would silently break the last-column indexing below
      val textName = Iterator.from(0).map(i => s"__bpe_text_$i")
        .find(n => !df.columns.contains(n)).get
      val withText = df.withColumn(textName, textCol)
      val outSchema = StructType(
        withText.schema.fields.dropRight(1) ++ Seq(
          StructField("bpe_tokens", ArrayType(StringType, containsNull = false)),
          StructField("n_bpe_tokens", IntegerType, nullable = false)))
      withText.mapPartitions { it =>
        val ms = bc.value
        it.map { r =>
          val text = r.getString(r.length - 1)
          val toks: Seq[String] =
            if (text == null) Seq.empty
            else text.split(" ").iterator.filter(_.nonEmpty)
              .flatMap(w => encodeWord(w, ms)).toSeq
          SqlRow.fromSeq(r.toSeq.dropRight(1) ++ Seq(toks, toks.size))
        }
      }(Encoders.row(outSchema))
    }
  }
}
