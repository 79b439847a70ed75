package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (the SentencePiece family, Kudo 2018) —
  * the OTHER tokenizer LLM pipelines actually ship, completing the learned
  * pair next to BPE ([[Bpe]]): pieces are scored by log-probability and a
  * word's tokenization is the Viterbi-best segmentation, not a greedy
  * merge replay.
  *
  * This is the deterministic HARD-EM re-expression (Viterbi-EM): the
  * E-step segments every distinct word with the current piece scores, the
  * M-step re-estimates scores from Viterbi usage counts — integers, so the
  * whole trajectory replays exactly in an external engine. (Reference
  * SentencePiece runs full forward-backward EM with random-ish pruning
  * schedules; hard EM is the standard deterministic variant and keeps the
  * oracle-exactness contract every operator here carries.) Every float in
  * the trajectory is ROUND-6 at birth (scores, DP cells), so both engines
  * compare identical doubles — the q281 trajectory discipline.
  *
  * Scale shape (the BPE lesson): the corpus collapses ONCE into a
  * (word, freq) table; seeding is one substring explode + keyed count;
  * each EM round is one distributed segmentation projection (pure Column
  * DP — whole-stage codegen, no UDF) + one keyed usage aggregate. Only the
  * VOCABULARY (bounded by seedSize) ever reaches the driver; documents are
  * scanned once, distinct words stay distributed.
  *
  * Semantics pinned for the oracle:
  *  - seed = every substring of length 1..maxPieceLen of every word
  *    (every occurrence, word-frequency weighted); kept = top `seedSize`
  *    by (count desc, piece asc) UNION all single chars (coverage);
  *  - score(p) = round6(ln(cnt_p / T)) over the kept set;
  *  - Viterbi DP left-to-right, cell = round6(best[i] + score(piece)),
  *    argmax ties prefer the LONGEST piece;
  *  - usage = word-frequency-weighted piece counts of the Viterbi
  *    segmentations; words longer than `maxWordLen` char-split (never hit
  *    on token-ish corpora; bounds the DP unroll);
  *  - M-step: drop multi-char pieces with zero usage; adj = usage + 1 for
  *    single chars (the char floor — chars must never leave the vocab or
  *    score -inf); score = round6(ln(adj / T_round));
  *  - final: top `vocabSize` by (adj desc, piece asc) UNION single chars,
  *    scores renormalized over the kept set.
  */
object Unigram {

  /** round6 matching Spark's Round(HALF_UP on BigDecimal) — used by the
    * imperative encode path so both paths emit identical cells. */
  private[text] def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Corpus → (w, freq): the one document-scale pass. */
  def wordTable(df: DataFrame, textCol: Column): DataFrame =
    graft.ops.Spread.forAmplification(df)
      .select(explode(TextAnalysis.tokens(textCol)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Seed piece counts: every substring occurrence of length
    * 1..maxPieceLen, word-frequency weighted. One explode + one keyed
    * count — linear in Σ word_len × maxPieceLen over DISTINCT words. */
  def seedCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("freq"), explode(flatten(
        transform(sequence(lit(1), length(col("w"))), i =>
          transform(sequence(lit(1),
            least(lit(maxPieceLen), length(col("w")) - i + 1)),
            l => col("w").substr(i, l))))).as("p"))
      .groupBy("p").agg(sum("freq").as("cnt"))

  /** Viterbi-segment ONE WORD column under a bounded vocab literal: the
    * forward DP runs as one `aggregate` HOF over positions (state =
    * (bests, backs) arrays — linear expression size; a naive unrolled
    * Column chain would blow up exponentially), the backtrack as a second
    * bounded fold. Words longer than maxWordLen, or containing
    * out-of-vocab characters (possible only on unseen text — learn forces
    * corpus chars in), fall back to a deterministic char split. */
  def segmentWordColumn(w: Column, vocab: Map[String, Double],
      maxPieceLen: Int, maxWordLen: Int): Column = {
    val vmap = typedlit(vocab)
    val fwd = aggregate(
      sequence(lit(1), length(w)),
      struct(array(lit(0.0d)).as("bests"),
        array(lit(0)).as("backs")),
      (acc, j) => {
        val bests = acc.getField("bests")
        val backs = acc.getField("backs")
        val cands = (1 to maxPieceLen).map { pl =>
          val lp = when(j >= pl,
            element_at(vmap, w.substr(j - pl + 1, lit(pl))))
          when(lp.isNotNull,
            round(element_at(bests, j - pl + 1) + lp, 6))
        }
        val bj =
          if (cands.size == 1) cands.head else greatest(cands: _*)
        // longest piece wins ties: probe candidates longest-first
        val backj = (maxPieceLen - 1 to 1 by -1).foldLeft(
          when(cands(maxPieceLen - 1) === bj, lit(maxPieceLen))) {
          (wc, pl) => wc.when(cands(pl - 1) === bj, lit(pl))
        }
        struct(concat(bests, array(bj)).as("bests"),
          concat(backs, array(backj)).as("backs"))
      })
    // Bind the forward DP's (bests, backs) ONCE per word (r14 optimization,
    // guide §4 expression hot path): `fwd` is an O(L·maxPieceLen) aggregate,
    // and referencing it INSIDE the backtrack lambda would re-evaluate the
    // whole forward pass at every backtrack step (plus once more in the
    // fallback test) — O(L) full DP recomputations per word, measured 2.9 s
    // → 0.7 s on q299's sf0.1 encode. transform over a one-element array
    // materializes the struct into the lambda variable; the backtrack then
    // pays two array lookups per step. Values are bit-identical: same cells,
    // same tie-breaks, same fallbacks (UnigramSpec pins the trajectories).
    val segmented = element_at(transform(array(fwd), f => {
      val bests = f.getField("bests")
      val backs = f.getField("backs")
      val backtrack = aggregate(
        sequence(lit(1), length(w)),
        struct(length(w).as("pos"),
          array().cast("array<string>").as("pieces")),
        (acc, _) => {
          val pos = acc.getField("pos")
          val pieces = acc.getField("pieces")
          val pl = element_at(backs, pos + 1)
          when(pos > 0, struct(
            (pos - pl).as("pos"),
            concat(array(w.substr(pos - pl + 1, pl)), pieces).as("pieces")))
            .otherwise(acc)
        }).getField("pieces")
      when(element_at(bests, length(w) + 1).isNull, split(w, ""))
        .otherwise(backtrack)
    }), 1)
    // the over-length fallback is checked BEFORE the DP so an over-long
    // word never pays the forward pass at all (the old || short-circuit
    // made this true only sometimes, depending on codegen)
    when(length(w) > maxWordLen, split(w, "")).otherwise(segmented)
  }

  /** Segment every word of a TEXT column: tokenize on spaces, Viterbi per
    * word, flatten in order — [[Bpe.encodeColumn]]'s shape for the unigram
    * model. Null text → empty token list. */
  def segmentColumn(textCol: Column, vocab: Map[String, Double],
      maxPieceLen: Int, maxWordLen: Int): Column = {
    val words = filter(split(coalesce(textCol, lit("")), " "),
      w => length(w) > 0)
    flatten(transform(words,
      w => segmentWordColumn(w, vocab, maxPieceLen, maxWordLen)))
  }

  /** One learned piece: raw Viterbi usage and the renormalized round-6
    * log-probability. */
  final case class Piece(piece: String, usage: Long, logp: Double)

  /** Learn the unigram vocabulary (see class doc for the pinned
    * semantics). Driver holds only vocab-bounded state (≤ seedSize +
    * alphabet rows per barrier — the learnMerges discipline). */
  def learn(df: DataFrame, textCol: Column, maxPieceLen: Int = 4,
      seedSize: Int = 200, vocabSize: Int = 48, rounds: Int = 2,
      maxWordLen: Int = 16): Seq[Piece] = {
    require(maxPieceLen >= 1 && seedSize >= 1 && vocabSize >= 1 &&
      rounds >= 1 && maxWordLen >= maxPieceLen,
      "Unigram.learn: degenerate parameters")
    // checkpoint: the word table is re-scanned once per round
    val words = wordTable(df, textCol).localCheckpoint(true)
    val seeds = seedCounts(words, maxPieceLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bounded barriers: seedSize rows + the alphabet
    val top = seeds.orderBy(col("cnt").desc, col("p").asc).limit(seedSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val chars = seeds.filter(length(col("p")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    seeds.unpersist(blocking = false)
    val kept0 = (top ++ chars).distinct
    val t0 = kept0.map(_._2).sum
    var vocab: Seq[(String, Double)] = kept0.map { case (p, c) =>
      (p, round6(math.log(c.toDouble / t0.toDouble)))
    }
    var lastUsage = Map.empty[String, Long]
    (1 to rounds).foreach { _ =>
      val vm = vocab.toMap
      val usages = words
        .select(col("freq"), explode(segmentWordColumn(col("w"), vm,
          maxPieceLen, maxWordLen)).as("p"))
        .groupBy("p").agg(sum("freq").as("usage"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val keptR = vocab
        .map { case (p, _) => (p, usages.getOrElse(p, 0L)) }
        .filter { case (p, u) => u > 0 || p.length == 1 }
      val adj = keptR.map { case (p, u) =>
        (p, u, u + (if (p.length == 1) 1L else 0L))
      }
      val t = adj.map(_._3).sum
      vocab = adj.map { case (p, _, a) =>
        (p, round6(math.log(a.toDouble / t.toDouble)))
      }
      lastUsage = keptR.toMap
    }
    // final size cut + renormalization over the kept set
    val withAdj = vocab.map { case (p, _) =>
      val u = lastUsage.getOrElse(p, 0L)
      (p, u, u + (if (p.length == 1) 1L else 0L))
    }
    val ranked = withAdj.sortBy { case (p, _, a) => (-a, p) }
    val keptF = (ranked.take(vocabSize) ++
      withAdj.filter(_._1.length == 1)).distinct
    val tF = keptF.map(_._3).sum
    keptF.map { case (p, u, a) =>
      Piece(p, u, round6(math.log(a.toDouble / tF.toDouble)))
    }.sortBy(_.piece)
  }

  /** Persist a learned vocabulary as a tiny parquet artifact — learn once
    * on the corpus, encode many batches/streams later without retraining
    * (the [[Bpe.saveMerges]] tokenizer-release shape; production
    * tokenizers are build-once artifacts like the IVF/BM25/gram indexes).
    * Pieces are row-identified by the piece string itself (unique by
    * construction), so no ordering column is needed. */
  def save(spark: org.apache.spark.sql.SparkSession, vocab: Seq[Piece],
      path: String): Unit = {
    import spark.implicits._
    vocab.toDF("piece", "usage", "logp")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Piece] =
    spark.read.parquet(path).orderBy("piece")
      .collect()
      .map(r => Piece(r.getAs[String]("piece"), r.getAs[Long]("usage"),
        r.getAs[Double]("logp")))
      .toSeq

  /** Distributed encode with a learned vocabulary: bounded vocabs (the
    * analytic case) run the pure-Column Viterbi — whole-stage codegen, no
    * UDF; production-size vocabs (32k+) would carry an oversized map
    * literal, so beyond `maxNativeVocab` the encode runs imperatively per
    * partition with the vocab broadcast once per executor (the
    * [[Bpe.encode]] dispatch, same output bit for bit — spec-pinned).
    * Output: (original columns..., unigram_tokens, n_unigram_tokens). */
  def encode(df: DataFrame, textCol: Column, vocab: Seq[Piece],
      maxPieceLen: Int = 4, maxWordLen: Int = 16,
      maxNativeVocab: Int = 1024): DataFrame = {
    val vm = vocab.map(p => p.piece -> p.logp).toMap
    if (vm.size <= maxNativeVocab) {
      df.withColumn("unigram_tokens",
          segmentColumn(textCol, vm, maxPieceLen, maxWordLen))
        .withColumn("n_unigram_tokens", size(col("unigram_tokens")))
    } else {
      import org.apache.spark.sql.{Encoders, Row => SqlRow}
      import org.apache.spark.sql.types._
      val spark = df.sparkSession
      val bc = spark.sparkContext.broadcast(vm)
      val textName = Iterator.from(0).map(i => s"__uni_text_$i")
        .find(n => !df.columns.contains(n)).get
      val withText = df.withColumn(textName, textCol)
      val outSchema = StructType(
        withText.schema.fields.dropRight(1) ++ Seq(
          StructField("unigram_tokens",
            ArrayType(StringType, containsNull = false)),
          StructField("n_unigram_tokens", IntegerType, nullable = false)))
      withText.mapPartitions { it =>
        val v = bc.value
        it.map { r =>
          val text = r.getString(r.length - 1)
          val toks: Seq[String] =
            if (text == null) Seq.empty
            else text.split(" ").iterator.filter(_.nonEmpty)
              .flatMap(w => segmentWord(w, v, maxPieceLen, maxWordLen))
              .toSeq
          SqlRow.fromSeq(r.toSeq.dropRight(1) ++ Seq(toks, toks.size))
        }
      }(Encoders.row(outSchema))
    }
  }

  /** Imperative Viterbi twin of [[segmentWordColumn]] — identical cells
    * (same round6, same longest-piece tie-break, same fallbacks). */
  private[text] def segmentWord(w: String, vocab: Map[String, Double],
      maxPieceLen: Int, maxWordLen: Int): Seq[String] = {
    val L = w.length
    if (L > maxWordLen) return w.map(_.toString)
    val bests = Array.fill[java.lang.Double](L + 1)(null)
    val backs = Array.fill(L + 1)(0)
    bests(0) = 0.0
    var j = 1
    while (j <= L) {
      var pl = maxPieceLen min j
      while (pl >= 1) {
        vocab.get(w.substring(j - pl, j)).foreach { lp =>
          if (bests(j - pl) != null) {
            val cand = round6(bests(j - pl) + lp)
            // strict > : the longest-first scan order makes ties keep the
            // longer piece, matching the Column chain's when() order
            if (bests(j) == null || cand > bests(j)) {
              bests(j) = cand; backs(j) = pl
            }
          }
        }
        pl -= 1
      }
      j += 1
    }
    if (bests(L) == null) return w.map(_.toString)
    val out = List.newBuilder[String]
    val rev = List.newBuilder[(Int, Int)]
    var pos = L
    while (pos > 0) { rev += ((pos - backs(pos), pos)); pos -= backs(pos) }
    rev.result().reverse.foreach { case (s, e) => out += w.substring(s, e) }
    out.result()
  }
}
