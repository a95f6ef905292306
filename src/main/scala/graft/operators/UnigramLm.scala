package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Unigram-LM tokenizer vocabulary training (the SentencePiece family,
  * Kudo 2018) as distributed hard-EM — the second trained-tokenizer
  * shape real pipelines use beside BPE ([[Bpe]]): seed a substring
  * vocabulary, then iterate (E) segment every word by Viterbi under the
  * current piece scores, (M) re-score each piece by its usage count;
  * unused pieces die, the survivors are the vocabulary.
  *
  * EXACT-ARITHMETIC variant, by design: piece scores are integer usage
  * counts (not float log-probs), and the Viterbi objective is the
  * lexicographic total order (fewer pieces, then larger score sum, then
  * longer piece at the current position) — every comparison is integer,
  * so the trained vocabulary is engine- and partitioning-invariant and a
  * SQL oracle can replay the EM rounds CTE for CTE (the t18/BPE
  * discipline). The classic float EM ranks pieces the same way on
  * Zipf-shaped counts; what the integer order gives up in smoothing it
  * buys back in replayability.
  *
  * Scale shape (100 TB): the ONLY corpus-sized pass is the
  * word-frequency hash-agg ([[Bpe.wordVocab]] shape). Seeding and every
  * EM round then run over the WORD VOCABULARY — per-word Viterbi is a
  * scan-stage `O(len × maxPieceLen)` map against a BROADCAST piece
  * table whose size is capped by construction (`seedCap` + alphabet,
  * the SentencePiece seed_sentencepiece_size dial — piece sets only
  * shrink after seeding), and each round moves one vocabulary-sized
  * piece-count aggregate to the driver. Rounds never touch the corpus.
  *
  * Training dials (documented contracts, mirrored by the oracle):
  * words longer than `maxWordLen` are excluded from training and
  * char-fallback at encode ([[tokenCounts]]); multi-char seed pieces
  * need weighted occurrence count ≥ `minCount`; single chars always
  * seed (so round-1 segmentation is total) and may die later — a word
  * stays segmentable because its own previous-round pieces always
  * survive by construction. */
object UnigramLm {

  /** (word, freq) over whitespace tokens, bounded to trainable lengths
    * — the one corpus-sized pass. */
  def wordVocab(docs: DataFrame, textName: String = "text",
                maxWordLen: Int = 12): DataFrame =
    docs.select(explode(split(col(textName), " ")).as("word"))
      .filter(col("word") =!= "" && length(col("word")) <= maxWordLen)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Viterbi segmentation of `word` under integer piece scores.
    * dp(i) = best segmentation of the suffix starting at 1-based
    * position i, chosen by (pieces ASC, score-sum DESC, piece-length
    * DESC) — a deterministic total order (equal triples imply the same
    * piece and suffix state). Returns None when no piece path covers
    * the word (possible once unused pieces die). */
  private[graft] def segment(word: String, scores: collection.Map[String, Long],
                             maxPieceLen: Int): Option[(Int, Long, List[String])] = {
    val n = word.length
    val np = new Array[Int](n + 2)
    val sm = new Array[Long](n + 2)
    val pick = new Array[Int](n + 2) // chosen piece length at pos, 0 = unreachable
    np(n + 1) = 0; sm(n + 1) = 0L; pick(n + 1) = -1
    var i = n
    while (i >= 1) {
      var bNp = Int.MaxValue; var bSm = Long.MinValue; var bL = 0
      var l = 1
      val maxL = math.min(maxPieceLen, n - i + 1)
      while (l <= maxL) {
        if (pick(i + l) != 0) {
          scores.get(word.substring(i - 1, i - 1 + l)) match {
            case Some(c) =>
              val cNp = np(i + l) + 1
              val cSm = sm(i + l) + c
              if (cNp < bNp || (cNp == bNp && (cSm > bSm ||
                  (cSm == bSm && l > bL)))) {
                bNp = cNp; bSm = cSm; bL = l
              }
            case None =>
          }
        }
        l += 1
      }
      if (bL > 0) { np(i) = bNp; sm(i) = bSm; pick(i) = bL }
      i -= 1
    }
    if (pick(1) == 0) None
    else {
      val pieces = List.newBuilder[String]
      var p = 1
      while (p <= n) { pieces += word.substring(p - 1, p - 1 + pick(p)); p += pick(p) }
      Some((np(1), sm(1), pieces.result()))
    }
  }

  /** Seed vocabulary: every single char of the trainable words (always
    * — keeps round-1 segmentation total) plus the top-`seedCap`
    * multi-char substrings by (weighted occurrence count DESC, piece
    * ASC) among those with count ≥ `minCount`. All DataFrame ops
    * (posexplode + substr + hash-agg) — vocabulary-sized. */
  private[graft] def seedScores(vocab: DataFrame, maxPieceLen: Int,
                                minCount: Long, seedCap: Int): Map[String, Long] = {
    val sub = vocab
      .select(col("word"), col("freq"),
        posexplode(split(col("word"), "(?!^)")).as(Seq("p0", "ch")))
      .filter(col("ch") =!= "")
      .select(col("word"), col("freq"), col("p0"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("p0")))).as("l"))
      .select(col("word").substr(col("p0") + 1, col("l")).as("piece"), col("freq"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val singles = sub.filter(length(col("piece")) === 1).collect()
      val multis = sub
        .filter(length(col("piece")) >= 2 && col("cnt") >= minCount)
        .orderBy(col("cnt").desc, col("piece").asc).limit(seedCap).collect()
      (singles ++ multis).map(r => r.getString(0) -> r.getLong(1)).toMap
    } finally { sub.unpersist(); () }
  }

  /** Train `rounds` hard-EM rounds; returns the FULL final vocabulary
    * (piece, cnt) — feed [[topPieces]] for the ranked head and
    * [[tokenCounts]] for encoding. */
  def train(docs: DataFrame, rounds: Int = 2, maxPieceLen: Int = 5,
            maxWordLen: Int = 12, minCount: Long = 2, seedCap: Int = 2000,
            textName: String = "text"): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = wordVocab(docs, textName, maxWordLen)
      .persist(StorageLevel.MEMORY_AND_DISK)
    vocab.count()
    var scores = seedScores(vocab, maxPieceLen, minCount, seedCap)
    (1 to rounds).foreach { _ =>
      val bc = spark.sparkContext.broadcast(scores)
      scores = vocab.as[(String, Long)].flatMap { case (w, f) =>
          segment(w, bc.value, maxPieceLen) match {
            case Some((_, _, pieces)) => pieces.iterator.map(p => (p, f))
            case None => Iterator.empty // unsegmentable: contributes nothing
          }
        }.toDF("piece", "f")
        .groupBy("piece").agg(sum("f").as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      bc.destroy()
    }
    vocab.unpersist()
    scores.toSeq.sortBy(_._1).toDF("piece", "cnt")
  }

  /** Ranked head of a trained vocabulary: (rank, piece, cnt) by
    * (cnt DESC, piece ASC) — the total order the oracle replays. */
  def topPieces(trained: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    trained.withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("piece").asc))
          .cast("long"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("piece"), col("cnt"))
      .orderBy(col("rank"))
  }

  /** Per-document token counts under a TRAINED vocabulary — the t09
    * packing hook (the [[Bpe.tokenCounts]] sibling): segment the
    * DISTINCT words with the SAME Viterbi the trainer used (encode and
    * train cannot drift), char-fallback (`length(word)` tokens) for
    * over-length or unsegmentable words, then fold per document.
    * Corpus-sized work: one word explode + one vocabulary join. */
  def tokenCounts(docs: DataFrame, trained: DataFrame,
                  idName: String = "doc_id", textName: String = "text",
                  maxPieceLen: Int = 5, maxWordLen: Int = 12): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val scores = trained.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bc = spark.sparkContext.broadcast(scores)
    val perWord = docs.select(explode(split(col(textName), " ")).as("word"))
      .filter(col("word") =!= "").distinct()
      .as[String].map { w =>
        val n =
          if (w.length > maxWordLen) w.length.toLong
          else segment(w, bc.value, maxPieceLen) match {
            case Some((np, _, _)) => np.toLong
            case None => w.length.toLong
          }
        (w, n)
      }.toDF("word", "word_tokens")
    val out = docs.select(col(idName),
        explode(split(col(textName), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(perWord, Seq("word"))
      .groupBy(col(idName))
      .agg(sum("word_tokens").as("n_tokens"))
    docs.select(col(idName)).join(out, Seq(idName), "left")
      .select(col(idName), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }
}
