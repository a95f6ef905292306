package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding VOCABULARY TRAINING (Sennrich et al. 2016) as a
  * distributed iterative pair-merge — the step real pipelines run after
  * t05's regex pre-tokenization: k rounds of count-pairs → pick the max
  * → apply the merge, deterministic at every step (exact integer counts,
  * total-order (count DESC, sym_a, sym_b) tiebreak) so the trained merge
  * table is engine- and partitioning-invariant and a SQL oracle can
  * replay it round for round.
  *
  * Scale shape (100 TB): the ONLY corpus-sized pass is the word-frequency
  * aggregate (one hash-agg). Training then operates on the WORD
  * VOCABULARY — distinct words × average word length symbol rows, orders
  * of magnitude smaller than the corpus — with per-round lineage
  * truncated (the d16/ConnectedComponents discipline: persist the round,
  * `createDataFrame(rdd, schema)` over its cache) so k merge rounds stay
  * O(1) plan depth. Per round, exactly ONE driver-side row moves (the
  * argmax pair).
  *
  * Merge-application semantics match the reference implementation:
  * adjacent pair counts include overlapping occurrences ("aaa" counts
  * (a,a) twice); applying a merge takes occurrences greedy-leftmost
  * within equal-symbol runs ("aaaa" + (a,a) → "aa aa"). Words carry a
  * terminal `</w>` symbol, so end-of-word merges are distinguishable. */
object Bpe {

  val EndOfWord = "</w>"

  /** (word, freq) over whitespace tokens — the one corpus-sized pass. */
  def wordVocab(docs: DataFrame, textName: String = "text"): DataFrame =
    docs.select(explode(split(col(textName), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol rows (word, freq, pos, sym): one row per character
    * plus the terminal [[EndOfWord]] marker. */
  private[graft] def initSeqs(vocab: DataFrame): DataFrame =
    vocab.select(col("word"), col("freq"),
        posexplode(split(col("word"), "(?!^)")).as(Seq("pos", "sym")))
      // Spark's split keeps the trailing zero-width match → one empty
      // string at pos = length(word); drop it (the marker takes that pos)
      .filter(col("sym") =!= "")
      .unionByName(vocab.select(col("word"), col("freq"),
        length(col("word")).as("pos"), lit(EndOfWord).as("sym")))

  /** Adjacent-pair frequencies of the current sequences:
    * (sym_a, sym_b, cnt) — overlapping occurrences all count, weighted
    * by word frequency. */
  private[graft] def pairCounts(seqs: DataFrame): DataFrame = {
    val w = Window.partitionBy("word").orderBy("pos")
    seqs.withColumn("nxt", lead(col("sym"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("sym").as("sym_a"), col("nxt").as("sym_b"))
      .agg(sum("freq").as("cnt"))
  }

  /** Merge every greedy-leftmost occurrence of the adjacent pair (a, b)
    * in each word's symbol sequence. Within a run of consecutive
    * matches (only possible when a == b), the 1st, 3rd, … are taken —
    * exactly the reference's left-to-right non-overlapping scan. */
  private[graft] def applyMerge(seqs: DataFrame, a: String, b: String): DataFrame = {
    val w = Window.partitionBy("word").orderBy("pos")
    val r = seqs.select(col("word"), col("freq"), col("pos"), col("sym"))
      .withColumn("rn", row_number().over(w))
      .withColumn("nxt", lead(col("sym"), 1).over(w))
    val taken = r.filter(col("sym") === lit(a) && col("nxt") === lit(b))
      .select(col("word").as("mw"), col("rn").as("mrn"))
      .withColumn("grp",
        col("mrn") - row_number().over(Window.partitionBy("mw").orderBy("mrn")))
      .withColumn("j",
        row_number().over(Window.partitionBy("mw", "grp").orderBy("mrn")))
      .filter(col("j") % 2 === 1)
      .select(col("mw"), col("mrn"))
    r.join(taken.select(col("mw").as("tw"), col("mrn").as("trn")),
        r("word") === col("tw") && r("rn") === col("trn"), "left")
      .join(taken.select(col("mw").as("cw"), col("mrn").as("crn")),
        r("word") === col("cw") && r("rn") === col("crn") + 1, "left")
      .filter(col("crn").isNull) // consumed second halves drop
      .select(col("word"), col("freq"), col("pos"),
        when(col("trn").isNotNull, concat(col("sym"), col("nxt")))
          .otherwise(col("sym")).as("sym"))
  }

  /** Train `merges` BPE merge rules over the corpus: returns the merge
    * table (step, sym_a, sym_b, pair_count), step 1-based in training
    * order, fewer rows when the vocabulary exhausts first. */
  def train(docs: DataFrame, merges: Int,
            textName: String = "text"): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    val spark = docs.sparkSession
    def truncate(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)
    var cached = initSeqs(wordVocab(docs, textName))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var seqs = truncate(cached)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val best = pairCounts(seqs)
        .orderBy(col("cnt").desc, col("sym_a").asc, col("sym_b").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((step, a, b, c))
        val next = applyMerge(seqs, a, b).persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize the round before releasing its parent
        cached.unpersist()
        cached = next
        seqs = truncate(next)
        step += 1
      }
    }
    cached.unpersist()
    val s = spark; import s.implicits._
    out.result().toDF("step", "sym_a", "sym_b", "pair_count")
  }

  /** Per-document token counts under a TRAINED vocabulary: apply the
    * merge table in training order to the word vocabulary (the same
    * [[applyMerge]] the trainer used — encode and train cannot drift),
    * then join token-per-word counts back to documents. The t09 packing
    * hook: feed the returned (idName, n_tokens) to any
    * offset/bin-packing derivation in place of whitespace counts.
    * Returns (counts, release): the encoded word vocabulary stays
    * cached until `release()` — call after materializing (the
    * simhashPairs contract). */
  def tokenCounts(docs: DataFrame, mergeTable: DataFrame,
                  idName: String = "doc_id",
                  textName: String = "text"): (DataFrame, () => Unit) = {
    val spark = docs.sparkSession
    def truncate(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)
    val rules = mergeTable.select("step", "sym_a", "sym_b")
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2)))
    var cached = initSeqs(wordVocab(docs, textName))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var seqs = truncate(cached)
    rules.foreach { case (a, b) =>
      val next = applyMerge(seqs, a, b).persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      cached.unpersist()
      cached = next
      seqs = truncate(next)
    }
    val perWord = seqs.groupBy("word").agg(count(lit(1)).as("word_tokens"))
    val out = docs.select(col(idName),
        explode(split(col(textName), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(perWord, Seq("word"))
      .groupBy(col(idName))
      .agg(sum("word_tokens").as("n_tokens"))
    // docs with no words still get a row (0 tokens) — the t09 contract
    val res = docs.select(col(idName)).join(out, Seq(idName), "left")
      .select(col(idName), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
    val fin = cached
    (res, () => { fin.unpersist(); () })
  }
}
