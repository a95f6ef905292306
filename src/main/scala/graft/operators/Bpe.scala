package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * VOCABULARY — one row per distinct word carrying its symbol sequence
  * as an ARRAY column. Applying a merge is a pure per-row fold over that
  * array (zero shuffles — r18 replaced the row-per-symbol layout whose
  * applyMerge cost 3 window shuffles + 2 shuffle joins per round), and
  * pair counting is one explode + partial-agg shuffle of (sym_a, sym_b)
  * pair counts. Per round, exactly ONE driver-side row moves (the argmax
  * pair). Lineage is re-anchored (persist + RDD truncation, the d16
  * discipline) every [[AnchorEvery]] rounds so a large merge budget
  * keeps O(1) plan depth without paying a materialization job per round.
  *
  * Merge-application semantics match the reference implementation:
  * adjacent pair counts include overlapping occurrences ("aaa" counts
  * (a,a) twice); applying a merge takes occurrences greedy-leftmost
  * within equal-symbol runs ("aaaa" + (a,a) → "aa aa"). Words carry a
  * terminal `</w>` symbol, so end-of-word merges are distinguishable. */
object Bpe {

  val EndOfWord = "</w>"

  /** Rounds between lineage re-anchors (persist + truncate): small
    * merge budgets (the gate's 8) chain lazily with zero extra jobs;
    * large ones stay O(AnchorEvery) plan depth. */
  private val AnchorEvery = 16

  /** (word, freq) over whitespace tokens — the one corpus-sized pass. */
  def wordVocab(docs: DataFrame, textName: String = "text"): DataFrame =
    docs.select(explode(split(col(textName), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** (word, freq, syms): the symbol sequence as an array — one element
    * per character plus the terminal [[EndOfWord]] marker. (Spark's
    * split keeps the trailing zero-width match → one empty string at
    * the end; filter it, the marker takes that slot.) */
  private[graft] def initSyms(vocab: DataFrame): DataFrame =
    vocab.select(col("word"), col("freq"),
      concat(
        filter(split(col("word"), "(?!^)"), s => s =!= ""),
        array(lit(EndOfWord))).as("syms"))

  /** Adjacent-pair frequencies of the current sequences:
    * (sym_a, sym_b, cnt) — overlapping occurrences all count, weighted
    * by word frequency. One explode + one partially-aggregated shuffle
    * of pair counts; the arrays never leave their scan task. */
  private[graft] def pairCounts(seqs: DataFrame): DataFrame = {
    val n = size(col("syms"))
    seqs.select(col("freq"),
        explode(zip_with(
          slice(col("syms"), lit(1), n - 1),
          slice(col("syms"), lit(2), n - 1),
          (x, y) => struct(x.as("sym_a"), y.as("sym_b")))).as("p"))
      .groupBy(col("p.sym_a").as("sym_a"), col("p.sym_b").as("sym_b"))
      .agg(sum("freq").as("cnt"))
  }

  /** Merge every greedy-leftmost occurrence of the adjacent pair (a, b)
    * in one symbol array — a pure per-row left fold, no shuffle. Within
    * a run of consecutive matches (only possible when a == b) the 1st,
    * 3rd, … are taken — exactly the reference's left-to-right
    * non-overlapping scan: a merged token is strictly longer than `a`,
    * so it can never match as the left half of another merge in the
    * same round, which is precisely the "consumed" rule. */
  private[graft] def mergeSyms(syms: Column, a: String, b: String): Column =
    aggregate(syms,
      typedLit(Array.empty[String]),
      (acc, s) =>
        when(get(acc, size(acc) - 1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s))))

  /** Row-frame adapter over [[mergeSyms]] (kept for spec parity with the
    * trainer loop: one projection, nothing else). */
  private[graft] def applyMerge(seqs: DataFrame, a: String, b: String): DataFrame =
    seqs.withColumn("syms", mergeSyms(col("syms"), a, b))

  /** Train `merges` BPE merge rules over the corpus: returns the merge
    * table (step, sym_a, sym_b, pair_count), step 1-based in training
    * order, fewer rows when the vocabulary exhausts first. */
  def train(docs: DataFrame, merges: Int,
            textName: String = "text"): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    val spark = docs.sparkSession
    def truncate(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)
    // one persisted anchor; each round's merge chains lazily on top as a
    // single narrow projection (recomputed per round from the anchor —
    // ≤ AnchorEvery cheap per-row passes — instead of paying a
    // materialization job per round)
    var anchor = initSyms(wordVocab(docs, textName))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Loop width ∝ the WORD VOCABULARY (the CC autoWidth discipline): every
    // per-round shuffle after the first is vocabulary-sized (pair-count
    // partials), and running k rounds at the corpus-sized session width
    // schedules mostly-empty tasks each round — measured 2.5× SLOWER at 32
    // cores than 8 on a 100× corpus before this (r19 scaling probe). The
    // count also materializes the anchor once, before round 1's collect.
    val sessionWidth = spark.conf.get("spark.sql.shuffle.partitions")
    val nWords = anchor.count()
    val width = math.max(8, math.min(sessionWidth.toInt,
      (nWords / 2000000L).toInt + 1))
    spark.conf.set("spark.sql.shuffle.partitions", width)
    try {
      var seqs = truncate(anchor)
      var sinceAnchor = 0
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
          seqs = applyMerge(seqs, a, b)
          sinceAnchor += 1
          if (sinceAnchor >= AnchorEvery) {
            val next = seqs.persist(StorageLevel.MEMORY_AND_DISK)
            next.count() // materialize the anchor before releasing its parent
            anchor.unpersist()
            anchor = next
            seqs = truncate(next)
            sinceAnchor = 0
          }
          step += 1
        }
      }
      anchor.unpersist()
      val s = spark; import s.implicits._
      out.result().toDF("step", "sym_a", "sym_b", "pair_count")
    } finally spark.conf.set("spark.sql.shuffle.partitions", sessionWidth)
  }

  /** Per-document token counts under a TRAINED vocabulary: apply the
    * merge table in training order to the word vocabulary (the same
    * [[mergeSyms]] fold the trainer used — encode and train cannot
    * drift; the rules are driver-side constants, so the whole replay is
    * a chain of per-row projections with zero shuffles), then join
    * token-per-word counts back to documents. The t09 packing hook:
    * feed the returned (idName, n_tokens) to any offset/bin-packing
    * derivation in place of whitespace counts. Returns (counts,
    * release): the encoded word vocabulary stays cached until
    * `release()` — call after materializing (the simhashPairs
    * contract). */
  def tokenCounts(docs: DataFrame, mergeTable: DataFrame,
                  idName: String = "doc_id",
                  textName: String = "text"): (DataFrame, () => Unit) = {
    val spark = docs.sparkSession
    def truncate(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)
    val rules = mergeTable.select("step", "sym_a", "sym_b")
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2)))
    // at most ONE intermediate anchor stays cached (r18 ADVICE: keeping
    // every 16-round anchor held ~rules/16 word-vocabulary frames for the
    // life of the session) — the train() discipline: materialize the new
    // anchor, then release its parent, which only the new anchor reads
    var prevAnchor: Option[DataFrame] = None
    var seqs = initSyms(wordVocab(docs, textName))
    var sinceAnchor = 0
    rules.foreach { case (a, b) =>
      seqs = applyMerge(seqs, a, b)
      sinceAnchor += 1
      if (sinceAnchor >= AnchorEvery) {
        val p = seqs.persist(StorageLevel.MEMORY_AND_DISK)
        p.count() // materialize before releasing the parent anchor
        prevAnchor.foreach(_.unpersist())
        prevAnchor = Some(p)
        seqs = truncate(p)
        sinceAnchor = 0
      }
    }
    val encoded = seqs.persist(StorageLevel.MEMORY_AND_DISK)
    // token count per word = surviving symbol count (incl. the marker)
    val perWord = encoded.select(col("word"),
      size(col("syms")).cast("long").as("word_tokens"))
    val out = docs.select(col(idName),
        explode(split(col(textName), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(perWord, Seq("word"))
      .groupBy(col(idName))
      .agg(sum("word_tokens").as("n_tokens"))
    // docs with no words still get a row (0 tokens) — the t09 contract
    val res = docs.select(col(idName)).join(out, Seq(idName), "left")
      .select(col(idName), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
    (res, () => { prevAnchor.foreach(_.unpersist()); encoded.unpersist(); () })
  }
}
