package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-pipeline expressions for the dedup operators.
  *
  * The composable form (`transform(sequence(...), i -> concat_ws(...))` +
  * `array_distinct` + `explode` × seeds + `md5` + `groupBy.min`) evaluates
  * interpreted higher-order lambdas per element and shuffles one row per
  * (shingle, seed). These expressions collapse that to one virtual call per
  * document inside the scan stage — the signature is computed where the data
  * is, and only (doc, seed, minhash) rows ever shuffle. At 100 TB that keeps
  * the MinHash exchange at `4 rows × docs`, independent of document length.
  *
  * Hash parity: MD5 over the UTF-8 bytes of `"<seed>:<shingle>"`, hex
  * lowercase — byte-identical to Spark's `md5()` and DuckDB's `md5()`, so
  * the DuckDB oracle reproduces the signatures exactly.
  */
object TextExpressions {

  private val digests = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  private[functions] def digest(): MessageDigest = digests.get()

  private val hexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex of a digest (= Spark's / DuckDB's md5() encoding). */
  private[functions] def toHex(h: Array[Byte]): String = {
    val out = new Array[Char](h.length * 2)
    var i = 0
    while (i < h.length) {
      out(2 * i) = hexChars((h(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(h(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Unsigned-lexicographic compare of two equal-length digests (hex encoding
    * is monotone in unsigned byte order, so comparing raw digests matches
    * comparing their hex strings). */
  private[functions] def digestLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }
}

/** Distinct word n-gram shingles of a single-space-tokenized text, in first-
  * occurrence order. Equivalent to
  * `array_distinct(transform(sequence(1, size(ws)-(n-1)), i -> concat_ws(" ", ws[i..i+n-1])))`
  * with the <n-token guard, evaluated in one pass. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"word_shingles requires a string input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    val last = words.length - n
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** MinHash signature: element `s` (0-based) is `min(md5("<s>:<shingle>"))`
  * in hex over the input shingle array, or null for an empty input. One
  * digest per (shingle, seed), computed in a single pass per row. */
case class MinHashSig(child: Expression, numSeeds: Int)
    extends UnaryExpression with CodegenFallback {

  require(numSeeds >= 1, "numSeeds must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"minhash_sig requires array<string>, got ${other.sql}")
  }

  private lazy val seedPrefixes: Array[Array[Byte]] =
    Array.tabulate(numSeeds)(s => (s.toString + ":").getBytes("UTF-8"))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val mins = new Array[Array[Byte]](numSeeds)
    val md = TextExpressions.digest()
    var i = 0
    while (i < m) {
      val shingleBytes = arr.getUTF8String(i).getBytes
      var s = 0
      while (s < numSeeds) {
        md.reset()
        md.update(seedPrefixes(s))
        md.update(shingleBytes)
        val digest = md.digest()
        if (mins(s) == null || TextExpressions.digestLt(digest, mins(s))) mins(s) = digest
        s += 1
      }
      i += 1
    }
    val out = new Array[Any](numSeeds)
    var s = 0
    while (s < numSeeds) {
      out(s) = if (mins(s) == null) null
      else UTF8String.fromString(TextExpressions.toHex(mins(s)))
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** SimHash of a single-space-tokenized text, computed per document in one
  * pass. Two widths:
  *   - 32-bit (default, the d04 signature): token hash = md5's first 4
  *     bytes (unsigned, = DuckDB `('0x'||substr(md5(w),1,8))::BIGINT`);
  *   - 60-bit (the d08 DEDUP signature): token hash = the value of the
  *     first 15 md5 hex chars (= DuckDB
  *     `('0x'||substr(md5(w),1,15))::BIGINT` — 60 bits keeps the value in
  *     a signed BIGINT on both engines). The wider signature exists for
  *     BANDING cardinality: 4 bands of 15 bits give 32768 bucket values
  *     per band, vs 256 for 8-bit bands of a 32-bit signature — the
  *     difference between near-constant candidate buckets and O(n²/256)
  *     candidate growth at corpus scale.
  * Bit b of the signature is the sign of Σ(±1 per token) over that hash
  * bit. Replaces the explode → per-bit-sum hash-aggregate form: no
  * token-level rows ever exist, so the operator is narrow — one signature
  * row per document out of the scan stage. */
case class SimHashSig(child: Expression, bits: Int = 32)
    extends UnaryExpression with CodegenFallback {

  require(bits == 32 || bits == 60, s"simhash_sig supports 32 or 60 bits, got $bits")

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"simhash_sig requires a string input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val counts = new Array[Int](bits)
    val md = TextExpressions.digest()
    var i = 0
    while (i < words.length) {
      md.reset()
      val digest = md.digest(words(i).getBytes("UTF-8"))
      val h =
        if (bits == 32)
          ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
            ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
        else {
          // value of the first 15 hex chars: bytes 0..6 whole, then the
          // HIGH nibble of byte 7 (hex chars map to nibbles in order)
          val v56 = ((digest(0) & 0xffL) << 48) | ((digest(1) & 0xffL) << 40) |
            ((digest(2) & 0xffL) << 32) | ((digest(3) & 0xffL) << 24) |
            ((digest(4) & 0xffL) << 16) | ((digest(5) & 0xffL) << 8) |
            (digest(6) & 0xffL)
          (v56 << 4) | ((digest(7) >> 4) & 0xfL)
        }
      var b = 0
      while (b < bits) {
        counts(b) += (((h >> b) & 1L).toInt * 2) - 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

/** Rabin–Karp rolling-hash fingerprint stats over all `w`-codepoint windows
  * of a document: `h(window) = Σ c_j · B^(w-1-j) mod M` with B=257,
  * M=2^31-1, maintained with the O(1) rolling update (subtract the outgoing
  * codepoint's `B^(w-1)` term, multiply by B, add the incoming codepoint) —
  * O(n) per document regardless of window width, vs O(n·w) for re-hashing
  * each window. Returns struct(n_windows, min_fp, n_distinct); min_fp is
  * null when the text is shorter than the window.
  *
  * The same values are reproducible in plain SQL as a Horner fold per
  * window (the d-oracle does exactly that), which pins the modular
  * arithmetic: the largest intermediate is codepoint·B^(w-1) < 2^21·2^31 =
  * 2^52, so 64-bit integer math suffices on both sides (do NOT narrow).
  */
case class RollingHashStats(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(w >= 2, "window must be >= 2")

  private val B = 257L
  private val M = 2147483647L // 2^31 - 1

  override def dataType: DataType = StructType(Seq(
    StructField("n_windows", IntegerType, nullable = false),
    StructField("min_fp", LongType, nullable = true),
    StructField("n_distinct", LongType, nullable = false)))

  override def prettyName: String = "rolling_hash_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"rolling_hash_stats requires a string input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length - w + 1
    if (n <= 0) return InternalRow(0, null, 0L)
    // B^(w-1) mod M, for the rolling removal of the outgoing codepoint
    var pw = 1L
    var k = 0
    while (k < w - 1) { pw = pw * B % M; k += 1 }
    val seen = new java.util.HashSet[Long]()
    var minFp = Long.MaxValue
    var h = 0L
    var i = 0
    while (i < w) { h = (h * B + cps(i)) % M; i += 1 }
    seen.add(h); if (h < minFp) minFp = h
    while (i < cps.length) {
      var x = (h - cps(i - w) * pw % M) % M
      if (x < 0) x += M
      h = (x * B + cps(i)) % M
      seen.add(h); if (h < minFp) minFp = h
      i += 1
    }
    InternalRow(n, minFp, seen.size().toLong)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashStats =
    copy(child = newChild)
}

/** Per-position Rabin–Karp hashes over all `w`-codepoint windows — the
  * per-window form of [[RollingHashStats]] (same B=257 / M=2^31-1
  * arithmetic, same O(n) rolling update): element i (0-based) is the
  * hash of the window starting at codepoint i. This is the scan-stage
  * index for exact-substring (passage-level) dedup: downstream ships
  * 8-byte hashes + positions through the shuffle instead of the w-char
  * window texts — a w/8× reduction in shuffle bytes at corpus scale —
  * and only hash-matched candidates ever re-extract text for the exact
  * verify. Empty output for texts shorter than w. */
case class RollingHashes(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(w >= 2, "window must be >= 2")

  private val B = 257L
  private val M = 2147483647L // 2^31 - 1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "rolling_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"rolling_hashes requires a string input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length - w + 1
    if (n <= 0)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.empty[Long])
    var pw = 1L
    var k = 0
    while (k < w - 1) { pw = pw * B % M; k += 1 }
    val out = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < w) { h = (h * B + cps(i)) % M; i += 1 }
    out(0) = h
    while (i < cps.length) {
      var x = (h - cps(i - w) * pw % M) % M
      if (x < 0) x += M
      h = (x * B + cps(i)) % M
      out(i - w + 1) = h
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashes =
    copy(child = newChild)
}

/** One-pass repetition/quality stats (Gopher-style filter inputs): word
  * count, distinct-word count, and most-frequent-word count in a single
  * tokenization with a per-row hash map — the composable form
  * (`transform(array_distinct(ws), u -> size(filter(ws, x -> x = u)))`)
  * is O(distinct × words) interpreted lambda calls per document.
  * Tokenization matches `split(text, " ")` exactly: single-space split,
  * empty tokens (including trailing) kept. */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_freq", IntegerType, nullable = false)))

  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"repetition_stats requires a string input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    // capacity capped: the map only ever holds n_distinct entries, and
    // sizing by document length would allocate O(words) buckets per row
    // (and overflow Int on pathological inputs)
    val counts = new java.util.HashMap[String, Int](math.min(words.length, 1 << 16))
    var top = 0
    var i = 0
    while (i < words.length) {
      val c = counts.merge(words(i), 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    InternalRow(words.length, counts.size(), top)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** One-pass Gopher duplicate-n-gram stats (the t17 filter's inputs):
  * char-weighted total and duplicated word-n-gram mass for n ∈ {2, 3},
  * computed per document with per-row hash maps — the cross-row form
  * (explode both gram sizes + a (doc, n, gram) hash-agg + join-back)
  * shuffles every gram occurrence even though the decision only ever
  * reads a document's OWN grams. Tokenization matches `split(text, " ")`
  * (empty tokens kept); gram weight = Unicode code-point length
  * (= Spark `length()` / DuckDB `length()`); a gram with count c ≥ 2
  * contributes c·len to the duplicated mass. */
case class DupGramStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("tot2", LongType, nullable = false),
    StructField("dup2", LongType, nullable = false),
    StructField("tot3", LongType, nullable = false),
    StructField("dup3", LongType, nullable = false)))

  override def prettyName: String = "dup_gram_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"dup_gram_stats requires a string input, got ${child.dataType.sql}")

  private def gramMass(words: Array[String], n: Int): (Long, Long) = {
    if (words.length < n) return (0L, 0L)
    // INITIAL capacity only (avoids over-allocation for short docs); the
    // map itself necessarily grows to O(distinct grams) entries per row —
    // correctness needs every distinct gram's count, so there is no hard
    // per-row memory cap beyond the document's own length
    val counts = new java.util.HashMap[String, Int](
      math.min(words.length, 1 << 16))
    val sb = new java.lang.StringBuilder()
    var i = 0
    val last = words.length - n
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      counts.merge(sb.toString, 1, (a, b) => a + b)
      i += 1
    }
    var tot = 0L
    var dup = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val g = e.getKey
      val w = e.getValue.toLong * g.codePointCount(0, g.length)
      tot += w
      if (e.getValue >= 2) dup += w
    }
    (tot, dup)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val (tot2, dup2) = gramMass(words, 2)
    val (tot3, dup3) = gramMass(words, 3)
    InternalRow(tot2, dup2, tot3, dup3)
  }

  override protected def withNewChildInternal(newChild: Expression): DupGramStats =
    copy(child = newChild)
}

object TextFunctions {
  def repetitionStats(text: Column): Column =
    GraftSqlShim.column(RepetitionStats(GraftSqlShim.expression(text)))

  def dupGramStats(text: Column): Column =
    GraftSqlShim.column(DupGramStats(GraftSqlShim.expression(text)))

  def wordShingles(text: Column, n: Int): Column =
    GraftSqlShim.column(WordShingles(GraftSqlShim.expression(text), n))

  def minhashSig(shingles: Column, numSeeds: Int): Column =
    GraftSqlShim.column(MinHashSig(GraftSqlShim.expression(shingles), numSeeds))

  def rollingHashStats(text: Column, w: Int): Column =
    GraftSqlShim.column(RollingHashStats(GraftSqlShim.expression(text), w))

  def rollingHashes(text: Column, w: Int): Column =
    GraftSqlShim.column(RollingHashes(GraftSqlShim.expression(text), w))

  def simhashSig(text: Column, bits: Int = 32): Column =
    GraftSqlShim.column(SimHashSig(GraftSqlShim.expression(text), bits))
}
