package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}

import graft.functions.{FloatDot, LongDot, MinHashSig, RepetitionStats, RollingHashStats, SimHashSig, WordShingles}

/** Spark-native registration of graft's Catalyst expressions, so SQL users
  * get them too:
  *
  *   spark.sql.extensions=graft.GraftExtensions   (or .withExtensions)
  *   SELECT float_dot(a.embedding, b.embedding) FROM ...
  *   SELECT minhash_sig(word_shingles(text, 3), 4) FROM docs
  *
  * Width/seed arguments must be integer literals (they parameterize the
  * expression tree, not per-row inputs). For an existing session, use
  * [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // open bbox_intersects into pushable bbox.* conjuncts (row-group
    // pruning via the STAC-GeoParquet covering stats)
    ext.injectOptimizerRule(_ => graft.plans.RewriteBboxIntersects)
    // COUNT/MIN/MAX over a portable-delta relation answered from log
    // stats when sound (falls back to the scan, never errors).
    // Injected BEFORE SplitDvScan: within one fixed-point pass the
    // metadata-only rewrite gets first claim on the relation; only
    // scans it declines are split.
    ext.injectOptimizerRule(_ => graft.stac.OptimizeDeltaMetadataOnlyAgg)
    // partially-DV'd portable-delta scans split into a columnar
    // DV-free leg + a row-path DV leg (stock pushdown/pruning rules
    // then run on both legs inside the same fixed point)
    ext.injectOptimizerRule(_ => graft.stac.SplitDvScan)
    // strengthen st_intersects_rect over FOREIGN GeoParquet layouts with
    // the covering columns the file's footer declares. POST-HOC
    // RESOLUTION, not an optimizer rule: the conjuncts must land while
    // the covering columns are still in the filter child's output and
    // the geometry attribute still carries the reader-stamped metadata —
    // predicate pushdown and column pruning erase both
    ext.injectPostHocResolutionRule(_ => graft.stac.RewriteCoveringIntersects)
    // SQL DML over portable-delta tables: INSERT INTO partitioned
    // tables (PreprocessTableInsertion fills an all-dynamic
    // partitionSpec, which skips the InsertableRelation seam), plus
    // DELETE FROM / UPDATE / canonical MERGE INTO — the analyzer
    // accepts those only for v2 tables, so the rewrite must land
    // post-resolution and pre-checkAnalysis: exactly the POST-HOC seam.
    ext.injectPostHocResolutionRule(_ => graft.stac.RewriteDeltaSqlDml)
    // SELECT ... FROM t VERSION|TIMESTAMP AS OF over portable-delta
    // tables: Spark resolves RelationTimeTravel only for v2 catalogs
    // and THROWS during resolution for V1 tables — the HINT batch runs
    // before Resolution, so the rewrite lands first
    ext.injectHintResolutionRule(spark =>
      new graft.stac.ResolveDeltaTimeTravel(spark))
    // OPTIMIZE / VACUUM / RESTORE statements (delta-spark's SQL
    // maintenance surface, absent from Spark's grammar) — a parser
    // extension routing to the existing verbs; everything else
    // delegates to the stock parser untouched
    ext.injectParser((spark, delegate) =>
      new graft.stac.GraftSqlParser(spark, delegate))
    // DESCRIBE HISTORY as a table-valued function (Spark has no HISTORY
    // statement for file-source tables): one bounded driver read of the
    // commit record (ICT-aware, sidecar-backed past log cleanup) — the
    // same O(history) cost as the DESCRIBE it stands in for
    ext.injectTableFunction((FunctionIdentifier("portable_delta_history"),
      new ExpressionInfo(classOf[GraftExtensions].getName, null,
        "portable_delta_history",
        "portable_delta_history(path) - commit history of a portable-delta table", ""),
      (args: Seq[Expression]) => {
        val path = args match {
          case Seq(Literal(s: org.apache.spark.unsafe.types.UTF8String, _)) =>
            s.toString
          case _ => throw new IllegalArgumentException(
            "portable_delta_history takes exactly one string literal: " +
              "the table path")
        }
        val spark = org.apache.spark.sql.SparkSession.active
        val hist = graft.stac.PortableDelta.history(
          spark.sessionState.newHadoopConf(), path)
        import org.apache.spark.sql.catalyst.expressions.AttributeReference
        import org.apache.spark.sql.types.{LongType, StringType, TimestampType}
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
          Seq(AttributeReference("version", LongType, nullable = false)(),
            AttributeReference("operation", StringType)(),
            AttributeReference("timestamp", TimestampType)()),
          hist.sortBy(_._1).map { case (v, op, tsMs) =>
            org.apache.spark.sql.catalyst.InternalRow(v,
              org.apache.spark.unsafe.types.UTF8String.fromString(op),
              tsMs * 1000L)
          })
      }))
    // CHANGE DATA FEED as a table-valued function — delta-spark's
    // `table_changes` analog for file-source tables:
    //   SELECT * FROM portable_delta_changes('<path>', 1, 3)
    //   SELECT * FROM portable_delta_changes('<path>', '<utc ts>', '<utc ts>')
    // Returns the DISTRIBUTED readChanges plan (the analyzed frame —
    // no driver materialization; a 100-TB feed window stays a bounded
    // per-commit scan), with _change_type/_commit_version/
    // _commit_timestamp columns. Version bounds are int literals;
    // timestamp bounds are UTC string literals resolved through the
    // ICT-aware commit history.
    ext.injectTableFunction((FunctionIdentifier("portable_delta_changes"),
      new ExpressionInfo(classOf[GraftExtensions].getName, null,
        "portable_delta_changes",
        "portable_delta_changes(path, from, to) - change data feed of a " +
          "portable-delta table between two versions (ints) or UTC " +
          "timestamps (strings)", ""),
      (args: Seq[Expression]) => {
        def str(e: Expression, what: String): String = e match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
            s.toString
          case other => throw new IllegalArgumentException(
            s"portable_delta_changes: $what must be a literal, got $other")
        }
        def longOf(e: Expression): Option[Long] = e match {
          case Literal(v: Int, _) => Some(v.toLong)
          case Literal(v: Long, _) => Some(v)
          case _ => None
        }
        args match {
          case Seq(p, from, to) =>
            val path = str(p, "the table path")
            val spark = org.apache.spark.sql.SparkSession.active
            val df = (longOf(from), longOf(to)) match {
              case (Some(f), Some(t)) =>
                graft.stac.PortableDelta.readChanges(spark, path, f, t)
              case _ =>
                // int/long literals are VERSIONS (handled above); string
                // bounds go through the shared option grammar — epoch
                // millis need 11-17 digits, so a compact date like
                // '20240102' refuses by name instead of resolving ~1970
                def ms(e: Expression, what: String): Long =
                  graft.stac.PortableDeltaRelation.parseTsMillis(
                    str(e, what), s"portable_delta_changes $what")
                graft.stac.PortableDelta.readChangesBetweenTimestamps(
                  spark, path, ms(from, "the start bound"),
                  ms(to, "the end bound"))
            }
            df.queryExecution.analyzed
          case other => throw new IllegalArgumentException(
            "portable_delta_changes takes exactly (path, from, to) — got " +
              s"${other.size} argument(s)")
        }
      }))
    // DESCRIBE DETAIL as a table-valued function — delta-spark's column
    // set from [[PortableDelta.describeDetail]] (numFiles/sizeInBytes
    // answer O(1) from the version checksum when present)
    ext.injectTableFunction((FunctionIdentifier("portable_delta_detail"),
      new ExpressionInfo(classOf[GraftExtensions].getName, null,
        "portable_delta_detail",
        "portable_delta_detail(path) - DESCRIBE DETAIL of a portable-delta table", ""),
      (args: Seq[Expression]) => {
        val path = args match {
          case Seq(Literal(s: org.apache.spark.unsafe.types.UTF8String, _)) =>
            s.toString
          case _ => throw new IllegalArgumentException(
            "portable_delta_detail takes exactly one string literal: " +
              "the table path")
        }
        val spark = org.apache.spark.sql.SparkSession.active
        val d = graft.stac.PortableDelta.describeDetail(spark, path)
        import org.apache.spark.sql.catalyst.expressions.AttributeReference
        import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
        import org.apache.spark.sql.types._
        import org.apache.spark.unsafe.types.UTF8String
        def utf8 = UTF8String.fromString _
        def strArray(xs: Seq[String]) = new GenericArrayData(xs.map(utf8).toArray)
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
          Seq(AttributeReference("format", StringType)(),
            AttributeReference("id", StringType)(),
            AttributeReference("location", StringType)(),
            AttributeReference("createdAt", TimestampType)(),
            AttributeReference("lastModified", TimestampType)(),
            AttributeReference("partitionColumns",
              ArrayType(StringType, containsNull = false))(),
            AttributeReference("clusteringColumns",
              ArrayType(StringType, containsNull = false))(),
            AttributeReference("numFiles", LongType, nullable = false)(),
            AttributeReference("sizeInBytes", LongType, nullable = false)(),
            AttributeReference("properties",
              MapType(StringType, StringType, valueContainsNull = false))(),
            AttributeReference("minReaderVersion", IntegerType, nullable = false)(),
            AttributeReference("minWriterVersion", IntegerType, nullable = false)(),
            AttributeReference("tableFeatures",
              ArrayType(StringType, containsNull = false))()),
          Seq(org.apache.spark.sql.catalyst.InternalRow(
            utf8(d.format), utf8(d.id), utf8(d.location),
            d.createdAt.map(ms => ms * 1000L).map(Long.box).orNull,
            d.lastModified.map(ms => ms * 1000L).map(Long.box).orNull,
            strArray(d.partitionColumns), strArray(d.clusteringColumns),
            d.numFiles, d.sizeInBytes,
            ArrayBasedMapData(d.properties.keys.map(utf8).toArray,
              d.properties.values.map(utf8).toArray),
            d.minReaderVersion, d.minWriterVersion,
            strArray(d.tableFeatures))))
      }))
  }
}

object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Exact-arity check: extra arguments must error, not be silently
    * ignored, and zero arguments must not IndexOutOfBounds. */
  private def arity(es: Seq[Expression], n: Int, name: String): Seq[Expression] = {
    if (es.length != n) throw new IllegalArgumentException(
      s"$name takes exactly $n argument(s), got ${es.length}")
    es
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("float_dot",
      info("float_dot", "float_dot(a, b) - double-precision dot product of two float arrays"),
      (es: Seq[Expression]) => { val a = arity(es, 2, "float_dot"); FloatDot(a(0), a(1)) }),
    ("long_dot",
      info("long_dot", "long_dot(a, b) - exact integer dot product of two bigint arrays"),
      (es: Seq[Expression]) => { val a = arity(es, 2, "long_dot"); LongDot(a(0), a(1)) }),
    ("word_shingles",
      info("word_shingles", "word_shingles(text, n) - distinct word n-gram shingles"),
      (es: Seq[Expression]) => { val a = arity(es, 2, "word_shingles"); WordShingles(a(0), intLit(a(1), "shingle width")) }),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(shingles, nSeeds) - MinHash signature array"),
      (es: Seq[Expression]) => { val a = arity(es, 2, "minhash_sig"); MinHashSig(a(0), intLit(a(1), "seed count")) }),
    ("simhash_sig",
      info("simhash_sig", "simhash_sig(text) - 32-bit SimHash of a tokenized text"),
      (es: Seq[Expression]) => SimHashSig(arity(es, 1, "simhash_sig").head)),
    ("rolling_hash_stats",
      info("rolling_hash_stats",
        "rolling_hash_stats(text, w) - Rabin-Karp window fingerprint stats"),
      (es: Seq[Expression]) => { val a = arity(es, 2, "rolling_hash_stats"); RollingHashStats(a(0), intLit(a(1), "window width")) }),
    ("repetition_stats",
      info("repetition_stats",
        "repetition_stats(text) - (n_words, n_distinct, top_freq) in one pass"),
      (es: Seq[Expression]) => RepetitionStats(arity(es, 1, "repetition_stats").head)),
    ("bloom_filter_agg",
      info("bloom_filter_agg",
        "bloom_filter_agg(v, expectedItems, numBits) - aggregate v into a bloom-filter sketch (xxhash64-keyed, mergeable partials)"),
      (es: Seq[Expression]) => { val a = arity(es, 3, "bloom_filter_agg")
        def l(e: Expression) = Cast(e, org.apache.spark.sql.types.LongType)
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(a(0))), l(a(1)), l(a(2))) }),
    ("bloom_might_contain",
      info("bloom_might_contain",
        "bloom_might_contain(bloom, v) - membership probe against a bloom_filter_agg sketch (no false negatives)"),
      (es: Seq[Expression]) => { val a = arity(es, 2, "bloom_might_contain")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          a(0), new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(a(1)))) }),
    ("bbox_intersects",
      info("bbox_intersects",
        "bbox_intersects(bbox, xmin, ymin, xmax, ymax) - STAC bbox-struct intersects query rectangle (optimizer rewrites it to pushable bbox.* bounds)"),
      (es: Seq[Expression]) => { val a = arity(es, 5, "bbox_intersects")
        // coerce the bounds so plain SQL literals work (1, 1.0 parse as
        // int/decimal; the expression wants doubles)
        def d(e: Expression) = Cast(e, org.apache.spark.sql.types.DoubleType)
        graft.plans.BboxIntersects(a(0), d(a(1)), d(a(2)), d(a(3)), d(a(4))) }),
    ("st_intersects_rect",
      info("st_intersects_rect",
        "st_intersects_rect(geom_wkb, xmin, ymin, xmax, ymax) - exact JTS geometry-rectangle intersects; over a GeoParquetCovering.read frame the analyzer adds the file's declared covering bounds as pushable conjuncts"),
      (es: Seq[Expression]) => { val a = arity(es, 5, "st_intersects_rect")
        def d(e: Expression) = Cast(e, org.apache.spark.sql.types.DoubleType)
        graft.stac.StIntersectsRect(a(0), d(a(1)), d(a(2)), d(a(3)), d(a(4))) }))

  /** Register on an already-running session (the extensions path only
    * applies at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, i, builder) =>
      org.apache.spark.sql.GraftSqlShim.registerFunction(spark, name, i, builder)
    }
}
