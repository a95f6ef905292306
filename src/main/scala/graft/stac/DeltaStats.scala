package graft.stac

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Per-file column statistics for the portable Delta log — the Delta
  * `add.stats` JSON (`numRecords` / `minValues` / `maxValues` /
  * `nullCount`, the published spec shape) — plus the data-skipping
  * evaluator that turns those stats into file pruning at read time.
  *
  * This is THE Delta scale feature: at 100 TB a predicate like
  * `ts >= yesterday` must not open a million parquet footers — the log
  * already knows every file's min/max, so the planner drops files whose
  * range cannot satisfy the predicate before any data I/O. Reference
  * behavior: `write_deltalake` (stac_geoparquet/arrow/_delta_lake.py:28-71)
  * produces these stats via delta-rs; engines reading its tables skip on
  * them.
  *
  * Stats are harvested from the parquet FOOTERS of the just-written
  * files — metadata-only reads, distributed over executors (a
  * million-file commit never serializes footer I/O through the driver).
  * Skipping supports the standard conjunct shapes (=, <, <=, >, >=, IN,
  * IS [NOT] NULL over literal comparisons, AND/OR); anything else is
  * conservatively kept — pruning is an optimization, never a filter.
  */
object DeltaStats {

  /** Spark-side types whose parquet footer stats we harvest. Nested /
    * binary / decimal columns are skipped (absent from the JSON → never
    * pruned on). */
  private def eligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | BooleanType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  @transient private lazy val mapper = new ObjectMapper()

  /** Split the comma-separated `dataSkippingStatsColumns` list, honoring
    * BACKQUOTES — a quoted column name may itself contain commas (legal
    * on column-mapped tables), so a bare split(",") would tear it. */
  private def splitColumnList(list: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var quoted = false
    list.foreach {
      case '`' => quoted = !quoted; cur += '`'
      case ',' if !quoted => out += cur.result().trim; cur.clear()
      case c => cur += c
    }
    require(!quoted, s"malformed dataSkippingStatsColumns entry " +
      s"(unclosed backquote): $list")
    out += cur.result().trim
    out.result().filter(_.nonEmpty)
  }

  /** Split a column name into path parts, honoring BACKQUOTES the way
    * Spark/Delta spell field names containing dots: `` `a.b` `` is one
    * part, `` `a.b`.c `` is two, a doubled backquote inside quotes
    * escapes a literal one. */
  private[stac] def nameParts(n: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0; var quoted = false
    while (i < n.length) {
      val c = n.charAt(i)
      if (c == '`') {
        if (quoted && i + 1 < n.length && n.charAt(i + 1) == '`') {
          cur += '`'; i += 1
        } else quoted = !quoted
      } else if (c == '.' && !quoted) {
        out += cur.result(); cur.clear()
      } else cur += c
      i += 1
    }
    require(!quoted,
      s"malformed column name (unclosed backquote): $n")
    out += cur.result()
    out.result()
  }

  /** Resolve a column path (`a.b.c`, backquote-aware) through nested
    * structs, case-insensitively, returning the matched field INDEX
    * chain and the leaf type. The delta spec's
    * `dataSkippingStatsColumns` accepts nested leaf paths; parquet keys
    * column chunks by the same chain. An UNQUOTED dotted name prefers
    * the nested walk (delta semantics) and falls back to an exact
    * top-level match, so a field whose name literally contains a dot
    * stays addressable with or without backquotes. */
  private[stac] def resolvePath(schema: StructType,
                          dotted: String): Option[(Seq[Int], DataType)] = {
    def walk(st: StructType, parts: List[String],
             acc: Vector[Int]): Option[(Seq[Int], DataType)] = parts match {
      case Nil => None
      case p :: rest =>
        val i = st.fields.indexWhere(_.name.equalsIgnoreCase(p))
        if (i < 0) None
        else (st.fields(i).dataType, rest) match {
          case (dt, Nil) => Some((acc :+ i, dt))
          case (inner: StructType, _) => walk(inner, rest, acc :+ i)
          case _ => None
        }
    }
    walk(schema, nameParts(dotted).toList, Vector.empty).orElse {
      val exact = schema.fields.indexWhere(_.name.equalsIgnoreCase(dotted))
      if (exact >= 0) Some((Seq(exact), schema.fields(exact).dataType)) else None
    }
  }

  /** The field-name PARTS an index chain spells in `schema` (used to
    * map a chain resolved on the LOGICAL schema onto the PHYSICAL one —
    * same shape, different names under column mapping). Parts stay a
    * Seq end-to-end: joining on '.' would mis-key a field whose name
    * literally contains a dot. */
  private def pathAt(schema: StructType, chain: Seq[Int]): (Seq[String], DataType) = {
    val names = Vector.newBuilder[String]
    var st: DataType = schema
    chain.foreach { i =>
      val f = st.asInstanceOf[StructType].fields(i)
      names += f.name; st = f.dataType
    }
    (names.result(), st)
  }

  /** All eligible leaves under an index chain (a struct named in
    * `dataSkippingStatsColumns` indexes every leaf beneath it). */
  private def eligibleLeaves(schema: StructType,
                             chain: Seq[Int]): Seq[Seq[Int]] = {
    val (_, dt) = pathAt(schema, chain)
    dt match {
      case st: StructType =>
        st.fields.indices.flatMap(i => eligibleLeaves(schema, chain :+ i))
      case t if eligible(t) => Seq(chain)
      case _ => Nil
    }
  }

  /** The columns stats are collected for, honoring the delta-spark
    * width knobs — on a 1000-column table, per-column min/max for every
    * field bloats the log and checkpoint far past what skipping ever
    * uses, so delta bounds it:
    * `delta.dataSkippingStatsColumns` (explicit comma-separated list;
    * names must exist — a typo silently indexing nothing would be a
    * debugging trap) wins over `delta.dataSkippingNumIndexedCols`
    * (first-N schema fields; -1 = all; delta's default 32). Ineligible
    * types drop out after selection, matching delta's position-based
    * counting. */
  private[stac] def statsColumns(schema: StructType, cfg: Map[String, String],
                                 logical: Option[StructType] = None): Seq[(Seq[String], DataType)] = {
    // `logical` carries the user-facing names on column-mapped tables
    // (same arity/order as `schema`, whose PHYSICAL names key the stats
    // JSON); name resolution happens on logical names, field selection
    // on the physical schema
    val names = logical.getOrElse(schema)
    require(names.length == schema.length,
      s"logical/physical schema arity mismatch (${names.length} vs ${schema.length})")
    cfg.get("delta.dataSkippingStatsColumns").map(_.trim).filter(_.nonEmpty) match {
      case Some(list) =>
        // explicit list: dotted NESTED leaf paths resolve through
        // structs (the reference accepts `a.b`); naming a struct
        // indexes every eligible leaf beneath it
        splitColumnList(list).flatMap { n =>
          val chain = resolvePath(names, n).map(_._1).getOrElse(
            throw new IllegalArgumentException(
              s"delta.dataSkippingStatsColumns names unknown column '$n' " +
                s"(schema: ${names.fieldNames.mkString(", ")})"))
          val leaves = eligibleLeaves(names, chain)
          if (leaves.isEmpty) throw new IllegalArgumentException(
            s"delta.dataSkippingStatsColumns names column '$n', whose type " +
              s"(${pathAt(names, chain)._2.simpleString}) is ineligible " +
              "for data skipping")
          leaves.map(pathAt(schema, _)) // PHYSICAL name parts key the JSON
        }
      case None =>
        // positional budget over LEAF columns in depth-first schema
        // order (delta's dataSkippingNumIndexedCols semantics: nested
        // leaves count toward the N; ineligible leaves consume their
        // position but get no stats) — so a STAC table's bbox struct
        // leaves get min/max, making `bbox.xmin >= ?` range queries
        // prune at the LOG level, above the parquet row-group stats
        val n = cfg.get("delta.dataSkippingNumIndexedCols")
          .flatMap(s => scala.util.Try(s.trim.toInt).toOption).getOrElse(32)
        val leaves = depthFirstLeaves(schema)
        (if (n < 0) leaves else leaves.take(n))
          .collect { case (name, dt) if eligible(dt) => name -> dt }
    }
  }

  /** All LEAF columns (non-struct) in depth-first schema order, as
    * (physical path PARTS, type). Array/map interiors are not
    * traversed (no parquet column-chunk stats address them as leaves
    * this code could soundly use). */
  private[stac] def depthFirstLeaves(schema: StructType): Seq[(Seq[String], DataType)] = {
    def walk(st: StructType, prefix: Vector[String]): Seq[(Seq[String], DataType)] =
      st.fields.toSeq.flatMap { f =>
        val path = prefix :+ f.name
        f.dataType match {
          case inner: StructType => walk(inner, path)
          case dt => Seq(path -> dt)
        }
      }
    walk(schema, Vector.empty)
  }

  /** Nest a path-parts column selection back into a StructType mirror
    * of the stats JSON (`(Seq(a, b), T)` → `struct<a: struct<b: T>>`) —
    * the checkpoint `stats_parsed` shape for nested selections.
    * `leaf` maps each column's type (identity for min/max, LongType
    * for nullCount). */
  private[stac] def nestedStructOf(cols: Seq[(Seq[String], DataType)],
                                   leaf: DataType => DataType = identity)
      : StructType = {
    // group by head segment preserving first-appearance order
    val order = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.util.Either[DataType, scala.collection.mutable.Buffer[(Seq[String], DataType)]]]
    cols.foreach { case (path, dt) =>
      if (path.size == 1) order.put(path.head, scala.util.Left(dt))
      else {
        order.getOrElseUpdate(path.head,
          scala.util.Right(scala.collection.mutable.Buffer.empty)) match {
          case scala.util.Right(buf) => buf += (path.tail -> dt)
          case scala.util.Left(_) => throw new IllegalArgumentException(
            s"column '${path.head}' is both a leaf and a struct in the stats selection")
        }
      }
    }
    StructType(order.toSeq.map {
      case (n, scala.util.Left(dt)) => StructField(n, leaf(dt))
      case (n, scala.util.Right(buf)) => StructField(n, nestedStructOf(buf.toSeq, leaf))
    })
  }

  /** Harvest the Delta stats JSON for each file (name → stats). Footer
    * reads run as a Spark job over the file list: metadata-only I/O,
    * sharded across executors; only the O(files) small JSON strings
    * return to the driver (the same order the commit itself costs). */
  def collectFileStats(spark: SparkSession, tableRoot: String,
                       fileNames: Seq[String], schema: StructType,
                       cfg: Map[String, String] = Map.empty,
                       logicalSchema: Option[StructType] = None): Map[String, String] = {
    if (fileNames.isEmpty) return Map.empty
    val cols: Seq[(Seq[String], DataType)] = statsColumns(schema, cfg, logicalSchema)
    val confW = new org.apache.spark.SerializableWritable(
      spark.sessionState.newHadoopConf())
    val parts = math.min(fileNames.size, 64)
    spark.sparkContext.parallelize(fileNames, parts).map { name =>
      name -> statsJsonOfFile(confW.value, new Path(tableRoot, name), cols)
    }.collect().toMap
  }

  /** One file's stats JSON from its parquet footer. */
  private[stac] def statsJsonOfFile(conf: Configuration, file: Path,
                                    cols: Seq[(Seq[String], DataType)]): String = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val numRecords = blocks.map(_.getRowCount).sum
      val byName = cols.toMap
      // accumulate across row groups, per leaf path
      val mins = scala.collection.mutable.LinkedHashMap.empty[Seq[String], Any]
      val maxs = scala.collection.mutable.LinkedHashMap.empty[Seq[String], Any]
      val nulls = scala.collection.mutable.LinkedHashMap.empty[Seq[String], Long]
      var statsComplete = true
      val undecodable = scala.collection.mutable.Set.empty[Seq[String]]
      for (b <- blocks; c <- b.getColumns.asScala) {
        // leaves key by parquet's ColumnPath PARTS — never a joined
        // string, which would collide a literal-dot field name with a
        // nested chain
        val name: Seq[String] = c.getPath.toArray.toSeq
        if (byName.contains(name)) {
          val dt = byName(name)
          val st = c.getStatistics
          if (st == null || !st.isNumNullsSet) statsComplete = false
          else {
            nulls.update(name, nulls.getOrElse(name, 0L) + st.getNumNulls)
            if (st.hasNonNullValue)
              decodeChunk(st.genericGetMin().asInstanceOf[AnyRef],
                st.genericGetMax().asInstanceOf[AnyRef],
                c.getPrimitiveType, dt) match {
                case Some((lo, hi)) =>
                  val ord = orderingFor(dt)
                  mins.update(name,
                    mins.get(name).map(m => ord.min(m, lo)).getOrElse(lo))
                  maxs.update(name,
                    maxs.get(name).map(m => ord.max(m, hi)).getOrElse(hi))
                case None => undecodable += name // e.g. INT96 timestamps
              }
          }
        }
      }
      // a column any row group can't decode gets NO min/max (partial
      // bounds would be unsound); its nullCount stays
      undecodable.foreach { n => mins.remove(n); maxs.remove(n) }
      val root = mapper.createObjectNode()
      root.put("numRecords", numRecords)
      // nested leaves nest in the JSON too (spec: minValues.a.b)
      def nodeAt(base: com.fasterxml.jackson.databind.node.ObjectNode,
                 path: Seq[String]) =
        path.foldLeft(base) { (n, p) =>
          Option(n.get(p)) match {
            case Some(o: com.fasterxml.jackson.databind.node.ObjectNode) => o
            case _ => n.putObject(p)
          }
        }
      val minN = root.putObject("minValues"); val maxN = root.putObject("maxValues")
      mins.foreach { case (k, v) =>
        putJson(nodeAt(minN, k.init), k.last, v, byName(k))
      }
      maxs.foreach { case (k, v) =>
        putJson(nodeAt(maxN, k.init), k.last, v, byName(k))
      }
      if (statsComplete) {
        val nullN = root.putObject("nullCount")
        nulls.foreach { case (k, v) =>
          nodeAt(nullN, k.init).put(k.last, v)
        }
      }
      mapper.writeValueAsString(root)
    } finally reader.close()
  }

  /** Parquet footer (min, max) → the comparable internal domain we keep:
    * Long for integral/date/timestamp-µs, Double for fp, String for
    * strings, Boolean. Returns None when the PHYSICAL type can't be
    * decoded soundly for the declared Spark type — notably INT96
    * timestamps (legacy layout; their footer stats are Binary and
    * deprecated-unordered) — so the column simply gets no min/max and is
    * never pruned on. Timestamp INT64 units (MILLIS/MICROS/NANOS) all
    * normalize to epoch-µs. */
  private def decodeChunk(minV: AnyRef, maxV: AnyRef,
                          prim: org.apache.parquet.schema.PrimitiveType,
                          dt: DataType): Option[(Any, Any)] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    def num(v: AnyRef): Long = v.asInstanceOf[Number].longValue()
    def dbl(v: AnyRef): Double = v.asInstanceOf[Number].doubleValue()
    scala.util.Try[(Any, Any)] {
      (dt, prim.getPrimitiveTypeName) match {
        case (ByteType | ShortType | IntegerType | DateType, INT32) =>
          (num(minV), num(maxV))
        case (LongType, INT64) => (num(minV), num(maxV))
        case (FloatType, FLOAT) | (DoubleType, DOUBLE) =>
          (dbl(minV), dbl(maxV))
        case (BooleanType, BOOLEAN) =>
          (minV.asInstanceOf[java.lang.Boolean].booleanValue(),
            maxV.asInstanceOf[java.lang.Boolean].booleanValue())
        case (StringType, BINARY) =>
          (minV.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8,
            maxV.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8)
        case (TimestampType | TimestampNTZType, INT64) =>
          val toMicros: Long => Long = prim.getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit match {
                case LogicalTypeAnnotation.TimeUnit.MILLIS => l => Math.multiplyExact(l, 1000L)
                case LogicalTypeAnnotation.TimeUnit.MICROS => identity
                case LogicalTypeAnnotation.TimeUnit.NANOS => l => Math.floorDiv(l, 1000L)
              }
            case _ => throw new IllegalArgumentException("INT64 without timestamp annotation")
          }
          (toMicros(num(minV)), toMicros(num(maxV)))
        case other => throw new IllegalArgumentException(s"no sound decode for $other")
      }
    }.toOption
  }

  private def orderingFor(dt: DataType): Ordering[Any] = (dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType => Ordering.Long
    case FloatType | DoubleType => Ordering.Double.TotalOrdering
    case BooleanType => Ordering.Boolean
    case StringType => Ordering.String
    case other => throw new IllegalArgumentException(s"ineligible type $other")
  }).asInstanceOf[Ordering[Any]]

  /** Write one min/max value into the stats JSON, in the spec's
    * representation: numbers as numbers, strings as strings, dates as
    * `yyyy-MM-dd`, timestamps as ISO-8601 micros (UTC). */
  private def putJson(node: com.fasterxml.jackson.databind.node.ObjectNode,
                      k: String, v: Any, dt: DataType): Unit = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      node.put(k, v.asInstanceOf[Long])
    case FloatType | DoubleType => node.put(k, v.asInstanceOf[Double])
    case BooleanType => node.put(k, v.asInstanceOf[Boolean])
    case StringType => node.put(k, v.asInstanceOf[String])
    case DateType =>
      node.put(k, java.time.LocalDate.ofEpochDay(v.asInstanceOf[Long]).toString)
    case TimestampType | TimestampNTZType =>
      val us = v.asInstanceOf[Long]
      node.put(k, java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L).toString)
    case other => throw new IllegalArgumentException(s"ineligible type $other")
  }

  /** Parse a stats JSON back into per-column (min, max) comparables plus
    * nullCount/numRecords. Missing pieces → None (never prune). */
  private[stac] final case class FileStats(numRecords: Option[Long],
                                     mins: Map[Seq[String], Any],
                                     maxs: Map[Seq[String], Any],
                                     nulls: Map[Seq[String], Long])

  private[stac] def parseStats(json: String, schema: StructType): FileStats = {
    val node = mapper.readTree(json)
    // stats sections nest alongside the schema (minValues.a.b for a
    // nested leaf) — flatten to path-parts keys, typed by the schema
    // walk; a literal-dot field name is ONE json key and ONE part
    def flatten(s: JsonNode, st: StructType,
                prefix: Vector[String]): Seq[(Seq[String], Any)] =
      s.properties().asScala.toSeq.flatMap { e =>
        val key = prefix :+ e.getKey
        st.fields.find(_.name == e.getKey).toSeq.flatMap { f =>
          (f.dataType, e.getValue) match {
            case (inner: StructType, v) if v.isObject => flatten(v, inner, key)
            case (dt, v) => decodeJson(v, dt).map((key: Seq[String]) -> _).toSeq
          }
        }
      }
    def section(key: String): Map[Seq[String], Any] =
      Option(node.get(key)).filter(_.isObject)
        .map(flatten(_, schema, Vector.empty).toMap).getOrElse(Map.empty)
    def flattenNulls(s: JsonNode, prefix: Vector[String]): Seq[(Seq[String], Long)] =
      s.properties().asScala.toSeq.flatMap { e =>
        val key = prefix :+ e.getKey
        if (e.getValue.isNumber) Seq((key: Seq[String]) -> e.getValue.asLong())
        else if (e.getValue.isObject) flattenNulls(e.getValue, key)
        else Nil
      }
    val nulls = Option(node.get("nullCount")).filter(_.isObject)
      .map(flattenNulls(_, Vector.empty).toMap).getOrElse(Map.empty[Seq[String], Long])
    FileStats(Option(node.get("numRecords")).filter(_.isNumber).map(_.asLong()),
      section("minValues"), section("maxValues"), nulls)
  }

  private def decodeJson(n: JsonNode, dt: DataType): Option[Any] = dt match {
    case ByteType | ShortType | IntegerType | LongType if n.isNumber => Some(n.asLong())
    case FloatType | DoubleType if n.isNumber => Some(n.asDouble())
    case BooleanType if n.isBoolean => Some(n.asBoolean())
    case StringType if n.isTextual => Some(n.asText())
    case DateType if n.isTextual =>
      scala.util.Try(java.time.LocalDate.parse(n.asText()).toEpochDay).toOption
    case (TimestampType | TimestampNTZType) if n.isTextual =>
      scala.util.Try {
        val i = java.time.Instant.parse(n.asText())
        Math.multiplyExact(i.getEpochSecond, 1000000L) + i.getNano / 1000L
      }.toOption
    case _ => None
  }

  /** Catalyst literal (internal representation) → the same comparable
    * domain as the stored stats, keyed by the COLUMN's declared type. */
  private def literalValue(l: Literal, dt: DataType): Option[Any] = (l.value, dt) match {
    case (null, _) => None
    case (v: Byte, _) => widen(v.toLong, dt)
    case (v: Short, _) => widen(v.toLong, dt)
    case (v: Int, _) => widen(v.toLong, dt)
    case (v: Long, _) => widen(v, dt)
    case (v: Float, _) => widen(v.toDouble, dt)
    case (v: Double, _) => widen(v, dt)
    case (v: Boolean, BooleanType) => Some(v)
    case (v: org.apache.spark.unsafe.types.UTF8String, StringType) => Some(v.toString)
    case _ => None
  }

  /** Align numeric literal vs column domain: integral columns compare as
    * Long only against integral literals (a fractional literal against an
    * integral column falls back to Double on both sides), fp columns as
    * Double. Dates/timestamps arrive as Int days / Long micros. */
  private def widen(v: Any, dt: DataType): Option[Any] = (v, dt) match {
    case (l: Long, ByteType | ShortType | IntegerType | LongType |
                   DateType | TimestampType | TimestampNTZType) => Some(l)
    case (l: Long, FloatType | DoubleType) => Some(l.toDouble)
    case (d: Double, FloatType | DoubleType) => Some(d)
    case (d: Double, ByteType | ShortType | IntegerType | LongType) => Some(d)
    case _ => None
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case (x: Long, y: Double) => Some(java.lang.Double.compare(x.toDouble, y))
    case (x: Double, y: Long) => Some(java.lang.Double.compare(x, y.toDouble))
    case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  /** Resolve a user `Column` predicate against `schema` into a TYPED
    * Catalyst expression (LessThan/EqualTo/... over AttributeReferences
    * and coercion-cast literals). The unresolved form a `Column` carries
    * in Spark 4 is `UnresolvedFunction("<", ...)` nodes the evaluator
    * can't pattern-match; analysis over a zero-row frame of the table's
    * schema is pure planning — no job runs. */
  def resolvePredicate(spark: SparkSession, schema: StructType,
                       condition: org.apache.spark.sql.Column): Expression = {
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    empty.filter(condition).queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.getOrElse(Literal.TrueLiteral)
  }

  /** Decode one hive-serialized partition value into the stats
    * comparable domain for its column type. Timestamps accept both the
    * hive `yyyy-MM-dd HH:mm:ss[.ffffff]` and ISO `T` forms. */
  private def partitionValueComparable(v: String, dt: DataType): Option[Any] = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      scala.util.Try(v.toLong).toOption
    case FloatType | DoubleType => scala.util.Try(v.toDouble).toOption
    case BooleanType => scala.util.Try(v.toBoolean).toOption
    case StringType => Some(v)
    case DateType =>
      scala.util.Try(java.time.LocalDate.parse(v).toEpochDay).toOption
    case TimestampType | TimestampNTZType =>
      scala.util.Try {
        val ldt = java.time.LocalDateTime.parse(v.replace(' ', 'T'))
        val i = ldt.toInstant(java.time.ZoneOffset.UTC)
        Math.multiplyExact(i.getEpochSecond, 1000000L) + i.getNano / 1000L
      }.toOption
    case _ => None
  }

  /** Could ANY row of a file with `stats` + `partitionValues` satisfy
    * `pred`? Conservative three-valued walk: an unrecognized node, a
    * column without stats, or an un-comparable pair keeps the file.
    * Supported: comparisons of a column against a literal (either
    * side), IN, IS [NOT] NULL, AND/OR, and NOT over those. A partition
    * value is a POINT statistic (min = max = value; null = the null
    * partition) — partition pruning is exactly data skipping over
    * point ranges, and works even on files with no stats JSON. */
  def satisfiable(statsJson: Option[String], partitionValues: Map[String, String],
                  schema: StructType, pred: Expression): Boolean = {
    if (statsJson.isEmpty && partitionValues.isEmpty) true else {
      val parsed = statsJson.map(parseStats(_, schema))
        .getOrElse(FileStats(None, Map.empty, Map.empty, Map.empty))
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      // partition columns are TOP-LEVEL — their key is one path part
      // (a literal-dot partition name stays one part, never split)
      val nullParts: Set[Seq[String]] = partitionValues.collect {
        case (k, null) if byName.contains(k) => Seq(k)
      }.toSet
      val pointBounds: Map[Seq[String], Any] = partitionValues.flatMap {
        case (k, v) if v != null && byName.contains(k) =>
          partitionValueComparable(v, byName(k)).map((Seq(k): Seq[String]) -> _)
        case _ => None
      }
      val fs = parsed.copy(
        mins = parsed.mins ++ pointBounds,
        maxs = parsed.maxs ++ pointBounds)

      // column references as path PARTS — a top-level attribute is ONE
      // part whatever its name spells; GetStructField appends parts
      def attrName(e: Expression): Option[Seq[String]] = e match {
        case a: AttributeReference => Some(Seq(a.name))
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          Some(u.nameParts)
        // nested leaf predicates (col("a.b")) analyze to GetStructField
        // chains — the same parts the stats JSON nests by
        case g: GetStructField =>
          attrName(g.child).map(_ :+ g.extractFieldName)
        // the analyzer may widen the COLUMN side (int col vs long lit)
        case c: Cast => attrName(c.child)
        case _ => None
      }
      // the leaf type a parts chain resolves to in `schema`
      def typeAt(parts: Seq[String]): Option[DataType] = {
        def walkT(st: StructType, ps: List[String]): Option[DataType] = ps match {
          case Nil => None
          case p :: rest =>
            st.fields.find(_.name == p)
              .orElse(st.fields.find(_.name.equalsIgnoreCase(p)))
              .flatMap(f => (f.dataType, rest) match {
                case (dt, Nil) => Some(dt)
                case (inner: StructType, _) => walkT(inner, rest)
                case _ => None
              })
        }
        walkT(schema, parts.toList)
      }
      // the analyzer wraps literal sides in Cast (type coercion): any
      // attribute-free deterministic foldable side IS a literal
      def litOf(e: Expression): Option[Literal] = e match {
        case l: Literal => Some(l)
        case c if c.deterministic && c.foldable && c.references.isEmpty =>
          scala.util.Try(Literal.create(c.eval(null), c.dataType)).toOption
        case _ => None
      }
      // (column, literal, flipped): `5 < col` normalizes to `col > 5`
      def sides(l: Expression, r: Expression): Option[(Seq[String], Literal, Boolean)] =
        (attrName(l), litOf(r), attrName(r), litOf(l)) match {
          case (Some(n), Some(lit), _, _) => Some((n, lit, false))
          case (_, _, Some(n), Some(lit)) => Some((n, lit, true))
          case _ => None
        }
      def bounds(name: Seq[String]): (Option[Any], Option[Any]) =
        (fs.mins.get(name), fs.maxs.get(name))
      def lv(name: Seq[String], lit: Literal): Option[Any] =
        typeAt(name).flatMap(dt => literalValue(lit, dt))
      // a column whose every row is null can satisfy no value comparison
      // (incl. the hive null partition: every row shares the null value)
      def allNull(name: Seq[String]): Boolean =
        nullParts.contains(name) ||
          ((fs.numRecords, fs.nulls.get(name)) match {
            case (Some(n), Some(k)) => n > 0 && k == n
            case _ => false
          })

      def cmpKeep(name: Seq[String], lit: Literal,
                  keep: (Option[Int], Option[Int]) => Boolean): Boolean = {
        if (allNull(name)) return false
        val (lo, hi) = bounds(name)
        lv(name, lit) match {
          case None => true
          case Some(v) =>
            val cLo = lo.flatMap(cmp(_, v)) // sign of (min - v)
            val cHi = hi.flatMap(cmp(_, v)) // sign of (max - v)
            if (cLo.isEmpty || cHi.isEmpty) true else keep(cLo, cHi)
        }
      }

      def walk(e: Expression): Boolean = e match {
        case And(a, b) => walk(a) && walk(b)
        case Or(a, b) => walk(a) || walk(b)
        case EqualTo(l, r) => sides(l, r) match {
          case Some((n, lit, _)) =>
            cmpKeep(n, lit, (lo, hi) => lo.get <= 0 && hi.get >= 0)
          case None => true
        }
        case GreaterThan(l, r) => sides(l, r) match {
          case Some((n, lit, false)) => cmpKeep(n, lit, (_, hi) => hi.get > 0)
          case Some((n, lit, true)) => cmpKeep(n, lit, (lo, _) => lo.get < 0)
          case None => true
        }
        case GreaterThanOrEqual(l, r) => sides(l, r) match {
          case Some((n, lit, false)) => cmpKeep(n, lit, (_, hi) => hi.get >= 0)
          case Some((n, lit, true)) => cmpKeep(n, lit, (lo, _) => lo.get <= 0)
          case None => true
        }
        case LessThan(l, r) => sides(l, r) match {
          case Some((n, lit, false)) => cmpKeep(n, lit, (lo, _) => lo.get < 0)
          case Some((n, lit, true)) => cmpKeep(n, lit, (_, hi) => hi.get > 0)
          case None => true
        }
        case LessThanOrEqual(l, r) => sides(l, r) match {
          case Some((n, lit, false)) => cmpKeep(n, lit, (lo, _) => lo.get <= 0)
          case Some((n, lit, true)) => cmpKeep(n, lit, (_, hi) => hi.get >= 0)
          case None => true
        }
        case In(a, values) =>
          (attrName(a), values.map(litOf)) match {
            case (Some(n), lits) if lits.forall(_.isDefined) =>
              lits.flatten.exists(v =>
                cmpKeep(n, v, (lo, hi) => lo.get <= 0 && hi.get >= 0))
            case _ => true
          }
        case IsNull(a) => attrName(a) match {
          case Some(n) if nullParts.contains(n) => true
          case Some(n) if pointBounds.contains(n) => false // non-null partition value everywhere
          case Some(n) => fs.nulls.get(n).forall(_ > 0)
          case None => true
        }
        case IsNotNull(a) => attrName(a) match {
          case Some(n) if nullParts.contains(n) => false // the null partition
          case Some(n) if pointBounds.contains(n) => true
          case Some(n) => (fs.numRecords, fs.nulls.get(n)) match {
            case (Some(rows), Some(k)) => k < rows
            case _ => true
          }
          case None => true
        }
        case Not(inner) => inner match {
          // ¬(a = v) is satisfied by any NON-NULL value ≠ v (SQL: NULL
          // input → NULL, not true) — prune only all-null files and
          // single-point files where min = max = v
          case EqualTo(l, r) => sides(l, r) match {
            case Some((n, lit, _)) =>
              if (allNull(n)) false
              else {
                val (lo, hi) = bounds(n)
                lv(n, lit) match {
                  case None => true
                  case Some(v) => (lo.flatMap(cmp(_, v)), hi.flatMap(cmp(_, v))) match {
                    case (Some(cl), Some(ch)) => !(cl == 0 && ch == 0)
                    case _ => true
                  }
                }
              }
            case None => true
          }
          case _ => true
        }
        case _ => true
      }
      walk(pred)
    }
  }
}
