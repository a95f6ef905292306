package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Per-file stats on add actions + data skipping. The contract under
  * test: every committed file carries the spec's stats JSON (numRecords /
  * minValues / maxValues / nullCount), range predicates prune files
  * WITHOUT opening them, pruning is conservative (unsupported predicate
  * shapes and stats-less files are kept), and the skipping answer is
  * always value-identical to the full-scan answer. */
class DeltaStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val mapper = new ObjectMapper()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("dstats").toString + "/tbl"

  /** ids 0..99 written as 4 range-partitioned files → disjoint id ranges. */
  private def rangeTable(): String = {
    val path = tmp()
    val s = spark; import s.implicits._
    val df = (0L until 100L).map(i =>
        (i, s"doc $i", if (i % 10 == 0) null else s"g${i / 25}"))
      .toDF("id", "body", "grp")
      .repartitionByRange(4, col("id"))
    PortableDelta.write(df, path)
    path
  }

  test("add actions carry spec-shaped stats harvested from parquet footers") {
    val path = rangeTable()
    val f = new java.io.File(s"$path/_delta_log/${"%020d".format(0L)}.json")
    val adds = scala.io.Source.fromFile(f, "UTF-8").getLines().filter(_.nonEmpty)
      .map(mapper.readTree).filter(_.has("add")).map(_.get("add")).toSeq
    assert(adds.size == 4)
    adds.foreach { a =>
      assert(a.has("stats"), "every add action must carry stats")
      val st = mapper.readTree(a.get("stats").asText())
      assert(st.get("numRecords").asLong() > 0)
      assert(st.get("minValues").has("id") && st.get("maxValues").has("id"))
      assert(st.get("minValues").has("body"), "strings are stats-eligible")
      assert(st.get("nullCount").has("grp"))
    }
    // the four files tile 0..99 disjointly and null counts add up
    val snap = PortableDelta.snapshot(spark, path)
    val ranges = snap.files.map { af =>
      val st = mapper.readTree(af.stats.get)
      (st.get("minValues").get("id").asLong(), st.get("maxValues").get("id").asLong())
    }.sortBy(_._1)
    assert(ranges.head._1 == 0L && ranges.last._2 == 99L)
    ranges.sliding(2).foreach { case Seq((_, hi), (lo, _)) => assert(hi < lo) }
    val nullsTotal = snap.files.map { af =>
      mapper.readTree(af.stats.get).get("nullCount").get("grp").asLong()
    }.sum
    assert(nullsTotal == 10L)
  }

  test("range predicates prune files; the skipped answer equals the full scan") {
    val path = rangeTable()
    val snap = PortableDelta.snapshot(spark, path)

    val (kept1, pruned1) = PortableDelta.statsPrune(spark, snap, col("id") < 10L)
    assert(kept1.size == 1 && pruned1 == 3, s"kept ${kept1.size}, pruned $pruned1")
    val (kept2, pruned2) =
      PortableDelta.statsPrune(spark, snap, col("id") >= 30L && col("id") < 60L)
    assert(kept2.size < 4 && kept2.size + pruned2 == 4)
    // equality on a mid-range point hits exactly one file
    val (kept3, _) = PortableDelta.statsPrune(spark, snap, col("id") === 50L)
    assert(kept3.size == 1)
    // IN with members in two different files keeps exactly those
    val (kept4, _) = PortableDelta.statsPrune(spark, snap, col("id").isin(1L, 99L))
    assert(kept4.size == 2)
    // an impossible range prunes everything
    val (kept5, _) = PortableDelta.statsPrune(spark, snap, col("id") > 1000L)
    assert(kept5.isEmpty)

    for (cond <- Seq(col("id") < 10L, col("id") >= 30L && col("id") < 60L,
        col("id") === 50L, col("id").isin(1L, 99L), col("id") > 1000L)) {
      val skipped = PortableDelta.readTableWhere(spark, path, cond)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      val full = PortableDelta.readTable(spark, path).filter(cond)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      assert(skipped == full, s"skipping changed the answer for $cond")
    }
  }

  test("pruning is conservative: unsupported shapes and stats-less files keep") {
    val path = rangeTable()
    val snap = PortableDelta.snapshot(spark, path)
    // a predicate shape the evaluator doesn't understand keeps everything
    val (keptF, prunedF) = PortableDelta.statsPrune(spark, snap, length(col("body")) > 2)
    assert(keptF.size == 4 && prunedF == 0)
    // NOT over a non-equality keeps everything
    val (keptN, _) = PortableDelta.statsPrune(spark, snap, !(col("id") < 10L))
    assert(keptN.size == 4)
    // files with stats stripped are never pruned
    val bare = snap.copy(files = snap.files.map(_.copy(stats = None)))
    val (keptB, _) = PortableDelta.statsPrune(spark, bare, col("id") < 10L)
    assert(keptB.size == 4)
    // IS NULL keeps files holding nulls; IS NOT NULL keeps non-all-null
    val (keptNull, _) = PortableDelta.statsPrune(spark, snap, col("grp").isNull)
    assert(keptNull.size == 4, "every range file holds an id % 10 == 0 null")
    val (keptNN, _) = PortableDelta.statsPrune(spark, snap, col("grp").isNotNull)
    assert(keptNN.size == 4)
  }

  test("stats survive checkpoint replay, appends, and DELETE re-adds") {
    val path = rangeTable()
    val s = spark; import s.implicits._
    // append a second batch with a disjoint id range (one more file)
    PortableDelta.write((100L until 120L).map(i => (i, s"doc $i", "g4"))
      .toDF("id", "body", "grp").coalesce(1), path, mode = "append")
    // DELETE some rows: the re-stated adds must keep their stats
    val del = PortableDelta.delete(spark, path, col("id") % 7 === 3L)
    assert(del.deletedRows > 0)
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.files.size == 5)
    assert(snap.files.forall(_.stats.isDefined),
      "stats must ride the checkpoint add struct and DELETE re-adds")
    val (kept, pruned) = PortableDelta.statsPrune(spark, snap, col("id") >= 100L)
    assert(kept.size == 1 && pruned == 4,
      s"append file alone holds ids >= 100: kept ${kept.size}")
    // skipping + DV compose: deleted rows stay gone in the pruned read
    val got = PortableDelta.readTableWhere(spark, path, col("id") >= 100L)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == (100L until 120L).filter(_ % 7 != 3).toSet)
  }

  test("dataSkippingNumIndexedCols / StatsColumns bound the stats width") {
    val s = spark; import s.implicits._
    def statsCols(path: String): Set[String] = {
      val snap = PortableDelta.snapshot(spark, path)
      snap.files.flatMap { af =>
        val st = mapper.readTree(af.stats.get)
        st.get("minValues").fieldNames().asScala.toSeq
      }.toSet
    }
    val rows = (0L until 20L).map(i => (i, s"doc $i", i * 2)).toDF("id", "body", "extra")
    // first-N positional limit: only `id` gets min/max on a 3-col table
    val p1 = tmp()
    PortableDelta.write(rows.coalesce(1), p1,
      properties = Map("delta.dataSkippingNumIndexedCols" -> "1"))
    assert(statsCols(p1) == Set("id"))
    // explicit column list wins over the positional limit
    val p2 = tmp()
    PortableDelta.write(rows.coalesce(1), p2, properties = Map(
      "delta.dataSkippingStatsColumns" -> "extra",
      "delta.dataSkippingNumIndexedCols" -> "1"))
    assert(statsCols(p2) == Set("extra"))
    // skipping still prunes on the indexed column and reads stay exact
    PortableDelta.write(rows.filter($"id" >= 10).coalesce(1), p2, mode = "append")
    val snap2 = PortableDelta.snapshot(spark, p2)
    val (kept, pruned) = PortableDelta.statsPrune(spark, snap2, col("extra") < 20L)
    assert(kept.size == 1 && pruned == 1,
      "the explicit stats column still prunes (append file's min extra is 20)")
    assert(PortableDelta.readTableWhere(spark, p2, col("id") === 3L).count() == 1L)
    // a typo'd stats column refuses BY NAME instead of silently indexing
    // nothing
    val p3 = tmp()
    val e = intercept[IllegalArgumentException] {
      PortableDelta.write(rows.coalesce(1), p3,
        properties = Map("delta.dataSkippingStatsColumns" -> "bogus"))
    }
    assert(e.getMessage.contains("bogus"))
    // -1 = every column (the delta escape hatch past the 32 default)
    val p4 = tmp()
    PortableDelta.write(rows.coalesce(1), p4,
      properties = Map("delta.dataSkippingNumIndexedCols" -> "-1"))
    assert(statsCols(p4) == Set("id", "body", "extra"))
  }

  test("dataSkippingStatsColumns resolves NESTED dotted paths; nested stats prune") {
    val s = spark; import s.implicits._
    val path = tmp()
    val rows = (0L until 40L).map(i => (i, (i * 3, s"t${i % 4}"), s"doc $i"))
      .toDF("id", "meta", "body")
      .select(col("id"),
        col("meta").cast("struct<score:bigint,tag:string>").as("meta"),
        col("body"))
      .repartitionByRange(4, col("id"))
    // a dotted LEAF path and a top-level column
    PortableDelta.write(rows, path, properties = Map(
      "delta.dataSkippingStatsColumns" -> "id, meta.score"))
    val snap = PortableDelta.snapshot(spark, path)
    snap.files.foreach { af =>
      val st = mapper.readTree(af.stats.get)
      assert(st.get("minValues").has("id"))
      assert(st.get("minValues").get("meta").has("score"),
        "nested leaf stats must nest in the JSON (minValues.meta.score)")
      assert(!st.get("minValues").has("body"), "unlisted columns get no stats")
      assert(st.get("nullCount").get("meta").get("score").isNumber)
    }
    // skipping prunes on the nested leaf (ids 0..39 → score 0..117,
    // range-partitioned into 4 disjoint files)
    val (kept, pruned) = PortableDelta.statsPrune(spark, snap,
      col("meta.score") < 30L)
    assert(pruned >= 2, s"nested-leaf predicate must prune files, pruned=$pruned")
    assert(PortableDelta.readTableWhere(spark, path, col("meta.score") < 30L)
      .count() === rows.filter(col("meta.score") < 30L).count())
    // naming the STRUCT indexes every eligible leaf beneath it
    val p2 = tmp()
    PortableDelta.write(rows.coalesce(1), p2, properties = Map(
      "delta.dataSkippingStatsColumns" -> "meta"))
    val st2 = mapper.readTree(
      PortableDelta.snapshot(spark, p2).files.head.stats.get)
    assert(st2.get("minValues").get("meta").has("score") &&
      st2.get("minValues").get("meta").has("tag"))
    assert(!st2.get("minValues").has("id"))
    // a dotted path through a NON-struct still refuses by name
    val e = intercept[IllegalArgumentException] {
      PortableDelta.write(rows.coalesce(1), tmp(), properties = Map(
        "delta.dataSkippingStatsColumns" -> "id.nope"))
    }
    assert(e.getMessage.contains("id.nope"))
    // DEFAULT path (no property): nested leaves count toward the 32 and
    // GET stats — the STAC bbox shape prunes at the log level for free
    val p3 = tmp()
    PortableDelta.write(rows.repartitionByRange(4, col("id")), p3)
    val snap3 = PortableDelta.snapshot(spark, p3)
    snap3.files.foreach { af =>
      val st3 = mapper.readTree(af.stats.get)
      assert(st3.get("minValues").get("meta").has("score") &&
        st3.get("minValues").get("meta").has("tag"),
        "default stats must cover nested struct leaves within the budget")
      assert(st3.get("minValues").has("id") && st3.get("minValues").has("body"))
    }
    val (_, pruned3) = PortableDelta.statsPrune(spark, snap3,
      col("meta.score") >= 90L)
    assert(pruned3 >= 2, s"default nested stats must prune, pruned=$pruned3")
    assert(PortableDelta.readTableWhere(spark, p3, col("meta.score") >= 90L)
      .count() === rows.filter(col("meta.score") >= 90L).count())
    // the leaf budget counts nested leaves positionally: with n=2 the
    // selection is id + meta.score (depth-first), so meta.tag and body
    // get no stats
    val p4 = tmp()
    PortableDelta.write(rows.coalesce(1), p4,
      properties = Map("delta.dataSkippingNumIndexedCols" -> "2"))
    val st4 = mapper.readTree(
      PortableDelta.snapshot(spark, p4).files.head.stats.get)
    assert(st4.get("minValues").has("id") &&
      st4.get("minValues").get("meta").has("score"))
    assert(!st4.get("minValues").get("meta").has("tag") &&
      !st4.get("minValues").has("body"),
      s"leaf budget 2 must stop after meta.score: ${st4.get("minValues")}")
  }

  test("stats_parsed checkpoint struct nests with the nested selection") {
    val s = spark; import s.implicits._
    val path = tmp()
    val rows = (0L until 20L).map(i => (i, (i * 3, s"t$i")))
      .toDF("id", "meta")
      .select(col("id"), col("meta").cast("struct<score:bigint,tag:string>").as("meta"))
    PortableDelta.write(rows.repartitionByRange(2, col("id")), path, properties = Map(
      "delta.checkpoint.writeStatsAsStruct" -> "true",
      "delta.checkpoint.writeStatsAsJson" -> "false"))
    PortableDelta.checkpoint(spark, path)
    val ck = new java.io.File(s"$path/_delta_log").listFiles()
      .filter(_.getName.endsWith(".checkpoint.parquet")).head
    val adds = spark.read.parquet(ck.getPath).where(col("add").isNotNull)
    // the struct nests exactly like the JSON: minValues.meta.score
    val mins = adds.select(col("add.stats_parsed.minValues.meta.score"))
      .collect().map(_.getLong(0)).sorted
    assert(mins.length == 2 && mins.head == 0L)
    assert(adds.select(col("add.stats_parsed.nullCount.meta.tag"))
      .collect().forall(_.getLong(0) == 0L))
    // JSON-less checkpoint still prunes on the nested leaf after the
    // log truncates (stats recovered from the struct)
    PortableDelta.cleanupLog(spark, path)
    val snap = PortableDelta.snapshot(spark, path)
    val (_, pruned) = PortableDelta.statsPrune(spark, snap,
      col("meta.score") < 10L)
    assert(pruned == 1, s"struct-recovered nested stats must prune, got $pruned")
  }

  test("checkpoint stats shapes: stats_parsed struct write + JSON-less read-back") {
    val s = spark; import s.implicits._
    def mk(path: String, props: Map[String, String]): Unit = {
      val df = (0L until 40L).map(i => (i, s"doc $i", i * 1.5))
        .toDF("id", "body", "score").repartitionByRange(2, col("id"))
      PortableDelta.write(df, path, properties = props)
    }
    // writeStatsAsStruct: the checkpoint add rows carry the TYPED struct
    // (what delta-spark's native skipping reads), JSON stays by default
    val p1 = tmp()
    mk(p1, Map("delta.checkpoint.writeStatsAsStruct" -> "true"))
    PortableDelta.checkpoint(spark, p1)
    val ck1 = spark.read.parquet(
      s"$p1/_delta_log/${"%020d".format(0L)}.checkpoint.parquet")
    val addT = ck1.schema("add").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(addT.fieldNames.contains("stats_parsed") &&
      addT.fieldNames.contains("stats"))
    val sp = ck1.select(col("add.stats_parsed"))
      .where(col("add").isNotNull)
    assert(sp.schema.fields.head.dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("numRecords", "minValues", "maxValues", "nullCount"))
    val bounds = ck1.where(col("add").isNotNull)
      .select(col("add.stats_parsed.minValues.id"),
        col("add.stats_parsed.maxValues.id"),
        col("add.stats_parsed.numRecords"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(bounds.map(_._3).sum == 40L)
    assert(bounds.map(_._1).min == 0L && bounds.map(_._2).max == 39L)
    // writeStatsAsJson=false: the struct is the ONLY stats carrier —
    // after truncation, skipping must still work from the re-rendered
    // struct (the external delta-spark table shape)
    val p2 = tmp()
    mk(p2, Map("delta.checkpoint.writeStatsAsStruct" -> "true",
      "delta.checkpoint.writeStatsAsJson" -> "false"))
    PortableDelta.checkpoint(spark, p2)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), p2)
    val ck2 = spark.read.parquet(
      s"$p2/_delta_log/${"%020d".format(0L)}.checkpoint.parquet")
    assert(!ck2.schema("add").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.contains("stats"), "JSON form must be dropped")
    val snap = PortableDelta.snapshot(spark, p2)
    assert(snap.files.forall(_.stats.isDefined),
      "stats must re-render from the struct on read")
    val (kept, pruned) = PortableDelta.statsPrune(spark, snap, col("id") >= 30L)
    assert(kept.size == 1 && pruned == 1,
      "skipping must survive the JSON-less checkpoint")
    assert(PortableDelta.readTableWhere(spark, p2, col("id") >= 30L)
      .count() == 10L)
    // json=false without the struct refuses (a checkpoint must keep
    // stats in some form)
    val p3 = tmp()
    mk(p3, Map("delta.checkpoint.writeStatsAsJson" -> "false"))
    val e = intercept[IllegalArgumentException] {
      PortableDelta.checkpoint(spark, p3)
    }
    assert(e.getMessage.contains("writeStatsAsStruct"))
    // a hive-partitioned table additionally carries TYPED partition
    // values (partitionValues_parsed) beside the spec string map
    val p5 = tmp()
    val pdf = (0L until 40L).map(i => (i, i % 4, s"doc $i"))
      .toDF("id", "bucket", "body")
    PortableDelta.write(pdf, p5, partitionBy = Seq("bucket"),
      properties = Map("delta.checkpoint.writeStatsAsStruct" -> "true"))
    PortableDelta.checkpoint(spark, p5)
    val ck5 = spark.read.parquet(
      s"$p5/_delta_log/${"%020d".format(0L)}.checkpoint.parquet")
    val pvp = ck5.where(col("add").isNotNull)
      .select(col("add.partitionValues_parsed.bucket"))
    assert(pvp.schema.fields.head.dataType ==
      org.apache.spark.sql.types.LongType, "typed, not string")
    assert(pvp.collect().map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L))

    // an EMPTY stats selection still checkpoints (numRecords-only
    // struct — parquet cannot write empty groups)
    val p4 = tmp()
    mk(p4, Map("delta.checkpoint.writeStatsAsStruct" -> "true",
      "delta.dataSkippingNumIndexedCols" -> "0"))
    PortableDelta.checkpoint(spark, p4)
    val ck4 = spark.read.parquet(
      s"$p4/_delta_log/${"%020d".format(0L)}.checkpoint.parquet")
    val spT = ck4.schema("add").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("stats_parsed")
      .dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(spT.fieldNames.toSeq == Seq("numRecords"))
    assert(PortableDelta.snapshot(spark, p4).version == 0L &&
      PortableDelta.readTable(spark, p4).count() == 40L)
  }

  test("a top-level column whose NAME contains a dot keys stats exactly — " +
       "no collision with a real nested path") {
    val s = spark; import s.implicits._
    val path = tmp()
    // the collision case: literal column `a.b` AND struct a{b}, with
    // OPPOSITE value ranges so any mis-keying flips pruning decisions
    val rows = (0L until 40L).map(i => (i, i, 1000L - i, s"doc $i"))
      .toDF("id", "ab_flat", "ab_nested", "body")
      .select(col("id"), col("ab_flat").as("a.b"),
        struct(col("ab_nested").as("b")).as("a"), col("body"))
      .repartitionByRange(4, col("id"))
    PortableDelta.write(rows, path)
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.files.size == 4)
    snap.files.foreach { af =>
      val st = mapper.readTree(af.stats.get)
      // literal-dot column: ONE flat JSON key, never nested
      assert(st.get("minValues").has("a.b"),
        s"literal-dot column must key flat: ${af.stats.get}")
      assert(st.get("minValues").get("a.b").isNumber)
      // the real struct leaf nests
      assert(st.get("minValues").get("a").isObject &&
        st.get("minValues").get("a").has("b"))
      // and the two carry DIFFERENT (opposite-range) bounds
      val flatMin = st.get("minValues").get("a.b").asLong()
      val nestMax = st.get("maxValues").get("a").get("b").asLong()
      assert(flatMin + nestMax == 1000L,
        s"ranges must belong to their own column: $flatMin / $nestMax")
    }
    // skipping: backquoted name addresses the literal column (low ids),
    // unquoted dotted path the struct leaf (high values on low ids)
    val (keptF, prunedF) = PortableDelta.statsPrune(spark, snap,
      col("`a.b`") < 10L)
    assert(prunedF == 3 && keptF.size == 1,
      s"literal-dot predicate must prune on the flat stats: kept=${keptF.size}")
    val (keptN, prunedN) = PortableDelta.statsPrune(spark, snap,
      col("a.b") > 990L)
    assert(prunedN == 3 && keptN.size == 1,
      s"nested predicate must prune on the nested stats: kept=${keptN.size}")
    // the same files survive both: id<10 ⇔ nested 1000-id>990
    assert(keptF.map(_.path).toSet == keptN.map(_.path).toSet)
    // value equality through the skipping read on both spellings
    assert(PortableDelta.readTableWhere(spark, path, col("`a.b`") < 10L)
      .count() == 10L)
    assert(PortableDelta.readTableWhere(spark, path, col("a.b") > 990L)
      .count() == 10L)
    // dataSkippingStatsColumns addresses both: backquoted = literal,
    // unquoted dotted = the nested leaf
    val p2 = tmp()
    PortableDelta.write(rows.coalesce(1), p2, properties = Map(
      "delta.dataSkippingStatsColumns" -> "`a.b`"))
    val st2 = mapper.readTree(
      PortableDelta.snapshot(spark, p2).files.head.stats.get)
    assert(st2.get("minValues").has("a.b") && !st2.get("minValues").has("a"),
      s"backquoted selection must index the literal column only: $st2")
    val p3 = tmp()
    PortableDelta.write(rows.coalesce(1), p3, properties = Map(
      "delta.dataSkippingStatsColumns" -> "a.b"))
    val st3 = mapper.readTree(
      PortableDelta.snapshot(spark, p3).files.head.stats.get)
    assert(st3.get("minValues").get("a").isObject &&
      st3.get("minValues").get("a").has("b") &&
      !st3.get("minValues").has("a.b"),
      s"unquoted dotted selection must prefer the nested walk: $st3")
    // CDF + DML over the collision table: the cdc write path and the
    // change-feed read project by EXACT name too (quotedCol) — before
    // round 12 either would resolve `a.b` into the sibling struct
    val p5 = tmp()
    PortableDelta.write(rows.coalesce(2), p5,
      properties = Map(PortableDelta.CdfProp -> "true"))
    PortableDelta.update(spark, p5, col("`a.b`") === 3L,
      Map("body" -> lit("upd")))
    val cdf = PortableDelta.readChanges(spark, p5, 1L, 1L)
      .select(col("_change_type"), col("`a.b`").as("flat"),
        col("a.b").as("nested"), col("body")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(cdf == Seq(
      ("update_postimage", 3L, 997L, "upd"),
      ("update_preimage", 3L, 997L, "doc 3")),
      s"CDF over a literal-dot column must keep both columns exact: $cdf")
    // MERGE drives the t-aliased SET carry-through and the source
    // schema-alignment select over the literal-dot name
    val srcM = rows.filter(col("id") === 1L)
      .withColumn("body", lit("merged")).coalesce(1)
    val mst = PortableDelta.merge(spark, p5, srcM, Seq("id"))
    assert(mst.updatedRows == 1L, s"$mst")
    val afterM = PortableDelta.readTable(spark, p5)
      .filter(col("id") === 1L)
      .select(col("`a.b`"), col("a.b").as("nested"), col("body"))
      .collect().head
    assert(afterM.getLong(0) == 1L && afterM.getLong(1) == 999L &&
      afterM.getString(2) == "merged",
      s"merged row must keep both dot-spellings exact: $afterM")
  }

  test("statsColumns: backquoted config names may contain commas and dots") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a,b", LongType), StructField("a.b", LongType),
      StructField("m", StructType(Seq(StructField("x", LongType))))))
    val got = DeltaStats.statsColumns(schema, Map(
      "delta.dataSkippingStatsColumns" -> "`a,b`, `a.b`, m.x"))
    assert(got == Seq(
      (Seq("a,b"), LongType), (Seq("a.b"), LongType), (Seq("m", "x"), LongType)),
      s"got $got")
  }
}
