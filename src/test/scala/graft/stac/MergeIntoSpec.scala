package graft.stac

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, Metadata, MetadataBuilder,
  StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Full-clause MERGE ([[PortableDelta.mergeInto]]): matched/not-matched
  * conditions, partial SET expressions over `t.*`/`s.*`, per-row
  * update semantics, DELETE and INSERT-only actions, generated-column
  * recompute, identity generation for inserts, row-ID preservation per
  * matched row, CDF pairs. */
class MergeIntoSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  import PortableDelta.MergeClauses

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pminto").toString + "/tbl"

  private def base(ids: Seq[Long]) = {
    val s = spark; import s.implicits._
    ids.map(i => (i, s"a$i", i * 10L)).toDF("id", "tag", "v")
  }

  private def readAll(path: String): Set[(Long, String, Long)] =
    PortableDelta.readTable(spark, path)
      .select(col("id"), col("tag"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("partial SET over both sides + matched condition; others untouched") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write(base(0L until 8L).repartition(2), path)
    // source carries ONLY the key + the referenced column — a partial
    // source, impossible with whole-row merge()
    val src = Seq((1L, 100L), (2L, 5L), (3L, 200L), (99L, 300L))
      .toDF("id", "bump")
    val st = PortableDelta.mergeInto(spark, path, src, Seq("id"),
      MergeClauses(
        matchedCondition = Some(col("s.bump") > 50L),
        updateSet = Some(Map("v" -> (col("t.v") + col("s.bump")))),
        insertNotMatched = false))
    // id 1 (+100) and 3 (+200) update; id 2 fails the condition; id 99
    // unmatched and inserts are off
    assert(st.updatedRows == 2L && st.insertedRows == 0L, s"got $st")
    assert(readAll(path) == (0L until 8L).map { i =>
      val v = i * 10L + (if (i == 1L) 100L else if (i == 3L) 200L else 0L)
      (i, s"a$i", v)
    }.toSet)
  }

  test("per-row update: every matched target row updates independently") {
    val s = spark; import s.implicits._
    val path = tmp()
    // two target rows share key 5
    PortableDelta.write(
      Seq((5L, "x", 1L), (5L, "y", 2L), (6L, "z", 3L))
        .toDF("id", "tag", "v").coalesce(1), path)
    val src = Seq((5L, 1000L)).toDF("id", "bump")
    val st = PortableDelta.mergeInto(spark, path, src, Seq("id"),
      MergeClauses(
        updateSet = Some(Map("v" -> (col("t.v") + col("s.bump")))),
        insertNotMatched = false))
    assert(st.updatedRows == 2L, s"got $st")
    assert(readAll(path) ==
      Set((5L, "x", 1001L), (5L, "y", 1002L), (6L, "z", 3L)))
  }

  test("conditional DELETE and INSERT-only merges") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write(base(0L until 6L).coalesce(1), path)
    // delete matched rows where the SOURCE says so
    val src = Seq((1L, true), (2L, false), (3L, true)).toDF("id", "kill")
    val st = PortableDelta.mergeInto(spark, path, src, Seq("id"),
      MergeClauses(matchedAction = "delete",
        matchedCondition = Some(col("s.kill")),
        insertNotMatched = false))
    assert(st.deletedRows == 2L && st.updatedRows == 0L, s"got $st")
    assert(readAll(path).map(_._1) == Set(0L, 2L, 4L, 5L))
    // INSERT-only (matchedAction=none): matched rows untouched even
    // though present in the source; condition gates the inserts
    val src2 = Seq((2L, "n2", 7L), (20L, "n20", 8L), (21L, "n21", 9L))
      .toDF("id", "tag", "v")
    val st2 = PortableDelta.mergeInto(spark, path, src2, Seq("id"),
      MergeClauses(matchedAction = "none",
        notMatchedCondition = Some(col("s.v") > 8L)))
    assert(st2.insertedRows == 1L && st2.updatedRows == 0L &&
      st2.deletedRows == 0L, s"got $st2")
    assert(readAll(path).map(_._1) == Set(0L, 2L, 4L, 5L, 21L))
    assert(readAll(path).contains((2L, "a2", 20L)), "matched row untouched")
  }

  test("row tracking: per-row ID carry-over pairs a shared-key update") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write(
      Seq((5L, "x", 1L), (5L, "y", 2L), (6L, "z", 3L))
        .toDF("id", "tag", "v").coalesce(1), path)        // v0
    PortableDelta.enableRowTracking(spark, path)          // v1
    PortableDelta.mergeInto(spark, path,
      Seq((5L, 100L)).toDF("id", "bump"), Seq("id"),
      MergeClauses(
        updateSet = Some(Map("v" -> (col("t.v") + col("s.bump")))),
        insertNotMatched = false))                        // v2
    // BOTH rows of key 5 pair — per-row IDs, not per-key min
    val ch = PortableDelta.readChanges(spark, path, 2L, 2L)
      .select(col("id"), col("tag"), col("v"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    assert(ch == Set(
      (5L, "x", 1L, "update_preimage"), (5L, "x", 101L, "update_postimage"),
      (5L, "y", 2L, "update_preimage"), (5L, "y", 102L, "update_postimage")),
      s"got $ch")
  }

  test("generated columns recompute on SET; identity generates for inserts") {
    val s = spark; import s.implicits._
    val path = tmp()
    val genMeta: Metadata = new MetadataBuilder()
      .putString("delta.generationExpression", "v * 2").build()
    val identMeta: Metadata = new MetadataBuilder()
      .putLong("delta.identity.start", 500L)
      .putLong("delta.identity.step", 5L).build()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("ident", LongType, nullable = true, identMeta),
      StructField("v", LongType),
      StructField("dbl", LongType, nullable = true, genMeta)))
    PortableDelta.write(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), path)
    PortableDelta.write(
      Seq((0L, 10L), (1L, 20L)).toDF("id", "v").coalesce(1),
      path, mode = "append")
    // SET v: the generated dbl RECOMPUTES; SETting dbl/ident refused
    val st = PortableDelta.mergeInto(spark, path,
      Seq((0L, 7L), (9L, 99L)).toDF("id", "v"), Seq("id"),
      MergeClauses(updateSet = Some(Map("v" -> col("s.v")))))
    assert(st.updatedRows == 1L && st.insertedRows == 1L, s"got $st")
    val got = PortableDelta.readTable(spark, path)
      .select(col("id"), col("ident"), col("v"), col("dbl")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // idents: batch 1 got 500, 505; the merge-inserted row continues
    assert(got.map(t => (t._1, t._3, t._4)) ==
      Set((0L, 7L, 14L), (1L, 20L, 40L), (9L, 99L, 198L)), s"got $got")
    assert(got.collect { case (9L, i, _, _) => i } == Set(510L),
      s"insert must continue the identity lattice: $got")
    // updated row keeps its identity value (carried from the target)
    assert(got.collect { case (0L, i, _, _) => i } == Set(500L))
    val e = intercept[IllegalArgumentException] {
      PortableDelta.mergeInto(spark, path,
        Seq((1L, 2L)).toDF("id", "v"), Seq("id"),
        MergeClauses(updateSet = Some(Map("dbl" -> lit(1L)))))
    }
    assert(e.getMessage.contains("generated column dbl"), e.getMessage)
  }

  test("matching runs against the LIVE view; partitioned rows migrate on SET") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write(
      (0L until 8L).map(i => (i, if (i % 2 == 0) "A" else "B", i))
        .toDF("id", "part", "v"), path, partitionBy = Seq("part"))
    // delete id 2: a later merge on its key must INSERT, not update
    PortableDelta.delete(spark, path, col("id") === 2L)
    val st = PortableDelta.mergeInto(spark, path,
      Seq((2L, "B", 222L), (4L, "B", 444L)).toDF("id", "part", "v"),
      Seq("id"),
      PortableDelta.MergeClauses(
        updateSet = Some(Map("part" -> col("s.part"), "v" -> col("s.v")))))
    // id 4 was live (updates, MIGRATING partition A -> B); id 2 was
    // dead (inserts)
    assert(st.updatedRows == 1L && st.insertedRows == 1L, s"got $st")
    val got = PortableDelta.readTable(spark, path)
      .select(col("id"), col("part"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got.contains((4L, "B", 444L)) && got.contains((2L, "B", 222L)))
    assert(got.size == 8)
    // the migrated row lives in B's hive dir per the LOG
    val snap = PortableDelta.snapshot(spark, path)
    assert(PortableDelta.readTableWhere(spark, path, col("part") === "B")
      .count() == 6L)
    assert(snap.partitionColumns == Seq("part"))
  }

  test("clause merge stages physically on a column-mapped table") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write(base(0L until 6L).coalesce(1), path)
    PortableDelta.renameColumn(spark, path, "v", "amount") // mapped now
    val st = PortableDelta.mergeInto(spark, path,
      Seq((1L, 100L), (9L, 900L)).toDF("id", "bump"), Seq("id"),
      PortableDelta.MergeClauses(
        updateSet = Some(Map("amount" -> (col("t.amount") + col("s.bump")))),
        insertNotMatched = false))
    assert(st.updatedRows == 1L, s"got $st")
    val got = PortableDelta.readTable(spark, path)
      .select(col("id"), col("amount")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) == 110L && got(2L) == 20L, s"got $got")
    // the appended file carries PHYSICAL names: the logical `amount`
    // resolves through the field's original physicalName
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.configuration.get("delta.columnMapping.mode").contains("name"))
    val f = snap.schema("amount")
    assert(f.metadata.getString("delta.columnMapping.physicalName") == "v")
  }

  test("CDF: clause merge writes exact update pairs + inserts; txn idempotent") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write(base(0L until 4L).coalesce(1), path,
      properties = Map(PortableDelta.CdfProp -> "true"))
    val src = Seq((1L, "u1", 111L), (9L, "n9", 999L)).toDF("id", "tag", "v")
    val st = PortableDelta.mergeInto(spark, path, src, Seq("id"),
      MergeClauses(updateSet = Some(Map(
        "tag" -> col("s.tag"), "v" -> col("s.v")))),
      txn = Some(("mi", 1L)))
    assert(st.updatedRows == 1L && st.insertedRows == 1L)
    val ch = PortableDelta.readChanges(spark, path, 1L, 1L)
      .select(col("id"), col("tag"), col("v"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    assert(ch == Set(
      (1L, "a1", 10L, "update_preimage"), (1L, "u1", 111L, "update_postimage"),
      (9L, "n9", 999L, "insert")), s"got $ch")
    // re-delivered txn: no-op before anything stages
    val st2 = PortableDelta.mergeInto(spark, path, src, Seq("id"),
      MergeClauses(updateSet = Some(Map("tag" -> col("s.tag")))),
      txn = Some(("mi", 1L)))
    assert(st2.version == st.version && st2.updatedRows == 0L)
    assert(PortableDelta.snapshot(spark, path).version == st.version)
  }

  test("multiple MATCHED clauses route per row, first-true wins") {
    val s = spark; import s.implicits._
    import PortableDelta.{MergeMatched, MergeNotMatched}
    val path = tmp()
    PortableDelta.write(base(0L until 10L).repartition(2), path)
    val src = Seq((1L, "kill"), (2L, "bump"), (3L, "kill"), (4L, "other"),
      (50L, "new")).toDF("id", "verb")
    val st = PortableDelta.mergeIntoFull(spark, path, src, Seq("id"),
      matched = Seq(
        MergeMatched("delete", Some(col("s.verb") === "kill")),
        MergeMatched("update", Some(col("s.verb") === "bump"),
          Some(Map("v" -> (col("t.v") + 1000L)))),
        // unconditional fallback LAST: tag the row
        MergeMatched("update", None,
          Some(Map("tag" -> concat(col("t.tag"), lit("*")))))),
      notMatched = Seq(MergeNotMatched(values = Some(Map(
        "id" -> col("s.id"), "tag" -> col("s.verb"), "v" -> lit(0L))))))
    assert(st.deletedRows == 2L && st.updatedRows == 2L &&
      st.insertedRows == 1L, s"got $st")
    assert(readAll(path) == Set(
      (0L, "a0", 0L), (2L, "a2", 1020L), (4L, "a4*", 40L),
      (5L, "a5", 50L), (6L, "a6", 60L), (7L, "a7", 70L),
      (8L, "a8", 80L), (9L, "a9", 90L), (50L, "new", 0L)))
  }

  test("WHEN NOT MATCHED BY SOURCE: delete and conditional update over target") {
    val s = spark; import s.implicits._
    import PortableDelta.{MergeBySource, MergeMatched}
    val path = tmp()
    PortableDelta.write(base(0L until 8L).repartition(2), path)
    // the sync-job shape: rows absent from the source get retired —
    // stale ones (v < 50) die, the rest get flagged
    val src = Seq((0L, 11L), (1L, 12L)).toDF("id", "nv")
    val st = PortableDelta.mergeIntoFull(spark, path, src, Seq("id"),
      matched = Seq(MergeMatched("update",
        set = Some(Map("v" -> col("s.nv"))))),
      bySource = Seq(
        MergeBySource("delete", Some(col("t.v") < 50L)),
        MergeBySource("update", None,
          Map("tag" -> concat(col("t.tag"), lit("!"))))))
    // 0,1 update from source; 2,3,4 (v=20..40) die; 5,6,7 get flagged
    assert(st.updatedRows == 5L && st.deletedRows == 3L &&
      st.insertedRows == 0L, s"got $st")
    assert(readAll(path) == Set(
      (0L, "a0", 11L), (1L, "a1", 12L),
      (5L, "a5!", 50L), (6L, "a6!", 60L), (7L, "a7!", 70L)))
  }

  test("BY SOURCE with an EMPTY source still applies; CDF records the pairs") {
    val s = spark; import s.implicits._
    import PortableDelta.MergeBySource
    val path = tmp()
    PortableDelta.write(base(0L until 3L).coalesce(1), path,
      properties = Map(PortableDelta.CdfProp -> "true"))
    val src = Seq.empty[(Long, String, Long)].toDF("id", "tag", "v")
    val st = PortableDelta.mergeIntoFull(spark, path, src, Seq("id"),
      bySource = Seq(
        MergeBySource("update", Some(col("t.id") === 0L),
          Map("v" -> lit(-1L))),
        MergeBySource("delete", Some(col("t.id") === 2L))))
    assert(st.updatedRows == 1L && st.deletedRows == 1L, s"got $st")
    assert(readAll(path) == Set((0L, "a0", -1L), (1L, "a1", 10L)))
    val ch = PortableDelta.readChanges(spark, path, 1L, 1L)
      .select(col("id"), col("v"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(ch == Set((0L, 0L, "update_preimage"), (0L, -1L, "update_postimage"),
      (2L, 20L, "delete")), s"got $ch")
  }

  test("multiple INSERT clauses: first-true routing, explicit values, NULL fill") {
    val s = spark; import s.implicits._
    import PortableDelta.MergeNotMatched
    val path = tmp()
    PortableDelta.write(base(0L until 2L).coalesce(1), path)
    val src = Seq((10L, "hot", 5L), (11L, "cold", 6L), (0L, "hot", 7L))
      .toDF("id", "kind", "w")
    val st = PortableDelta.mergeIntoFull(spark, path, src, Seq("id"),
      notMatched = Seq(
        MergeNotMatched(Some(col("kind") === "hot"), Some(Map(
          "id" -> col("id"), "tag" -> lit("HOT"), "v" -> (col("w") * 100L)))),
        // fallback: NULL-fills the unnamed plain column `tag`
        MergeNotMatched(values = Some(Map(
          "id" -> col("id"), "v" -> col("w"))))))
    // id 0 matches the target and there is no MATCHED clause → untouched
    assert(st.insertedRows == 2L && st.updatedRows == 0L, s"got $st")
    val got = PortableDelta.readTable(spark, path)
      .select(col("id"), col("tag"), col("v")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSet
    assert(got == Set(
      (0L, Some("a0"), 0L), (1L, Some("a1"), 10L),
      (10L, Some("HOT"), 500L), (11L, None, 6L)), s"got $got")
  }

  test("mergeSchema: an insert-only merge with a NEW source column evolves " +
      "the schema in the same commit; old rows null-backfill") {
    val s = spark; import s.implicits._
    import PortableDelta.MergeNotMatched
    val path = tmp()
    PortableDelta.write(base(0L until 4L).coalesce(1), path)
    val src = Seq((10L, "n10", 100L, 0.9), (1L, "x", 0L, 0.1))
      .toDF("id", "tag", "v", "score") // `score` is NEW
    // without the option: the aligned insert PROJECTS to the table
    // schema (extra source columns are SET helpers, the stac43 shape) —
    // the table schema must not silently change
    val twin = tmp()
    PortableDelta.write(base(0L until 4L).coalesce(1), twin)
    PortableDelta.mergeIntoFull(spark, twin, src, Seq("id"),
      notMatched = Seq(MergeNotMatched()))
    assert(PortableDelta.snapshot(spark, twin).schema.fieldNames.toSeq ==
      Seq("id", "tag", "v"), "no option, no evolution")
    // with it: ONE commit evolves metaData + inserts
    val st = PortableDelta.mergeIntoFull(spark, path, src, Seq("id"),
      notMatched = Seq(MergeNotMatched()), mergeSchema = true)
    assert(st.insertedRows == 1L && st.updatedRows == 0L, s"got $st")
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.version == 1L, "evolution + insert must be ONE commit")
    assert(snap.schema.fieldNames.toSeq ==
      Seq("id", "tag", "v", "score") && snap.schema("score").nullable)
    val got = PortableDelta.readTable(spark, path)
      .select(col("id"), col("tag"), col("v"), col("score")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(got == Set(
      (0L, "a0", 0L, None), (1L, "a1", 10L, None),
      (2L, "a2", 20L, None), (3L, "a3", 30L, None),
      (10L, "n10", 100L, Some(0.9))), s"got $got")
    // matched UPDATE after evolution: carried `score` of an old row is
    // null; SETting it works
    val st2 = PortableDelta.mergeIntoFull(spark, path,
      Seq((1L, 0.5)).toDF("id", "ns"), Seq("id"),
      matched = Seq(PortableDelta.MergeMatched("update",
        set = Some(Map("score" -> col("s.ns"))))))
    assert(st2.updatedRows == 1L)
    val r1 = PortableDelta.readTable(spark, path)
      .filter(col("id") === 1L).select("tag", "score").head()
    assert(r1.getString(0) == "a1" && r1.getDouble(1) == 0.5)
  }

  test("clause-order refusals: an unconditional clause must be last") {
    val s = spark; import s.implicits._
    import PortableDelta.{MergeMatched, MergeNotMatched}
    val path = tmp()
    PortableDelta.write(base(0L until 2L).coalesce(1), path)
    val src = Seq((1L, "x", 1L)).toDF("id", "tag", "v")
    val e = intercept[IllegalArgumentException](
      PortableDelta.mergeIntoFull(spark, path, src, Seq("id"),
        matched = Seq(
          MergeMatched("update", None, Some(Map("v" -> lit(0L)))),
          MergeMatched("delete", Some(col("s.v") > 0L)))))
    assert(e.getMessage.contains("unreachable"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      PortableDelta.mergeIntoFull(spark, path, src, Seq("id"),
        notMatched = Seq(MergeNotMatched(), MergeNotMatched())))
    assert(e2.getMessage.contains("unreachable"), e2.getMessage)
    assert(PortableDelta.snapshot(spark, path).version == 0L,
      "refusals must not commit")
  }

  test("commit race vs concurrent ALTER: the merge restarts on the evolved schema") {
    // the round-17 hazard (ADVICE r16): mergeIntoFull pinned
    // tableSchema/genNames/identNames from snap0; a rebase after losing
    // the commit race to a SCHEMA-evolving writer kept projecting
    // through the stale schema — concurrently-added column values were
    // dropped from rewritten rows, and with mergeSchema=true the
    // re-stated metaData actively REVERTED the concurrent ALTER. The
    // fix restarts the whole merge when the rebased snapshot's schema
    // differs from snap0's. Reproduced with a LogStore that injects a
    // real concurrent addColumn commit at the merge's publish instant.
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write(base(0L until 6L).repartition(2), path)   // v0
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set(GraftLogStore.ImplKey, classOf[RacingLogStore].getName)
    try {
      RacingLogStore.hook.set(() => {
        PortableDelta.addColumn(spark, path, "c_new",
          org.apache.spark.sql.types.StringType)                  // wins v1
        ()
      })
      // source carries its OWN new column (mergeSchema evolution), so a
      // stale-schema commit would be doubly wrong: revert c_new AND
      // stamp a schema lacking it
      val src = Seq((2L, "up2", 222L, "s2"), (9L, "in9", 999L, "s9"))
        .toDF("id", "tag", "v", "s_new")
      // explicit SET/VALUES: the restarted merge revalidates against the
      // EVOLVED schema, where whole-row clauses would refuse by name
      // (the source lacks c_new) — exactly the loud restart semantics
      val srcCols = Map("tag" -> col("s.tag"), "v" -> col("s.v"),
        "s_new" -> col("s.s_new"))
      val st = PortableDelta.mergeIntoFull(spark, path, src, Seq("id"),
        matched = Seq(PortableDelta.MergeMatched("update",
          set = Some(srcCols))),
        notMatched = Seq(PortableDelta.MergeNotMatched(
          values = Some(srcCols + ("id" -> col("s.id"))))),
        mergeSchema = true)
      assert(RacingLogStore.hook.get() == null, "the race must have fired")
      assert(st.updatedRows == 1L && st.insertedRows == 1L, s"$st")
      val snap = PortableDelta.snapshot(spark, path)
      assert(snap.version == 2L,
        s"ALTER v1 + restarted merge v2, got ${snap.version}")
      assert(snap.schema.fieldNames.toSeq ==
        Seq("id", "tag", "v", "c_new", "s_new"),
        s"concurrent c_new must survive AND s_new must evolve: " +
          snap.schema.fieldNames.toSeq.mkString(","))
      val rows = PortableDelta.readTable(spark, path)
        .select("id", "tag", "v", "c_new", "s_new").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getString(3),
          if (r.isNullAt(4)) null else r.getString(4)))).toMap
      assert(rows(2L) == (("up2", 222L, null, "s2")),
        s"updated row drifted: ${rows(2L)}")
      assert(rows(9L) == (("in9", 999L, null, "s9")),
        s"inserted row drifted: ${rows(9L)}")
      assert(rows(0L) == (("a0", 0L, null, null)),
        s"untouched row drifted: ${rows(0L)}")
    } finally {
      RacingLogStore.hook.set(null)
      hconf.unset(GraftLogStore.ImplKey)
    }
  }
}

/** Test-only [[GraftLogStore]]: on the first publication after [[
  * RacingLogStore.hook]] is armed, it first runs the hook (which
  * commits through this same store — re-entrancy guarded), so the
  * original publication loses the race exactly like a real concurrent
  * writer. Everything else delegates to the default store. */
class RacingLogStore extends GraftLogStore {
  override def putIfAbsent(fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path,
      dest: org.apache.hadoop.fs.Path): Boolean = {
    if (!RacingLogStore.inHook.get()) {
      val h = RacingLogStore.hook.getAndSet(null)
      if (h != null) {
        RacingLogStore.inHook.set(true)
        try h.run() finally RacingLogStore.inHook.set(false)
      }
    }
    RacingLogStore.delegate.putIfAbsent(fs, tmp, dest)
  }
}

object RacingLogStore {
  private[stac] val delegate = new RenameLogStore
  private[stac] val hook =
    new java.util.concurrent.atomic.AtomicReference[Runnable]()
  private[stac] val inHook: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)
}
