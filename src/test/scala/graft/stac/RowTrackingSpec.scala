package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row tracking (`delta.enableRowTracking`): stable row IDs on adds
  * (baseRowId + row index, materialized through rewrites), the
  * `delta.rowTracking` high-water mark in domainMetadata, and the CDF
  * payoff — UPDATE-shaped commits reconstruct as update_preimage/
  * update_postimage PAIRS by row ID even when no cdc file exists. */
class RowTrackingSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val mapper = new ObjectMapper()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("prowtrack").toString + "/tbl"

  private def df(ids: Seq[Long], tag: String) = {
    val s = spark; import s.implicits._
    ids.map(i => (i, s"$tag$i")).toDF("id", "tag")
  }

  private def changes(path: String, v: Long): Set[(Long, String, String)] =
    PortableDelta.readChanges(spark, path, v, v)
      .select(col("id"), col("tag"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  test("enable backfills stable IDs; appends/DML extend the high-water mark") {
    val path = tmp()
    PortableDelta.write(df(0L until 4L, "a").coalesce(1), path)           // v0
    PortableDelta.write(df(4L until 10L, "a").coalesce(1), path,
      mode = "append")                                                    // v1
    val v = PortableDelta.enableRowTracking(spark, path)                  // v2
    assert(v == 2L)
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.writerFeatures.contains("rowTracking") &&
      snap.writerFeatures.contains("domainMetadata"))
    assert(snap.configuration.get(PortableDelta.RowTrackingProp).contains("true"))
    assert(snap.configuration.contains(PortableDelta.MaterializedRowIdProp))
    // backfill: every live file gets a baseRowId; ranges are disjoint
    // and cover exactly [0, rows)
    val spans = snap.files.map(f =>
      (f.baseRowId.get, f.baseRowId.get +
        mapper.readTree(f.stats.get).get("numRecords").asLong() - 1))
    assert(spans.map(_._1).min == 0L)
    assert(spans.sortBy(_._1).sliding(2).forall {
      case Seq((_, hi), (lo2, _)) => lo2 == hi + 1
      case _ => true
    })
    assert(snap.domainMetadata.get("delta.rowTracking")
      .exists(_.contains(""""rowIdHighWaterMark":9""")))
    // an append claims a FRESH id range past the mark
    PortableDelta.write(df(10L until 13L, "a").coalesce(1), path,
      mode = "append")                                                    // v3
    val snap2 = PortableDelta.snapshot(spark, path)
    val newFile = snap2.files.filterNot(f =>
      snap.files.map(_.path).contains(f.path))
    assert(newFile.size == 1 && newFile.head.baseRowId.contains(10L))
    assert(newFile.head.defaultRowCommitVersion.contains(3L))
    assert(snap2.domainMetadata.get("delta.rowTracking")
      .exists(_.contains(""""rowIdHighWaterMark":12""")))
    // DELETE keeps the file's baseRowId on the DV re-add (same file,
    // same stable IDs), and the state survives checkpoint + truncation
    PortableDelta.delete(spark, path, col("id") === 1L)                   // v4
    val snap3 = PortableDelta.snapshot(spark, path)
    assert(snap3.files.forall(_.baseRowId.isDefined),
      "DV re-adds must carry their original baseRowId")
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    val snap4 = PortableDelta.snapshot(spark, path)
    assert(snap4.files.forall(_.baseRowId.isDefined),
      "baseRowId must survive checkpoint replay")
    assert(snap4.domainMetadata.get("delta.rowTracking")
      .exists(_.contains(""""rowIdHighWaterMark":12""")),
      "the high-water mark must survive checkpoint replay")
  }

  test("own UPDATE pairs pre/post images via row IDs — without CDF") {
    val path = tmp()
    PortableDelta.write(df(0L until 6L, "a").coalesce(1), path)           // v0
    PortableDelta.enableRowTracking(spark, path)                          // v1
    val st = PortableDelta.update(spark, path, col("id") < 3L,
      Map("tag" -> concat(lit("u"), col("id").cast("string"))))           // v2
    assert(st.updatedRows == 3L)
    val ch = changes(path, 2L)
    assert(ch == Set(
      (0L, "a0", "update_preimage"), (0L, "u0", "update_postimage"),
      (1L, "a1", "update_preimage"), (1L, "u1", "update_postimage"),
      (2L, "a2", "update_preimage"), (2L, "u2", "update_postimage")),
      s"got $ch")
    // a SECOND update of an already-rewritten row still pairs (the
    // materialized IDs, not fresh baseRowId+index, carry identity)
    PortableDelta.update(spark, path, col("id") === 1L,
      Map("tag" -> lit("uu1")))                                           // v3
    val ch2 = changes(path, 3L)
    assert(ch2 == Set(
      (1L, "u1", "update_preimage"), (1L, "uu1", "update_postimage")),
      s"got $ch2")
    // final state is exact
    assert(PortableDelta.readTable(spark, path)
      .select(col("id"), col("tag")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((0L, "u0"), (1L, "uu1"), (2L, "u2"), (3L, "a3"), (4L, "a4"),
        (5L, "a5")))
    // plain DELETE on the same table still reads as deletes (no born
    // files → nothing to pair against)
    PortableDelta.delete(spark, path, col("id") === 5L)                   // v4
    assert(changes(path, 4L) == Set((5L, "a5", "delete")))
  }

  test("MERGE preserves matched rows' IDs — pairing exact, inserts fresh") {
    val path = tmp()
    PortableDelta.write(df(0L until 6L, "a").coalesce(1), path)           // v0
    PortableDelta.enableRowTracking(spark, path)                          // v1
    val st = PortableDelta.merge(spark, path,
      df(2L until 9L, "m").coalesce(1), keys = Seq("id"))                 // v2
    assert(st.updatedRows == 4L && st.insertedRows == 3L)
    // matched rows read as UPDATE PAIRS (the merge-updated row kept its
    // target row's ID via the materialized column); unmatched as inserts
    val ch = changes(path, 2L)
    assert(ch == Set(
      (2L, "a2", "update_preimage"), (2L, "m2", "update_postimage"),
      (3L, "a3", "update_preimage"), (3L, "m3", "update_postimage"),
      (4L, "a4", "update_preimage"), (4L, "m4", "update_postimage"),
      (5L, "a5", "update_preimage"), (5L, "m5", "update_postimage"),
      (6L, "m6", "insert"), (7L, "m7", "insert"), (8L, "m8", "insert")),
      s"got $ch")
    // a SECOND merge over an already-merged row still pairs — the
    // carried ID (not a fresh baseRowId+index) is the row's identity
    PortableDelta.merge(spark, path, df(Seq(3L), "mm").coalesce(1),
      keys = Seq("id"))                                                   // v3
    val ch2 = changes(path, 3L)
    assert(ch2 == Set(
      (3L, "m3", "update_preimage"), (3L, "mm3", "update_postimage")),
      s"got $ch2")
    assert(PortableDelta.readTable(spark, path)
      .select(col("id"), col("tag")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      ((0L until 2L).map(i => i -> s"a$i") ++
        Seq(2L -> "m2", 3L -> "mm3", 4L -> "m4", 5L -> "m5") ++
        (6L until 9L).map(i => i -> s"m$i")).toSet)
  }

  test("OPTIMIZE materializes IDs — identity survives compaction") {
    val path = tmp()
    PortableDelta.write(df(0L until 4L, "a").coalesce(1), path)           // v0
    PortableDelta.write(df(4L until 8L, "a").coalesce(1), path,
      mode = "append")                                                    // v1
    PortableDelta.enableRowTracking(spark, path)                          // v2
    PortableDelta.delete(spark, path, col("id") === 1L)                   // v3
    val ost = PortableDelta.optimizeCompact(spark, path)                  // v4
    assert(ost.removedFiles == 2 && ost.purgedDvRows == 1L)
    // compaction is dataChange=false: the feed sees NOTHING for v4
    assert(PortableDelta.readChanges(spark, path, 4L, 4L).count() == 0L)
    // but an UPDATE of a compacted row still pairs by its ORIGINAL id —
    // the rewrite materialized identities instead of minting fresh ones
    PortableDelta.update(spark, path, col("id") === 2L,
      Map("tag" -> lit("z2")))                                            // v5
    val ch = changes(path, 5L)
    assert(ch == Set(
      (2L, "a2", "update_preimage"), (2L, "z2", "update_postimage")),
      s"got $ch")
    assert(PortableDelta.readTable(spark, path).count() == 7L)
  }

  test("row tracking composes with hive partitioning") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write(
      (0L until 12L).map(i => (i, if (i % 2 == 0) "A" else "B", s"a$i"))
        .toDF("id", "part", "tag"),
      path, partitionBy = Seq("part"))                                    // v0
    PortableDelta.enableRowTracking(spark, path)                          // v1
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.files.forall(_.baseRowId.isDefined))
    // update across BOTH partitions — pairs must resolve per partition
    // (row-id keying is table-relative-path based, partition dirs incl.)
    val st = PortableDelta.update(spark, path, col("id") < 4L,
      Map("tag" -> concat(lit("u"), col("id").cast("string"))))           // v2
    assert(st.updatedRows == 4L)
    val ch = PortableDelta.readChanges(spark, path, 2L, 2L)
      .select(col("id"), col("part"), col("tag"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(ch == Set(
      (0L, "A", "a0", "update_preimage"), (0L, "A", "u0", "update_postimage"),
      (1L, "B", "a1", "update_preimage"), (1L, "B", "u1", "update_postimage"),
      (2L, "A", "a2", "update_preimage"), (2L, "A", "u2", "update_postimage"),
      (3L, "B", "a3", "update_preimage"), (3L, "B", "u3", "update_postimage")),
      s"got $ch")
    assert(PortableDelta.readTable(spark, path)
      .where(col("part") === "A").count() == 6L)
  }

  test("external UPDATE-shaped commit (no cdc) pairs via materialized IDs") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write(df(0L until 5L, "a").coalesce(1), path)           // v0
    PortableDelta.enableRowTracking(spark, path)                          // v1
    val snap = PortableDelta.snapshot(spark, path)
    val mcol = snap.configuration(PortableDelta.MaterializedRowIdProp)
    val oldFile = snap.files.head
    assert(oldFile.baseRowId.contains(0L))
    // an external engine's whole-file UPDATE rewrite: rows 0..2 updated,
    // row 3 dropped, row 4 kept verbatim, one NEW row with a fresh ID —
    // original identities ride in the materialized row-id column
    val rewritten = Seq(
      (0L, "x0", 0L), (1L, "x1", 1L), (2L, "x2", 2L),
      (4L, "a4", 4L), (9L, "born", 5L))
      .toDF("id", "tag", mcol)
    val staging = java.nio.file.Files.createTempDirectory("prt-ext").toString + "/p"
    rewritten.coalesce(1).write.parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
    val dest = new java.io.File(path, "ext-rewrite.parquet")
    java.nio.file.Files.move(part.toPath, dest.toPath)
    val ci = mapper.createObjectNode()
    ci.putObject("commitInfo").put("timestamp", 3L).put("operation", "UPDATE")
    val rm = mapper.createObjectNode()
    val r = rm.putObject("remove")
    r.put("path", oldFile.path); r.put("deletionTimestamp", 3L)
    r.put("dataChange", true)
    val ad = mapper.createObjectNode()
    val a = ad.putObject("add")
    a.put("path", dest.getName); a.putObject("partitionValues")
    a.put("size", dest.length); a.put("modificationTime", 3L)
    a.put("dataChange", true)
    a.put("baseRowId", 5L); a.put("defaultRowCommitVersion", 2L)
    val dm = mapper.createObjectNode()
    val d = dm.putObject("domainMetadata")
    d.put("domain", "delta.rowTracking")
    d.put("configuration", """{"rowIdHighWaterMark":5}""")
    d.put("removed", false)
    val out = new java.io.FileOutputStream(
      s"$path/_delta_log/${"%020d".format(2L)}.json")
    try out.write((Seq(ci, rm, ad, dm).map(mapper.writeValueAsString)
      .mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()

    val ch = changes(path, 2L)
    assert(ch == Set(
      (0L, "a0", "update_preimage"), (0L, "x0", "update_postimage"),
      (1L, "a1", "update_preimage"), (1L, "x1", "update_postimage"),
      (2L, "a2", "update_preimage"), (2L, "x2", "update_postimage"),
      (4L, "a4", "update_preimage"), (4L, "a4", "update_postimage"),
      (3L, "a3", "delete"),
      (9L, "born", "insert")),
      s"got $ch")
    // the table itself reads the rewritten state (materialized column
    // is file-internal, invisible to the schema)
    assert(PortableDelta.readTable(spark, path).columns.toSeq ==
      Seq("id", "tag"))
    assert(PortableDelta.readTable(spark, path)
      .select(col("id")).collect().map(_.getLong(0)).toSet ==
      Set(0L, 1L, 2L, 4L, 9L))
  }
}
