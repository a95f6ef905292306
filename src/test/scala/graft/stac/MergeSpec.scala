package graft.stac

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MERGE (upsert) over the portable Delta log, DV-style: matched target
  * rows die by position, new row versions append — untouched files are
  * never rewritten. Contracts: update/insert/delete counters are exact,
  * matching runs against the LIVE (DV-filtered) view, duplicate source
  * keys are rejected, pre-merge versions still time-travel, and the
  * on-disk file set only ever GROWS across a merge. */
class MergeSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pmerge").toString + "/tbl"

  private def rows(ids: Seq[Long], tag: String) = {
    val s = spark; import s.implicits._
    ids.map(i => (i, tag, i * 10L)).toDF("id", "tag", "v")
  }

  test("upsert: matched rows update in place (by DV), unmatched insert") {
    val path = tmp()
    PortableDelta.write(rows(0L until 10L, "base").repartition(3), path)
    def partsOnDisk = new java.io.File(path).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).toSet
    val before = partsOnDisk

    // source: updates for 3,4,5 (tag=up), inserts for 20,21
    val src = rows(Seq(3L, 4L, 5L), "up").union(rows(Seq(20L, 21L), "new"))
    val st = PortableDelta.merge(spark, path, src, Seq("id"))
    assert(st.updatedRows == 3 && st.insertedRows == 2 && st.deletedRows == 0,
      s"unexpected $st")
    // untouched files were not rewritten; the set only grew
    assert(before.subsetOf(partsOnDisk), "merge must never rewrite existing files")
    val got = PortableDelta.readTable(spark, path)
      .select(col("id"), col("tag")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 12)
    assert(Seq(3L, 4L, 5L).forall(got(_) == "up"))
    assert(Seq(20L, 21L).forall(got(_) == "new"))
    assert((0L until 10L).filterNot(Seq(3L, 4L, 5L).contains)
      .forall(got(_) == "base"))
    // pre-merge version still reads the original rows
    val pre = PortableDelta.readTable(spark, path, st.version - 1)
      .select(col("tag")).distinct().collect().map(_.getString(0)).toSeq
    assert(pre == Seq("base"))
  }

  test("matching is against the LIVE view: a deleted key re-inserts") {
    val path = tmp()
    PortableDelta.write(rows(0L until 5L, "base").coalesce(1), path)
    PortableDelta.delete(spark, path, col("id") === 2L)
    // id 2 is dead: merging it must count as INSERT, not update
    val st = PortableDelta.merge(spark, path, rows(Seq(2L), "back"), Seq("id"))
    assert(st.updatedRows == 0 && st.insertedRows == 1, s"unexpected $st")
    val got = PortableDelta.readTable(spark, path)
      .select(col("id"), col("tag")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(2L) == "back" && got.size == 5)
  }

  test("whenMatched=delete kills matched rows; insertNotMatched=false drops the rest") {
    val path = tmp()
    PortableDelta.write(rows(0L until 10L, "base").repartition(2), path)
    val st = PortableDelta.merge(spark, path,
      rows(Seq(1L, 3L, 99L), "x"), Seq("id"),
      whenMatched = "delete", insertNotMatched = false)
    assert(st.deletedRows == 2 && st.insertedRows == 0 && st.updatedRows == 0,
      s"unexpected $st")
    val got = PortableDelta.readTable(spark, path)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == (0L until 10L).toSet -- Set(1L, 3L))
  }

  test("txn-tagged MERGE is idempotent per (appId, version) — the CDC sink contract") {
    val path = tmp()
    PortableDelta.write(rows(0L until 6L, "base").coalesce(1), path)
    val m1 = PortableDelta.merge(spark, path,
      rows(Seq(1L, 2L), "up").union(rows(Seq(10L), "new")), Seq("id"),
      txn = Some(("cdc", 0L)))
    assert(m1.updatedRows == 2 && m1.insertedRows == 1)
    // a replayed MERGE is the dangerous re-delivery: it would re-apply
    // row MUTATIONS — the txn gate must void it before any scan
    val m2 = PortableDelta.merge(spark, path,
      rows(Seq(3L), "evil"), Seq("id"), txn = Some(("cdc", 0L)))
    assert(m2.updatedRows == 0 && m2.insertedRows == 0 &&
      m2.version == m1.version, s"replayed merge must be a no-op: $m2")
    assert(PortableDelta.readTable(spark, path)
      .filter(col("tag") === "evil").count() == 0L)
    // next batchId lands; watermark advances
    val m3 = PortableDelta.merge(spark, path, rows(Seq(3L), "up3"), Seq("id"),
      txn = Some(("cdc", 1L)))
    assert(m3.updatedRows == 1 && m3.version == m1.version + 1)
    assert(PortableDelta.snapshot(spark, path).txns("cdc") == 1L)
  }

  test("duplicate source keys are rejected; empty source is a no-op") {
    val path = tmp()
    PortableDelta.write(rows(0L until 5L, "base").coalesce(1), path)
    val dup = rows(Seq(1L, 1L), "d")
    val e = intercept[IllegalArgumentException] {
      PortableDelta.merge(spark, path, dup, Seq("id"))
    }
    assert(e.getMessage.contains("unique"))
    val v = PortableDelta.snapshot(spark, path).version
    val st = PortableDelta.merge(spark, path, rows(Nil, "z"), Seq("id"))
    assert(st.version == v && st.insertedRows == 0,
      "empty source must not commit")
  }

  test("merge is re-runnable: same source twice converges to the same table") {
    val path = tmp()
    PortableDelta.write(rows(0L until 6L, "base").repartition(2), path)
    val src = rows(Seq(4L, 5L, 6L), "up")
    val st1 = PortableDelta.merge(spark, path, src, Seq("id"))
    assert(st1.updatedRows == 2 && st1.insertedRows == 1)
    val snap1 = PortableDelta.readTable(spark, path)
      .orderBy(col("id")).collect().map(_.toSeq).toSeq
    // second run: 4,5,6 now all exist → 3 updates, 0 inserts, same values
    val st2 = PortableDelta.merge(spark, path, src, Seq("id"))
    assert(st2.updatedRows == 3 && st2.insertedRows == 0)
    val snap2 = PortableDelta.readTable(spark, path)
      .orderBy(col("id")).collect().map(_.toSeq).toSeq
    assert(snap1 == snap2, "re-merging the same source must be value-stable")
  }
}
