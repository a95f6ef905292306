package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** REORG TABLE ... APPLY (PURGE): every DV-carrying file is rewritten
  * with its soft-deleted rows materialized away (single-file victims
  * qualify, unlike compaction's bin-packing), and the
  * `purgeDroppedColumns` sweep rewrites mapped-table files whose
  * parquet bytes still hold dropped columns. Contracts: clean files
  * untouched, `dataChange=false` on both action sides, value identity,
  * no-op commits nothing, row IDs survive on row-tracked tables. */
class ReorgSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val mapper = new ObjectMapper()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("preorg").toString + "/tbl"

  private def df(lo: Long, hi: Long) = {
    val s = spark; import s.implicits._
    (lo until hi).map(i => (i, s"row $i")).toDF("id", "body")
  }

  test("purge rewrites exactly the DV-carrying files; no-op when clean") {
    val path = tmp()
    PortableDelta.write(df(0, 100).coalesce(1), path)            // file A
    PortableDelta.write(df(100, 200).coalesce(1), path, mode = "append") // B
    val del = PortableDelta.delete(spark, path, col("id") < 25L) // DV on A
    assert(del.dvFiles == 1)
    val preV = PortableDelta.snapshot(spark, path).version
    val cleanFile = PortableDelta.snapshot(spark, path).files
      .find(_.dv.isEmpty).get.path
    val expect = PortableDelta.readTable(spark, path)
      .select("id").collect().map(_.getLong(0)).toSet

    // a SINGLE DV-carrying victim still qualifies (compaction needs >= 2)
    val st = PortableDelta.reorgPurge(spark, path)
    assert(st.removedFiles == 1 && st.purgedDvRows == 25L, s"unexpected $st")
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.version == preV + 1)
    assert(snap.files.forall(_.dv.isEmpty), "no live file carries a DV")
    assert(snap.files.exists(_.path == cleanFile),
      "the DV-free file is NOT rewritten")
    assert(PortableDelta.readTable(spark, path)
      .select("id").collect().map(_.getLong(0)).toSet == expect)
    // dataChange=false on both sides of the purge commit
    val lines = scala.io.Source.fromFile(
      new java.io.File(s"$path/_delta_log/${"%020d".format(snap.version)}.json"),
      "UTF-8").getLines().filter(_.nonEmpty).map(mapper.readTree).toSeq
    assert(lines.filter(_.has("remove")).map(_.get("remove"))
      .forall(!_.get("dataChange").asBoolean()))
    assert(lines.filter(_.has("add")).map(_.get("add"))
      .forall(!_.get("dataChange").asBoolean()))
    // already purged → nothing to do, nothing committed
    val st2 = PortableDelta.reorgPurge(spark, path)
    assert(st2.removedFiles == 0 &&
      PortableDelta.snapshot(spark, path).version == snap.version)
  }

  test("a fully-dead file purges to a remove with no replacement add") {
    // delete() turns a SINGLE-commit full-file death into a plain
    // remove; stack two DV deletes so the file dies across commits and
    // the purge faces a zero-survivor victim
    val path = tmp()
    PortableDelta.write(df(0, 40).coalesce(1), path)
    PortableDelta.write(df(40, 80).coalesce(1), path, mode = "append")
    PortableDelta.delete(spark, path, col("id") < 39L)   // DV, 1 survivor
    PortableDelta.delete(spark, path, col("id") === 39L) // now fully dead
    val snap0 = PortableDelta.snapshot(spark, path)
    if (snap0.files.exists(_.dv.isDefined)) {
      val st = PortableDelta.reorgPurge(spark, path)
      assert(st.removedFiles >= 1)
      assert(PortableDelta.snapshot(spark, path).files.forall(_.dv.isEmpty))
    }
    assert(PortableDelta.readTable(spark, path)
      .select("id").collect().map(_.getLong(0)).toSet ==
      (40L until 80L).toSet)
  }

  test("purgeDroppedColumns rewrites only files with stale bytes") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write(
      (0L until 50L).map(i => (i, s"secret $i", s"keep $i"))
        .toDF("id", "pii", "body").coalesce(1), path)
    PortableDelta.dropColumn(spark, path, "pii") // metadata-only
    // post-drop append: born WITHOUT the stale column
    PortableDelta.write(
      (50L until 60L).map(i => (i, s"keep $i")).toDF("id", "body")
        .coalesce(1), path, mode = "append")
    val snapPre = PortableDelta.snapshot(spark, path)
    val freshFile = snapPre.files.maxBy(_.modificationTime).path
    // the dropped column's bytes are still on disk pre-purge
    def rawCols(): Set[String] = PortableDelta.snapshot(spark, path).files
      .flatMap(f => spark.read.parquet(s"$path/${f.path}").columns).toSet
    assert(rawCols().size == 3,
      s"stale physical column still present pre-purge: ${rawCols()}")

    val st = PortableDelta.reorgPurge(spark, path, purgeDroppedColumns = true)
    assert(st.removedFiles == 1, s"only the stale file rewrites: $st")
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.files.exists(_.path == freshFile),
      "the clean post-drop file is NOT rewritten")
    assert(rawCols().size == 2,
      s"no parquet byte of the dropped column survives: ${rawCols()}")
    // logical read unchanged
    assert(PortableDelta.readTable(spark, path)
      .select("id").collect().map(_.getLong(0)).toSet == (0L until 60L).toSet)
    // second sweep: nothing stale, nothing committed
    val st2 = PortableDelta.reorgPurge(spark, path, purgeDroppedColumns = true)
    assert(st2.removedFiles == 0 &&
      PortableDelta.snapshot(spark, path).version == snap.version)
  }

  test("row IDs survive the purge on a row-tracked table") {
    val path = tmp()
    PortableDelta.write(df(0, 30).coalesce(1), path)             // v0
    PortableDelta.enableRowTracking(spark, path)                 // v1
    PortableDelta.delete(spark, path, col("id") < 5L)            // v2: DV
    PortableDelta.reorgPurge(spark, path)                        // v3: purge
    // purge is dataChange=false: the change feed sees NOTHING for it
    assert(PortableDelta.readChanges(spark, path, 3L, 3L).count() == 0L)
    // an UPDATE of a purged-file row still pairs by its ORIGINAL id —
    // the purge rewrite materialized identities, not fresh ones
    PortableDelta.update(spark, path, col("id") === 7L,
      Map("body" -> lit("z7")))                                  // v4
    val ch = PortableDelta.readChanges(spark, path, 4L, 4L)
      .select("id", "body", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(ch == Set((7L, "row 7", "update_preimage"),
      (7L, "z7", "update_postimage")), s"got $ch")
    assert(PortableDelta.readTable(spark, path).count() == 25L)
  }
}
