package graft.stac

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Replay of the FROZEN combined external-shaped Delta fixture
  * (`src/test/resources/external_combined_delta/`, bytes committed at
  * round 11 — see `graft.FixtureGen` for provenance). One table
  * combining hive partitioning + CDF + deletion vectors + column
  * mapping (post-RENAME) + clustering domainMetadata + a MULTI-PART
  * checkpoint + a post-checkpoint JSON tail, with external commitInfo
  * fields (engineInfo/operationParameters/txnId) and `tags` on adds.
  *
  * The point of freezing: the reader's interop claims regress against
  * bytes that CANNOT co-evolve with the writer — a reader break shows
  * up here even if the current writer's output drifts with it. (A real
  * second engine is not installable in this sandbox: zero egress, no
  * delta jars — this is the honest stand-in, mangled into the shapes
  * delta-spark/kernel emit per PROTOCOL.md.) */
class ExternalFixtureSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  /** Copy the frozen fixture to a scratch dir (continuation legs write). */
  private def stage(): String = {
    val src = java.nio.file.Paths.get("src/test/resources/external_combined_delta")
    assert(java.nio.file.Files.isDirectory(src), s"fixture missing at $src")
    val dst = java.nio.file.Files.createTempDirectory("extfix").resolve("tbl")
    java.nio.file.Files.walk(src).forEach { p =>
      val tgt = dst.resolve(src.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(tgt)
      else {
        java.nio.file.Files.createDirectories(tgt.getParent)
        java.nio.file.Files.copy(p, tgt)
      }
      ()
    }
    dst.toString
  }

  test("frozen fixture replays: snapshot, mapped schema, DV-filtered rows, domain") {
    val path = stage()
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.version == 6L)
    assert(snap.readerFeatures.toSet == Set("columnMapping", "deletionVectors"))
    assert(snap.domainMetadata.contains("delta.clustering"))
    assert(snap.configuration.get("delta.enableChangeDataFeed").contains("true"))
    // logical schema post-rename: id, text, grp (physical names differ)
    assert(PortableDelta.readTable(spark, path).columns.toSeq ==
      Seq("id", "text", "grp"))
    val got = PortableDelta.readTable(spark, path)
      .select(col("id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // ids 0..9 minus the deleted 2; id 5 carries the UPDATE
    assert(got.keySet == (0L to 9L).toSet - 2L, s"live ids: ${got.keySet}")
    assert(got(5L) == "UPDATED 5" && got(4L) == "doc 4")
    // partition pruning works over the mapped hive layout
    assert(PortableDelta.readTableWhere(spark, path, col("grp") === "odd")
      .count() == 5L)
  }

  test("frozen fixture: time travel crosses the rename; CDF yields the update + delete") {
    val path = stage()
    // v1 predates the RENAME: schema says `body`, all 8 rows live
    val v1 = PortableDelta.readTable(spark, path, 1L)
    assert(v1.columns.toSeq == Seq("id", "body", "grp"))
    assert(v1.count() == 8L)
    // CDF over the UPDATE commit (v3): exact pre/post pair for id 5
    val cdf3 = PortableDelta.readChanges(spark, path, 3L, 3L)
      .filter(col("id") === 5L)
      .select(col("_change_type"), col("text")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cdf3 == Map("update_preimage" -> "doc 5",
      "update_postimage" -> "UPDATED 5"), s"got $cdf3")
    // CDF over the DELETE commit (v4): id 2 leaves
    val cdf4 = PortableDelta.readChanges(spark, path, 4L, 4L)
      .select(col("_change_type"), col("id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(cdf4 == Seq("delete" -> 2L), s"got $cdf4")
  }

  test("frozen fixture: this engine WRITES on top, checkpoints, and cleans up") {
    val path = stage()
    val s = spark; import s.implicits._
    PortableDelta.write(
      Seq((10L, "doc 10", "even"), (11L, "doc 11", "odd"))
        .toDF("id", "text", "grp").repartition(1),
      path, partitionBy = Seq("grp"), mode = "append")           // v7
    val del = PortableDelta.delete(spark, path, col("id") === 0L) // v8
    assert(del.deletedRows == 1L)
    // CDF written by OUR engine on the external table reads (before
    // cleanup truncates the commit JSON the feed replays from)
    val cdf = PortableDelta.readChanges(spark, path, 8L, 8L)
      .select(col("_change_type"), col("id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(cdf == Seq("delete" -> 0L))
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark, path)
    val got = PortableDelta.readTable(spark, path)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == ((1L to 11L).toSet - 2L), s"live ids after continuation: $got")
  }
}
