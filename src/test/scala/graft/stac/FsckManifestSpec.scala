package graft.stac

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `fsckRepair` (drop log references to vanished files — data OR their
  * on-disk DV packs) and `generateSymlinkManifest` (the Hive/Presto/
  * Trino interop manifests, with the DV / column-mapping refusals and
  * the delta-spark auto-regen property). */
class FsckManifestSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pfsck").toString + "/tbl"

  private def df(ids: Seq[Long], tag: String) = {
    val s = spark; import s.implicits._
    ids.map(i => (i, s"$tag$i")).toDF("id", "tag")
  }

  test("fsck removes vanished files; dryRun reports without committing") {
    val path = tmp()
    PortableDelta.write(df(0L until 9L, "a").repartition(3), path)
    val snap0 = PortableDelta.snapshot(spark, path)
    assert(snap0.files.size == 3)
    // healthy table: nothing to repair
    assert(PortableDelta.fsckRepair(spark, path).isEmpty)
    // vanish one file (storage loss)
    val victim = snap0.files.head.path
    assert(new java.io.File(path, victim).delete())
    val dry = PortableDelta.fsckRepair(spark, path, dryRun = true)
    assert(dry == Seq(victim))
    assert(PortableDelta.snapshot(spark, path).version == snap0.version,
      "dryRun must not commit")
    val repaired = PortableDelta.fsckRepair(spark, path)
    assert(repaired == Seq(victim))
    val snap1 = PortableDelta.snapshot(spark, path)
    assert(snap1.version == snap0.version + 1 &&
      !snap1.files.exists(_.path == victim))
    // the surviving rows scan cleanly (no FileNotFound)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val expect = snap1.files
      .map(f => mapper.readTree(f.stats.get).get("numRecords").asLong()).sum
    assert(PortableDelta.readTable(spark, path).count() == expect)
    PortableDelta.validateChecksum(spark, path)
  }

  test("a file whose DV pack vanished is broken too") {
    val path = tmp()
    PortableDelta.write(df(0L until 8L, "a").repartition(2), path)
    PortableDelta.delete(spark, path, col("id") % 4L === 0L) // DVs on disk
    val packs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("deletion_vector_"))
    assert(packs.nonEmpty)
    packs.foreach(p => assert(p.delete()))
    val repaired = PortableDelta.fsckRepair(spark, path)
    assert(repaired.nonEmpty, "DV-orphaned files must repair")
    // what remains reads without resurrecting the deleted rows
    val left = PortableDelta.readTable(spark, path)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(!left.exists(_ % 4L == 0L),
      s"no deleted row may resurrect: $left")
  }

  test("manifests mirror hive dirs; reading THROUGH them equals the table") {
    val s = spark; import s.implicits._
    val path = tmp()
    val data = (0L until 40L).map(i => (i, s"p${i % 4}")).toDF("id", "part")
    PortableDelta.write(data.repartition(4), path, partitionBy = Seq("part"))
    val dirs = PortableDelta.generateSymlinkManifest(spark, path)
    assert(dirs.size == 4 && dirs.forall(_.startsWith("part=")), s"$dirs")
    // a symlink-manifest consumer: read the manifest lines, open those
    // parquet URIs directly (what Presto/Trino/Hive do)
    val uris = dirs.flatMap { d =>
      scala.io.Source.fromFile(
        s"$path/_symlink_format_manifest/$d/manifest").getLines().toList
    }
    assert(uris.nonEmpty && uris.forall(_.endsWith(".parquet")))
    val viaManifest = spark.read.parquet(uris.map(_.stripPrefix("file:")): _*)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val direct = PortableDelta.readTable(spark, path)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(viaManifest == direct)
    // refusals by name
    PortableDelta.delete(spark, path, col("id") === 1L) // a DV lands
    val e = intercept[IllegalArgumentException] {
      PortableDelta.generateSymlinkManifest(spark, path)
    }
    assert(e.getMessage.contains("deletion vectors"), e.getMessage)
    val p2 = tmp()
    PortableDelta.write(df(0L until 4L, "a").coalesce(1), p2)
    PortableDelta.renameColumn(spark, p2, "tag", "label")
    val e2 = intercept[IllegalArgumentException] {
      PortableDelta.generateSymlinkManifest(spark, p2)
    }
    assert(e2.getMessage.contains("column mapping"), e2.getMessage)
  }

  test("the compatibility property regenerates manifests on every commit") {
    val path = tmp()
    PortableDelta.write(df(0L until 4L, "a").coalesce(1), path,
      properties = Map(
        "delta.compatibility.symlinkFormatManifest.enabled" -> "true"))
    val m = new java.io.File(
      s"$path/_symlink_format_manifest/manifest")
    assert(m.isFile, "the create commit must already write the manifest")
    val before = scala.io.Source.fromFile(m).getLines().toSet
    PortableDelta.write(df(4L until 6L, "a").coalesce(1), path,
      mode = "append")
    val after = scala.io.Source.fromFile(m).getLines().toSet
    assert(before.subsetOf(after) && after.size == before.size + 1,
      s"the append must extend the manifest: $before -> $after")
    // the manifest view equals the table after every commit
    val uris = after.toSeq.map(_.stripPrefix("file:"))
    assert(spark.read.parquet(uris: _*).count() ==
      PortableDelta.readTable(spark, path).count())
  }
}
