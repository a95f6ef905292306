package graft.stac

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ALTER TABLE ... DROP FEATURE: trace-gated protocol downgrade.
  * Writer-only features drop in one history-intact commit once their
  * residue is gone; reader-facing features demand the explicit
  * TRUNCATE HISTORY trade (checkpoint at the drop + full earlier-log
  * truncation); the emitted protocol normalizes back to legacy
  * versions on an exact tier match; every refusal names the trace. */
class DropFeatureSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private def conf = spark.sessionState.newHadoopConf()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pdrop").toString + "/tbl"

  private def df(lo: Long, hi: Long) = {
    val s = spark; import s.implicits._
    (lo until hi).map(i => (i, s"row $i")).toDF("id", "tag")
  }

  test("writer-only drop: trace refusal by name, then one-commit downgrade") {
    val path = tmp()
    PortableDelta.write(df(0, 50).coalesce(1), path,
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    val pre = PortableDelta.snapshot(spark, path)
    assert(pre.writerFeatures.contains("changeDataFeed"))
    // property still on → refuse naming it
    val e1 = intercept[IllegalArgumentException] {
      PortableDelta.dropFeatureSupport(spark, path, "changeDataFeed")
    }
    assert(e1.getMessage.contains("delta.enableChangeDataFeed"))
    PortableDelta.setTableProperties(spark, path,
      Map("delta.enableChangeDataFeed" -> "false"))
    val v = PortableDelta.dropFeatureSupport(spark, path, "changeDataFeed")
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.version == v)
    assert(!snap.writerFeatures.contains("changeDataFeed"),
      s"feature still listed: ${snap.writerFeatures}")
    // writer-only drop keeps history: v0 still time-travels
    assert(PortableDelta.readTable(spark, path, 0L).count() == 50L)
    // data still reads
    assert(PortableDelta.readTable(spark, path).count() == 50L)
    // dropping an unlisted feature refuses by name
    val e2 = intercept[IllegalArgumentException] {
      PortableDelta.dropFeatureSupport(spark, path, "changeDataFeed")
    }
    assert(e2.getMessage.contains("not listed"))
  }

  test("deletionVectors: purge gate, truncate-history gate, then drop") {
    val path = tmp()
    PortableDelta.write(df(0, 100).coalesce(1), path)
    PortableDelta.write(df(100, 150).coalesce(1), path, mode = "append")
    PortableDelta.delete(spark, path, col("id") < 10L) // DV → feature lands
    assert(PortableDelta.snapshot(spark, path)
      .writerFeatures.contains("deletionVectors"))
    // live DVs → refuse pointing at reorgPurge
    val e1 = intercept[IllegalArgumentException] {
      PortableDelta.dropFeatureSupport(spark, path, "deletionVectors",
        truncateHistory = true)
    }
    assert(e1.getMessage.contains("reorgPurge"))
    PortableDelta.reorgPurge(spark, path)
    // purged but no truncation opt-in → refuse naming the trade
    val e2 = intercept[IllegalArgumentException] {
      PortableDelta.dropFeatureSupport(spark, path, "deletionVectors")
    }
    assert(e2.getMessage.contains("truncateHistory"))
    val expect = PortableDelta.readTable(spark, path)
      .select("id").collect().map(_.getLong(0)).toSet
    val v = PortableDelta.dropFeatureSupport(spark, path, "deletionVectors",
      truncateHistory = true)
    val snap = PortableDelta.snapshot(spark, path)
    assert(!snap.readerFeatures.contains("deletionVectors") &&
      !snap.writerFeatures.contains("deletionVectors"),
      s"still listed: r=${snap.readerFeatures} w=${snap.writerFeatures}")
    // the earlier log is GONE: no JSON commit below the drop version
    val jsons = new java.io.File(s"$path/_delta_log").listFiles()
      .map(_.getName).filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong).sorted
    assert(jsons.forall(_ >= v), s"pre-drop commits survive: ${jsons.toSeq}")
    // pre-drop time travel is lost (the documented trade) ...
    intercept[Exception] { PortableDelta.readTable(spark, path, 0L).count() }
    // ... but the current state replays exactly, from the checkpoint
    assert(PortableDelta.readTable(spark, path)
      .select("id").collect().map(_.getLong(0)).toSet == expect)
    // validates + crc intact after the truncation
    PortableDelta.validateChecksum(spark, path)
    // and the table keeps writing
    PortableDelta.write(df(150, 160).coalesce(1), path, mode = "append")
    assert(PortableDelta.readTable(spark, path).count() == 150L)
  }

  test("protocol normalizes to legacy versions on an exact tier match") {
    val path = tmp()
    PortableDelta.write(df(0, 30).coalesce(1), path)
    val base = PortableDelta.snapshot(spark, path)
    assert(base.minWriterVersion == 2 && base.minReaderVersion == 1)
    // upgrade to (1,7): the fold carries appendOnly+invariants along
    PortableDelta.enableInCommitTimestamps(spark, path)
    val up = PortableDelta.snapshot(spark, path)
    assert(up.minWriterVersion == 7)
    assert(up.writerFeatures.toSet ==
      Set("appendOnly", "invariants", "inCommitTimestamp"),
      s"legacy fold on upgrade: ${up.writerFeatures}")
    PortableDelta.setTableProperties(spark, path,
      Map("delta.enableInCommitTimestamps" -> "false"))
    val v = PortableDelta.dropFeatureSupport(spark, path, "inCommitTimestamp")
    val snap = PortableDelta.snapshot(spark, path)
    // {appendOnly, invariants} is EXACTLY legacy writer-2 → back to (1,2)
    assert(snap.minReaderVersion == 1 && snap.minWriterVersion == 2,
      s"expected legacy (1,2), got (${snap.minReaderVersion}, " +
        s"${snap.minWriterVersion}) w=${snap.writerFeatures}")
    assert(snap.writerFeatures.isEmpty && snap.readerFeatures.isEmpty)
    // provenance properties left with the feature
    assert(!snap.configuration.keys.exists(_.startsWith(
      "delta.inCommitTimestamp")),
      s"provenance survives: ${snap.configuration}")
    assert(PortableDelta.readTable(spark, path, 0L).count() == 30L)
    assert(snap.version == v)
  }

  test("domainMetadata drop refuses while domains or dependent features live") {
    val path = tmp()
    PortableDelta.write(df(0, 20).coalesce(1), path, properties = Map(
      "delta.feature.domainMetadata" -> "supported"))
    PortableDelta.alterClusterBy(spark, path, Seq("id"))
    val pre = PortableDelta.snapshot(spark, path)
    assert(pre.writerFeatures.contains("domainMetadata") &&
      pre.domainMetadata.contains("delta.clustering"))
    // a live domain is the feature's trace — refuse naming it
    val e1 = intercept[IllegalArgumentException] {
      PortableDelta.dropFeatureSupport(spark, path, "domainMetadata")
    }
    assert(e1.getMessage.contains("delta.clustering"))
    PortableDelta.alterClusterBy(spark, path, Nil) // CLUSTER BY NONE
    // the domain is gone but `clustering` stays listed: its state RIDES
    // on domain actions — still refuse, naming the dependent
    val e2 = intercept[IllegalArgumentException] {
      PortableDelta.dropFeatureSupport(spark, path, "domainMetadata")
    }
    assert(e2.getMessage.contains("clustering"))
    PortableDelta.dropFeatureSupport(spark, path, "clustering")
    PortableDelta.dropFeatureSupport(spark, path, "domainMetadata")
    val snap = PortableDelta.snapshot(spark, path)
    assert(!snap.writerFeatures.contains("domainMetadata"))
    assert(PortableDelta.readTable(spark, path).count() == 20L)
  }

  test("rowTracking drop removes the domain and materialized column prop") {
    val path = tmp()
    PortableDelta.write(df(0, 20).coalesce(1), path)
    PortableDelta.enableRowTracking(spark, path)
    val pre = PortableDelta.snapshot(spark, path)
    assert(pre.writerFeatures.contains("rowTracking") &&
      pre.domainMetadata.contains("delta.rowTracking"))
    val e = intercept[IllegalArgumentException] {
      PortableDelta.dropFeatureSupport(spark, path, "rowTracking")
    }
    assert(e.getMessage.contains("delta.enableRowTracking"))
    PortableDelta.setTableProperties(spark, path,
      Map("delta.enableRowTracking" -> "false"))
    PortableDelta.dropFeatureSupport(spark, path, "rowTracking")
    val snap = PortableDelta.snapshot(spark, path)
    assert(!snap.writerFeatures.contains("rowTracking"))
    assert(!snap.domainMetadata.contains("delta.rowTracking"),
      s"domain survives: ${snap.domainMetadata}")
    assert(!snap.configuration.contains(
      PortableDelta.MaterializedRowIdProp))
    PortableDelta.validateChecksum(spark, path)
  }
}
