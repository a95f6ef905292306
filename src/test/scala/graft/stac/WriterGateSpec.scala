package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The spec's WRITER gate: a version-7 table is committable only by an
  * engine implementing EVERY listed writer feature. Unknown features
  * refuse every mutating verb BY NAME (reads stay governed by the
  * reader gate alone); `vacuumProtocolCheck` is implemented on both
  * sides; column INVARIANTS (`delta.invariants` field metadata) are
  * enforced like CHECK constraints, so the claimed `invariants`
  * support is honest for external tables carrying them. */
class WriterGateSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val mapper = new ObjectMapper()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pwgate").toString + "/tbl"

  private def df(ids: Seq[Long]) = {
    val s = spark; import s.implicits._
    ids.map(i => (i, i * 2)).toDF("id", "v")
  }

  /** Append an externally-shaped protocol commit listing `writerFeats`
    * (reader side untouched at version 1). */
  private def pushProtocol(path: String, v: Long,
                           writerFeats: Seq[String]): Unit = {
    val proto = mapper.createObjectNode()
    val p = proto.putObject("protocol")
    p.put("minReaderVersion", 1); p.put("minWriterVersion", 7)
    val wf = p.putArray("writerFeatures"); writerFeats.foreach(wf.add)
    val ci = mapper.createObjectNode()
    ci.putObject("commitInfo").put("operation", "UPGRADE PROTOCOL")
    val out = new java.io.FileOutputStream(
      s"$path/_delta_log/${"%020d".format(v)}.json")
    try out.write((Seq(ci, proto).map(mapper.writeValueAsString)
      .mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  test("unknown writer feature refuses every mutating verb by name; reads work") {
    val path = tmp()
    PortableDelta.write(df(0L until 6L).coalesce(1), path)            // v0
    pushProtocol(path, 1L, Seq("appendOnly", "futureFancyCommitProtocol"))
    // reads untouched (reader gate passes at version 1)
    assert(PortableDelta.readTable(spark, path).count() == 6L)
    def refused(body: => Any): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains("futureFancyCommitProtocol") &&
        e.getMessage.contains("refusing to commit"), e.getMessage)
    }
    refused(PortableDelta.write(df(Seq(9L)), path, mode = "append"))
    refused(PortableDelta.write(df(Seq(9L)), path, mode = "overwrite"))
    refused(PortableDelta.delete(spark, path, col("id") === 1L))
    refused(PortableDelta.update(spark, path, col("id") === 1L,
      Map("v" -> lit(0L))))
    refused(PortableDelta.merge(spark, path, df(Seq(1L)), Seq("id")))
    refused(PortableDelta.mergeInto(spark, path, df(Seq(1L)), Seq("id")))
    refused(PortableDelta.restore(spark, path, 0L))
    refused(PortableDelta.optimizeCompact(spark, path))
    refused(PortableDelta.optimizeZOrder(spark, path, Seq("id"), 2))
    refused(PortableDelta.addCheckConstraint(spark, path, "c1", "v >= 0"))
    refused(PortableDelta.enableRowTracking(spark, path))
    refused(PortableDelta.enableInCommitTimestamps(spark, path))
    refused(PortableDelta.renameColumn(spark, path, "v", "w"))
    refused(PortableDelta.vacuum(spark, path, graceMillis = 0L))
    // the late-round-10 ALTER verbs gate identically
    refused(PortableDelta.addColumn(spark, path, "z",
      org.apache.spark.sql.types.LongType))
    refused(PortableDelta.setTableProperties(spark, path, Map("x" -> "y")))
    refused(PortableDelta.unsetTableProperties(spark, path, Seq("x")))
    refused(PortableDelta.widenColumnType(spark, path, "v",
      org.apache.spark.sql.types.LongType))
    refused(PortableDelta.alterClusterBy(spark, path, Seq("v")))
    // the log is untouched by all those refusals
    assert(PortableDelta.snapshot(spark, path).version == 1L)
  }

  // the REAL modern feature names delta engines ship today, pinned ONE
  // BY ONE (not just the generic unknown-feature path): a future edit
  // that silently adds one of these to SupportedWriterFeatures without
  // implementing its obligations — or renames the generic path — fails
  // here. Refusal must stage NOTHING: the table dir byte-set is
  // identical after every refused verb.
  // icebergCompatV2 left this list in round 14 — its obligations are
  // implemented (IcebergCompatSpec); V1's differ and stay refused
  for (feat <- Seq("icebergCompatV1",
                   "coordinatedCommits", "catalogOwned-preview")) {
    test(s"external log listing '$feat' refuses writes BY NAME, stages nothing") {
      val path = tmp()
      PortableDelta.write(df(0L until 4L).coalesce(1), path)          // v0
      pushProtocol(path, 1L, Seq("appendOnly", feat))
      // reads stay available (reader gate is separate and passes)
      assert(PortableDelta.readTable(spark, path).count() == 4L)
      def listing(): Map[String, Long] = {
        def walk(d: java.io.File): Seq[java.io.File] =
          d.listFiles().toSeq.flatMap(f =>
            if (f.isDirectory) walk(f) else Seq(f))
        walk(new java.io.File(path)).map(f =>
          f.getPath -> f.length()).toMap
      }
      val before = listing()
      def refused(body: => Any): Unit = {
        val e = intercept[IllegalArgumentException](body)
        assert(e.getMessage.contains(feat) &&
          e.getMessage.contains("refusing to commit"),
          s"refusal must name '$feat': ${e.getMessage}")
      }
      refused(PortableDelta.write(df(Seq(9L)), path, mode = "append"))
      refused(PortableDelta.delete(spark, path, col("id") === 1L))
      refused(PortableDelta.update(spark, path, col("id") === 1L,
        Map("v" -> lit(0L))))
      refused(PortableDelta.merge(spark, path, df(Seq(1L)), Seq("id")))
      refused(PortableDelta.optimizeCompact(spark, path))
      refused(PortableDelta.setTableProperties(spark, path, Map("x" -> "y")))
      refused(PortableDelta.vacuum(spark, path, graceMillis = 0L))
      assert(listing() == before,
        s"a refused verb must stage NOTHING under $path")
    }
  }

  test("external log listing 'collations' ACCEPTS writes (round-12 refusal " +
       "flipped: the feature is implemented)") {
    val path = tmp()
    PortableDelta.write(df(0L until 4L).coalesce(1), path)            // v0
    pushProtocol(path, 1L, Seq("appendOnly", "invariants", "collations"))
    assert(PortableDelta.readTable(spark, path).count() == 4L)
    // writes proceed through the gate — the feature's obligations are
    // implemented (serialize/restore + declaration), not refused
    PortableDelta.write(df(Seq(9L)).coalesce(1), path, mode = "append")
    assert(PortableDelta.readTable(spark, path).count() == 5L)
    assert(PortableDelta.delete(spark, path, col("id") === 0L).deletedRows == 1L)
  }

  test("vacuumProtocolCheck on BOTH protocol sides is fully supported") {
    val path = tmp()
    PortableDelta.write(df(0L until 4L).coalesce(1), path)            // v0
    val proto = mapper.createObjectNode()
    val p = proto.putObject("protocol")
    p.put("minReaderVersion", 3); p.put("minWriterVersion", 7)
    val rf = p.putArray("readerFeatures"); rf.add("vacuumProtocolCheck")
    val wf = p.putArray("writerFeatures"); wf.add("vacuumProtocolCheck")
    val ci = mapper.createObjectNode()
    ci.putObject("commitInfo").put("operation", "UPGRADE PROTOCOL")
    val out = new java.io.FileOutputStream(
      s"$path/_delta_log/${"%020d".format(1L)}.json")
    try out.write((Seq(ci, proto).map(mapper.writeValueAsString)
      .mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    assert(PortableDelta.readTable(spark, path).count() == 4L)
    assert(PortableDelta.delete(spark, path, col("id") === 0L)
      .deletedRows == 1L)
    assert(PortableDelta.vacuum(spark, path, graceMillis = 0L) >= 0)
    assert(PortableDelta.readTable(spark, path).count() == 3L)
  }

  test("operationMetrics ride commitInfo for every verb (DESCRIBE HISTORY shape)") {
    val path = tmp()
    PortableDelta.write(df(0L until 10L).repartition(2), path)        // v0
    PortableDelta.delete(spark, path, col("id") === 0L)               // v1
    PortableDelta.update(spark, path, col("id") === 1L,
      Map("v" -> lit(0L)))                                            // v2
    PortableDelta.merge(spark, path, df(Seq(2L, 20L)), Seq("id"))     // v3
    PortableDelta.optimizeCompact(spark, path)                        // v4
    def metricsOf(v: Long): Map[String, String] = {
      val f = new java.io.File(s"$path/_delta_log/${"%020d".format(v)}.json")
      val ci = scala.io.Source.fromFile(f, "UTF-8").getLines()
        .filter(_.nonEmpty).map(mapper.readTree)
        .find(_.has("commitInfo")).get.get("commitInfo")
      val m = ci.get("operationMetrics")
      assert(m != null, s"v$v commitInfo lacks operationMetrics")
      import scala.jdk.CollectionConverters._
      m.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }
    val w = metricsOf(0L)
    assert(w("numFiles") == "2" && w("numOutputRows") == "10", s"got $w")
    val d = metricsOf(1L)
    assert(d("numDeletedRows") == "1", s"got $d")
    val u = metricsOf(2L)
    assert(u("numUpdatedRows") == "1", s"got $u")
    val mg = metricsOf(3L)
    assert(mg("numTargetRowsUpdated") == "1" &&
      mg("numTargetRowsInserted") == "1", s"got $mg")
    val o = metricsOf(4L)
    assert(o("numRemovedFiles").toInt >= 2 && o("numAddedFiles").toInt >= 1,
      s"got $o")
  }

  test("column invariants from delta.invariants metadata are enforced") {
    val s = spark; import s.implicits._
    val path = tmp()
    // externally-shaped table whose `v` column carries an invariant
    val invMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("delta.invariants",
        """{"expression":{"expression":"v < 100"}}""").build()
    val withInv = df(0L until 4L)
      .select(col("id"), col("v").as("v", invMeta))
    PortableDelta.write(withInv.coalesce(1), path)                    // v0
    // violating append: refused by name, nothing lands
    val e = intercept[IllegalArgumentException] {
      PortableDelta.write(Seq((50L, 500L)).toDF("id", "v"),
        path, mode = "append")
    }
    assert(e.getMessage.contains("INVARIANT on v (v < 100)"), e.getMessage)
    assert(PortableDelta.snapshot(spark, path).version == 0L)
    // violating UPDATE and mergeInto refused too (same gate)
    val e2 = intercept[IllegalArgumentException] {
      PortableDelta.update(spark, path, col("id") === 1L,
        Map("v" -> lit(1000L)))
    }
    assert(e2.getMessage.contains("INVARIANT on v"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      PortableDelta.mergeInto(spark, path, Seq((1L, 999L)).toDF("id", "v"),
        Seq("id"), PortableDelta.MergeClauses(
          updateSet = Some(Map("v" -> col("s.v")))))
    }
    assert(e3.getMessage.contains("INVARIANT on v"), e3.getMessage)
    // passing writes land
    PortableDelta.write(Seq((60L, 99L)).toDF("id", "v"), path,
      mode = "append")
    assert(PortableDelta.readTable(spark, path).count() == 5L)
  }
}
