package graft.stac

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Version checksum files (`<version>.crc`, delta-spark's
  * VersionChecksum artifact): every commit writes an incremental
  * post-state summary; checkpoints re-seed it from full (post-expiry)
  * state; [[PortableDelta.tableStats]] answers numFiles/sizeInBytes
  * O(1) from it; [[PortableDelta.validateChecksum]] recomputes state
  * independently and fails naming the drifted field. */
class ChecksumSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private def conf = spark.sessionState.newHadoopConf()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pcrc").toString + "/tbl"

  private def crcFile(path: String, v: Long) =
    new java.io.File(s"$path/_delta_log", f"$v%020d.crc")

  /** Live bytes/files recomputed the slow way — straight off the
    * engine's own snapshot — as the spec's independent oracle. */
  private def slowStats(path: String): (Long, Long) = {
    val files = PortableDelta.snapshot(spark, path).files
    (files.size.toLong, files.map(_.size).sum)
  }

  private def df(lo: Int, hi: Int) = {
    val s = spark; import s.implicits._
    (lo until hi).map(i => (i.toLong, s"r$i")).toDF("id", "tag")
  }

  test("crc chain: every verb leaves a valid checksum at its version") {
    val path = tmp()
    PortableDelta.write(df(0, 100).repartition(4), path,
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    def check(tag: String): Unit = {
      val v = PortableDelta.currentVersion(spark, path)
      assert(crcFile(path, v).exists(), s"$tag: crc missing at v$v")
      val cs = PortableDelta.validateChecksum(spark, path)
      val (n, b) = slowStats(path)
      assert(cs.numFiles == n && cs.tableSizeBytes == b,
        s"$tag: crc (${cs.numFiles}, ${cs.tableSizeBytes}) vs slow ($n, $b)")
    }
    check("create")
    PortableDelta.write(df(100, 150).repartition(2), path, mode = "append",
      txn = Some(("crc-app", 7L)))
    check("append+txn")
    PortableDelta.delete(spark, path, col("id") < 10L)
    check("delete(dv)")
    PortableDelta.update(spark, path, col("id") === 50L,
      Map("tag" -> lit("updated")))
    check("update")
    PortableDelta.optimizeCompact(spark, path)
    check("optimize")
    PortableDelta.restore(spark, path, 1L)
    check("restore")
    PortableDelta.setTableProperties(spark, path,
      Map("delta.logRetentionDuration" -> "interval 30 days"))
    check("setTableProperties")
    // the chain carried the txn watermark all along
    val cs = PortableDelta.readChecksum(conf, path,
      PortableDelta.currentVersion(spark, path)).get
    assert(cs.setTransactions.exists(_.get("crc-app").contains(7L)))
  }

  test("tableStats: O(1) from crc; broken chain re-seeds via aggregate") {
    val path = tmp()
    PortableDelta.write(df(0, 200).repartition(3), path)
    PortableDelta.write(df(200, 250).coalesce(1), path, mode = "append")
    val (n, b) = slowStats(path)
    val st1 = PortableDelta.tableStats(spark, path)
    assert((st1.numFiles, st1.sizeInBytes) == (n, b))
    // break the chain: remove every crc — the fallback must aggregate
    // AND re-seed, so the second call is crc-served again
    val log = new java.io.File(s"$path/_delta_log")
    log.listFiles().filter(_.getName.endsWith(".crc")).foreach(_.delete())
    assert(!crcFile(path, st1.version).exists())
    val st2 = PortableDelta.tableStats(spark, path)
    assert((st2.numFiles, st2.sizeInBytes) == (n, b))
    assert(crcFile(path, st2.version).exists(), "fallback did not re-seed")
    PortableDelta.validateChecksum(spark, path)
    // checkpoint also re-seeds (authoritative full state)
    log.listFiles().filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val cv = PortableDelta.checkpoint(spark, path)
    assert(crcFile(path, cv).exists(), "checkpoint did not re-seed")
    PortableDelta.validateChecksum(spark, path)
    // post-checkpoint commits fold incrementally from the re-seeded crc
    PortableDelta.write(df(250, 260).coalesce(1), path, mode = "append")
    PortableDelta.validateChecksum(spark, path)
  }

  test("external commit without a crc breaks the chain until a checkpoint") {
    val path = tmp()
    PortableDelta.write(df(0, 50).coalesce(1), path)
    // simulate an external writer: copy v0's JSON shape into v1 with no
    // add/remove actions (a no-op commitInfo-only commit) and NO crc
    val log = new java.io.File(s"$path/_delta_log")
    val v1 = new java.io.File(log, f"${1L}%020d.json")
    java.nio.file.Files.write(v1.toPath,
      """{"commitInfo":{"operation":"EXTERNAL","timestamp":1}}""".getBytes)
    assert(!crcFile(path, 1L).exists())
    // the engine's next commit finds no predecessor crc — must skip,
    // not write a wrong one
    PortableDelta.write(df(50, 60).coalesce(1), path, mode = "append")
    assert(!crcFile(path, 2L).exists(), "chain must not bridge a gap")
    intercept[IllegalStateException] {
      PortableDelta.validateChecksum(spark, path)
    }
    // checkpoint heals
    val cv = PortableDelta.checkpoint(spark, path)
    assert(cv == 2L && crcFile(path, 2L).exists())
    PortableDelta.validateChecksum(spark, path)
  }

  test("validateChecksum names the drifted field on corruption") {
    val path = tmp()
    PortableDelta.write(df(0, 30).coalesce(1), path)
    val f = crcFile(path, 0L)
    val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.put("tableSizeBytes", node.get("tableSizeBytes").asLong() + 13L)
    java.nio.file.Files.write(f.toPath, node.toString.getBytes("UTF-8"))
    // hadoop's LocalFileSystem keeps its own transport-checksum sidecar
    // (`.<name>.crc`) — drop it so the tampered CONTENT reaches the
    // validator instead of tripping the transport layer
    new java.io.File(f.getParentFile, s".${f.getName}.crc").delete()
    val e = intercept[IllegalArgumentException] {
      PortableDelta.validateChecksum(spark, path)
    }
    assert(e.getMessage.contains("tableSizeBytes"),
      s"mismatch must be named: ${e.getMessage}")
  }

  test("describeDetail: identity, layout, size, protocol in one row") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write(
      (0 until 60).map(i => (i.toLong, s"p${i % 3}", s"r$i"))
        .toDF("id", "part", "tag").repartition(2),
      path, partitionBy = Seq("part"),
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    PortableDelta.optimizeZOrder(spark, path, Seq("id"), 2)
    val d = PortableDelta.describeDetail(spark, path)
    assert(d.format == "delta" && d.location == path)
    assert(d.id == PortableDelta.snapshot(spark, path).tableId)
    assert(d.partitionColumns == Seq("part"))
    assert(d.clusteringColumns == Seq("id"), "zorder published dimensions")
    assert((d.numFiles, d.sizeInBytes) == slowStats(path))
    assert(d.properties.get("delta.enableChangeDataFeed").contains("true"))
    assert(d.minWriterVersion >= 7 &&
      d.tableFeatures.contains("changeDataFeed") &&
      d.tableFeatures.contains("clustering"))
    assert(d.createdAt.nonEmpty && d.lastModified.nonEmpty &&
      d.createdAt.get <= d.lastModified.get)
  }

  test("cleanupLog reclaims superseded crc files, keeps the checkpoint's") {
    val path = tmp()
    PortableDelta.write(df(0, 40).coalesce(1), path)
    (0 until 3).foreach(i =>
      PortableDelta.write(df(40 + i * 10, 50 + i * 10).coalesce(1), path,
        mode = "append"))
    val cv = PortableDelta.checkpoint(spark, path)
    assert(cv == 3L)
    PortableDelta.cleanupLog(conf, path)
    val log = new java.io.File(s"$path/_delta_log")
    val crcs = log.listFiles()
      .filter(_.getName.matches("\\d{20}\\.crc"))
      .map(_.getName.stripSuffix(".crc").toLong).sorted
    assert(crcs.toSeq == Seq(3L), s"expected only v3 crc, got ${crcs.toSeq}")
    PortableDelta.validateChecksum(spark, path)
    // and the surviving table still answers O(1)
    val st = PortableDelta.tableStats(spark, path)
    assert((st.numFiles, st.sizeInBytes) == slowStats(path))
  }
}
