package graft.stac

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Change Data Feed reconstruction from the portable log: row-level
  * insert/delete changes per version, derived from file actions alone.
  * Contracts: appends are inserts, DV growth is position-exact deletes,
  * file removal deletes only then-live rows, MERGE shows the
  * delete+insert pair, OPTIMIZE (dataChange=false) is silent, and
  * truncated ranges fail by name. */
class CdfSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pcdf").toString + "/tbl"

  private def rows(ids: Seq[Long], tag: String) = {
    val s = spark; import s.implicits._
    ids.map(i => (i, tag)).toDF("id", "tag")
  }

  private def changes(path: String, from: Long, to: Long): Seq[(Long, String, Long)] =
    PortableDelta.readChanges(spark, path, from, to)
      .select(col("id"), col("_change_type"), col("_commit_version"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("create/append/delete/merge each produce their exact row changes") {
    val path = tmp()
    PortableDelta.write(rows(0L until 5L, "a").coalesce(1), path)          // v0
    PortableDelta.write(rows(5L until 8L, "b").coalesce(1), path,
      mode = "append")                                                     // v1
    PortableDelta.delete(spark, path, col("id") < 2L)                      // v2
    val s = spark; import s.implicits._
    PortableDelta.merge(spark, path,
      rows(Seq(4L, 9L), "m"), Seq("id"))                                   // v3

    val all = changes(path, 0L, 3L)
    assert(all.filter(_._3 == 0L).map(c => (c._1, c._2)).toSet ==
      (0L until 5L).map(i => (i, "insert")).toSet)
    assert(all.filter(_._3 == 1L).map(c => (c._1, c._2)).toSet ==
      (5L until 8L).map(i => (i, "insert")).toSet)
    assert(all.filter(_._3 == 2L).map(c => (c._1, c._2)).toSet ==
      Set((0L, "delete"), (1L, "delete")))
    // merge: id 4 updates (delete + insert), id 9 inserts
    assert(all.filter(_._3 == 3L).map(c => (c._1, c._2)).toSet ==
      Set((4L, "delete"), (4L, "insert"), (9L, "insert")))
    // a sub-range slices cleanly
    assert(changes(path, 2L, 2L).map(c => (c._1, c._2)).toSet ==
      Set((0L, "delete"), (1L, "delete")))
  }

  test("second DELETE reports only NEWLY dead positions (DV diff)") {
    val path = tmp()
    PortableDelta.write(rows(0L until 10L, "a").coalesce(1), path)         // v0
    PortableDelta.delete(spark, path, col("id") < 4L)                      // v1
    PortableDelta.delete(spark, path, col("id") < 6L)                      // v2: only 4,5 new
    assert(changes(path, 2L, 2L).map(c => (c._1, c._2)).toSet ==
      Set((4L, "delete"), (5L, "delete")))
  }

  test("OPTIMIZE is invisible; overwrite is full delete + insert") {
    val path = tmp()
    PortableDelta.write(rows(0L until 4L, "a").coalesce(1), path)          // v0
    PortableDelta.write(rows(4L until 6L, "a").coalesce(1), path,
      mode = "append")                                                     // v1
    val opt = PortableDelta.optimizeCompact(spark, path)                   // v2
    assert(opt.removedFiles == 2)
    assert(changes(path, 2L, 2L).isEmpty,
      "dataChange=false rewrites must produce no CDF rows")
    PortableDelta.write(rows(100L until 102L, "c").coalesce(1), path,
      mode = "overwrite")                                                  // v3
    val ov = changes(path, 3L, 3L)
    assert(ov.filter(_._2 == "delete").map(_._1).toSet == (0L until 6L).toSet)
    assert(ov.filter(_._2 == "insert").map(_._1).toSet == Set(100L, 101L))
  }

  test("a truncated range fails by name, not with wrong data") {
    val path = tmp()
    PortableDelta.write(rows(0L until 3L, "a").coalesce(1), path)          // v0
    PortableDelta.write(rows(3L until 5L, "a").coalesce(1), path,
      mode = "append")                                                     // v1
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    val e = intercept[Exception] {
      PortableDelta.readChanges(spark, path, 0L, 1L).collect()
    }
    assert(e.getMessage.contains("not reconstructable") ||
      e.getMessage.contains("CDF needs commit"), e.getMessage)
  }

  test("interop: a commit carrying cdc actions wins over file-diff reconstruction") {
    // delta-spark with delta.enableChangeDataFeed writes AddCDCFile
    // actions pointing at _change_data/ parquet that includes
    // update_preimage/update_postimage rows — change types file diffs
    // cannot express. Synthesize that external shape: v1 appends a
    // 3-row data file BUT its cdc file says 1 insert + an update pair;
    // reconstruction would report 3 inserts, the spec says the cdc file
    // is authoritative.
    val path = tmp()
    PortableDelta.write(rows(0L until 2L, "a").coalesce(1), path)          // v0
    val s = spark; import s.implicits._
    // the v1 data file (what the table state gains)
    val dataStage = java.nio.file.Files.createTempDirectory("cdc-data").toString + "/d"
    Seq((2L, "a"), (10L, "b"), (11L, "b")).toDF("id", "tag")
      .coalesce(1).write.parquet(dataStage)
    val dataPart = new java.io.File(dataStage).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).head
    val dataName = "part-cdc-ext-0001.parquet"
    assert(dataPart.renameTo(new java.io.File(s"$path/$dataName")))
    // the cdc file: one true insert + the update pair for id 1
    val cdcStage = java.nio.file.Files.createTempDirectory("cdc-cdc").toString + "/c"
    Seq((2L, "a", "insert"), (1L, "a", "update_preimage"),
      (1L, "b", "update_postimage"))
      .toDF("id", "tag", "_change_type").coalesce(1).write.parquet(cdcStage)
    val cdcPart = new java.io.File(cdcStage).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).head
    new java.io.File(s"$path/_change_data").mkdirs()
    val cdcName = "_change_data/cdc-ext-0001.parquet"
    assert(cdcPart.renameTo(new java.io.File(s"$path/$cdcName")))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val addN = mapper.createObjectNode()
    val a = addN.putObject("add")
    a.put("path", dataName)
    a.putObject("partitionValues")
    a.put("size", new java.io.File(s"$path/$dataName").length())
    a.put("modificationTime", 1L); a.put("dataChange", true)
    val cdcN = mapper.createObjectNode()
    val c = cdcN.putObject("cdc")
    c.put("path", cdcName)
    c.putObject("partitionValues")
    c.put("size", new java.io.File(s"$path/$cdcName").length())
    c.put("dataChange", false)
    PortableDelta.commit(spark.sessionState.newHadoopConf(), path, 1,
      Seq(addN, cdcN))
    val got = changes(path, 1L, 1L).sorted
    assert(got == Seq((1L, "update_postimage", 1L), (1L, "update_preimage", 1L),
      (2L, "insert", 1L)).sorted,
      s"cdc actions must be authoritative for their version, got $got")
    // versions WITHOUT cdc actions still reconstruct from file diffs,
    // and the v1 state advance included the add
    PortableDelta.write(rows(20L until 21L, "c").coalesce(1), path,
      mode = "append")                                                     // v2
    assert(changes(path, 2L, 2L) == Seq((20L, "insert", 2L)))
    assert(PortableDelta.readTable(spark, path)
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 1L, 2L, 10L, 11L, 20L))
  }

  test("CDC WRITE: enableChangeDataFeed makes DML emit cdc actions external readers consume") {
    val path = tmp()
    PortableDelta.write(rows(0L until 4L, "a").coalesce(1), path,
      properties = Map(PortableDelta.CdfProp -> "true"))             // v0
    // UPDATE: the cdc file must carry the update PAIR — old values as
    // preimage, SET-applied values as postimage (reconstruction could
    // only say delete+insert)
    PortableDelta.update(spark, path, col("id") < 2L,
      Map("tag" -> lit("u1")))                                        // v1
    def cdcActionsOf(v: Long) = logLinesOf(path, v).filter(_.has("cdc"))
    assert(cdcActionsOf(1).nonEmpty, "UPDATE must commit cdc actions")
    cdcActionsOf(1).foreach { n =>
      val c = n.get("cdc")
      assert(c.get("path").asText().startsWith("_change_data/"))
      assert(!c.get("dataChange").asBoolean(), "cdc actions carry dataChange=false")
      assert(new java.io.File(s"$path/${c.get("path").asText()}").isFile,
        "cdc action must point at a real file")
    }
    val u = changes(path, 1L, 1L).sorted
    assert(u == Seq((0L, "update_postimage", 1L), (0L, "update_preimage", 1L),
      (1L, "update_postimage", 1L), (1L, "update_preimage", 1L)).sorted,
      s"update pair expected, got $u")
    // preimage carries the OLD tag, postimage the new one
    val tags = PortableDelta.readChanges(spark, path, 1L, 1L)
      .select(col("_change_type"), col("tag")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toSet
    assert(tags == Set("update_preimage" -> "a", "update_postimage" -> "u1"))
    // DELETE: cdc rows with _change_type=delete
    PortableDelta.delete(spark, path, col("id") === 3L)               // v2
    assert(cdcActionsOf(2).nonEmpty, "DELETE must commit cdc actions")
    assert(changes(path, 2L, 2L) == Seq((3L, "delete", 2L)))
    // MERGE: matched update pair + insert, all through the cdc file
    val s2 = spark; import s2.implicits._
    PortableDelta.merge(spark, path,
      Seq((2L, "m", 9L), (10L, "m", 9L)).toDF("id", "tag", "v")
        .select(col("id"), col("tag")), Seq("id"))                    // v3
    assert(cdcActionsOf(3).nonEmpty, "MERGE must commit cdc actions")
    val m = changes(path, 3L, 3L).sorted
    assert(m == Seq((2L, "update_postimage", 3L), (2L, "update_preimage", 3L),
      (10L, "insert", 3L)).sorted, s"merge changes expected, got $m")
    // _commit_timestamp rides every change row, consistent with history
    val histTs = PortableDelta.history(
      spark.sessionState.newHadoopConf(), path).map(h => h._1 -> h._3).toMap
    PortableDelta.readChanges(spark, path, 1L, 3L)
      .select(col("_commit_version"), col("_commit_timestamp").cast("double"))
      .collect().foreach { r =>
        assert(math.abs(r.getDouble(1) * 1000 - histTs(r.getLong(0))) < 1.0,
          s"_commit_timestamp must equal the commit's history time, row $r")
      }
    // time-windowed CDF: the window covering exactly v2..v3 yields the
    // same change set as the version-range read
    val winLo = histTs(2L); val winHi = histTs(3L)
    val win = PortableDelta.readChangesBetweenTimestamps(spark, path, winLo, winHi)
      .select(col("id"), col("_change_type"), col("_commit_version"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(win == (changes(path, 2L, 2L) ++ changes(path, 3L, 3L)).toSet,
      s"time-window CDF must equal the version-range read, got $win")
    val noCommits = intercept[IllegalArgumentException] {
      PortableDelta.readChangesBetweenTimestamps(spark, path,
        histTs.values.max + 10000, histTs.values.max + 20000)
    }
    assert(noCommits.getMessage.contains("no commits"))
    // the table state itself is unaffected by cdc files (dataChange=false)
    assert(PortableDelta.readTable(spark, path)
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 1L, 2L, 10L))
    // truncation reclaims the cdc files of versions readChanges can no
    // longer serve; later commits' cdc files survive
    def cdcOnDisk = Option(new java.io.File(s"$path/_change_data").listFiles())
      .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    val beforeGc = cdcOnDisk
    assert(beforeGc >= 3, s"expected cdc files from 3 DML commits, got $beforeGc")
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)  // wipes v0..v3
    assert(cdcOnDisk == 0, "cdc files of truncated commits must be reclaimed")
    PortableDelta.update(spark, path, col("id") === 2L, Map("tag" -> lit("u2"))) // v4
    assert(cdcOnDisk > 0, "post-truncation commits keep their cdc files")
    assert(changes(path, 4L, 4L).map(c => (c._1, c._2)).toSet ==
      Set((2L, "update_preimage"), (2L, "update_postimage")))
    // a table WITHOUT the property stays cdc-less
    val plain = tmp()
    PortableDelta.write(rows(0L until 2L, "a").coalesce(1), plain)
    PortableDelta.delete(spark, plain, col("id") === 0L)
    assert(logLinesOf(plain, 1).forall(!_.has("cdc")), "CDC write is opt-in")
  }

  private def logLinesOf(path: String, v: Long) = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    scala.io.Source.fromFile(
      new java.io.File(s"$path/_delta_log/${"%020d".format(v)}.json"), "UTF-8")
      .getLines().filter(_.nonEmpty).map(mapper.readTree).toSeq
  }

  test("a several-hundred-commit range reads with bounded plan lineage") {
    // 300 commits synthesized straight into the log (a Spark write per
    // commit would dominate the test): one real parquet file added per
    // version. Without the chunked lineage truncation the union PLAN
    // itself becomes the cost across a range like this (the d16
    // analyzer lesson applied to CDF).
    val path = tmp()
    val s = spark; import s.implicits._
    val n = 300
    PortableDelta.write(rows(Seq(-1L), "seed").coalesce(1), path)       // v0
    val staging =
      java.nio.file.Files.createTempDirectory("pcdf-stage").toString + "/p"
    (0L until (n - 1).toLong).map(i => (i, s"c$i")).toDF("id", "tag")
      .repartition(n - 1).write.parquet(staging) // round-robin: 1 row/file
    val parts = new java.io.File(staging).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
    // round-robin leaves some target partitions empty — what matters is
    // a several-hundred-commit range, one real file per commit
    assert(parts.length > 150, s"need a long range, got ${parts.length} files")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    parts.zipWithIndex.foreach { case (f, i) =>
      val dest = new java.io.File(path, s"synced-$i.parquet")
      java.nio.file.Files.move(f.toPath, dest.toPath)
      val ci = mapper.createObjectNode()
      val c = ci.putObject("commitInfo")
      c.put("timestamp", 1700000000000L + i); c.put("operation", "WRITE")
      val addN = mapper.createObjectNode()
      val a = addN.putObject("add")
      a.put("path", dest.getName); a.putObject("partitionValues")
      a.put("size", dest.length); a.put("modificationTime", dest.lastModified)
      a.put("dataChange", true)
      val out = new java.io.FileOutputStream(
        new java.io.File(s"$path/_delta_log/${"%020d".format(i + 1L)}.json"))
      try out.write((mapper.writeValueAsString(ci) + "\n" +
        mapper.writeValueAsString(addN) + "\n").getBytes("UTF-8"))
      finally out.close()
    }
    val nv = parts.length + 1 // synthesized commits + the seed
    val ch = PortableDelta.readChanges(spark, path, 0L, parts.length.toLong)
    val got = ch.groupBy(col("_commit_version"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == nv, s"expected $nv versions with changes, got ${got.size}")
    assert(got.forall { case (_, c) => c >= 1 }, "every version contributes")
    assert(ch.count() == n.toLong, "every data row + the seed appears once")
    assert(ch.select(col("_change_type")).distinct().collect()
      .map(_.getString(0)).toSeq == Seq("insert"))
  }
}
