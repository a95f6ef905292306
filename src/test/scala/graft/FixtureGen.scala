package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.stac.PortableDelta

/** One-off generator for the FROZEN combined external-shaped Delta
  * fixture under `src/test/resources/external_combined_delta/` — the
  * cross-engine stand-in this sandbox allows (no second Delta engine is
  * installable: zero egress, no delta jars). The bytes are generated
  * ONCE, hand-mangled into the shapes external engines emit (multi-part
  * checkpoint, engineInfo/operationParameters commitInfo fields, `tags`
  * on adds), and COMMITTED — so the reader's interop claims regress
  * against frozen bytes, not against whatever the current writer
  * happens to produce (writer/reader co-evolution cannot mask a reader
  * break). Combines in ONE table: hive partitioning, CDF, deletion
  * vectors, column mapping (post-rename), domainMetadata (clustering),
  * a multi-part checkpoint, and a post-checkpoint JSON tail.
  *
  * Run: sbt "Test/runMain graft.FixtureGen" (only to REGENERATE — the
  * committed fixture is the artifact; `ExternalFixtureSpec` replays it).
  */
object FixtureGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/external_combined_delta")
    val spark = SparkSession.builder()
      .master("local[4]").appName("fixture-gen")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", value = false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fixgen").toString + "/tbl"

    def rows(ids: Long*) =
      ids.map(i => (i, s"doc $i", if (i % 2 == 0) "even" else "odd"))
        .toDF("id", "body", "grp")

    // v0: born with CDF + DVs, hive-partitioned
    PortableDelta.write(rows(0L, 1L, 2L, 3L).repartition(2), dir,
      partitionBy = Seq("grp"), properties = Map(
        "delta.enableChangeDataFeed" -> "true",
        "delta.enableDeletionVectors" -> "true"))
    // v1: append
    PortableDelta.write(rows(4L, 5L, 6L, 7L).repartition(2), dir,
      partitionBy = Seq("grp"), mode = "append")
    // v2: RENAME COLUMN -> column mapping (name mode) engages
    PortableDelta.renameColumn(spark, dir, "body", "text")
    // v3: UPDATE -> cdc files under _change_data
    PortableDelta.update(spark, dir, col("id") === 5L,
      Map("text" -> lit("UPDATED 5")))
    // v4: DELETE one row of a multi-row file -> deletion vector
    PortableDelta.delete(spark, dir, col("id") === 2L)
    // v5: clustering metadata -> domainMetadata action
    PortableDelta.alterClusterBy(spark, dir, Seq("id"))
    // checkpoint at v5, then shard it into the spec's multi-part layout
    val cv = PortableDelta.checkpoint(spark, dir)
    require(cv == 5L, s"unexpected checkpoint version $cv")
    val logDir = new java.io.File(s"$dir/_delta_log")
    val single = new java.io.File(logDir, f"$cv%020d.checkpoint.parquet")
    val all = spark.read.parquet(single.getPath)
    def movePart(df: org.apache.spark.sql.DataFrame, dest: java.io.File): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("pt").toString + "/p"
      df.coalesce(1).write.parquet(stage)
      val p = new java.io.File(stage).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).head
      require(p.renameTo(dest))
    }
    movePart(all.filter(col("add").isNull),
      new java.io.File(logDir, f"$cv%020d.checkpoint.${1}%010d.${2}%010d.parquet"))
    movePart(all.filter(col("add").isNotNull),
      new java.io.File(logDir, f"$cv%020d.checkpoint.${2}%010d.${2}%010d.parquet"))
    require(single.delete())
    val lc = new java.io.File(logDir, "_last_checkpoint")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val lcNode = mapper.readTree(scala.io.Source.fromFile(lc).mkString)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    lcNode.put("parts", 2)
    java.nio.file.Files.write(lc.toPath, lcNode.toString.getBytes("UTF-8"))
    // the raw rewrite bypassed Hadoop's LocalFileSystem — its stale
    // checksum shadow would fail every later read
    new java.io.File(logDir, "._last_checkpoint.crc").delete()
    // v6: post-checkpoint JSON tail (logical names post-rename)
    PortableDelta.write(
      rows(8L, 9L).withColumnRenamed("body", "text").repartition(1), dir,
      partitionBy = Seq("grp"), mode = "append")

    // external mangling of the JSON commits: fields other engines emit
    // and conformant readers must ignore — engineInfo/operationParameters
    // on commitInfo, tags on add actions
    logDir.listFiles().filter(_.getName.matches("\\d{20}\\.json")).foreach { f =>
      val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toList
      val outLines = lines.filter(_.nonEmpty).map { l =>
        val n = mapper.readTree(l).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        if (n.has("commitInfo")) {
          val ci = n.get("commitInfo").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          ci.put("engineInfo", "extengine/3.2.0 kernel/9.9")
          ci.putObject("operationParameters").put("mode", "Append")
          ci.put("txnId", java.util.UUID.nameUUIDFromBytes(f.getName.getBytes).toString)
        }
        if (n.has("add"))
          n.get("add").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
            .putObject("tags").put("INSERTION_TIME", "1700000000000000")
        n.toString
      }
      java.nio.file.Files.write(f.toPath,
        (outLines.mkString("\n") + "\n").getBytes("UTF-8"))
    }
    // Hadoop LocalFileSystem checksum shadows are OUR artifact, not an
    // external engine's — strip them everywhere
    def stripCrc(d: java.io.File): Unit = {
      d.listFiles().foreach { f =>
        if (f.isDirectory) stripCrc(f)
        else if (f.getName.startsWith(".") && f.getName.endsWith(".crc")) f.delete()
      }
    }
    stripCrc(new java.io.File(dir))

    // freeze: copy the whole table into test resources
    val dst = java.nio.file.Paths.get(out)
    def rmrf(p: java.nio.file.Path): Unit = if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => { java.nio.file.Files.delete(q); () })
    }
    rmrf(dst)
    val srcP = java.nio.file.Paths.get(dir)
    java.nio.file.Files.walk(srcP).forEach { p =>
      val rel = srcP.relativize(p)
      val tgt = dst.resolve(rel.toString)
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(tgt)
      else {
        java.nio.file.Files.createDirectories(tgt.getParent)
        java.nio.file.Files.copy(p, tgt)
      }
      ()
    }
    println(s"[fixgen] frozen at $out")
    // summary for the spec's hardcoded expectations
    val snap = PortableDelta.snapshot(spark, dir)
    println(s"[fixgen] version=${snap.version} files=${snap.files.size} " +
      s"readerFeatures=${snap.readerFeatures} writerFeatures=${snap.writerFeatures}")
    PortableDelta.readTable(spark, dir).orderBy("id").show(20, truncate = false)
    spark.stop()
  }
}
