package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.stac.PortableDelta

/** One-off generator for the SECOND frozen external-shaped fixture,
  * `src/test/resources/external_modern_delta/` — the round-10/11
  * feature surface the round-11 combined fixture predates:
  * identityColumns (GENERATED ALWAYS, high-water mark in field
  * metadata), typeWidening (int → long mid-history, per-field change
  * history), variantType (a real variant column in the parquet bytes),
  * a V2 CHECKPOINT AS THE PRIMARY (UUID top-level + sidecar, no classic
  * checkpoint anywhere), and a checkpointProtection region whose
  * boundary (version 100) is far past the history — so every cleanup
  * against the fixture must refuse/no-op.
  *
  * Same freezing rationale as [[FixtureGen]]: the bytes are generated
  * once, mangled into external commitInfo/tags shapes, and COMMITTED,
  * so reader claims regress against bytes the writer cannot co-evolve
  * with. Run `sbt "Test/runMain graft.FixtureGenModern"` only to
  * REGENERATE; `ModernFixtureSpec` replays the committed bytes.
  */
object FixtureGenModern {

  /** External mangling + checksum-shadow strip + freeze-copy, shared
    * shape with [[FixtureGen]] (kept local to test tooling). */
  private[graft] def mangleAndFreeze(dir: String, out: String): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val logDir = new java.io.File(s"$dir/_delta_log")
    logDir.listFiles().filter(_.getName.matches("\\d{20}\\.json")).foreach { f =>
      val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toList
      val outLines = lines.filter(_.nonEmpty).map { l =>
        val n = mapper.readTree(l).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        if (n.has("commitInfo")) {
          val ci = n.get("commitInfo").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          ci.put("engineInfo", "extengine/4.0.1 kernel/10.1")
          ci.putObject("operationParameters").put("mode", "Append")
          ci.put("txnId", java.util.UUID.nameUUIDFromBytes(f.getName.getBytes).toString)
        }
        if (n.has("add"))
          n.get("add").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
            .putObject("tags").put("INSERTION_TIME", "1710000000000000")
        n.toString
      }
      java.nio.file.Files.write(f.toPath,
        (outLines.mkString("\n") + "\n").getBytes("UTF-8"))
    }
    def stripCrc(d: java.io.File): Unit = {
      d.listFiles().foreach { f =>
        if (f.isDirectory) stripCrc(f)
        else if (f.getName.startsWith(".") && f.getName.endsWith(".crc")) f.delete()
      }
    }
    stripCrc(new java.io.File(dir))
    val dst = java.nio.file.Paths.get(out)
    if (java.nio.file.Files.exists(dst)) {
      java.nio.file.Files.walk(dst).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => { java.nio.file.Files.delete(q); () })
    }
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
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/external_modern_delta")
    val spark = SparkSession.builder()
      .master("local[4]").appName("fixture-gen-modern")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", value = false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("fixgen2").toString + "/tbl"

    // v0: created with an identity column (GENERATED ALWAYS, start=100
    // step=10), an int column destined to widen, and a VARIANT column;
    // typeWidening opted in and the checkpointProtection boundary set
    // far past this fixture's history (version 100)
    val identMeta = new MetadataBuilder()
      .putLong("delta.identity.start", 100L)
      .putLong("delta.identity.step", 10L).build()
    val schema0 = StructType(Seq(
      StructField("rid", LongType, nullable = true, identMeta),
      StructField("id", LongType),
      StructField("score", IntegerType),
      StructField("payload", VariantType)))
    PortableDelta.write(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema0),
      dir, properties = Map(
        "delta.enableTypeWidening" -> "true",
        PortableDelta.CheckpointProtectionProp -> "100"))
    val s = spark; import s.implicits._
    def batch(ids: Long*) = ids.toDF("id")
      .selectExpr("id", "CAST(id * 2 AS INT) AS score",
        "parse_json(concat('{\"k\":', id, ',\"tag\":\"t', id % 3, '\"}')) AS payload")
    // v1: append — identity generates 100, 110, ...
    PortableDelta.write(batch(0L, 1L, 2L).coalesce(1), dir, mode = "append")
    // v2: widen score int -> long (typeWidening feature + per-field history)
    PortableDelta.widenColumnType(spark, dir, "score", LongType)
    // v3: post-widen append (wide bytes; identity continues off the HWM)
    PortableDelta.write(
      batch(3L, 4L).selectExpr("id", "CAST(score AS BIGINT) AS score", "payload")
        .coalesce(1),
      dir, mode = "append")
    // v4 (upgrade) + V2 CHECKPOINT at v4 as the PRIMARY — no classic
    // checkpoint parquet exists anywhere in this fixture
    val cv = PortableDelta.checkpointV2(spark, dir, addsPerSidecar = 2)
    require(cv == 4L, s"unexpected v2-checkpoint version $cv")
    // v5: post-checkpoint JSON tail
    PortableDelta.write(
      batch(5L).selectExpr("id", "CAST(score AS BIGINT) AS score", "payload")
        .coalesce(1),
      dir, mode = "append")

    mangleAndFreeze(dir, out)
    println(s"[fixgen-modern] frozen at $out")
    val snap = PortableDelta.snapshot(spark, dir)
    println(s"[fixgen-modern] version=${snap.version} files=${snap.files.size} " +
      s"readerFeatures=${snap.readerFeatures} writerFeatures=${snap.writerFeatures}")
    PortableDelta.readTable(spark, dir)
      .selectExpr("rid", "id", "score", "to_json(payload) AS pj")
      .orderBy("id").show(20, truncate = false)
    spark.stop()
  }
}
