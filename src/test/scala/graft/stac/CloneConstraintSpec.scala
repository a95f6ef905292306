package graft.stac

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shallow CLONE (zero-copy table snapshots via absolute-path adds) and
  * CHECK / NOT NULL constraint enforcement over the portable Delta
  * log — plus the absolute-add-path interop read the spec allows for
  * externally-written tables. */
class CloneConstraintSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/tbl"

  private def rows(ids: Seq[Long], tag: String) = {
    val s = spark; import s.implicits._
    ids.map(i => (i, tag, i * 10L)).toDF("id", "tag", "v")
  }

  private def parquetsUnder(path: String): Set[String] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val root = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(root)) return Set.empty
    val it = fs.listFiles(root, true)
    val out = scala.collection.mutable.Set.empty[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet") &&
          !st.getPath.toString.contains("_delta_log"))
        out += st.getPath.getName
    }
    out.toSet
  }

  test("shallow clone: zero-copy read, independent writes, source untouched") {
    val src = tmp("pclone-src")
    val dst = tmp("pclone-dst")
    PortableDelta.write(rows(0L until 12L, "base").repartition(3), src)
    PortableDelta.delete(spark, src, col("id") % 4 === 0) // source has DVs
    val srcState = PortableDelta.readTable(spark, src)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    PortableDelta.cloneShallow(spark, src, dst)
    assert(parquetsUnder(dst).isEmpty,
      "shallow clone must copy ZERO data bytes into the clone root")
    val cloneState = PortableDelta.readTable(spark, dst)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cloneState == srcState,
      "the clone reads the source's bytes — including its deletion vectors")

    // clone mutates independently: DELETE lands DVs in the CLONE's root,
    // UPDATE/append land files there; the source never changes
    val srcDisk = parquetsUnder(src)
    PortableDelta.delete(spark, dst, col("id") === 1L)
    PortableDelta.update(spark, dst, col("id") === 2L, Map("tag" -> lit("cl")))
    PortableDelta.write(rows(Seq(100L), "new"), dst, mode = "append")
    assert(parquetsUnder(src) == srcDisk, "the clone must never write into the source")
    assert(PortableDelta.readTable(spark, src)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet == srcState,
      "source state is unaffected by clone mutations")
    val got = PortableDelta.readTable(spark, dst)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!got.contains(1L) && got(2L) == "cl" && got(100L) == "new")
    assert(got.size == srcState.size - 1 + 1)
    // and the clone's CDF sees its own mutations position-exactly
    val ch = PortableDelta.readChanges(spark, dst, 1L, 1L)
      .select(col("id"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ch == Set((1L, "delete")), s"clone CDF: $ch")
  }

  test("clone of a historical version = time travel + clone in one step") {
    val src = tmp("pclone-hist-src")
    val dst = tmp("pclone-hist-dst")
    PortableDelta.write(rows(0L until 5L, "v0").coalesce(1), src)
    PortableDelta.write(rows(5L until 8L, "v1"), src, mode = "append")
    PortableDelta.cloneShallow(spark, src, dst, versionAsOf = Some(0L))
    val got = PortableDelta.readTable(spark, dst)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == (0L until 5L).map(i => (i, "v0")).toSet)
    // target occupied → refused
    val e = intercept[IllegalArgumentException] {
      PortableDelta.cloneShallow(spark, src, dst)
    }
    assert(e.getMessage.contains("already holds"), e.getMessage)
  }

  test("interop: an external-shaped log with an ABSOLUTE add path reads") {
    // the spec allows add.path to be an absolute URI; synthesize the
    // shape an external engine might emit
    val dataDir = java.nio.file.Files.createTempDirectory("pabs-data").toString + "/files"
    val tbl = tmp("pabs-tbl")
    rows(0L until 6L, "ext").coalesce(1).write.parquet(dataDir)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dataDir).getFileSystem(conf)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(dataDir))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    val abs = fs.makeQualified(part)
    val schema = rows(Nil, "x").schema
    val log = new java.io.File(tbl, "_delta_log")
    log.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(log, "0" * 20 + ".json"))
    try {
      w.println("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""")
      w.println(s"""{"metaData":{"id":"ext-abs-1","format":{"provider":"parquet","options":{}},"schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsString(schema.json)},"partitionColumns":[],"configuration":{}}}""")
      w.println(s"""{"add":{"path":"${abs.toUri}","size":${fs.getFileStatus(part).getLen},"modificationTime":0,"dataChange":true}}""")
    } finally w.close()
    val got = PortableDelta.readTable(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == (0L until 6L).map(i => (i, "ext")).toSet)
  }

  test("CHECK constraints gate write/UPDATE/MERGE; drop lifts the gate") {
    val path = tmp("pconstraint")
    PortableDelta.write(rows(0L until 10L, "base").coalesce(1), path)
    // adding a constraint existing rows violate is refused
    val bad = intercept[IllegalArgumentException] {
      PortableDelta.addCheckConstraint(spark, path, "v_big", "v > 50")
    }
    assert(bad.getMessage.contains("v_big"), bad.getMessage)
    PortableDelta.addCheckConstraint(spark, path, "v_nonneg", "v >= 0")
    // legacy writer-3 protocol level for CHECK constraints
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.minWriterVersion == 3, s"got ${snap.minWriterVersion}")
    assert(snap.configuration(PortableDelta.ConstraintPrefix + "v_nonneg") == "v >= 0")

    val e1 = intercept[IllegalArgumentException] {
      PortableDelta.write(rows(Seq(20L), "x")
        .withColumn("v", lit(-5L)), path, mode = "append")
    }
    assert(e1.getMessage.contains("CHECK v_nonneg") &&
      e1.getMessage.contains("1 row(s)"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      PortableDelta.update(spark, path, col("id") < 3L,
        Map("v" -> (col("v") - 100L)))
    }
    assert(e2.getMessage.contains("CHECK v_nonneg"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      PortableDelta.merge(spark, path,
        rows(Seq(1L, 30L), "m").withColumn("v", lit(-1L)), Seq("id"))
    }
    assert(e3.getMessage.contains("CHECK v_nonneg"), e3.getMessage)
    // nothing landed: table unchanged through all three refusals
    assert(PortableDelta.readTable(spark, path).count() == 10L)
    assert(PortableDelta.snapshot(spark, path).version == 1L)
    // conforming writes pass; NULL check results VIOLATE (strict)
    PortableDelta.write(rows(Seq(20L), "ok"), path, mode = "append")
    val eNull = intercept[IllegalArgumentException] {
      PortableDelta.write(rows(Seq(21L), "x")
        .withColumn("v", lit(null).cast("long")), path, mode = "append")
    }
    assert(eNull.getMessage.contains("CHECK v_nonneg"), eNull.getMessage)
    PortableDelta.dropCheckConstraint(spark, path, "v_nonneg")
    PortableDelta.write(rows(Seq(21L), "neg")
      .withColumn("v", lit(-5L)), path, mode = "append")
    assert(PortableDelta.readTable(spark, path).count() == 12L)
  }

  test("constraints survive checkpoint + log truncation; NOT NULL enforced") {
    val path = tmp("pconstraint-ckpt")
    PortableDelta.write(rows(0L until 5L, "base").coalesce(1), path)
    PortableDelta.addCheckConstraint(spark, path, "tag_known", "tag IS NOT NULL")
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    // the constraint rides metaData through the checkpoint
    val e = intercept[IllegalArgumentException] {
      PortableDelta.write(rows(Seq(9L), "x")
        .withColumn("tag", lit(null).cast("string")), path, mode = "append")
    }
    assert(e.getMessage.contains("tag_known"), e.getMessage)
    // NOT NULL: the table schema's non-nullable id (primitive encoder)
    // rejects a batch whose plan makes id nullable and null
    val s = spark; import s.implicits._
    val nullable = Seq((java.lang.Long.valueOf(33L), "t", 1L)).toDF("id", "tag", "v")
      .withColumn("id", when(col("v") === 1L, lit(null).cast("long")))
    val e2 = intercept[IllegalArgumentException] {
      PortableDelta.write(nullable, path, mode = "append")
    }
    assert(e2.getMessage.contains("NOT NULL column id"), e2.getMessage)
    // constraint enforcement composes with clones: the clone inherits
    // the configuration, so the gate follows the snapshot
    val dst = tmp("pconstraint-clone")
    PortableDelta.cloneShallow(spark, path, dst)
    val e3 = intercept[IllegalArgumentException] {
      PortableDelta.write(rows(Seq(40L), "x")
        .withColumn("tag", lit(null).cast("string")), dst, mode = "append")
    }
    assert(e3.getMessage.contains("tag_known"), e3.getMessage)
  }

  test("DV-protocol table records checkConstraints as a writer feature") {
    val path = tmp("pconstraint-dv")
    PortableDelta.write(rows(0L until 6L, "base").coalesce(1), path)
    PortableDelta.delete(spark, path, col("id") === 0L) // → 3/7 protocol
    PortableDelta.addCheckConstraint(spark, path, "v_cap", "v < 1000")
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.minWriterVersion == 7 &&
      snap.writerFeatures.contains("checkConstraints"),
      s"got ${snap.minWriterVersion}/${snap.writerFeatures}")
    assert(snap.readerFeatures == Seq("deletionVectors"),
      "reader side is unaffected by a writer-only feature")
  }
}
