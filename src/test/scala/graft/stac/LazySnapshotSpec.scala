package graft.stac

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** DataFrame-backed snapshot file state: on a checkpoint-seeded table,
  * readTableWhere evaluates data skipping on EXECUTORS over the
  * checkpoint's add rows and materializes only the surviving files.
  * The proof is structural: a synthetic 100k-add checkpoint where all
  * but a handful of paths DO NOT EXIST on disk — any code path that
  * materialized-then-scanned the full add list (or pruned on the
  * driver after building a full scan) would die on a missing file;
  * only distributed pruning down to the real survivors can answer. */
class LazySnapshotSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private val ProtoT =
    "struct<minReaderVersion:int,minWriterVersion:int," +
      "readerFeatures:array<string>,writerFeatures:array<string>>"
  private val MetaT =
    "struct<id:string,format:struct<provider:string,options:map<string,string>>," +
      "schemaString:string,partitionColumns:array<string>," +
      "configuration:map<string,string>,createdTime:bigint>"
  private val DvT =
    "struct<storageType:string,pathOrInlineDv:string,offset:int," +
      "sizeInBytes:int,cardinality:bigint>"
  private val AddT =
    "struct<path:string,partitionValues:map<string,string>,size:bigint," +
      s"modificationTime:bigint,dataChange:boolean,deletionVector:$DvT," +
      "stats:string>"
  private val TxnT = "struct<appId:string,version:bigint,lastUpdated:bigint>"

  private def writeOne(df: org.apache.spark.sql.DataFrame,
                       dest: java.io.File): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("lazysnap-w").toString + "/p"
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
    dest.getParentFile.mkdirs()
    java.nio.file.Files.move(part.toPath, dest.toPath)
  }

  test("100k-add checkpoint: distributed prune, only survivors materialize") {
    val s = spark; import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("lazysnap").toString + "/tbl"
    new java.io.File(s"$root/_delta_log").mkdirs()
    val tableSchema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))

    // the two REAL files (fake add i claims id range [100i, 100i+99])
    def rows(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, i * 2)).toDF("id", "v")
    writeOne(rows(300L, 399L), new java.io.File(root, "part-3.parquet"))
    writeOne(rows(700L, 799L), new java.io.File(root, "part-7.parquet"))

    // checkpoint parquet: protocol + metaData + 100_000 add rows whose
    // stats tile disjoint id ranges; 99_998 of the paths are FAKE
    val smallDf = Seq(1).toDF("x").select(
      struct(lit(1).as("minReaderVersion"), lit(2).as("minWriterVersion"),
        lit(null).cast("array<string>").as("readerFeatures"),
        lit(null).cast("array<string>").as("writerFeatures"))
        .cast(ProtoT).as("protocol"),
      lit(null).cast(MetaT).as("metaData"),
      lit(null).cast(AddT).as("add"),
      lit(null).cast(TxnT).as("txn"))
      .unionByName(Seq(1).toDF("x").select(
        lit(null).cast(ProtoT).as("protocol"),
        struct(lit("lazy-1").as("id"),
          struct(lit("parquet").as("provider"),
            map().cast("map<string,string>").as("options")).as("format"),
          lit(tableSchema.json).as("schemaString"),
          lit(null).cast("array<string>").as("partitionColumns"),
          map().cast("map<string,string>").as("configuration"),
          lit(1L).as("createdTime")).cast(MetaT).as("metaData"),
        lit(null).cast(AddT).as("add"),
        lit(null).cast(TxnT).as("txn")))
    val statsJson = concat(lit("""{"numRecords":100,"minValues":{"id":"""),
      (col("id") * 100).cast("string"),
      lit("""},"maxValues":{"id":"""),
      (col("id") * 100 + 99).cast("string"),
      lit("""},"nullCount":{"id":0}}"""))
    val addsDf = spark.range(100000).select(
      lit(null).cast(ProtoT).as("protocol"),
      lit(null).cast(MetaT).as("metaData"),
      struct(
        concat(lit("part-"), col("id").cast("string"), lit(".parquet")).as("path"),
        map().cast("map<string,string>").as("partitionValues"),
        lit(1000L).as("size"), lit(1L).as("modificationTime"),
        lit(true).as("dataChange"),
        lit(null).cast(DvT).as("deletionVector"),
        statsJson.as("stats")).cast(AddT).as("add"),
      lit(null).cast(TxnT).as("txn"))
    writeOne(smallDf.unionByName(addsDf),
      new java.io.File(s"$root/_delta_log/${"%020d".format(0L)}.checkpoint.parquet"))
    val lcOut = new java.io.FileWriter(s"$root/_delta_log/_last_checkpoint")
    try lcOut.write("""{"version":0,"size":100002}""") finally lcOut.close()

    // a JSON tail: one REAL new file added, part-7 removed — tail
    // actions must OVERRIDE checkpoint rows without materializing them
    writeOne(rows(10000000L, 10000009L),
      new java.io.File(root, "part-new.parquet"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val ci = mapper.createObjectNode()
    ci.putObject("commitInfo").put("timestamp", 2L).put("operation", "WRITE")
    val addN = mapper.createObjectNode()
    val a = addN.putObject("add")
    a.put("path", "part-new.parquet"); a.putObject("partitionValues")
    a.put("size", new java.io.File(root, "part-new.parquet").length)
    a.put("modificationTime", 2L); a.put("dataChange", true)
    a.put("stats", """{"numRecords":10,"minValues":{"id":10000000},""" +
      """"maxValues":{"id":10000009},"nullCount":{"id":0}}""")
    val remN = mapper.createObjectNode()
    val rm = remN.putObject("remove")
    rm.put("path", "part-7.parquet"); rm.put("deletionTimestamp", 2L)
    rm.put("dataChange", true)
    val out = new java.io.FileOutputStream(
      s"$root/_delta_log/${"%020d".format(1L)}.json")
    try out.write((Seq(ci, addN, remN).map(mapper.writeValueAsString)
      .mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()

    // range inside fake-tiled space but covering only real part-3:
    // 99_999 other adds must prune WITHOUT the driver ever naming them
    val got1 = PortableDelta.readTableWhere(spark, root,
        col("id").between(300L, 350L))
      .select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got1 == (300L to 350L).map(i => (i, i * 2)).toSet)

    // part-7 was removed by the tail: its range now matches NOTHING —
    // and its checkpoint row must not resurrect the file
    assert(PortableDelta.readTableWhere(spark, root,
      col("id").between(700L, 799L)).count() == 0L)

    // the tail's new file is visible through the DataFrame state
    val got3 = PortableDelta.readTableWhere(spark, root,
        col("id") === 10000005L)
      .select(col("v")).collect().map(_.getLong(0)).toSeq
    assert(got3 == Seq(20000010L))

    // ---- DML against the same synthetic state: DELETE and UPDATE must
    // route victim selection through the DataFrame-backed file state —
    // 99_998 fake paths mean ANY full materialize-and-scan (or a full
    // filesByLogKey broadcast over unpruned files) dies on a missing
    // file; only executor-side stats pruning down to part-3 can commit
    val dst = PortableDelta.delete(spark, root, col("id").between(310L, 320L))
    assert(dst.deletedRows == 11L && dst.dvFiles == 1 && dst.removedFiles == 0,
      s"got $dst")
    assert(PortableDelta.readTableWhere(spark, root,
      col("id").between(300L, 330L)).count() == 20L) // 31 - 11 dead

    val ust = PortableDelta.update(spark, root, col("id") === 330L,
      Map("v" -> lit(-1L)))
    assert(ust.updatedRows == 1L, s"got $ust")
    val after = PortableDelta.readTableWhere(spark, root,
        col("id").between(300L, 340L))
      .select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(after.size == 30L) // 41 ids - 11 deleted
    assert(after(330L) == -1L && after(325L) == 650L)
    assert(!after.contains(315L))

    // OPTIMIZE victim selection narrows on the flat add frame the same
    // way: every fake add claims size=1000 and carries no DV, so a
    // 600-byte target excludes every fake file executor-side — victims
    // can only be REAL files (small ones, or part-3 via its DV). The
    // call succeeding at all proves selection never materialized or
    // opened the 99_998 nonexistent paths; state must be unchanged.
    PortableDelta.optimizeCompact(spark, root, targetFileBytes = 600L)
    val after2 = PortableDelta.readTableWhere(spark, root,
        col("id").between(300L, 340L))
      .select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(after2 == after, "OPTIMIZE must not change logical state")

    // ---- the FORMAT ROUTE over the same 100k-add, DV-carrying state:
    // relation build collects only the DV-carrying add rows (an
    // executor-side filter — never the add list), listFiles prunes on
    // executors, and the scan opens only the surviving REAL file(s);
    // any over-wide materialization dies on a fake path, and a missed
    // DV would resurrect the 11 deleted ids
    val rel = spark.read.format("portable-delta").load(root)
    val q = rel.filter(col("id").between(300L, 340L))
    val scans = q.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.size == 1 &&
      scans.head.metadata("Location").contains("PortableDeltaFileIndex"))
    val planned = scans.head.selectedPartitions.totalNumberOfFiles
    assert(planned >= 1 && planned <= 4,
      s"stats pruning must keep only the touched real files, planned $planned")
    val viaFmt = q.select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaFmt == after,
      "format route must equal readTableWhere over the synthetic state")

    // ---- distributed VACUUM over the same state: the referenced frame
    // (100k checkpoint refs) flows as a DataFrame into the anti-join —
    // an unreferenced orphan is reclaimed, every referenced REAL file
    // stays, and no fake path is ever opened or deleted
    val orphan = new java.io.File(root, "orphan-0.parquet")
    writeOne(rows(0L, 0L), orphan)
    assert(orphan.setLastModified(1000L)) // well past any grace window
    val reclaimed = PortableDelta.vacuum(spark, root, graceMillis = 0L)
    assert(reclaimed >= 1, s"expected the orphan reclaimed, got $reclaimed")
    assert(!orphan.exists, "unreferenced orphan must be deleted")
    val after3 = PortableDelta.readTableWhere(spark, root,
        col("id").between(300L, 340L))
      .select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(after3 == after, "vacuum must keep every referenced file")
  }

  test("snapshot slice over a 100k-add checkpoint: executor-side ordering, " +
       "only the slice's files open") {
    val s = spark; import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("lazyslice").toString + "/tbl"
    new java.io.File(s"$root/_delta_log").mkdirs()
    val tableSchema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))
    def rows(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, i * 2)).toDF("id", "v")
    // three REAL files named to sort FIRST; the 100k fake adds ("z-…")
    // sort after them — buildScan lists its paths eagerly, so any slice
    // implementation that touched files beyond the requested window
    // (or built a scan over the full add list) dies on a missing file
    val realSizes = (0 until 3).map { i =>
      val f = new java.io.File(root, s"a-$i.parquet")
      writeOne(rows(i * 10L, i * 10L + 9L), f)
      f.length()
    }
    val smallDf = Seq(1).toDF("x").select(
      struct(lit(1).as("minReaderVersion"), lit(2).as("minWriterVersion"),
        lit(null).cast("array<string>").as("readerFeatures"),
        lit(null).cast("array<string>").as("writerFeatures"))
        .cast(ProtoT).as("protocol"),
      lit(null).cast(MetaT).as("metaData"),
      lit(null).cast(AddT).as("add"),
      lit(null).cast(TxnT).as("txn"))
      .unionByName(Seq(1).toDF("x").select(
        lit(null).cast(ProtoT).as("protocol"),
        struct(lit("lazyslice-1").as("id"),
          struct(lit("parquet").as("provider"),
            map().cast("map<string,string>").as("options")).as("format"),
          lit(tableSchema.json).as("schemaString"),
          lit(null).cast("array<string>").as("partitionColumns"),
          map().cast("map<string,string>").as("configuration"),
          lit(1L).as("createdTime")).cast(MetaT).as("metaData"),
        lit(null).cast(AddT).as("add"),
        lit(null).cast(TxnT).as("txn")))
    def addRow(p: String, size: Long) = Seq(1).toDF("x").select(
      lit(null).cast(ProtoT).as("protocol"),
      lit(null).cast(MetaT).as("metaData"),
      struct(lit(p).as("path"),
        map().cast("map<string,string>").as("partitionValues"),
        lit(size).as("size"), lit(1L).as("modificationTime"),
        lit(true).as("dataChange"),
        lit(null).cast(DvT).as("deletionVector"),
        lit(null).cast("string").as("stats")).cast(AddT).as("add"),
      lit(null).cast(TxnT).as("txn"))
    val fakeAdds = spark.range(100000).select(
      lit(null).cast(ProtoT).as("protocol"),
      lit(null).cast(MetaT).as("metaData"),
      struct(
        concat(lit("z-"), col("id").cast("string"), lit(".parquet")).as("path"),
        map().cast("map<string,string>").as("partitionValues"),
        lit(1000L).as("size"), lit(1L).as("modificationTime"),
        lit(true).as("dataChange"),
        lit(null).cast(DvT).as("deletionVector"),
        lit(null).cast("string").as("stats")).cast(AddT).as("add"),
      lit(null).cast(TxnT).as("txn"))
    val realAdds = (0 until 3).map(i => addRow(s"a-$i.parquet", realSizes(i)))
      .reduce(_ unionByName _)
    writeOne(smallDf.unionByName(realAdds).unionByName(fakeAdds),
      new java.io.File(s"$root/_delta_log/${"%020d".format(0L)}.checkpoint.parquet"))
    val lc = new java.io.FileWriter(s"$root/_delta_log/_last_checkpoint")
    try lc.write("""{"version":0,"size":100005}""") finally lc.close()

    // slice 1: two files -> a-0, a-1 (path order); pinned state caches
    val (df1, end1, c1) = PortableDelta.readSnapshotSlice(
      spark, root, versionAsOf = 0L, fromFile = 0, maxFiles = 2)
    assert(end1 == 2 && !c1)
    assert(df1.select(col("id")).collect().map(_.getLong(0)).toSet ==
      (0L to 19L).toSet)
    assert(PortableDelta.sliceStateCached(root, 0L),
      "pinned ordering must cache across an in-flight drain")
    // slice 2: byte budget admits exactly one more real file (first
    // file always admits; budget < its size blocks the second)
    val (df2, end2, c2) = PortableDelta.readSnapshotSlice(
      spark, root, versionAsOf = 0L, fromFile = 2, maxFiles = 10,
      maxBytes = 1L)
    assert(end2 == 3 && !c2)
    assert(df2.select(col("id")).collect().map(_.getLong(0)).toSet ==
      (20L to 29L).toSet)
    // an empty tail slice from the end completes and evicts the cache
    // (the 100k fake files are never opened anywhere in this drain)
    val (df3, end3, c3) = PortableDelta.readSnapshotSlice(
      spark, root, versionAsOf = 0L, fromFile = 100003, maxFiles = 1)
    assert(end3 == 100003 && c3 && df3.isEmpty)
    assert(!PortableDelta.sliceStateCached(root, 0L),
      "a completed drain must evict + unpersist the pinned ordering")
  }
}
