package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** `spark.read.format("portable-delta")` — the file-source read path
  * over the portable Delta log. Contracts: value parity with
  * [[PortableDelta.readTable]], log-stats FILE pruning visible in the
  * scan's numFiles metric, parquet PushedFilters in the plan, partition
  * pruning from log partitionValues (never directory names), SQL
  * `CREATE TABLE ... USING portable-delta` access, checkpoint-seeded
  * tables, schema evolution nulls, and the two by-name refusals
  * (deletion vectors, column mapping). */
class PortableDeltaDataSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val mapper = new ObjectMapper()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pdsrc").toString + "/tbl"

  // sparkPlan, not executedPlan: AQE re-instantiates scan nodes, so the
  // executed tree's metric/metadata instances are unreachable via collect
  // (the CLAUDE.md in-gate assert rule)
  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"expected one file scan, got ${scans.size}")
    scans.head
  }

  // planning-time file count: what listFiles handed the scan AFTER log
  // pruning + partition filters — row-level results can't fake this
  // (a kept-but-empty file still counts)
  private def filesPlanned(scan: FileSourceScanExec): Long =
    scan.selectedPartitions.totalNumberOfFiles

  private def idDf(n: Long) = {
    val s = spark; import s.implicits._
    (0L until n).map(i => (i, s"d$i", s"g${i % 3}")).toDF("id", "body", "grp")
  }

  test("load() matches readTable and the log-declared schema") {
    val path = tmp()
    PortableDelta.write(idDf(40L).repartitionByRange(4, col("id")), path)
    val viaFmt = spark.read.format("portable-delta").load(path)
    assert(viaFmt.schema == PortableDelta.readTable(spark, path).schema)
    val a = viaFmt.orderBy("id").collect().toSeq
    val b = PortableDelta.readTable(spark, path).orderBy("id").collect().toSeq
    assert(a == b && a.size == 40)
  }

  test("log is the source of truth: uncommitted files are invisible") {
    val path = tmp()
    PortableDelta.write(idDf(10L), path)
    // drop a stray parquet file into the table dir — a listing-based
    // reader would pick it up; the log-backed index must not
    idDf(5L).coalesce(1).write.mode("overwrite").parquet(s"$path/.stray")
    val stray = new java.io.File(s"$path/.stray").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(stray.toPath,
      new java.io.File(path, "stray-not-committed.parquet").toPath)
    assert(spark.read.format("portable-delta").load(path).count() == 10L)
  }

  test("stats pruning: range predicate drops files before I/O; PushedFilters set") {
    val path = tmp()
    PortableDelta.write(idDf(400L).repartitionByRange(8, col("id")), path)
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.files.size == 8 && snap.files.forall(_.stats.isDefined))
    val q = spark.read.format("portable-delta").load(path)
      .filter(col("id") >= 350L)
    val rows = q.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == (350L until 400L).toSeq)
    val scan = scanOf(q)
    assert(filesPlanned(scan) < 8,
      s"log stats must prune files at planning: kept ${filesPlanned(scan)} of 8")
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(id,350)"),
      s"parquet pushdown missing: ${scan.metadata("PushedFilters")}")
    assert(scan.metadata("Location").contains("PortableDeltaFileIndex"))
  }

  test("partition pruning: log partitionValues select one partition's files") {
    val path = tmp()
    PortableDelta.write(idDf(60L), path, partitionBy = Seq("grp"))
    val total = PortableDelta.snapshot(spark, path).files.size
    val perG1 = PortableDelta.snapshot(spark, path).files
      .count(_.partitionValues.get("grp").contains("g1"))
    assert(perG1 > 0 && perG1 < total)
    val q = spark.read.format("portable-delta").load(path)
      .filter(col("grp") === "g1")
    val got = q.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 60L).filter(_ % 3 == 1).toSeq)
    // partition columns come from the LOG values, typed
    assert(q.schema("grp").dataType == StringType)
    val scan = scanOf(q)
    assert(filesPlanned(scan) == perG1,
      s"expected $perG1 files, planned ${filesPlanned(scan)}")
  }

  test("SQL surface: CREATE TABLE USING portable-delta, then plain SELECT") {
    val path = tmp()
    PortableDelta.write(idDf(30L), path)
    spark.sql("DROP TABLE IF EXISTS pd_sql_t")
    spark.sql(s"CREATE TABLE pd_sql_t USING `portable-delta` OPTIONS (path '$path')")
    try {
      val n = spark.sql(
        "SELECT count(*) AS n FROM pd_sql_t WHERE id < 10").collect()(0).getLong(0)
      assert(n == 10L)
      val s = spark.sql("SELECT sum(id) AS s FROM pd_sql_t").collect()(0).getLong(0)
      assert(s == (0L until 30L).sum)
    } finally spark.sql("DROP TABLE IF EXISTS pd_sql_t")
  }

  test("checkpoint-seeded table: relation reads through lazy state") {
    val path = tmp()
    PortableDelta.write(idDf(100L).repartitionByRange(5, col("id")), path)
    PortableDelta.write(idDf(100L).filter(col("id") < 0), path, mode = "append")
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    val q = spark.read.format("portable-delta").load(path).filter(col("id") >= 80L)
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (80L until 100L).toSeq)
    assert(filesPlanned(scanOf(q)) < 5)
  }

  test("schema evolution: pre-widening files surface null for added columns") {
    val path = tmp()
    val s = spark; import s.implicits._
    PortableDelta.write(Seq((1L, "a")).toDF("id", "body"), path)
    PortableDelta.write(Seq((2L, "b", 7.5)).toDF("id", "body", "score"), path,
      mode = "append", mergeSchema = true)
    val got = spark.read.format("portable-delta").load(path)
      .orderBy("id").collect()
    assert(got.length == 2 && got(0).isNullAt(2) && got(1).getDouble(2) == 7.5)
  }

  test("refusal by name: surviving files with deletion vectors") {
    val path = tmp()
    PortableDelta.write(idDf(50L), path)
    val res = PortableDelta.delete(spark, path, col("id") % 2 === 0)
    assert(res.deletedRows > 0 && res.removedFiles == 0)
    val e = intercept[Exception] {
      spark.read.format("portable-delta").load(path).collect()
    }
    assert(e.getMessage.contains("deletion vectors") &&
      e.getMessage.contains("readTable"), e.getMessage)
  }

  test("write path: save modes, partitionBy, full protocol round trip") {
    val path = tmp()
    idDf(12L).write.format("portable-delta").partitionBy("grp").save(path)
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.partitionColumns == Seq("grp") &&
      snap.files.forall(_.stats.isDefined),
      "the write path must go through the full protocol (stats, partitioning)")
    // default mode re-save errors; append appends; overwrite replaces
    intercept[IllegalArgumentException](
      idDf(1L).write.format("portable-delta").save(path))
    idDf(12L).withColumn("id", col("id") + 100)
      .write.format("portable-delta").mode("append").save(path)
    assert(spark.read.format("portable-delta").load(path).count() == 24L)
    // Ignore: existing table short-circuits, nothing written
    idDf(3L).write.format("portable-delta").mode("ignore").save(path)
    assert(spark.read.format("portable-delta").load(path).count() == 24L)
    idDf(2L).write.format("portable-delta").mode("overwrite").save(path)
    assert(spark.read.format("portable-delta").load(path).count() == 2L)
  }

  test("INSERT INTO refuses loudly — the stock file insert would bypass the log") {
    val path = tmp()
    PortableDelta.write(idDf(5L), path)
    spark.sql("DROP TABLE IF EXISTS pd_ins_t")
    spark.sql(s"CREATE TABLE pd_ins_t USING `portable-delta` OPTIONS (path '$path')")
    try {
      val e = intercept[Exception](
        spark.sql("INSERT INTO pd_ins_t VALUES (99, 'x', 'g9')"))
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("bypass the Delta log")), msgs(e).mkString(" | "))
      assert(spark.read.format("portable-delta").load(path).count() == 5L,
        "the refused insert must not have changed the table")
    } finally spark.sql("DROP TABLE IF EXISTS pd_ins_t")
  }

  test("time travel: versionAsOf and timestampAsOf options") {
    val path = tmp()
    PortableDelta.write(idDf(5L), path)                       // v0
    PortableDelta.write(idDf(5L).withColumn("id", col("id") + 10), path,
      mode = "append")                                        // v1
    val v0 = spark.read.format("portable-delta")
      .option("versionAsOf", "0").load(path)
    assert(v0.count() == 5L &&
      v0.select(max("id")).head().getLong(0) == 4L)
    assert(spark.read.format("portable-delta").load(path).count() == 10L)
    // timestampAsOf at v0's commit time resolves to v0
    val t0 = PortableDelta.history(
      spark.sessionState.newHadoopConf(), path)
      .find(_._1 == 0L).get._3
    val byTs = spark.read.format("portable-delta")
      .option("timestampAsOf", t0.toString).load(path)
    assert(byTs.count() == 5L)
    intercept[IllegalArgumentException](
      spark.read.format("portable-delta").option("versionAsOf", "0")
        .option("timestampAsOf", "123").load(path))
  }

  test("refusal by name: column mapping") {
    val path = tmp()
    val conf = spark.sessionState.newHadoopConf()
    val schema = StructType(Seq(StructField("id", LongType)))
    val proto = mapper.createObjectNode()
    val p = proto.putObject("protocol")
    p.put("minReaderVersion", 2); p.put("minWriterVersion", 5)
    val metaN = mapper.createObjectNode()
    val m = metaN.putObject("metaData")
    m.put("id", "pdsrc-cm-1")
    val fmt = m.putObject("format"); fmt.put("provider", "parquet"); fmt.putObject("options")
    m.put("schemaString", schema.json)
    m.putArray("partitionColumns")
    m.putObject("configuration").put("delta.columnMapping.mode", "name")
    m.put("createdTime", 1L)
    PortableDelta.commit(conf, path, 0L, Seq(proto, metaN))
    val e = intercept[IllegalStateException] {
      spark.read.format("portable-delta").load(path)
    }
    assert(e.getMessage.contains("column mapping") &&
      e.getMessage.contains("readTable"), e.getMessage)
  }
}
