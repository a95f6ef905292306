package graft.stac

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
  * tables, schema evolution nulls, DV-aware reads (row-index drop,
  * value-equal to readTable), column-mapped reads (physical-name
  * rewrite), and the SQL write surface (INSERT INTO via
  * InsertableRelation; the raw-file bypass stays refused). */
class PortableDeltaDataSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

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

  test("deletion vectors: the format route drops DV-dead rows, value-equal to readTable") {
    val path = tmp()
    PortableDelta.write(idDf(50L).repartitionByRange(4, col("id")), path)
    val res = PortableDelta.delete(spark, path, col("id") % 2 === 0)
    assert(res.deletedRows > 0 && res.removedFiles == 0,
      "the DELETE must land as deletion vectors, not file rewrites")
    val viaFmt = spark.read.format("portable-delta").load(path)
    val a = viaFmt.orderBy("id").collect().toSeq
    val b = PortableDelta.readTable(spark, path).orderBy("id").collect().toSeq
    assert(a == b && a.size == 25, s"got ${a.size} rows")
    assert(a.forall(_.getLong(0) % 2 == 1), "even ids must be DV-dead")
    // filters compose with the DV drop: pushdown skips row groups and
    // the temp row-index column still names the PHYSICAL position
    val filtered = spark.read.format("portable-delta").load(path)
      .filter(col("id") >= 25L)
    assert(filtered.collect().map(_.getLong(0)).sorted.toSeq ==
      (25L until 50L).filter(_ % 2 == 1).toSeq)
    val scan = scanOf(filtered)
    assert(filesPlanned(scan) < 4,
      "log-stats pruning must still run on a DV-carrying table")
    // aggregate over the format route subtracts the dead rows
    spark.sql("DROP TABLE IF EXISTS pd_dv_t")
    spark.sql(s"CREATE TABLE pd_dv_t USING `portable-delta` OPTIONS (path '$path')")
    try assert(spark.sql("SELECT count(*) AS n FROM pd_dv_t")
      .head().getLong(0) == 25L)
    finally spark.sql("DROP TABLE IF EXISTS pd_dv_t")
  }

  test("SplitDvScan: a partially-DV'd table keeps COLUMNAR reads over its " +
      "DV-free files under graft extensions; values ≡ readTable both ways") {
    val path = tmp()
    PortableDelta.write(idDf(400L).repartitionByRange(8, col("id")), path)
    // surgical delete: both ids land in the FIRST range file, so one of
    // eight files carries a DV — the 100-TB shape (a handful of
    // recently-mutated files in a sea of DV-free ones)
    val res = PortableDelta.delete(spark, path,
      col("id") === 7L || col("id") === 13L)
    assert(res.deletedRows == 2 && res.removedFiles == 0)
    val snap = PortableDelta.snapshot(spark, path)
    val nDv = snap.files.count(_.dv.isDefined)
    assert(nDv > 0 && nDv < snap.files.size, s"need a MIXED table, got $nDv DV'd")
    val expected = PortableDelta.readTable(spark, path)
      .orderBy("id").collect().toSeq

    // extension-less session: ONE row-path scan (round-15 behavior), correct
    val plainQ = spark.read.format("portable-delta").load(path)
    val plainScans = plainQ.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s }
    assert(plainScans.size == 1 && !plainScans.head.supportsColumnar,
      "without the extension the whole scan stays on the row path")
    assert(plainQ.orderBy("id").collect().toSeq == expected)

    // armed session: the scan splits — columnar over DV-free files,
    // row path over exactly the DV-carrying ones
    val as = armedSession
    val q = as.read.format("portable-delta").load(path)
    val scans = q.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s }
    assert(scans.size == 2, s"expected the split union, got ${scans.size} scan(s)")
    assert(scans.forall(_.metadata("Location").contains("PortableDeltaFileIndex")),
      "both legs must plan through the log-backed index")
    val (colLegs, rowLegs) = scans.partition(_.supportsColumnar)
    assert(colLegs.size == 1 && rowLegs.size == 1,
      s"one columnar + one row leg, got ${colLegs.size}/${rowLegs.size}")
    assert(colLegs.head.selectedPartitions.totalNumberOfFiles ==
      (snap.files.size - nDv).toLong, "the columnar leg reads the DV-free files")
    assert(rowLegs.head.selectedPartitions.totalNumberOfFiles == nDv.toLong,
      "the row leg reads only the DV-carrying files")
    assert(q.orderBy("id").collect().toSeq == expected,
      "the split union must answer exactly like readTable")

    // stock pushdown/pruning still run on BOTH legs post-split
    val f = as.read.format("portable-delta").load(path)
      .filter(col("id") >= 350L)
    val fScans = f.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s }
    assert(fScans.map(_.selectedPartitions.totalNumberOfFiles).sum <
      snap.files.size, "log-stats pruning must survive the split")
    assert(fScans.exists(_.metadata("PushedFilters")
      .contains("GreaterThanOrEqual(id,350)")),
      s"parquet pushdown missing: ${fScans.map(_.metadata("PushedFilters"))}")
    assert(f.collect().map(_.getLong(0)).sorted.toSeq == (350L until 400L).toSeq)

    // runtime arm() (extraOptimizations — post-optimization): the
    // Filter case pushes the adjacent predicate into both legs itself,
    // so pushdown and per-leg skipping survive even without extensions
    val prevOpts = spark.experimental.extraOptimizations
    graft.stac.SplitDvScan.arm(spark)
    try {
      val fa = spark.read.format("portable-delta").load(path)
        .filter(col("id") >= 350L)
      val faScans = fa.queryExecution.sparkPlan.collect {
        case s: FileSourceScanExec => s }
      assert(faScans.size == 2 && faScans.exists(_.supportsColumnar),
        s"arm() must split too: ${faScans.size} scan(s)")
      assert(faScans.exists(_.metadata("PushedFilters")
        .contains("GreaterThanOrEqual(id,350)")),
        s"arm() path must keep pushdown: ${faScans.map(_.metadata("PushedFilters"))}")
      assert(faScans.map(_.selectedPartitions.totalNumberOfFiles).sum <
        snap.files.size, "per-leg log-stats skipping must survive arm()")
      assert(fa.collect().map(_.getLong(0)).sorted.toSeq ==
        (350L until 400L).toSeq)
    } finally spark.experimental.extraOptimizations = prevOpts

    // fully-DV'd tables keep ONE scan even when armed (an empty
    // columnar leg buys nothing)
    PortableDelta.delete(spark, path, col("id") % 2 === 0L)
    assert(PortableDelta.snapshot(spark, path).files.forall(_.dv.isDefined))
    val q2 = as.read.format("portable-delta").load(path)
    assert(q2.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s }.size == 1,
      "a fully-DV'd table must not split")
    assert(q2.orderBy("id").collect().toSeq ==
      PortableDelta.readTable(spark, path).orderBy("id").collect().toSeq)
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

  test("INSERT INTO lands a real commit through the full write protocol") {
    val path = tmp()
    PortableDelta.write(idDf(5L), path)
    spark.sql("DROP TABLE IF EXISTS pd_ins_t")
    spark.sql(s"CREATE TABLE pd_ins_t USING `portable-delta` OPTIONS (path '$path')")
    try {
      spark.sql("INSERT INTO pd_ins_t VALUES (99, 'x', 'g9'), (100, 'y', 'g0')")
      // the insert is a LOG commit (v1), with stats, visible to both routes
      val snap = PortableDelta.snapshot(spark, path)
      assert(snap.version == 1L, s"expected one commit, at v${snap.version}")
      assert(snap.files.forall(_.stats.isDefined),
        "INSERT INTO must go through the full protocol (stats harvested)")
      assert(PortableDelta.readTable(spark, path).count() == 7L)
      assert(spark.sql("SELECT count(*) AS n FROM pd_ins_t").head().getLong(0) == 7L,
        "the SAME table name must see the new rows (relation cache dropped)")
      val got = spark.sql("SELECT id, body FROM pd_ins_t WHERE id >= 99 ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((99L, "x"), (100L, "y")))
      // INSERT with a SELECT source; then INSERT OVERWRITE replaces
      spark.sql("INSERT INTO pd_ins_t SELECT id + 200, body, grp FROM pd_ins_t WHERE id < 2")
      assert(spark.sql("SELECT count(*) AS n FROM pd_ins_t").head().getLong(0) == 9L)
      spark.sql("INSERT OVERWRITE pd_ins_t VALUES (1, 'only', 'g1')")
      assert(PortableDelta.readTable(spark, path).count() == 1L)
      assert(spark.sql("SELECT body FROM pd_ins_t").head().getString(0) == "only")
    } finally spark.sql("DROP TABLE IF EXISTS pd_ins_t")
  }

  test("static PARTITION insert still refuses — the raw-file bypass stays impossible") {
    val path = tmp()
    PortableDelta.write(idDf(6L), path, partitionBy = Seq("grp"))
    spark.sql("DROP TABLE IF EXISTS pd_insp_t")
    spark.sql(s"CREATE TABLE pd_insp_t USING `portable-delta` OPTIONS (path '$path')")
    try {
      val e = intercept[Exception](spark.sql(
        "INSERT INTO pd_insp_t PARTITION (grp='g1') VALUES (99, 'x')"))
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("bypass the Delta log")), msgs(e).mkString(" | "))
      assert(PortableDelta.readTable(spark, path).count() == 6L,
        "the refused insert must not have changed the table")
      // in THIS session (no graft extensions) even the dynamic form
      // refuses for a partitioned table — PreprocessTableInsertion fills
      // an all-dynamic partitionSpec, which skips the InsertableRelation
      // seam; never a silent log bypass
      val e2 = intercept[Exception](
        spark.sql("INSERT INTO pd_insp_t VALUES (99, 'x', 'g1')"))
      assert(msgs(e2).exists(_.contains("bypass the Delta log")), msgs(e2).mkString(" | "))
    } finally spark.sql("DROP TABLE IF EXISTS pd_insp_t")
  }

  /** A session armed with [[graft.GraftExtensions]] on the SAME
    * SparkContext (extensions only apply at session construction) —
    * the BboxIntersectsSpec pattern; the shared session is restored. */
  private lazy val armedSession: org.apache.spark.sql.SparkSession = {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[8, 3]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    org.apache.spark.sql.SparkSession.setDefaultSession(base)
    org.apache.spark.sql.SparkSession.setActiveSession(base)
    s
  }

  test("partitioned INSERT INTO works under graft extensions (dynamic partitions only)") {
    val path = tmp()
    PortableDelta.write(idDf(6L), path, partitionBy = Seq("grp"))
    val as = armedSession
    as.sql("DROP TABLE IF EXISTS pd_insx_t")
    as.sql(s"CREATE TABLE pd_insx_t USING `portable-delta` OPTIONS (path '$path')")
    try {
      as.sql("INSERT INTO pd_insx_t VALUES (99, 'x', 'g7')")
      val snap = PortableDelta.snapshot(spark, path)
      assert(snap.version == 1L && snap.partitionColumns == Seq("grp"))
      assert(snap.files.exists(_.partitionValues.get("grp").contains("g7")),
        "the new row's partition value must come from the batch")
      assert(snap.files.forall(_.stats.isDefined), "full protocol: stats")
      assert(PortableDelta.readTable(spark, path).count() == 7L)
      assert(as.sql("SELECT count(*) AS n FROM pd_insx_t").head().getLong(0) == 7L)
      // INSERT OVERWRITE keeps the table's layout
      as.sql("INSERT OVERWRITE pd_insx_t VALUES (1, 'only', 'g1')")
      val snap2 = PortableDelta.snapshot(spark, path)
      assert(snap2.partitionColumns == Seq("grp") &&
        PortableDelta.readTable(spark, path).count() == 1L)
      // static PARTITION spec still refuses — per-partition overwrite
      // semantics are not silently approximated
      val e = intercept[Exception](as.sql(
        "INSERT INTO pd_insx_t PARTITION (grp='g1') VALUES (5, 'y')"))
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("bypass the Delta log")), msgs(e).mkString(" | "))
    } finally as.sql("DROP TABLE IF EXISTS pd_insx_t")
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

  /** Stage the frozen externally-shaped fixture (column mapping
    * post-RENAME + deletion vectors + hive partitioning + CDF + a
    * multi-part checkpoint) into a scratch dir. */
  private def stageExternal(): String = {
    val src = java.nio.file.Paths.get("src/test/resources/external_combined_delta")
    assert(java.nio.file.Files.isDirectory(src), s"fixture missing at $src")
    val dst = java.nio.file.Files.createTempDirectory("pdsrcext").resolve("tbl")
    java.nio.file.Files.walk(src).forEach { p =>
      val tgt = dst.resolve(src.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(tgt)
      else {
        java.nio.file.Files.createDirectories(tgt.getParent)
        java.nio.file.Files.copy(p, tgt)
      }
      ()
    }
    dst.toString
  }

  test("CTAS: CREATE TABLE ... USING portable-delta AS SELECT lands a real table") {
    val path = tmp()
    spark.sql("DROP TABLE IF EXISTS pd_ctas_t")
    spark.sql(s"""CREATE TABLE pd_ctas_t USING `portable-delta`
                 |OPTIONS (path '$path')
                 |AS SELECT id, concat('d', id) AS body FROM range(25)""".stripMargin)
    try {
      val snap = PortableDelta.snapshot(spark, path)
      assert(snap.version == 0L && snap.files.forall(_.stats.isDefined),
        "CTAS must go through the full protocol (one commit, stats)")
      assert(PortableDelta.readTable(spark, path).count() == 25L)
      assert(spark.sql("SELECT sum(id) FROM pd_ctas_t").head().getLong(0) ==
        (0L until 25L).sum)
    } finally spark.sql("DROP TABLE IF EXISTS pd_ctas_t")
  }

  test("timestampAsOf strings parse in UTC, never the JVM default zone") {
    // 2024-01-02T03:04:05Z = 1704164645000 ms — host-independent by
    // construction (Timestamp.valueOf would shift this by the JVM zone)
    assert(PortableDeltaRelation.parseUtcMillis("2024-01-02T03:04:05Z") ==
      1704164645000L)
    assert(PortableDeltaRelation.parseUtcMillis("2024-01-02 03:04:05") ==
      1704164645000L)
    assert(PortableDeltaRelation.parseUtcMillis("2024-01-02") ==
      1704153600000L)
    assert(PortableDeltaRelation.parseUtcMillis("2024-01-02 03:04:05.250") ==
      1704164645250L)
  }

  test("column mapping: the format route reads physical names, value-equal to readTable") {
    // the frozen external fixture: mapped (post-RENAME `body`->`text`),
    // DV-carrying, hive-partitioned — the worst case for the stock scan
    val path = stageExternal()
    val viaFmt = spark.read.format("portable-delta").load(path)
    assert(viaFmt.columns.toSeq == Seq("id", "text", "grp"),
      "the relation must surface LOGICAL names")
    val a = viaFmt.orderBy("id").collect().toSeq
    val b = PortableDelta.readTable(spark, path)
      .orderBy("id").collect().toSeq
    assert(a == b, s"format route drifted from readTable:\n $a\n vs $b")
    val got = a.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == (0L to 9L).toSet - 2L, s"live ids: ${got.keySet}")
    assert(got(5L) == "UPDATED 5" && got(4L) == "doc 4")
    // partition pruning over the mapped hive layout (log partitionValues
    // key by PHYSICAL name) + data-column filters on renamed columns
    val odd = spark.read.format("portable-delta").load(path)
      .filter(col("grp") === "odd")
    assert(odd.count() == 5L)
    val scanned = filesPlanned(scanOf(odd))
    val totalFiles = PortableDelta.snapshot(spark, path).files.size
    assert(scanned < totalFiles,
      s"partition pruning must drop files: planned $scanned of $totalFiles")
    assert(spark.read.format("portable-delta").load(path)
      .filter(col("text") === "UPDATED 5").count() == 1L,
      "filters on a RENAMED column must rewrite to the physical name")
    // a rename on a plain table flips it to mapped mode mid-history:
    // the format route follows (round-14 refusal leg, now value-checked)
    val p2 = tmp()
    PortableDelta.write(idDf(20L), p2)
    PortableDelta.renameColumn(spark, p2, "body", "text")
    val viaFmt2 = spark.read.format("portable-delta").load(p2)
    assert(viaFmt2.columns.toSeq == Seq("id", "text", "grp"))
    assert(viaFmt2.orderBy("id").collect().toSeq ==
      PortableDelta.readTable(spark, p2).orderBy("id").collect().toSeq)
  }

  /** A 4-commit table for the batch change-feed legs: v0 create,
    * v1 append, v2 DELETE (DVs), v3 MERGE (delete+insert pairs). */
  private def cdfTable(): String = {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write((0L until 20L).map(i => (i, s"a$i")).toDF("id", "b")
      .repartition(2), path)                                        // v0
    PortableDelta.write((20L until 30L).map(i => (i, s"b$i")).toDF("id", "b"),
      path, mode = "append")                                        // v1
    PortableDelta.delete(spark, path, col("id") % 5 === 0L)         // v2
    PortableDelta.merge(spark, path,
      (25L until 35L).map(i => (i, s"m$i")).toDF("id", "b"),
      Seq("id"))                                                    // v3
    path
  }

  test("batch readChangeFeed: option route ≡ readChanges, version and timestamp bounds") {
    val path = cdfTable()
    def agg(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long, Long)] =
      df.groupBy(col("_commit_version"), col("_change_type"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).sorted.toSeq
    val viaOpt = spark.read.format("portable-delta")
      .option("readChangeFeed", "true")
      .option("startingVersion", "0").option("endingVersion", "3").load(path)
    assert(viaOpt.columns.contains("_change_type") &&
      viaOpt.columns.contains("_commit_version") &&
      viaOpt.columns.contains("_commit_timestamp"),
      s"CDF schema drifted: ${viaOpt.columns.toSeq}")
    val want = agg(PortableDelta.readChanges(spark, path, 0L, 3L))
    assert(agg(viaOpt) == want, s"option route drifted:\n ${agg(viaOpt)}\n $want")
    // endingVersion defaults to the current version
    assert(agg(spark.read.format("portable-delta")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .load(path)) == want)
    // a WINDOW: only v2..v3 changes
    val win = agg(spark.read.format("portable-delta")
      .option("readChangeFeed", "true")
      .option("startingVersion", "2").load(path))
    assert(win == want.filter(_._1 >= 2L), s"window drifted: $win")
    // timestamp bounds resolve over ICT-aware history (start = first
    // commit AT/AFTER, end = last AT/BEFORE)
    val hist = PortableDelta.history(
      spark.sessionState.newHadoopConf(), path).sortBy(_._1)
    val t1 = hist.find(_._1 == 1L).get._3
    val t2 = hist.find(_._1 == 2L).get._3
    val byTs = agg(spark.read.format("portable-delta")
      .option("readChangeFeed", "true")
      .option("startingTimestamp", t1.toString)
      .option("endingTimestamp", t2.toString).load(path))
    assert(byTs == want.filter(t => t._1 >= 1L && t._1 <= 2L),
      s"timestamp bounds drifted: $byTs")
    // SQL over the option route ≡ the TVF route (CREATE TABLE + options)
    spark.sql("DROP TABLE IF EXISTS pd_cdf_bt")
    spark.sql(s"CREATE TABLE pd_cdf_bt USING `portable-delta` OPTIONS (" +
      s"path '$path', readChangeFeed 'true', startingVersion '1')")
    try assert(agg(spark.table("pd_cdf_bt")) == want.filter(_._1 >= 1L),
      "a CREATE TABLE with CDF options must serve the feed")
    finally spark.sql("DROP TABLE IF EXISTS pd_cdf_bt")
  }

  test("batch readChangeFeed refusals: typos, misplaced bounds, bad windows never silently scan") {
    val path = cdfTable()
    def refuses(msgPart: String)(op: => Unit): Unit = {
      val e = intercept[Exception](op)
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains(msgPart)),
        s"wanted '$msgPart' in: ${msgs(e).mkString(" | ")}")
    }
    // a CDF bound without readChangeFeed would silently return current
    // rows — refuse by name
    refuses("readChangeFeed is not enabled")(
      spark.read.format("portable-delta")
        .option("startingVersion", "1").load(path).collect())
    // separator typos of the option name refuse (case differences are
    // fine — Spark hands V1 sources a case-insensitive map)
    refuses("did you mean 'readChangeFeed'")(
      spark.read.format("portable-delta")
        .option("read_change_feed", "true").option("startingVersion", "0")
        .load(path).collect())
    refuses("change-feed read is option")(
      spark.read.format("portable-delta")
        .option("readChangeDataFeed", "true").option("startingVersion", "0")
        .load(path).collect())
    assert(spark.read.format("portable-delta")
      .option("readChangefeed", "true").option("startingVersion", "0")
      .load(path).count() ==
      PortableDelta.readChanges(spark, path, 0L, 3L).count(),
      "case variants ARE the option (case-insensitive map)")
    // time travel and the feed cannot combine
    refuses("cannot combine with versionAsOf")(
      spark.read.format("portable-delta").option("readChangeFeed", "true")
        .option("startingVersion", "0").option("versionAsOf", "1")
        .load(path).collect())
    // a start bound is required; double or empty bounds refuse
    refuses("needs a start bound")(
      spark.read.format("portable-delta").option("readChangeFeed", "true")
        .load(path).collect())
    refuses("not both")(
      spark.read.format("portable-delta").option("readChangeFeed", "true")
        .option("startingVersion", "0").option("startingTimestamp", "2024-01-01")
        .load(path).collect())
    refuses("empty window")(
      spark.read.format("portable-delta").option("readChangeFeed", "true")
        .option("startingVersion", "3").option("endingVersion", "1")
        .load(path).collect())
    refuses("after the last commit")(
      spark.read.format("portable-delta").option("readChangeFeed", "true")
        .option("startingTimestamp", "2999-01-01").load(path).collect())
  }

  test("saveAsTable: a MANAGED portable-delta table lands at the warehouse location") {
    // the catalog-managed path probe (round-17 VERDICT task): Spark's
    // CTAS command passes the managed table's default location as the
    // path option, so the full write protocol runs at the warehouse dir
    val s = spark; import s.implicits._
    spark.sql("DROP TABLE IF EXISTS pd_managed_t")
    (0L until 30L).map(i => (i, s"m$i")).toDF("id", "b")
      .write.format("portable-delta").saveAsTable("pd_managed_t")
    try {
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("pd_managed_t"))
      val loc = new org.apache.hadoop.fs.Path(meta.location).toString
      val snap = PortableDelta.snapshot(spark, loc)
      assert(snap.version == 0L && snap.files.forall(_.stats.isDefined),
        "saveAsTable must run the full protocol (one commit, stats)")
      assert(spark.table("pd_managed_t").count() == 30L)
      assert(spark.sql("SELECT sum(id) AS s FROM pd_managed_t")
        .head().getLong(0) == (0L until 30L).sum)
      // append through saveAsTable lands as a protocol commit too
      Seq((100L, "x")).toDF("id", "b").write.format("portable-delta")
        .mode("append").saveAsTable("pd_managed_t")
      assert(PortableDelta.snapshot(spark, loc).version == 1L &&
        spark.table("pd_managed_t").count() == 31L)
    } finally spark.sql("DROP TABLE IF EXISTS pd_managed_t")
  }

  test("timestamp option grammar: explicit offsets normalize to UTC, compact dates refuse") {
    // +02:00 at 05:04:05 IS 03:04:05Z
    assert(PortableDeltaRelation.parseUtcMillis("2024-01-02T05:04:05+02:00") ==
      PortableDeltaRelation.parseUtcMillis("2024-01-02T03:04:05Z"))
    assert(PortableDeltaRelation.parseUtcMillis("2024-01-02 01:04:05-02:00") ==
      1704164645000L)
    assert(PortableDeltaRelation.parseUtcMillis("2024-01-02T03:04:05.250+00:00") ==
      1704164645250L)
    // epoch millis pass through the OPTION grammar; compact dates refuse
    assert(PortableDeltaRelation.parseTsMillis("1704164645000", "t") ==
      1704164645000L)
    val e = intercept[IllegalArgumentException](
      PortableDeltaRelation.parseTsMillis("20240102", "t"))
    assert(e.getMessage.contains("ambiguous") &&
      e.getMessage.contains("epoch MILLISECONDS"), e.getMessage)
    // malformed strings name the accepted grammar
    val e2 = intercept[IllegalArgumentException](
      PortableDeltaRelation.parseUtcMillis("01/02/2024", "t"))
    assert(e2.getMessage.contains("accepted grammar"), e2.getMessage)
  }
}
