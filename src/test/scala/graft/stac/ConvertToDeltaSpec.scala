package graft.stac

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** CONVERT TO DELTA ([[PortableDelta.convertToDelta]] + the SQL
  * statement): adopt an existing parquet directory into the portable
  * Delta log IN PLACE. Contracts: zero data movement (the disk file
  * set is byte-identical before/after), footer-collected stats on
  * every add, value parity with the raw parquet read, declared-type
  * partition recovery from hive directories, refusals by name
  * (already-a-delta-table, partitioned layout without a declared
  * schema, colliding partition column), and full engine function
  * afterward (DML, time travel, the format route). */
class ConvertToDeltaSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  /** One armed session for the SQL statements (the ExtrasSpec pattern). */
  private lazy val armed: org.apache.spark.sql.SparkSession = {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[8, 3]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    org.apache.spark.sql.SparkSession.setDefaultSession(base)
    org.apache.spark.sql.SparkSession.setActiveSession(base)
    s
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pdconvert").toString + "/tbl"

  private def diskParquet(path: String): Set[String] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
    val b = Set.newBuilder[String]
    while (it.hasNext) {
      val st = it.next()
      // FULL path: partitionBy reuses the same part-file NAME across
      // partition dirs, so a name-keyed set under-counts
      if (st.isFile && st.getPath.getName.endsWith(".parquet") &&
          !st.getPath.toString.contains("_delta_log"))
        b += s"${st.getPath.toUri.getPath}:${st.getLen}"
    }
    b.result()
  }

  test("flat directory: in-place adopt, stats from footers, verbs work after") {
    val s = spark; import s.implicits._
    val path = tmp()
    val df = (0L until 200L).map(i => (i, s"d$i", i % 7L)).toDF("id", "b", "g")
    df.repartition(4).write.parquet(path)
    val before = diskParquet(path)
    val v = PortableDelta.convertToDelta(spark, path)
    assert(v == 0L)
    assert(diskParquet(path) == before,
      "CONVERT must not move, rewrite, or add any data file")
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.files.size == 4 && snap.files.forall(_.stats.isDefined),
      "every adopted file carries footer-collected stats")
    assert(snap.schema.fieldNames.toSeq == Seq("id", "b", "g"))
    // value parity with the raw parquet read
    assert(PortableDelta.readTable(spark, path).orderBy("id").collect().toSeq ==
      spark.read.parquet(path).orderBy("id").collect().toSeq)
    // stats are REAL: a range predicate prunes files at planning time
    // through the format route (ids were range-partitioned)
    val sorted = tmp()
    df.repartitionByRange(4, col("id")).write.parquet(sorted)
    PortableDelta.convertToDelta(spark, sorted)
    val narrow = spark.read.format("portable-delta").load(sorted)
      .filter(col("id") < 10L)
    val scans = narrow.queryExecution.sparkPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc }
    assert(scans.size == 1 &&
      scans.head.selectedPartitions.totalNumberOfFiles < 4,
      "adopted stats must prune files at planning time")
    assert(narrow.count() == 10L)
    // the table is fully functional: DML + time travel from v0
    PortableDelta.delete(spark, path, col("g") === 0L)
    assert(PortableDelta.readTable(spark, path).count() ==
      df.filter(col("g") =!= 0L).count())
    assert(PortableDelta.readTable(spark, path, 0L).count() == 200L)
    // re-converting refuses by name (double-commit hazard)
    val e = intercept[IllegalArgumentException](
      PortableDelta.convertToDelta(spark, path))
    assert(e.getMessage.contains("already carries a _delta_log"), e.getMessage)
  }

  test("hive-partitioned: declared types recover values; SQL statement route") {
    val s = spark; import s.implicits._
    val path = tmp()
    val df = (0L until 120L).map(i => (i, s"d$i", (i % 3L).toInt))
      .toDF("id", "b", "p")
    df.write.partitionBy("p").parquet(path)
    // partitioned layout without PARTITIONED BY refuses by name
    val e = intercept[IllegalArgumentException](
      PortableDelta.convertToDelta(spark, path))
    assert(e.getMessage.contains("declare the partition schema"), e.getMessage)
    // the delta-spark statement form, typed partition column
    val nOnDisk = diskParquet(path).size.toLong
    val r = armed.sql(
      s"CONVERT TO DELTA parquet.`$path` PARTITIONED BY (p INT)").head()
    assert(r.getString(0) == path && r.getLong(1) == 0L &&
      r.getLong(2) == nOnDisk, s"unexpected convert result: $r ($nOnDisk files)")
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.partitionColumns == Seq("p") &&
      snap.schema.fieldNames.toSeq == Seq("id", "b", "p"))
    assert(snap.files.forall(f => f.partitionValues.get("p").exists(_ != null)))
    // typed partition values round-trip: INT comparisons + pruning
    val viaFmt = spark.read.format("portable-delta").load(path)
    assert(viaFmt.schema("p").dataType == IntegerType)
    val one = viaFmt.filter(col("p") === 1)
    val scans = one.queryExecution.sparkPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc }
    assert(scans.size == 1 &&
      scans.head.selectedPartitions.totalNumberOfFiles <
        snap.files.size.toLong,
      "partition pruning must drop adopted files")
    assert(one.count() == df.filter(col("p") === 1).count())
    assert(viaFmt.orderBy("id").select("id", "b", "p").collect().toSeq ==
      df.orderBy("id").select("id", "b", "p").collect().toSeq)
    // a wrong PARTITIONED BY (column not in the layout) refuses by name
    val p2 = tmp()
    (0L until 10L).map(i => (i, i)).toDF("x", "y").write.parquet(p2)
    val e2 = intercept[IllegalArgumentException](
      PortableDelta.convertToDelta(spark, p2,
        Some(StructType(Seq(StructField("nope", IntegerType))))))
    assert(e2.getMessage.contains("missing from the layout"), e2.getMessage)
  }

  test("DESCRIBE HISTORY / DESCRIBE DETAIL statements ≡ the TVFs") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write((0L until 10L).map(i => (i, s"d$i")).toDF("id", "b"),
      path)
    PortableDelta.delete(spark, path, col("id") === 0L)
    val hist = armed.sql(s"DESCRIBE HISTORY '$path'").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(1L, 0L),
      "history lists newest first (the delta-spark order)")
    assert(hist.exists(_.getString(1).contains("DELETE")))
    val viaTvf = armed.sql(
      s"SELECT version, operation FROM portable_delta_history('$path')")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(hist.map(r => (r.getLong(0), r.getString(1))).toSet == viaTvf,
      "statement ≡ TVF")
    val det = armed.sql(s"DESCRIBE DETAIL '$path'").head()
    assert(det.getString(0) == "delta" &&
      det.getLong(det.fieldIndex("numFiles")) ==
        PortableDelta.snapshot(spark, path).files.size.toLong)
    val detTvf = armed.sql(
      s"SELECT numFiles, sizeInBytes FROM portable_delta_detail('$path')").head()
    assert(det.getLong(det.fieldIndex("numFiles")) == detTvf.getLong(0) &&
      det.getLong(det.fieldIndex("sizeInBytes")) == detTvf.getLong(1))
    // non-pd targets keep the stock parse error for the DESCRIBE forms
    val e = intercept[Exception](armed.sql("DESCRIBE HISTORY not_a_table"))
    assert(!e.getMessage.contains("portable-delta"), e.getMessage)
  }

  test("SHOW TBLPROPERTIES / FSCK REPAIR / GENERATE statements") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write((0L until 40L).map(i => (i, s"d$i")).toDF("id", "b")
      .repartition(4), path,
      properties = Map("delta.logRetentionDuration" -> "interval 30 days"))
    // SHOW answers from the LOG configuration, not the catalog copy
    val props = armed.sql(s"SHOW TBLPROPERTIES '$path'").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("delta.logRetentionDuration")
      .contains("interval 30 days"), props.toString)
    assert(armed.sql(
      s"SHOW TBLPROPERTIES '$path' ('delta.logRetentionDuration')")
      .head().getString(1) == "interval 30 days")
    val eK = intercept[Exception](armed.sql(
      s"SHOW TBLPROPERTIES '$path' ('no.such.key')").collect())
    assert(eK.getMessage.contains("no.such.key"), eK.getMessage)
    // FSCK: vanish one data file; DRY RUN lists without committing
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val victim = PortableDelta.snapshot(spark, path).files.head.path
    fs.delete(new org.apache.hadoop.fs.Path(path, victim), false)
    val dry = armed.sql(s"FSCK REPAIR TABLE '$path' DRY RUN").collect()
    assert(dry.map(_.getString(0)).toSeq == Seq(victim) && !dry.head.getBoolean(1))
    assert(PortableDelta.snapshot(spark, path).version == 0L,
      "DRY RUN must not commit")
    val fixed = armed.sql(s"FSCK REPAIR TABLE '$path'").collect()
    assert(fixed.map(_.getString(0)).toSeq == Seq(victim) &&
      fixed.head.getBoolean(1))
    assert(PortableDelta.snapshot(spark, path).version == 1L)
    assert(PortableDelta.readTable(spark, path).count() < 40L)
    // GENERATE: manifest rows name real directories with content
    val dirs = armed.sql(
      s"GENERATE symlink_format_manifest FOR TABLE '$path'").collect()
      .map(_.getString(0))
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"$path/_symlink_format_manifest/$d/manifest".replace("//", "/"))))
    }
  }

  test("CREATE TABLE ... SHALLOW CLONE statement: zero-copy, time-travel source") {
    val s = spark; import s.implicits._
    val src = tmp()
    PortableDelta.write((0L until 30L).map(i => (i, s"d$i")).toDF("id", "b"),
      src)                                                         // v0
    PortableDelta.delete(spark, src, col("id") < 10L)              // v1
    val dst = tmp()
    val r = armed.sql(s"CREATE TABLE '$dst' SHALLOW CLONE '$src'").head()
    assert(r.getString(0) == src && r.getString(1) == dst)
    assert(PortableDelta.readTable(spark, dst).count() == 20L)
    // zero-copy: no parquet bytes under the clone root
    assert(diskParquet(dst).isEmpty, "SHALLOW CLONE must move no data")
    // VERSION AS OF clones the pre-delete state
    val dst0 = tmp()
    armed.sql(s"CREATE TABLE '$dst0' SHALLOW CLONE '$src' VERSION AS OF 0")
    assert(PortableDelta.readTable(spark, dst0).count() == 30L)
    // an occupied destination refuses by name
    val e = intercept[Exception](armed.sql(
      s"CREATE TABLE '$dst' SHALLOW CLONE '$src'"))
    assert(e.getMessage.contains("already holds a Delta table"), e.getMessage)
  }

  test("single-commit ADD COLUMNS (delta parity: one metaData re-statement)") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write((0L until 5L).map(i => (i, s"d$i")).toDF("id", "b"),
      path)                                                        // v0
    val r = armed.sql(s"ALTER TABLE '$path' ADD COLUMNS " +
      "(x INT, y STRING COMMENT 'why', z DOUBLE)").head()
    assert(r.getLong(1) == 1L,
      s"three columns must land as ONE commit: version ${r.getLong(1)}")
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.version == 1L &&
      snap.schema.fieldNames.toSeq == Seq("id", "b", "x", "y", "z"))
    assert(snap.schema("y").getComment().contains("why"))
    // mapped table: each new field born with fresh id + physical name,
    // still one commit
    PortableDelta.renameColumn(spark, path, "b", "body")          // v2 (mapped)
    val v3 = PortableDelta.addColumns(spark, path,
      Seq(("m1", IntegerType, None), ("m2", IntegerType, None)))
    assert(v3 == 3L)
    val snap3 = PortableDelta.snapshot(spark, path)
    val ids = Seq("m1", "m2").map(n =>
      snap3.schema(n).metadata.getLong("delta.columnMapping.id"))
    assert(ids.distinct.size == 2,
      s"mapped ADD COLUMNS must mint distinct column ids: $ids")
    // duplicate names refuse
    val e = intercept[IllegalArgumentException](
      PortableDelta.addColumns(spark, path,
        Seq(("q", IntegerType, None), ("Q", IntegerType, None))))
    assert(e.getMessage.contains("duplicate column name"), e.getMessage)
  }
}
