package graft.stac

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native SQL time-travel syntax ([[ResolveDeltaTimeTravel]]) and the
  * OPTIMIZE/VACUUM/RESTORE maintenance statements ([[GraftSqlParser]])
  * under [[graft.GraftExtensions]]. Contracts: syntax ≡ the existing
  * reader options / Scala verbs (value parity), operation metrics as
  * result rows, UTC timestamp rule, non-portable-delta targets keep
  * Spark's stock errors. */
class DeltaSqlExtrasSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  /** One armed session for the whole suite (the SqlDmlSpec pattern). */
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
    java.nio.file.Files.createTempDirectory("pdextras").toString + "/tbl"

  private def versioned(): String = {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write((0L until 10L).map(i => (i, s"v0_$i")).toDF("id", "b"),
      path)                                                     // v0
    PortableDelta.write(Seq((100L, "v1_x")).toDF("id", "b"), path,
      mode = "append")                                          // v1
    PortableDelta.delete(spark, path, col("id") === 0L)         // v2
    path
  }

  test("VERSION AS OF: table name and portable-delta.`path` forms ≡ options") {
    val path = versioned()
    armed.sql("DROP TABLE IF EXISTS tt_t")
    armed.sql(s"CREATE TABLE tt_t USING `portable-delta` OPTIONS (path '$path')")
    try {
      def ids(sql: String): Seq[Long] =
        armed.sql(sql).select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids("SELECT * FROM tt_t VERSION AS OF 0") == (0L until 10L))
      assert(ids("SELECT * FROM tt_t VERSION AS OF 1") == (0L until 10L) :+ 100L)
      assert(ids("SELECT * FROM tt_t VERSION AS OF 2") == (1L until 10L) :+ 100L)
      // current read unaffected
      assert(ids("SELECT * FROM tt_t") == (1L until 10L) :+ 100L)
      // the path-based two-part form needs no catalog entry
      assert(ids(s"SELECT * FROM `portable-delta`.`$path` VERSION AS OF 0") ==
        (0L until 10L))
      // parity with the reader option (the gate-tested route)
      assert(ids("SELECT * FROM tt_t VERSION AS OF 1") ==
        spark.read.format("portable-delta").option("versionAsOf", "1")
          .load(path).select("id").collect().map(_.getLong(0)).sorted.toSeq)
    } finally armed.sql("DROP TABLE IF EXISTS tt_t")
  }

  test("TIMESTAMP AS OF: literal string resolves in UTC ≡ timestampAsOf option") {
    val path = versioned()
    val hist = PortableDelta.history(
      spark.sessionState.newHadoopConf(), path).sortBy(_._1)
    val v1ts = hist.find(_._1 == 1L).get._3
    // a UTC instant at v1's commit time (string form, explicit Z)
    val iso = java.time.Instant.ofEpochMilli(v1ts).toString
    armed.sql("DROP TABLE IF EXISTS tt_ts_t")
    armed.sql(s"CREATE TABLE tt_ts_t USING `portable-delta` OPTIONS (path '$path')")
    try {
      val got = armed.sql(
        s"SELECT * FROM tt_ts_t TIMESTAMP AS OF '$iso'")
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      val want = spark.read.format("portable-delta")
        .option("timestampAsOf", v1ts.toString).load(path)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want && got.contains(100L), s"got $got")
      // a computed instant refuses by name
      val e = intercept[Exception](armed.sql(
        "SELECT * FROM tt_ts_t TIMESTAMP AS OF current_timestamp()").collect())
      assert(e.getMessage.contains("literal"), e.getMessage)
    } finally armed.sql("DROP TABLE IF EXISTS tt_ts_t")
  }

  test("non-portable-delta targets keep Spark's stock time-travel error") {
    val s = spark; import s.implicits._
    val pq = java.nio.file.Files.createTempDirectory("ttpq").toString + "/p"
    Seq((1, "a")).toDF("id", "b").write.parquet(pq)
    armed.sql("DROP TABLE IF EXISTS tt_plain")
    armed.sql(s"CREATE TABLE tt_plain USING parquet OPTIONS (path '$pq')")
    try {
      val e = intercept[Exception](
        armed.sql("SELECT * FROM tt_plain VERSION AS OF 0").collect())
      assert(!e.getMessage.contains("portable-delta"), e.getMessage)
    } finally armed.sql("DROP TABLE IF EXISTS tt_plain")
  }

  test("OPTIMIZE statement: compaction metrics as rows, file-count collapse") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write((0L until 400L).map(i => (i, s"d$i")).toDF("id", "b")
      .repartition(16), path)
    PortableDelta.delete(spark, path, col("id") % 7 === 0L) // DVs to purge
    val before = PortableDelta.snapshot(spark, path).files.size
    val r = armed.sql(s"OPTIMIZE '$path'").head()
    assert(r.getInt(2) == before && r.getInt(3) < before,
      s"compaction must collapse $before files: $r")
    assert(r.getLong(4) > 0L, s"DV rows must purge: $r")
    val after = PortableDelta.snapshot(spark, path)
    assert(after.files.size == r.getInt(3) &&
      after.files.forall(_.dv.isEmpty))
    assert(PortableDelta.readTable(spark, path).count() == 400L - 400L / 7 - 1L)
  }

  test("OPTIMIZE ... ZORDER BY and WHERE-scoped compaction") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write((0L until 300L).map(i => (i, i % 50L)).toDF("x", "y")
      .repartition(8), path)
    val rz = armed.sql(s"OPTIMIZE '$path' ZORDER BY (x, y)").head()
    assert(rz.getInt(2) == 8 && rz.getInt(3) >= 1, s"$rz")
    assert(PortableDelta.readTable(spark, path).count() == 300L)
    // WHERE + ZORDER refuses by name
    val e = intercept[Exception](
      armed.sql(s"OPTIMIZE '$path' WHERE x < 10 ZORDER BY (x)"))
    assert(e.getMessage.contains("ZORDER BY with WHERE"), e.getMessage)
  }

  test("VACUUM statement: full and LITE reclaim with RETAIN 0 HOURS") {
    val s = spark; import s.implicits._
    def mk(): String = {
      val p = tmp()
      PortableDelta.write((0L until 50L).map(i => (i, s"d$i")).toDF("id", "b")
        .repartition(4), p)
      PortableDelta.write((0L until 5L).map(i => (i, "x")).toDF("id", "b"), p,
        mode = "overwrite") // 4 tombstones
      // vacuum never reclaims files a RECONSTRUCTABLE version still
      // references — truncate the log past v0 first (the bench pattern)
      PortableDelta.checkpoint(spark, p)
      PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), p)
      p
    }
    val p1 = mk()
    // RETAIN below the retention floor refuses BY NAME (delta-spark's
    // retentionDurationCheck): RETAIN 0 would break time travel/RESTORE/
    // in-flight readers silently
    val e = intercept[Exception](armed.sql(s"VACUUM '$p1' RETAIN 0 HOURS")
      .collect())
    assert(e.getMessage.contains("retention floor") &&
      e.getMessage.contains(PortableDeltaVacuumCommand.RetentionCheckKey),
      e.getMessage)
    // the explicit session override admits it (the delta-spark escape)
    armed.conf.set(PortableDeltaVacuumCommand.RetentionCheckKey, "false")
    try {
      val r1 = armed.sql(s"VACUUM '$p1' RETAIN 0 HOURS").head()
      assert(r1.getLong(1) == 4L, s"full vacuum must reclaim 4 files: $r1")
      val p2 = mk()
      val r2 = armed.sql(s"VACUUM '$p2' LITE RETAIN 0 HOURS").head()
      assert(r2.getLong(1) == 4L, s"lite vacuum must reclaim 4 files: $r2")
      assert(PortableDelta.readTable(spark, p1).count() == 5L &&
        PortableDelta.readTable(spark, p2).count() == 5L)
    } finally armed.conf.unset(PortableDeltaVacuumCommand.RetentionCheckKey)
    // a RETAIN at/above the table's own (lowered) floor passes the check
    val p3 = mk()
    PortableDelta.setTableProperties(spark, p3,
      Map("delta.deletedFileRetentionDuration" -> "interval 1 hours"))
    val r3 = armed.sql(s"VACUUM '$p3' RETAIN 2 HOURS").head()
    assert(r3.getLong(1) == 0L,
      s"fresh tombstones are inside the 2h grace window: $r3")
  }

  test("RESTORE statement: version and timestamp forms, catalog-table target") {
    val path = versioned() // v0 10 rows, v1 +100, v2 delete id 0
    armed.sql("DROP TABLE IF EXISTS rst_t")
    armed.sql(s"CREATE TABLE rst_t USING `portable-delta` OPTIONS (path '$path')")
    try {
      val r = armed.sql("RESTORE TABLE rst_t TO VERSION AS OF 1").head()
      assert(r.getLong(1) == 3L && r.getLong(2) == 1L, s"$r")
      assert(PortableDelta.readTable(spark, path).count() == 11L,
        "v1 state must be current again (the delete rolled back)")
      // the same table name sees the restored state (cache dropped)
      assert(armed.sql("SELECT count(*) FROM rst_t").head().getLong(0) == 11L)
      // timestamp form restores v0
      val hist = PortableDelta.history(
        spark.sessionState.newHadoopConf(), path).sortBy(_._1)
      val v0ts = hist.find(_._1 == 0L).get._3
      val r2 = armed.sql(s"RESTORE rst_t TO TIMESTAMP AS OF '$v0ts'").head()
      assert(r2.getLong(2) == 0L, s"$r2")
      assert(PortableDelta.readTable(spark, path).count() == 10L)
    } finally armed.sql("DROP TABLE IF EXISTS rst_t")
  }

  test("ALTER TABLE: ADD/RENAME/DROP COLUMN, TYPE widening, properties — SQL ≡ Scala verbs") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write((0L until 10L).map(i =>
      (i.toInt, s"d$i")).toDF("id", "b"), path)                    // v0
    // ADD COLUMNS: the full colTypeList grammar (nested struct commas,
    // COMMENT) through the delegate's parser — ONE commit for the list
    val r1 = armed.sql(s"ALTER TABLE '$path' ADD COLUMNS " +
      "(score DOUBLE COMMENT 'quality', meta STRUCT<x: INT, y: STRING>)").head()
    assert(r1.getString(0) == path && r1.getLong(1) == 1L, s"$r1")
    val snap1 = PortableDelta.snapshot(spark, path)
    assert(snap1.schema.fieldNames.toSeq ==
      Seq("id", "b", "score", "meta"), snap1.schema.treeString)
    assert(snap1.schema("score").getComment().contains("quality"))
    // TYPE widening (int -> bigint); non-widening refuses through SQL.
    // The widening verb gates on delta.enableTypeWidening — set it
    // through SQL too (property-verb round trip)
    armed.sql(s"ALTER TABLE '$path' SET TBLPROPERTIES " +
      "('delta.enableTypeWidening' = 'true')")
    armed.sql(s"ALTER TABLE '$path' ALTER COLUMN id TYPE BIGINT")
    assert(PortableDelta.snapshot(spark, path).schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
    val eN = intercept[Exception](
      armed.sql(s"ALTER TABLE '$path' ALTER COLUMN b TYPE INT").collect())
    assert(eN.getMessage.contains("widen"), eN.getMessage)
    // SET / UNSET TBLPROPERTIES
    armed.sql(s"ALTER TABLE '$path' SET TBLPROPERTIES (" +
      "'delta.deletedFileRetentionDuration' = 'interval 48 hours', " +
      "'graft.note' = 'r17')")
    val cfg = PortableDelta.smallSnapshot(spark, path).configuration
    assert(cfg.get("delta.deletedFileRetentionDuration")
      .contains("interval 48 hours") && cfg.get("graft.note").contains("r17"))
    armed.sql(s"ALTER TABLE '$path' UNSET TBLPROPERTIES ('graft.note')")
    assert(!PortableDelta.smallSnapshot(spark, path)
      .configuration.contains("graft.note"))
    // RENAME/DROP COLUMN flip the table to column mapping — SQL route
    armed.sql(s"ALTER TABLE '$path' RENAME COLUMN b TO body")
    armed.sql(s"ALTER TABLE '$path' DROP COLUMN meta")
    val snap2 = PortableDelta.snapshot(spark, path)
    assert(snap2.schema.fieldNames.toSeq == Seq("id", "body", "score"))
    assert(PortableDelta.readTable(spark, path).orderBy("id")
      .select("body").collect().map(_.getString(0)).toSeq ==
      (0 until 10).map(i => s"d$i"),
      "renamed column must still read the original bytes")
    // guarded properties refuse through SQL exactly as through the verb
    val eG = intercept[Exception](armed.sql(
      s"ALTER TABLE '$path' SET TBLPROPERTIES ('delta.columnMapping.mode' = 'name')"))
    assert(eG.getMessage.contains("delta.columnMapping.mode"), eG.getMessage)
  }

  test("ALTER TABLE: constraints, CLUSTER BY, DROP FEATURE, catalog-table target") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write((0L until 10L).map(i => (i, i * 2L)).toDF("id", "v"),
      path)
    armed.sql("DROP TABLE IF EXISTS alt_t")
    armed.sql(s"CREATE TABLE alt_t USING `portable-delta` OPTIONS (path '$path')")
    try {
      // catalog-NAMED target: ADD CONSTRAINT routes through the verb
      armed.sql("ALTER TABLE alt_t ADD CONSTRAINT v_even CHECK (v % 2 = 0)")
      assert(PortableDelta.smallSnapshot(spark, path).configuration
        .get("delta.constraints.v_even").isDefined)
      val eV = intercept[Exception](PortableDelta.write(
        Seq((100L, 3L)).toDF("id", "v"), path, mode = "append"))
      assert(eV.getMessage.contains("v_even"), eV.getMessage)
      armed.sql("ALTER TABLE alt_t DROP CONSTRAINT v_even")
      assert(!PortableDelta.smallSnapshot(spark, path).configuration
        .contains("delta.constraints.v_even"))
      // schema change on a catalog-named table: the catalog's stored
      // schema syncs, so SELECT through the NAME keeps working
      armed.sql("ALTER TABLE alt_t ADD COLUMN note STRING")
      assert(armed.sql("SELECT id, note FROM alt_t").count() == 10L,
        "catalog schema must sync after ALTER ADD COLUMN")
      // RENAME/DROP COLUMN remove old names from the new schema — the
      // one case alterTableDataSchema refuses (r18 ADVICE fix: the sync
      // replaces the WHOLE CatalogTable schema); a stale catalog schema
      // would fail these name-based SELECTs
      armed.sql("ALTER TABLE alt_t RENAME COLUMN note TO remark")
      assert(armed.sql("SELECT id, remark FROM alt_t").count() == 10L,
        "catalog schema must sync after ALTER RENAME COLUMN")
      armed.sql("ALTER TABLE alt_t DROP COLUMN remark")
      assert(armed.sql("SELECT * FROM alt_t").columns.toSeq ==
        Seq("id", "v"), "catalog schema must sync after ALTER DROP COLUMN")
      assert(armed.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("alt_t"))
        .schema.fieldNames.toSeq == Seq("id", "v"),
        "the stored CatalogTable schema itself must be current")
      // CLUSTER BY publishes clustering columns; NONE clears them
      armed.sql("ALTER TABLE alt_t CLUSTER BY (id, v)")
      assert(PortableDelta.describeDetail(spark, path)
        .clusteringColumns == Seq("id", "v"))
      armed.sql("ALTER TABLE alt_t CLUSTER BY NONE")
      assert(PortableDelta.describeDetail(spark, path)
        .clusteringColumns.isEmpty)
      // DROP FEATURE: an absent feature refuses by name (the verb's
      // contract, surfaced through SQL)
      val eF = intercept[Exception](
        armed.sql("ALTER TABLE alt_t DROP FEATURE deletionVectors"))
      assert(eF.getMessage.contains("deletionVectors"), eF.getMessage)
    } finally armed.sql("DROP TABLE IF EXISTS alt_t")
    // non-pd targets keep Spark's stock ALTER path untouched
    val pq = java.nio.file.Files.createTempDirectory("altpq").toString + "/p"
    Seq((1, "a")).toDF("id", "b").write.parquet(pq)
    armed.sql("DROP TABLE IF EXISTS alt_plain")
    armed.sql(s"CREATE TABLE alt_plain USING parquet OPTIONS (path '$pq')")
    try {
      armed.sql("ALTER TABLE alt_plain SET TBLPROPERTIES ('x' = 'y')")
      assert(armed.sql("SHOW TBLPROPERTIES alt_plain")
        .collect().exists(r => r.getString(0) == "x" && r.getString(1) == "y"),
        "non-pd ALTER must reach Spark's stock command")
    } finally armed.sql("DROP TABLE IF EXISTS alt_plain")
  }

  test("digit timestamps and clone destinations: the wrong-shape inputs refuse by name") {
    val path = versioned()
    // unquoted compact date must NOT resolve as epoch millis (~1970):
    // every SQL surface routes all-digit values through parseTsMillis
    val eR = intercept[IllegalArgumentException](
      armed.sql(s"RESTORE '$path' TO TIMESTAMP AS OF 20240102").collect())
    assert(eR.getMessage.contains("ambiguous"), eR.getMessage)
    val eC = intercept[IllegalArgumentException](armed.sql(
      s"CREATE TABLE '${tmp()}' SHALLOW CLONE '$path' TIMESTAMP AS OF 20240102")
      .collect())
    assert(eC.getMessage.contains("ambiguous"), eC.getMessage)
    // a backquoted clone destination is delta-spark's catalog-identifier
    // syntax — refused by name, never a relative directory named `t2`
    val eB = intercept[UnsupportedOperationException](
      armed.sql(s"CREATE TABLE `clone_dst_t` SHALLOW CLONE '$path'").collect())
    assert(eB.getMessage.contains("catalog-identifier"), eB.getMessage)
    assert(!new java.io.File("clone_dst_t").exists(),
      "the refused clone must not create a working-directory table")
    // 13-digit epoch millis (the documented grammar) still resolves
    val hist = PortableDelta.history(
      spark.sessionState.newHadoopConf(), path).sortBy(_._1)
    val v1ts = hist.find(_._1 == 1L).get._3
    val dst = tmp()
    armed.sql(s"CREATE TABLE '$dst' SHALLOW CLONE '$path' TIMESTAMP AS OF $v1ts")
    assert(PortableDelta.readTable(spark, dst).count() == 11L)
  }

  test("unknown statements and non-pd targets fall through to the stock parser") {
    // plain SQL still parses through the wrapped parser
    assert(armed.sql("SELECT 1 + 1 AS v").head().getInt(0) == 2)
    // OPTIMIZE over an unknown table name: stock parse error, not ours
    val e = intercept[Exception](armed.sql("OPTIMIZE definitely_not_a_table"))
    assert(!e.getMessage.contains("portable-delta"), e.getMessage)
  }
}
