package graft.stac

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL `DELETE FROM` / `UPDATE` / `MERGE INTO` over portable-delta
  * tables — the [[RewriteDeltaSqlDml]] post-hoc rewrites under
  * [[graft.GraftExtensions]]. Contracts: each verb routes through the
  * protocol DML (DVs, CDF, stats), reports delta-style affected-row
  * counts, reads back value-equal to the Scala API, refuses
  * unsupported shapes BY NAME, and extension-less sessions keep
  * Spark's v2-only analysis error (never a silent wrong write). */
class PortableDeltaSqlDmlSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  /** A session armed with [[graft.GraftExtensions]] on the SAME
    * SparkContext — the BboxIntersectsSpec pattern. */
  private lazy val armed: org.apache.spark.sql.SparkSession = {
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

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pdsqldml").toString + "/tbl"

  private def mkTable(n: Long = 40L): String = {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write((0L until n)
      .map(i => (i, s"d$i", i * 1.5)).toDF("id", "body", "price")
      .repartitionByRange(4, col("id")), path)
    path
  }

  private def table(path: String, name: String): Unit = {
    armed.sql(s"DROP TABLE IF EXISTS $name")
    armed.sql(s"CREATE TABLE $name USING `portable-delta` OPTIONS (path '$path')")
  }

  test("DELETE FROM: DV death path, affected-row count, value parity") {
    val path = mkTable()
    table(path, "dml_del_t")
    try {
      val n = armed.sql("DELETE FROM dml_del_t WHERE id % 2 = 0")
        .head().getLong(0)
      assert(n == 20L, s"num_affected_rows must report the deleted rows: $n")
      val res = PortableDelta.snapshot(spark, path)
      assert(res.version == 1L && res.files.exists(_.dv.isDefined),
        "the SQL DELETE must land as one DV commit")
      assert(PortableDelta.readTable(spark, path)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq ==
        (0L until 40L).filter(_ % 2 == 1))
      // the SAME table name sees the post-DELETE state (cache dropped)
      assert(armed.sql("SELECT count(*) FROM dml_del_t").head().getLong(0) == 20L)
      // DELETE without WHERE empties the table
      armed.sql("DELETE FROM dml_del_t")
      assert(PortableDelta.readTable(spark, path).count() == 0L)
    } finally armed.sql("DROP TABLE IF EXISTS dml_del_t")
  }

  test("UPDATE ... SET: expressions over table columns, parity with the Scala API") {
    val path = mkTable()
    table(path, "dml_upd_t")
    try {
      val n = armed.sql(
        "UPDATE dml_upd_t SET price = price * 2, body = concat(body, '!') " +
          "WHERE id < 10").head().getLong(0)
      assert(n == 10L)
      val got = PortableDelta.readTable(spark, path)
        .orderBy("id").collect()
      assert(got(3).getDouble(2) == 3L * 1.5 * 2 && got(3).getString(1) == "d3!")
      assert(got(15).getDouble(2) == 15L * 1.5 && got(15).getString(1) == "d15")
      // cross-check: the Scala API on a twin table produces identical state
      val twin = mkTable()
      PortableDelta.update(spark, twin, col("id") < 10,
        Map("price" -> (col("price") * 2),
          "body" -> concat(col("body"), lit("!"))))
      assert(PortableDelta.readTable(spark, path).orderBy("id").collect().toSeq ==
        PortableDelta.readTable(spark, twin).orderBy("id").collect().toSeq)
    } finally armed.sql("DROP TABLE IF EXISTS dml_upd_t")
  }

  test("MERGE INTO: equi-key upsert with UPDATE SET + INSERT, counts per clause") {
    val path = mkTable(10L)
    table(path, "dml_mrg_t")
    try {
      // temp views are PER-SESSION — register in the armed one
      armed.createDataFrame(
        Seq((5L, "five", 100.0), (6L, "six", 200.0), (50L, "fifty", 300.0))
      ).toDF("sid", "sbody", "sprice").createOrReplaceTempView("dml_mrg_src")
      val r = armed.sql(
        """MERGE INTO dml_mrg_t t USING dml_mrg_src s ON t.id = s.sid
          |WHEN MATCHED THEN UPDATE SET price = s.sprice, body = s.sbody
          |WHEN NOT MATCHED THEN INSERT (id, body, price)
          |  VALUES (s.sid, s.sbody, s.sprice)""".stripMargin).head()
      assert(r.getLong(0) == 3L && r.getLong(1) == 2L &&
        r.getLong(2) == 0L && r.getLong(3) == 1L,
        s"(affected, updated, deleted, inserted) = $r")
      val byId = PortableDelta.readTable(spark, path).collect()
        .map(x => x.getLong(0) -> ((x.getString(1), x.getDouble(2)))).toMap
      assert(byId(5L) == (("five", 100.0)) && byId(6L) == (("six", 200.0)))
      assert(byId(50L) == (("fifty", 300.0)) && byId.size == 11)
    } finally armed.sql("DROP TABLE IF EXISTS dml_mrg_t")
  }

  test("MERGE INTO: WHEN MATCHED DELETE with AND condition") {
    val s = spark; import s.implicits._
    val path = mkTable(10L)
    table(path, "dml_mrgd_t")
    try {
      armed.createDataFrame(Seq((2L, 1), (3L, 0), (4L, 1)))
        .toDF("kid", "kill").createOrReplaceTempView("dml_mrgd_src")
      val r = armed.sql(
        """MERGE INTO dml_mrgd_t t USING dml_mrgd_src s ON t.id = s.kid
          |WHEN MATCHED AND s.kill = 1 THEN DELETE""".stripMargin).head()
      assert(r.getLong(2) == 2L, s"two rows must die: $r")
      assert(PortableDelta.readTable(spark, path)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(0L, 1L, 3L, 5L, 6L, 7L, 8L, 9L))
    } finally armed.sql("DROP TABLE IF EXISTS dml_mrgd_t")
  }

  test("portable_delta_history TVF: commit record through plain SQL") {
    val path = mkTable()
    PortableDelta.delete(spark, path, col("id") === 0L)   // v1
    PortableDelta.update(spark, path, col("id") === 1L,
      Map("price" -> lit(9.0)))                           // v2
    val rows = armed.sql(
      s"SELECT version, operation, timestamp FROM " +
        s"portable_delta_history('$path') ORDER BY version").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    val ops = rows.map(_.getString(1)).toSeq
    assert(ops.head.nonEmpty && ops.exists(_.contains("DELETE")) &&
      ops.exists(_.contains("UPDATE")), s"operations: $ops")
    assert(rows.forall(r => !r.isNullAt(2) &&
      r.getTimestamp(2).getTime > 0L), "commit times must be real instants")
    // a non-literal argument refuses by name
    val e = intercept[Exception](armed.sql(
      "SELECT * FROM portable_delta_history(concat('a', 'b'))"))
    assert(e.getMessage.contains("string literal") ||
      Option(e.getCause).exists(_.getMessage.contains("string literal")),
      e.getMessage)
  }

  test("portable_delta_detail TVF: DESCRIBE DETAIL through plain SQL") {
    val path = mkTable()
    PortableDelta.delete(spark, path, col("id") === 0L) // DVs flip features
    val d = armed.sql(
      s"""SELECT format, numFiles, sizeInBytes, partitionColumns,
         |       minReaderVersion, minWriterVersion, tableFeatures, properties
         |FROM portable_delta_detail('$path')""".stripMargin).head()
    assert(d.getString(0) == "delta" || d.getString(0) == "parquet",
      s"format: ${d.getString(0)}")
    val snap = PortableDelta.snapshot(spark, path)
    assert(d.getLong(1) == snap.files.size &&
      d.getLong(2) == snap.files.map(_.size).sum,
      s"numFiles/sizeInBytes must match the log: $d")
    assert(d.getSeq[String](3).isEmpty, "unpartitioned table")
    assert(d.getSeq[String](6).contains("deletionVectors"),
      s"the DELETE's protocol upgrade must surface: ${d.getSeq[String](6)}")
  }

  test("MERGE INSERT of a key column takes the CLAUSE's expression, " +
      "never silently the join key (the round-15 clobber, now expressible)") {
    val path = mkTable(5L)
    table(path, "dml_mrgk_t")
    try {
      armed.createDataFrame(Seq((100L, "x", 1.0)))
        .toDF("sid", "sbody", "sprice").createOrReplaceTempView("dml_mrgk_src")
      // join on s.sid, insert id = s.sid + 1 — per-clause value maps
      // make this expressible; the inserted key must be 101, not 100
      val r = armed.sql(
        """MERGE INTO dml_mrgk_t t USING dml_mrgk_src s ON t.id = s.sid
          |WHEN NOT MATCHED THEN INSERT (id, body, price)
          |  VALUES (s.sid + 1, s.sbody, s.sprice)""".stripMargin).head()
      assert(r.getLong(3) == 1L, s"insert count: $r")
      val ids = PortableDelta.readTable(spark, path)
        .filter(col("id") >= 100L).select("id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(101L),
        s"the INSERT expression must win over the join-key mapping: $ids")
    } finally armed.sql("DROP TABLE IF EXISTS dml_mrgk_t")
  }

  test("full-clause SQL MERGE: multiple conditional MATCHED/NOT MATCHED + " +
      "NOT MATCHED BY SOURCE, per-clause routing value-checked") {
    val s = spark; import s.implicits._
    val path = mkTable(10L) // ids 0..9, price = id * 1.5
    table(path, "dml_full_t")
    try {
      armed.createDataFrame(Seq(
        (1L, "kill", 0.0), (2L, "bump", 50.0), (3L, "other", 60.0),
        (20L, "hot", 70.0), (21L, "cold", 80.0)))
        .toDF("sid", "verb", "sprice").createOrReplaceTempView("dml_full_src")
      val r = armed.sql(
        """MERGE INTO dml_full_t t USING dml_full_src s ON t.id = s.sid
          |WHEN MATCHED AND s.verb = 'kill' THEN DELETE
          |WHEN MATCHED AND s.verb = 'bump' THEN UPDATE SET price = t.price + s.sprice
          |WHEN MATCHED THEN UPDATE SET body = concat(t.body, '*')
          |WHEN NOT MATCHED AND s.verb = 'hot' THEN INSERT (id, body, price)
          |  VALUES (s.sid, 'HOT', s.sprice * 2)
          |WHEN NOT MATCHED THEN INSERT (id, body, price)
          |  VALUES (s.sid, s.verb, s.sprice)
          |WHEN NOT MATCHED BY SOURCE AND t.id >= 8 THEN DELETE
          |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET body = concat(t.body, '!')
          |""".stripMargin).head()
      // matched: 1 deletes, 2 bumps, 3 stars; inserts: 20 hot, 21 cold;
      // by source: 8,9 delete; 0,4,5,6,7 flag
      assert(r.getLong(1) == 7L && r.getLong(2) == 3L && r.getLong(3) == 2L,
        s"(affected, updated, deleted, inserted) = $r")
      val got = PortableDelta.readTable(spark, path).collect()
        .map(x => (x.getLong(0), x.getString(1), x.getDouble(2))).toSet
      assert(got == Set(
        (0L, "d0!", 0.0), (2L, "d2", 2 * 1.5 + 50.0), (3L, "d3*", 3 * 1.5),
        (4L, "d4!", 4 * 1.5), (5L, "d5!", 5 * 1.5), (6L, "d6!", 6 * 1.5),
        (7L, "d7!", 7 * 1.5), (20L, "HOT", 140.0), (21L, "cold", 80.0)),
        s"got $got")
      // BY SOURCE conditions see only the target — a source reference
      // refuses by name
      val e = intercept[Exception](armed.sql(
        """MERGE INTO dml_full_t t USING dml_full_src s ON t.id = s.sid
          |WHEN NOT MATCHED BY SOURCE AND s.sprice > 0 THEN DELETE
          |""".stripMargin))
      assert(e.getMessage.contains("only the target"), e.getMessage)
    } finally armed.sql("DROP TABLE IF EXISTS dml_full_t")
  }

  test("INSERT OVERWRITE a partitioned table refuses under dynamic " +
      "partitionOverwriteMode (whole-table truncation is not what dynamic asks)") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write(Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "p"),
      path, partitionBy = Seq("p"))
    armed.sql("DROP TABLE IF EXISTS dml_ovw_t")
    armed.sql(s"CREATE TABLE dml_ovw_t USING `portable-delta` OPTIONS (path '$path')")
    val prev = armed.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try {
      armed.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      val e = intercept[Exception](armed.sql(
        "INSERT OVERWRITE dml_ovw_t SELECT 9L AS id, 'a' AS p"))
      assert(e.getMessage.contains("partitionOverwriteMode") &&
        e.getMessage.contains("truncate"), e.getMessage)
      assert(PortableDelta.readTable(spark, path).count() == 3L,
        "the refusal must not commit anything")
      // static mode keeps the documented whole-table overwrite
      armed.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      armed.sql("INSERT OVERWRITE dml_ovw_t SELECT 9L AS id, 'a' AS p")
      val got = PortableDelta.readTable(spark, path).collect()
      assert(got.length == 1 && got(0).getLong(0) == 9L)
    } finally {
      armed.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
      armed.sql("DROP TABLE IF EXISTS dml_ovw_t")
    }
  }

  test("portable_delta_changes TVF: the change feed through plain SQL, " +
      "distributed (no LocalRelation) and ≡ readChanges") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write(Seq((1L, "a"), (2L, "b")).toDF("id", "b"), path,
      properties = Map(PortableDelta.CdfProp -> "true"))          // v0
    PortableDelta.write(Seq((3L, "c")).toDF("id", "b"), path,
      mode = "append")                                            // v1
    PortableDelta.delete(spark, path, col("id") === 1L)           // v2
    val q = armed.sql(
      s"SELECT id, b, _change_type, _commit_version FROM " +
        s"portable_delta_changes('$path', 1, 2) ORDER BY _commit_version, id")
    // distributed: the TVF returns the analyzed readChanges plan, not a
    // collected LocalRelation
    assert(!q.queryExecution.analyzed.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
      "the feed must stay a distributed plan")
    val got = q.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq((3L, "c", "insert", 1L), (1L, "a", "delete", 2L)),
      s"got $got")
    // value parity with the Scala API
    val api = PortableDelta.readChanges(spark, path, 1L, 2L)
      .select(col("id"), col("b"), col("_change_type"), col("_commit_version"))
      .orderBy(col("_commit_version"), col("id")).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == api)
    // timestamp-bounded form resolves through the commit history
    val hist = PortableDelta.history(
      spark.sessionState.newHadoopConf(), path).sortBy(_._1)
    val (t1, t2) = (hist.find(_._1 == 1L).get._3, hist.find(_._1 == 2L).get._3)
    val gotTs = armed.sql(
      s"SELECT count(*) FROM portable_delta_changes('$path', '$t1', '$t2')")
      .head().getLong(0)
    assert(gotTs == 2L, s"timestamp bounds must cover v1..v2: $gotTs")
    // a non-literal argument refuses by name
    val e = intercept[Exception](armed.sql(
      s"SELECT * FROM portable_delta_changes(concat('a','b'), 0, 1)"))
    assert(e.getMessage.contains("literal") ||
      Option(e.getCause).exists(_.getMessage.contains("literal")), e.getMessage)
  }

  test("MERGE star actions: UPDATE SET * / INSERT * expand by name and route") {
    val path = mkTable(6L)
    table(path, "dml_star_t")
    try {
      // star expansion needs name-aligned source columns
      armed.createDataFrame(Seq((2L, "two!", 222.0), (60L, "sixty", 600.0)))
        .toDF("id", "body", "price").createOrReplaceTempView("dml_star_src")
      val r = armed.sql(
        """MERGE INTO dml_star_t t USING dml_star_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head()
      assert(r.getLong(1) == 1L && r.getLong(3) == 1L,
        s"(affected, updated, deleted, inserted) = $r")
      val byId = PortableDelta.readTable(spark, path).collect()
        .map(x => x.getLong(0) -> ((x.getString(1), x.getDouble(2)))).toMap
      assert(byId(2L) == (("two!", 222.0)) && byId(60L) == (("sixty", 600.0)) &&
        byId.size == 7, s"got $byId")
    } finally armed.sql("DROP TABLE IF EXISTS dml_star_t")
  }

  test("refusals by name; extension-less sessions keep Spark's v2-only error") {
    val path = mkTable()
    table(path, "dml_ref_t")
    try {
      // subquery condition
      val e1 = intercept[Exception](armed.sql(
        "DELETE FROM dml_ref_t WHERE id IN (SELECT id FROM dml_ref_t WHERE id < 3)"))
      assert(e1.getMessage.contains("subqueries are not supported"), e1.getMessage)
      // non-equi merge condition
      armed.createDataFrame(Seq(Tuple1(1L))).toDF("sid")
        .createOrReplaceTempView("dml_ref_src")
      val e2 = intercept[Exception](armed.sql(
        """MERGE INTO dml_ref_t t USING dml_ref_src s ON t.id >= s.sid
          |WHEN MATCHED THEN DELETE""".stripMargin))
      assert(e2.getMessage.contains("not target-col = source-col"), e2.getMessage)
      // the table is untouched by the refusals
      assert(PortableDelta.readTable(spark, path).count() == 40L)
      // the unarmed shared session refuses DELETE with the stock
      // analysis error (the rewrite is extension-scoped)
      spark.sql("DROP TABLE IF EXISTS dml_ref_plain")
      spark.sql(s"CREATE TABLE dml_ref_plain USING `portable-delta` OPTIONS (path '$path')")
      try {
        val e3 = intercept[Exception](
          spark.sql("DELETE FROM dml_ref_plain WHERE id = 1"))
        assert(Option(e3.getMessage).exists(m =>
          m.toLowerCase.contains("delete") || m.contains("v2")), e3.getMessage)
        assert(PortableDelta.readTable(spark, path).count() == 40L)
      } finally spark.sql("DROP TABLE IF EXISTS dml_ref_plain")
    } finally armed.sql("DROP TABLE IF EXISTS dml_ref_t")
  }
}
