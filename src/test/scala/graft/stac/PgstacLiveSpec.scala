package graft.stac

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S5/S6/J1 over a LIVE JDBC connection (reference:
  * `tests/test_pgstac_reader.py:70-173`, which runs real Postgres in
  * Docker). No Postgres exists in this environment, so DuckDB's JDBC
  * driver stands in: the same `items` / `collections` table shapes are
  * loaded into a DuckDB file and `PgstacReader.readItems` executes its
  * real partitioned-JDBC path against it — SQL assembly, WHERE pushdown,
  * datetime range partitioning, and broadcast hydration all run for real
  * instead of being string-pinned.
  *
  * Tests self-skip (ScalaTest `assume`) if no DuckDB JDBC driver jar was
  * found by the build.
  */
class PgstacLiveSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def driverPresent: Boolean =
    try { Class.forName("org.duckdb.DuckDBDriver"); true }
    catch { case _: ClassNotFoundException => false }

  /** One DuckDB database file with 6 items across 2 collections plus the
    * per-collection base items (the pgstac `collection_base_item` shape). */
  private lazy val dbPath: String = {
    val path = java.nio.file.Files.createTempDirectory("pgstac").resolve("pg.db").toString
    val conn = java.sql.DriverManager.getConnection(s"jdbc:duckdb:$path")
    val st = conn.createStatement()
    st.execute("""CREATE TABLE items (
      id VARCHAR, geometry VARCHAR, collection VARCHAR,
      datetime TIMESTAMP, end_datetime TIMESTAMP, content VARCHAR)""")
    st.execute("""INSERT INTO items VALUES
      ('i1','0101000000000000000000F03F000000000000F03F','naip',
       TIMESTAMP '2020-01-15 00:00:00', TIMESTAMP '2020-01-15 00:00:00',
       '{"id":"i1","properties":{"datetime":"2020-01-15T00:00:00Z"},"assets":{"image":{"href":"s3://naip/i1.tif"}}}'),
      ('i2','0101000000000000000000004000000000000000C0','naip',
       TIMESTAMP '2020-06-01 00:00:00', TIMESTAMP '2020-06-01 00:00:00',
       '{"id":"i2","properties":{"datetime":"2020-06-01T00:00:00Z"},"assets":{"image":{"href":"s3://naip/i2.tif"}}}'),
      ('i3','010100000000000000000008400000000000001040','naip',
       TIMESTAMP '2021-03-10 00:00:00', TIMESTAMP '2021-03-10 00:00:00',
       '{"id":"i3","properties":{"datetime":"2021-03-10T00:00:00Z"},"assets":{"image":{"href":"s3://naip/i3.tif"}}}'),
      ('i4','0101000000000000000000144000000000000014C0','naip',
       TIMESTAMP '2021-09-20 00:00:00', TIMESTAMP '2021-09-20 00:00:00',
       '{"id":"i4","properties":{"datetime":"2021-09-20T00:00:00Z"},"assets":{"image":{"href":"s3://naip/i4.tif"}}}'),
      ('s1','010100000000000000000018400000000000001840','sentinel',
       TIMESTAMP '2020-02-02 00:00:00', TIMESTAMP '2020-02-02 00:00:00',
       '{"id":"s1","properties":{"datetime":"2020-02-02T00:00:00Z"}}'),
      ('s2','01010000000000000000001C400000000000001C40','sentinel',
       TIMESTAMP '2022-02-02 00:00:00', TIMESTAMP '2022-02-02 00:00:00',
       '{"id":"s2","properties":{"datetime":"2022-02-02T00:00:00Z"}}')""")
    st.execute("""CREATE TABLE collections (collection VARCHAR, base_item VARCHAR)""")
    st.execute("""INSERT INTO collections VALUES
      ('naip','{"type":"Feature","stac_version":"1.0.0","assets":{"image":{"type":"image/tiff","roles":["data"]}}}'),
      ('sentinel','{"type":"Feature","stac_version":"1.0.0"}')""")
    st.close(); conn.close()
    path
  }

  private def url = s"jdbc:duckdb:$dbPath"

  test("readItems executes the items SQL over a real JDBC connection") {
    assume(driverPresent, "no DuckDB JDBC driver jar in the environment")
    val all = PgstacReader.readItems(spark, url)
    assert(all.count() == 6)
    assert(all.columns.toSeq ==
      Seq("id", "geometry", "collection", "datetime", "end_datetime", "content"))
  }

  test("user connection hook: jdbcOptions merge in, configure intercepts last") {
    assume(driverPresent, "no DuckDB JDBC driver jar in the environment")
    // the ref-0.8.1 connection-factory analog: a recording hook sees the
    // fully-assembled reader and may override any option; the read still
    // executes through whatever it returns
    var calls = 0
    val got = PgstacReader.readItems(spark, url,
      jdbcOptions = Map("fetchsize" -> "3"),
      configure = r => { calls += 1; r })
    assert(got.count() == 6)
    assert(calls == 1)
    // configure wins over everything assembled before it (full control)
    val e = intercept[Exception] {
      PgstacReader.readItems(spark, url,
        configure = _.option("url", "jdbc:duckdb:/nonexistent/dir/x.db"))
        .count()
    }
    assert(e != null)
  }

  test("collection + datetime-range filters push down as WHERE over JDBC") {
    assume(driverPresent, "no DuckDB JDBC driver jar in the environment")
    val got = PgstacReader.readItems(spark, url,
      collection = Some("naip"),
      startDatetime = Some("2020-01-01 00:00:00"),
      endDatetime = Some("2021-01-01 00:00:00"))
    assert(got.select("id").collect().map(_.getString(0)).sorted.toSeq == Seq("i1", "i2"))
  }

  test("datetime bounds drive a genuinely partitioned read (one query per slice)") {
    assume(driverPresent, "no DuckDB JDBC driver jar in the environment")
    val got = PgstacReader.readItems(spark, url,
      collection = Some("naip"),
      startDatetime = Some("2020-01-01 00:00:00"),
      endDatetime = Some("2022-01-01 00:00:00"),
      numPartitions = 3)
    assert(got.rdd.getNumPartitions == 3)
    // no row lost or duplicated across the partition slices
    assert(got.select("id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("i1", "i2", "i3", "i4"))
  }

  test("end-to-end: JDBC read -> broadcast hydration merges base_item defaults") {
    assume(driverPresent, "no DuckDB JDBC driver jar in the environment")
    val items = PgstacReader.readItems(spark, url, collection = Some("naip"))
      .select(col("collection"), col("content").as("item"))
    val base = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "collections").load()
    val hydrated = Hydrate.hydrateItems(items, base, itemCol = "item")
      .select(col("item")).collect().map(_.getString(0))
    assert(hydrated.length == 4)
    // the base item contributed type/roles that raw content lacks
    hydrated.foreach { j =>
      assert(j.contains("\"stac_version\":\"1.0.0\""))
      assert(j.contains("\"type\":\"image/tiff\""))
      assert(j.contains("\"roles\":[\"data\"]"))
    }
    // per-item fields survived the merge
    assert(hydrated.exists(_.contains("s3://naip/i1.tif")))
  }

  /** Map the pinned Postgres partitions SQL onto DuckDB: range accessors
    * become 2-element-list indexing, to_char→strftime, format→printf, the
    * interval-string epsilon → INTERVAL syntax. The STATEMENT SHAPE —
    * filename CASE, dtrange-vs-partition_dtrange distinction, watermark,
    * ordering — executes unchanged. */
  private def duckPartitionsSql(updatedAfter: Option[String]): String =
    PgstacReader.partitionsSql(updatedAfter)
      .replace("lower(partition_dtrange)", "partition_dtrange[1]")
      .replace("upper(partition_dtrange)", "partition_dtrange[2]")
      .replace("lower(dtrange)", "dtrange[1]")
      .replace("upper(dtrange)", "dtrange[2]")
      .replace("to_char(", "strftime(")
      .replace("'YYYYMMDD'", "'%Y%m%d'")
      .replace("format('items_", "printf('items_")
      .replace("+ '.000001 seconds'", "+ INTERVAL 1 MICROSECOND")

  /** The pgstac partitions_view CONTRACT (one row per partition: its
    * constraint range, its actual data range, a last_updated watermark),
    * emulated over the live database: naip has two yearly partitions —
    * only one touched after the watermark — and sentinel a single
    * unbounded partition (the '-infinity'/'infinity' filename branch). */
  private def createPartitionsView(): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("""CREATE OR REPLACE VIEW partitions_view AS
      SELECT * FROM (VALUES
        ('naip',
         ['2020-01-01 00:00:00'::TIMESTAMP, '2021-01-01 00:00:00'::TIMESTAMP],
         ['2020-01-15 00:00:00'::TIMESTAMP, '2020-06-01 00:00:00'::TIMESTAMP],
         TIMESTAMP '2024-05-02 00:00:00'),
        ('naip',
         ['2021-01-01 00:00:00'::TIMESTAMP, '2022-01-01 00:00:00'::TIMESTAMP],
         ['2021-03-10 00:00:00'::TIMESTAMP, '2021-09-20 00:00:00'::TIMESTAMP],
         TIMESTAMP '2024-04-01 00:00:00'),
        ('sentinel',
         ['-infinity'::TIMESTAMP, 'infinity'::TIMESTAMP],
         ['2020-02-02 00:00:00'::TIMESTAMP, '2022-02-02 00:00:00'::TIMESTAMP],
         TIMESTAMP '2024-06-01 00:00:00')
      ) v(collection, partition_dtrange, dtrange, last_updated)""")
    st.close(); conn.close()
  }

  /** A minimal `search_query()`-equivalent vendored into the stand-in
    * (the partitions_view approach applied to F2): a table macro that
    * interprets the CQL2 JSON argument server-side — `=` on
    * collection/id and `t_after` on datetime, enough to prove the
    * DELEGATED subquery (`FROM search_query('…') JOIN items`) executes
    * as SQL rather than being string-pinned. pgstac's real function
    * covers full CQL2; the wire contract (filter JSON in, matching ids
    * out, join back to items) is identical. */
  private def createSearchFunction(): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    // leaf evaluator (scalar macro) + the table macro: one level of
    // `and` composes two leaves, enough to cross-check the delegated
    // path against the native Cql2.filter evaluation of the same AST
    st.execute("""CREATE OR REPLACE MACRO cql2_leaf(f, id_, coll, dt) AS
      CASE json_extract_string(f, '$.op')
        WHEN '=' THEN
          CASE json_extract_string(f, '$.args[0].property')
            WHEN 'collection' THEN coll = json_extract_string(f, '$.args[1]')
            WHEN 'id' THEN id_ = json_extract_string(f, '$.args[1]')
            ELSE FALSE END
        WHEN 't_after' THEN
          dt > CAST(json_extract_string(f, '$.args[1]') AS TIMESTAMP)
        ELSE FALSE END""")
    st.execute("""CREATE OR REPLACE MACRO search_query(f) AS TABLE
      SELECT id FROM items
      WHERE CASE json_extract_string(f, '$.op')
        WHEN 'and' THEN
          cql2_leaf(CAST(json_extract(f, '$.args[0]') AS VARCHAR),
                    id, collection, datetime)
          AND cql2_leaf(CAST(json_extract(f, '$.args[1]') AS VARCHAR),
                        id, collection, datetime)
        ELSE cql2_leaf(f, id, collection, datetime) END""")
    st.close(); conn.close()
  }

  test("CQL2 filter delegates to a live search_query() function (F2 through S5)") {
    assume(driverPresent, "no DuckDB JDBC driver jar in the environment")
    createSearchFunction()
    val eq = """{"op":"=","args":[{"property":"collection"},"naip"]}"""
    val got = PgstacReader.readItems(spark, url, cql2Json = Some(eq))
    assert(got.select("id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("i1", "i2", "i3", "i4"))
    // full item columns ride back through the join, not just ids
    assert(got.columns.toSeq ==
      Seq("id", "geometry", "collection", "datetime", "end_datetime", "content"))
    val after = """{"op":"t_after","args":[{"property":"datetime"},"2021-01-01T00:00:00"]}"""
    assert(PgstacReader.readItems(spark, url, cql2Json = Some(after))
      .select("id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("i3", "i4", "s2"))
    // delegation composes with the partitioned-scan machinery: datetime
    // bounds still split the delegated subquery into range slices
    val sliced = PgstacReader.readItems(spark, url, cql2Json = Some(eq),
      startDatetime = Some("2020-01-01 00:00:00"),
      endDatetime = Some("2022-01-01 00:00:00"), numPartitions = 2)
    assert(sliced.rdd.getNumPartitions == 2)
    assert(sliced.select("id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("i1", "i2", "i3", "i4"))
  }

  test("delegated search_query() hash-matches the native Cql2.filter " +
       "evaluation of the same AST") {
    assume(driverPresent, "no DuckDB JDBC driver jar in the environment")
    createSearchFunction()
    // the same CQL2 JSON evaluated two ways: (a) DELEGATED — the server's
    // search_query() interprets the filter and the matching ids join back
    // to items (the reference's pgstac path); (b) NATIVE — Cql2.filter
    // translates the AST to Catalyst over the unfiltered JDBC read. A
    // divergence in either interpreter fails BY VALUE, not by row count.
    def values(df: org.apache.spark.sql.DataFrame): Seq[(String, String, String, String)] =
      df.selectExpr("id", "collection", "CAST(datetime AS STRING)", "content")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
        .sortBy(_._1).toSeq
    val asts = Seq(
      """{"op":"=","args":[{"property":"collection"},"naip"]}""",
      """{"op":"t_after","args":[{"property":"datetime"},{"timestamp":"2020-07-01T00:00:00Z"}]}""",
      """{"op":"and","args":[
        |  {"op":"=","args":[{"property":"collection"},"naip"]},
        |  {"op":"t_after","args":[{"property":"datetime"},{"timestamp":"2020-07-01T00:00:00Z"}]}
        |]}""".stripMargin)
    // the fake's t_after leaf takes a bare timestamp string; the native
    // side parses the full {"timestamp": ...} operand — normalize the
    // delegated copy to what the stand-in macro consumes
    def delegatedForm(ast: String): String =
      ast.replace("""{"timestamp":"2020-07-01T00:00:00Z"}""",
        "\"2020-07-01 00:00:00\"")
    for (ast <- asts) {
      val delegated = values(
        PgstacReader.readItems(spark, url, cql2Json = Some(delegatedForm(ast))))
      val native = values(
        PgstacReader.readItems(spark, url).filter(Cql2.filter(ast)))
      assert(delegated.nonEmpty,
        s"degenerate cross-check (no rows) for $ast")
      assert(delegated == native,
        s"delegated vs native divergence for $ast:\n  " +
          s"delegated=$delegated\n  native=$native")
    }
  }

  test("partitions sync query runs the pinned statement on a live connection") {
    assume(driverPresent, "no DuckDB JDBC driver jar in the environment")
    createPartitionsView()
    val parts = spark.read.format("jdbc").option("url", url)
      .option("dbtable", s"(${duckPartitionsSql(Some("2024-05-01 00:00:00"))}) p").load()
      .collect()
    // the stale naip partition is filtered by the watermark; ordering is
    // last_updated asc; filenames take the YYYYMMDD vs unbounded branches
    assert(parts.map(_.getAs[String]("partition")).toSeq ==
      Seq("items_20200101_20210101.parquet", "items.parquet"))
    assert(parts.map(_.getAs[String]("collection")).toSeq == Seq("naip", "sentinel"))
    // the read-slice end is the DATA range upper + 1µs (not the constraint
    // range), so an item AT the inclusive upper bound survives exclusive <
    assert(parts.head.getAs[java.sql.Timestamp]("end").toString == "2020-06-01 00:00:00.000001")
  }

  test("end-to-end incremental sync: changed partitions -> sliced reads -> per-partition files") {
    assume(driverPresent, "no DuckDB JDBC driver jar in the environment")
    createPartitionsView()
    val outDir = java.nio.file.Files.createTempDirectory("pgsync").toString
    val parts = spark.read.format("jdbc").option("url", url)
      .option("dbtable", s"(${duckPartitionsSql(Some("2024-05-01 00:00:00"))}) p").load()
      .collect()
    val written = parts.map { p =>
      val coll = p.getAs[String]("collection")
      val slice = PgstacReader.readItems(spark, url,
        collection = Some(coll),
        startDatetime = Some(p.getAs[java.sql.Timestamp]("start").toString),
        endDatetime = Some(p.getAs[java.sql.Timestamp]("end").toString),
        numPartitions = 2)
      val path = s"$outDir/$coll/${p.getAs[String]("partition")}"
      slice.write.mode("overwrite").parquet(path)
      path
    }
    assert(written.toSeq == Seq(
      s"$outDir/naip/items_20200101_20210101.parquet",
      s"$outDir/sentinel/items.parquet"))
    // naip: i1 and i2 — i2 sits exactly AT upper(dtrange); without the 1µs
    // epsilon the exclusive `datetime <` in the items query would drop it.
    // The stale 2021 naip partition (i3, i4) was not reprocessed.
    assert(spark.read.parquet(written(0)).select("id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("i1", "i2"))
    assert(spark.read.parquet(written(1)).select("id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("s1", "s2"))
  }

  test("named-cursor chunking: the read drains batch-wise at the declared fetchsize") {
    assume(driverPresent, "no DuckDB JDBC driver jar in the environment")
    // The reference streams items through a server-side named cursor
    // fetching itersize=10000 rows per round trip (pgstac_reader.py:163).
    // The JDBC analog is statement fetchSize: this leg interposes a
    // recording proxy driver between Spark and the stand-in database and
    // asserts (a) the fetchsize reaches the statement BEFORE execution,
    // (b) the result drains through ceil(rows / fetchsize) simulated
    // round trips — i.e. batch-wise cursor paging, not one row-at-a-time
    // re-query and not an unbounded single slurp the server must buffer.
    FetchRecordingDriver.ensureRegistered()
    FetchRecordingDriver.clear()
    val got = PgstacReader.readItems(spark, s"jdbc:graftrec:$dbPath", fetchsize = 2)
    assert(got.count() == 6)
    val dataRecs = FetchRecordingDriver.finished.filter(_.rows > 0)
    assert(dataRecs.nonEmpty, "the recording proxy saw no data query")
    val items = dataRecs.filter(_.sql.contains("FROM items"))
    assert(items.nonEmpty, s"no items query recorded: ${dataRecs.map(_.sql)}")
    items.foreach { r =>
      assert(r.fetchSize == 2,
        s"fetchsize must be set on the statement before execute, got ${r.fetchSize}")
      assert(r.rows == 6)
      assert(r.batches == 3, // ceil(6 rows / fetchsize 2)
        s"expected 3 fetch round-trips for 6 rows at fetchsize 2, got ${r.batches}")
    }
    // and the DEFAULT path pins the reference's itersize contract
    FetchRecordingDriver.clear()
    PgstacReader.readItems(spark, s"jdbc:graftrec:$dbPath").count()
    val dflt = FetchRecordingDriver.finished.filter(r => r.rows > 0 && r.sql.contains("FROM items"))
    assert(dflt.nonEmpty && dflt.forall(_.fetchSize == 10000),
      s"default fetchsize must be the reference's itersize=10000: ${dflt.map(_.fetchSize)}")
    assert(dflt.forall(_.batches == 1), "6 rows fit one 10000-row fetch")
  }

  test("named-cursor protocol: DECLARE/FETCH/CLOSE ordering against a scripted server") {
    assume(driverPresent, "no DuckDB JDBC driver jar in the environment")
    // The fetchsize leg above pins ACCOUNTING; this pins the WIRE-LEVEL
    // statement sequence the reference's psycopg named cursor issues
    // (pgstac_reader.py:200-209): txn open, DECLARE before any FETCH,
    // FETCH FORWARD <itersize> batches until a short batch, CLOSE after
    // the last FETCH, COMMIT last. The fake IMPLEMENTS the cursor verbs
    // (DuckDB has none), so a reader that skipped DECLARE, fetched past
    // CLOSE, or ran outside a transaction would fail here, not in prod.
    CursorFakeDriver.ensureRegistered()
    CursorFakeDriver.clear()
    val ids = PgstacReader.cursorDrain(
      s"${CursorFakeDriver.Prefix}$dbPath",
      "SELECT id FROM items ORDER BY id", itersize = 2)(_.getString(1))
    assert(ids == Vector("i1", "i2", "i3", "i4", "s1", "s2"))
    val ev = CursorFakeDriver.events
    // exact sequence: 6 rows at itersize 2 = 3 full batches + 1 dry probe
    assert(ev == Seq(
      "AUTOCOMMIT(false)",
      "DECLARE graft_items",
      "FETCH 2 graft_items -> 2",
      "FETCH 2 graft_items -> 2",
      "FETCH 2 graft_items -> 2",
      "FETCH 2 graft_items -> 0",
      "CLOSE graft_items",
      "COMMIT",
      "AUTOCOMMIT(true)"), s"wire sequence drifted: $ev")
    // a non-multiple row count ends on the short batch, no dry probe
    CursorFakeDriver.clear()
    val four = PgstacReader.cursorDrain(
      s"${CursorFakeDriver.Prefix}$dbPath",
      "SELECT id FROM items WHERE collection = 'naip' ORDER BY id",
      itersize = 3)(_.getString(1))
    assert(four.size == 4)
    assert(CursorFakeDriver.events.count(_.startsWith("FETCH")) == 2,
      s"3+1 rows at itersize 3 is exactly two FETCHes: ${CursorFakeDriver.events}")
    // the scripted server REFUSES protocol violations the way Postgres
    // would: FETCH without DECLARE, and DECLARE outside a transaction
    val conn = java.sql.DriverManager.getConnection(s"${CursorFakeDriver.Prefix}$dbPath")
    try {
      val st = conn.createStatement()
      val e1 = intercept[java.sql.SQLException] {
        st.executeQuery("""FETCH FORWARD 2 FROM "nope"""")
      }
      assert(e1.getMessage.contains("does not exist"))
      val e2 = intercept[java.sql.SQLException] {
        st.execute("""DECLARE "c" NO SCROLL CURSOR FOR SELECT 1""")
      }
      assert(e2.getMessage.contains("transaction"),
        "DECLARE outside a transaction must refuse like Postgres does")
    } finally conn.close()
  }
  // ------------------------------------------------------------------
  // VERDICT r15 #8: delegation ≡ native across a FUZZED operator sample.
  // The three hand-written cross-check ASTs above pin the wire contract;
  // this leg widens it: ~50 generated CQL2 ASTs (Cql2FuzzSpec's
  // structural-pairing discipline — each AST is built TOGETHER with an
  // independent DuckDB SQL rendering) run through the DELEGATED path
  // (search_query() recreated per AST from the independent rendering,
  // executed server-side, ids joined back by readItems) and the NATIVE
  // path (Cql2.filter over the unfiltered JDBC read). Any drift between
  // the engine's CQL2 interpretation and a second implementation of the
  // spec — through the real wire — fails by VALUE.

  /** A richer items DB for the fuzz leg: 40 rows, NULL datetimes and
    * contents sprinkled, accented/mixed-case collections, day-grid
    * datetimes so boundary equalities occur. Round 17: geometry is a
    * real GeoJSON POINT at (i%10, i/10) — derivable from the id, so the
    * spatial generator's DuckDB rendering stays INDEPENDENT of the
    * engine's geometry code (id arithmetic, never WKB). */
  private lazy val fuzzDbPath: String = {
    val path = java.nio.file.Files.createTempDirectory("pgstacfz")
      .resolve("pg.db").toString
    val conn = java.sql.DriverManager.getConnection(s"jdbc:duckdb:$path")
    val st = conn.createStatement()
    st.execute("""CREATE TABLE items (
      id VARCHAR, geometry VARCHAR, collection VARCHAR,
      datetime TIMESTAMP, end_datetime TIMESTAMP, content VARCHAR)""")
    val colls = Vector("naip", "NAIP", "café", "CAFE", "sentinel")
    val rows = (0 until 40).map { i =>
      val coll = colls(i % colls.length)
      val dt =
        if (i % 13 == 5) "NULL"
        else f"TIMESTAMP '2020-${1 + i % 12}%02d-${1 + (i * 3) % 28}%02d 0${i % 10}:00:00'"
      val edt =
        if (i % 13 == 5) "NULL"
        else f"TIMESTAMP '2020-${1 + i % 12}%02d-${1 + (i * 3) % 28 + (i % 2)}%02d 0${i % 10}:00:00'"
      val content = if (i % 8 == 6) "NULL" else s"'{\"n\":$i}'"
      val geom = s"""'{"type":"Point","coordinates":[${i % 10},${i / 10}]}'"""
      f"('z$i%02d', $geom, '$coll', $dt, $edt, $content)"
    }
    st.execute("INSERT INTO items VALUES " + rows.mkString(","))
    st.close(); conn.close()
    path
  }
  private def fuzzUrl = s"jdbc:duckdb:$fuzzDbPath"

  test("delegated search_query() ≡ native Cql2.filter over ~80 fuzzed ASTs " +
      "(string/temporal/spatial/arithmetic classes through the real wire)") {
    assume(driverPresent, "no DuckDB JDBC driver jar in the environment")
    import org.scalacheck.{Gen, rng}
    def jq(x: String) = "\"" + x.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\""
    def sq(x: String) = "'" + x.replace("'", "''") + "'"
    type P = (String, String) // (cql2Json, duckdbSql) built TOGETHER
    val collPool = Vector("naip", "NAIP", "café", "CAFE", "sentinel", "nope")
    val genColl: Gen[P] = for {
      lit <- Gen.oneOf(collPool)
      (cop, sop) <- Gen.oneOf(Seq("=" -> "=", "<>" -> "<>"))
      wrap <- Gen.oneOf("none", "casei", "accenti")
    } yield wrap match {
      case "none" =>
        (s"""{"op":"$cop","args":[{"property":"collection"},${jq(lit)}]}""",
          s"(collection $sop ${sq(lit)})")
      case "casei" =>
        (s"""{"op":"$cop","args":[{"op":"casei","args":[{"property":"collection"}]},${jq(lit.toLowerCase)}]}""",
          s"(lower(collection) $sop ${sq(lit.toLowerCase)})")
      case _ =>
        (s"""{"op":"$cop","args":[{"op":"accenti","args":[{"property":"collection"}]},${jq(lit)}]}""",
          s"(strip_accents(collection) $sop ${sq(lit)})")
    }
    val genIdLike: Gen[P] = for {
      pat <- Gen.oneOf("z0%", "z1%", "%5", "z_2", "z2_", "%9%")
    } yield (s"""{"op":"like","args":[{"property":"id"},${jq(pat)}]}""",
      s"(id LIKE ${sq(pat)})")
    val genIdIn: Gen[P] = for {
      n <- Gen.choose(1, 4)
      ids <- Gen.listOfN(n, Gen.choose(0, 45).map(i => f"z$i%02d"))
    } yield (s"""{"op":"in","args":[{"property":"id"},[${ids.map(jq).mkString(",")}]]}""",
      s"(id IN (${ids.map(sq).mkString(",")}))")
    val genTsLit: Gen[String] = for {
      m <- Gen.choose(1, 12); d <- Gen.choose(1, 28); h <- Gen.choose(0, 9)
    } yield f"2020-$m%02d-$d%02d 0$h:00:00"
    val genDt: Gen[P] = for {
      (cop, sop) <- Gen.oneOf(Seq("=" -> "=", "<" -> "<", "<=" -> "<=",
        ">" -> ">", ">=" -> ">="))
      prop <- Gen.oneOf("datetime", "end_datetime")
      ts <- genTsLit
    } yield (s"""{"op":"$cop","args":[{"property":"$prop"},{"timestamp":${jq(ts.replace(' ', 'T'))}}]}""",
      s"($prop $sop TIMESTAMP ${sq(ts)})")
    val genTemporal: Gen[P] = for {
      (cop, sop) <- Gen.oneOf(Seq("t_after" -> ">", "t_before" -> "<"))
      ts <- genTsLit
    } yield (s"""{"op":"$cop","args":[{"property":"datetime"},{"timestamp":${jq(ts.replace(' ', 'T'))}}]}""",
      s"(datetime $sop TIMESTAMP ${sq(ts)})")
    val genNullChk: Gen[P] = Gen.oneOf(
      ("""{"op":"isNull","args":[{"property":"content"}]}""",
        "(content IS NULL)"),
      ("""{"op":"not","args":[{"op":"isNull","args":[{"property":"datetime"}]}]}""",
        "(NOT (datetime IS NULL))"))
    // ---- round-17 widening: spatial envelopes + arithmetic terms ----
    // geometry is POINT(i%10, i/10); the independent rendering is pure
    // id arithmetic (DuckDB never parses geometry). Closed-boundary
    // semantics on both sides: JTS intersects includes the boundary,
    // BETWEEN is closed.
    val px = "(CAST(substr(id, 2) AS INT) % 10)"
    val py = "(CAST(substr(id, 2) AS INT) // 10)"
    val genSpatial: Gen[P] = for {
      x1 <- Gen.choose(-1, 8); dx <- Gen.choose(1, 6)
      y1 <- Gen.choose(-1, 2); dy <- Gen.choose(1, 3)
      prop <- Gen.oneOf("geometry", "bbox")
      neg <- Gen.oneOf(false, true)
    } yield {
      val (x2, y2) = (x1 + dx, y1 + dy)
      val poly = s"""{"type":"Polygon","coordinates":[[[$x1,$y1],[$x2,$y1],""" +
        s"""[$x2,$y2],[$x1,$y2],[$x1,$y1]]]}"""
      val inRect = s"($px BETWEEN $x1 AND $x2 AND $py BETWEEN $y1 AND $y2)"
      if (neg)
        (s"""{"op":"s_disjoint","args":[{"property":"$prop"},$poly]}""",
          s"(NOT $inRect)")
      else
        (s"""{"op":"s_intersects","args":[{"property":"$prop"},$poly]}""",
          inRect)
    }
    // the promoted numeric property `n` (P1: content properties surface
    // top-level after normalize) — rendered from content-nullness + id
    // arithmetic, never the engine's JSON extraction. div renders as
    // DuckDB's floor-division `//` (≡ truncation for the non-negative
    // domain here); ^ as pow() — exact doubles at these magnitudes.
    val nSql = "(CASE WHEN content IS NULL THEN NULL " +
      "ELSE CAST(substr(id, 2) AS INT) END)"
    val genArith: Gen[P] = for {
      (aJson, aSql) <- Gen.oneOf(
        (s"""{"op":"%","args":[{"property":"n"},7]}""", s"($nSql % 7)"),
        (s"""{"op":"+","args":[{"op":"*","args":[{"property":"n"},2]},3]}""",
          s"(($nSql * 2) + 3)"),
        (s"""{"op":"-","args":[{"property":"n"},20]}""", s"($nSql - 20)"),
        (s"""{"op":"div","args":[{"property":"n"},4]}""", s"($nSql // 4)"),
        (s"""{"op":"^","args":[{"property":"n"},2]}""", s"pow($nSql, 2)"))
      (cop, sop) <- Gen.oneOf(Seq(">" -> ">", "<=" -> "<=", "=" -> "="))
      k <- Gen.choose(0, 40)
    } yield (s"""{"op":"$cop","args":[$aJson,$k]}""", s"($aSql $sop $k)")
    val genLeaf: Gen[P] = Gen.frequency(3 -> genColl, 2 -> genDt,
      2 -> genTemporal, 1 -> genIdLike, 1 -> genIdIn, 1 -> genNullChk,
      2 -> genSpatial, 2 -> genArith)
    def genPred(depth: Int): Gen[P] =
      if (depth <= 0) genLeaf
      else Gen.frequency(
        2 -> genLeaf,
        2 -> (for { a <- genPred(depth - 1); b <- genPred(depth - 1) }
          yield (s"""{"op":"and","args":[${a._1},${b._1}]}""",
            s"(${a._2} AND ${b._2})")),
        2 -> (for { a <- genPred(depth - 1); b <- genPred(depth - 1) }
          yield (s"""{"op":"or","args":[${a._1},${b._1}]}""",
            s"(${a._2} OR ${b._2})")),
        1 -> genPred(depth - 1).map(a =>
          (s"""{"op":"not","args":[${a._1}]}""", s"(NOT ${a._2})")))
    val asts: Seq[P] = (0 until 80).flatMap(i =>
      genPred(2).apply(Gen.Parameters.default, rng.Seed(1000L + i)))

    def values(df: org.apache.spark.sql.DataFrame): Seq[(String, String, String, String)] =
      df.selectExpr("id", "collection", "CAST(datetime AS STRING)",
        "coalesce(content, '<null>')")
        .collect()
        .map(r => (r.getString(0), r.getString(1),
          Option(r.getString(2)).getOrElse("<null>"), r.getString(3)))
        .sortBy(_._1).toSeq
    // the NATIVE side evaluates over the NORMALIZED item shape the
    // production pipeline produces: GeoJSON → ISO WKB + bbox struct
    // (G1/G4) and content properties promoted top-level (P1's `n`) —
    // spatial and arithmetic CQL2 classes address exactly those columns
    val toWkbU = org.apache.spark.sql.functions.udf((g: String) =>
      if (g == null) null else Wkb.geoJsonToWkb(g))
    val bboxU = org.apache.spark.sql.functions.udf((g: String) =>
      if (g == null) None
      else Wkb.bounds(Wkb.geoJsonToWkb(g)).map(t => FuzzBbox(t._1, t._2, t._3, t._4)))
    val native0 = PgstacReader.readItems(spark, fuzzUrl)
      .withColumn("bbox", bboxU(org.apache.spark.sql.functions.col("geometry")))
      .withColumn("geometry", toWkbU(org.apache.spark.sql.functions.col("geometry")))
      .withColumn("n", org.apache.spark.sql.functions
        .get_json_object(org.apache.spark.sql.functions.col("content"), "$.n")
        .cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var nonEmpty = 0
      asts.foreach { case (json, sql) =>
        // the INDEPENDENT rendering becomes the server's interpreter —
        // the wire contract (subquery runs server-side, ids join back)
        // is exactly the production delegation path
        val conn = java.sql.DriverManager.getConnection(fuzzUrl)
        try {
          val st = conn.createStatement()
          st.execute("CREATE OR REPLACE MACRO search_query(f) AS TABLE " +
            s"SELECT id FROM items WHERE $sql")
          st.close()
        } finally conn.close()
        val delegated = values(
          PgstacReader.readItems(spark, fuzzUrl, cql2Json = Some(json)))
        val native = values(native0.filter(Cql2.filter(json)))
        assert(delegated == native,
          s"delegated vs native divergence for $json\n  sql=$sql\n  " +
            s"delegated=${delegated.take(5)}…(${delegated.size})\n  " +
            s"native=${native.take(5)}…(${native.size})")
        if (delegated.nonEmpty) nonEmpty += 1
      }
      assert(nonEmpty >= 15,
        s"degenerate fuzz sample: only $nonEmpty of ${asts.size} ASTs matched rows")
    } finally { native0.unpersist(); () }
  }
}

/** A scripted cursor-protocol JDBC fake (`jdbc:graftcur:<duckdb path>`):
  * IMPLEMENTS Postgres's named-cursor verbs — DECLARE .. CURSOR FOR,
  * FETCH FORWARD n FROM, CLOSE — over a DuckDB backend (which has no
  * cursors), recording the wire-level event sequence and enforcing the
  * server's rules (cursors require a transaction; FETCH/CLOSE of an
  * undeclared cursor is an error). Everything non-cursor passes
  * through. */
object CursorFakeDriver {
  private[stac] val Prefix = "jdbc:graftcur:"
  private val evs = java.util.Collections.synchronizedList(
    new java.util.ArrayList[String]())
  def events: Seq[String] = {
    import scala.jdk.CollectionConverters._
    evs.synchronized { evs.asScala.toList }
  }
  def clear(): Unit = evs.synchronized { evs.clear() }
  private[stac] def record(e: String): Unit = evs.add(e)

  private val registered = new java.util.concurrent.atomic.AtomicBoolean(false)
  def ensureRegistered(): Unit =
    if (registered.compareAndSet(false, true))
      java.sql.DriverManager.registerDriver(new GraftCursorJdbcDriver)

  private val Declare =
    """(?is)\s*DECLARE\s+"?([A-Za-z_][A-Za-z0-9_]*)"?\s+(?:NO\s+SCROLL\s+)?CURSOR\s+FOR\s+(.+)""".r
  private val Fetch =
    """(?is)\s*FETCH\s+FORWARD\s+(\d+)\s+FROM\s+"?([A-Za-z_][A-Za-z0-9_]*)"?\s*""".r
  private val Close =
    """(?is)\s*CLOSE\s+"?([A-Za-z_][A-Za-z0-9_]*)"?\s*""".r

  /** One open cursor: the lazily-executed backing result set. */
  private final class Cursor(val sql: String, conn: java.sql.Connection) {
    private var rs: java.sql.ResultSet = _
    private var st: java.sql.Statement = _
    def resultSet(): java.sql.ResultSet = {
      if (rs == null) { st = conn.createStatement(); rs = st.executeQuery(sql) }
      rs
    }
    def close(): Unit = { if (rs != null) rs.close(); if (st != null) st.close() }
  }

  private[stac] def proxyConn(real: java.sql.Connection): java.sql.Connection = {
    val cursors = new java.util.concurrent.ConcurrentHashMap[String, Cursor]()
    java.lang.reflect.Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.Connection]),
      (proxy, m, args) => m.getName match {
        case "setAutoCommit" =>
          record(s"AUTOCOMMIT(${args(0)})")
          FetchRecordingDriver.invoke(real, m, args)
        case "commit" =>
          record("COMMIT")
          FetchRecordingDriver.invoke(real, m, args)
        case "createStatement" =>
          val st = FetchRecordingDriver.invoke(real, m, args)
            .asInstanceOf[java.sql.Statement]
          proxyStmt(st, real, cursors)
        case "close" =>
          cursors.values().forEach(_.close()); cursors.clear()
          FetchRecordingDriver.invoke(real, m, args)
        case _ => FetchRecordingDriver.invoke(real, m, args)
      }).asInstanceOf[java.sql.Connection]
  }

  private def proxyStmt(real: java.sql.Statement, conn: java.sql.Connection,
                        cursors: java.util.concurrent.ConcurrentHashMap[String, Cursor])
      : java.sql.Statement = {
    def handle(sql: String): Option[AnyRef] = sql match {
      case Declare(name, query) =>
        if (conn.getAutoCommit)
          throw new java.sql.SQLException(
            s"""cursor "$name" requires a transaction (DECLARE CURSOR outside transaction)""")
        cursors.put(name, new Cursor(query, conn))
        record(s"DECLARE $name")
        Some(java.lang.Boolean.FALSE)
      case Close(name) =>
        val c = cursors.remove(name)
        if (c == null) throw new java.sql.SQLException(
          s"""cursor "$name" does not exist""")
        c.close()
        record(s"CLOSE $name")
        Some(java.lang.Boolean.FALSE)
      case Fetch(_, _) => Some(null) // handled in executeQuery
      case _ => None
    }
    def fetchRs(sql: String): java.sql.ResultSet = sql match {
      case Fetch(k, name) =>
        val c = cursors.get(name)
        if (c == null) throw new java.sql.SQLException(
          s"""cursor "$name" does not exist""")
        boundedRs(c.resultSet(), k.toInt, delivered =>
          record(s"FETCH $k $name -> $delivered"))
      case _ => null
    }
    java.lang.reflect.Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.Statement]),
      (_, m, args) => (m.getName, if (args != null && args.nonEmpty)
          args(0) else null) match {
        case ("execute", sql: String)
            if Declare.matches(sql) || Close.matches(sql) || Fetch.matches(sql) =>
          handle(sql).get match {
            case null => java.lang.Boolean.TRUE // FETCH via execute
            case b => b
          }
        case ("executeQuery", sql: String) if Fetch.matches(sql) =>
          fetchRs(sql)
        case ("executeQuery", sql: String)
            if Declare.matches(sql) || Close.matches(sql) =>
          throw new java.sql.SQLException(s"not a query: $sql")
        case _ => FetchRecordingDriver.invoke(real, m, args)
      }).asInstanceOf[java.sql.Statement]
  }

  /** A ResultSet view delivering at most `k` rows of `under` WITHOUT
    * closing it (the server keeps the portal open between FETCHes);
    * reports the delivered count once drained or closed. */
  private def boundedRs(under: java.sql.ResultSet, k: Int,
                        report: Int => Unit): java.sql.ResultSet = {
    var n = 0
    var reported = false
    def done(): Unit = if (!reported) { reported = true; report(n) }
    java.lang.reflect.Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.ResultSet]),
      (_, m, args) => m.getName match {
        case "next" =>
          if (n >= k) { done(); java.lang.Boolean.FALSE }
          else {
            val has = FetchRecordingDriver.invoke(under, m, args)
            if (has == java.lang.Boolean.TRUE) { n += 1; has }
            else { done(); has }
          }
        case "close" => done(); java.lang.Boolean.FALSE // keep the portal open
        case _ => FetchRecordingDriver.invoke(under, m, args)
      }).asInstanceOf[java.sql.ResultSet]
  }
}

/** Top-level for Spark/JDBC driver resolution (see
  * [[GraftRecordingJdbcDriver]]'s note). */
final class GraftCursorJdbcDriver extends java.sql.Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(CursorFakeDriver.Prefix)
  override def connect(url: String, info: java.util.Properties): java.sql.Connection =
    if (!acceptsURL(url)) null
    else CursorFakeDriver.proxyConn(java.sql.DriverManager.getConnection(
      "jdbc:duckdb:" + url.stripPrefix(CursorFakeDriver.Prefix), info))
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def getPropertyInfo(u: String, i: java.util.Properties): Array[java.sql.DriverPropertyInfo] =
    Array.empty
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger = throw new java.sql.SQLFeatureNotSupportedException()
}

/** A java.sql proxy driver (`jdbc:graftrec:<duckdb path>`) that records
  * per-query fetchSize, row count, and SIMULATED fetch round-trips
  * (a new batch every `fetchSize` rows drained — the named-cursor
  * accounting a real Postgres server would do). Dynamic proxies over the
  * java.sql interfaces; everything else passes through to DuckDB. */
object FetchRecordingDriver {
  final class Rec(val sql: String, val fetchSize: Int) {
    @volatile var rows: Long = 0
    @volatile var batches: Long = 0
  }
  private val recs = java.util.Collections.synchronizedList(
    new java.util.ArrayList[Rec]())
  def finished: Seq[Rec] = {
    import scala.jdk.CollectionConverters._
    recs.synchronized { recs.asScala.toList }
  }
  def clear(): Unit = recs.synchronized { recs.clear() }

  private val registered = new java.util.concurrent.atomic.AtomicBoolean(false)
  def ensureRegistered(): Unit =
    if (registered.compareAndSet(false, true))
      java.sql.DriverManager.registerDriver(new GraftRecordingJdbcDriver)

  private[stac] val Prefix = "jdbc:graftrec:"

  private[stac] def invoke(target: AnyRef, m: java.lang.reflect.Method,
                           args: Array[AnyRef]): AnyRef =
    try { if (args == null) m.invoke(target) else m.invoke(target, args: _*) }
    catch { case e: java.lang.reflect.InvocationTargetException => throw e.getCause }

  private[stac] def proxyConn(real: java.sql.Connection): java.sql.Connection =
    java.lang.reflect.Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.Connection]),
      (_, m, args) => {
        val res = invoke(real, m, args)
        m.getName match {
          case "prepareStatement" =>
            proxyStmt(res.asInstanceOf[java.sql.PreparedStatement],
              classOf[java.sql.PreparedStatement], args(0).asInstanceOf[String])
          case "createStatement" =>
            proxyStmt(res.asInstanceOf[java.sql.Statement],
              classOf[java.sql.Statement], null)
          case _ => res
        }
      }).asInstanceOf[java.sql.Connection]

  private def proxyStmt[T <: java.sql.Statement](real: T, iface: Class[T],
                                                 preparedSql: String): T = {
    val fetchSize = new java.util.concurrent.atomic.AtomicInteger(0)
    java.lang.reflect.Proxy.newProxyInstance(getClass.getClassLoader,
      Array(iface),
      (_, m, args) => {
        if (m.getName == "setFetchSize") fetchSize.set(args(0).asInstanceOf[Integer])
        val res = invoke(real, m, args)
        m.getName match {
          case "executeQuery" =>
            val sql = if (args != null && args.nonEmpty) args(0).asInstanceOf[String]
              else preparedSql
            val rec = new Rec(if (sql == null) "" else sql, fetchSize.get())
            recs.add(rec)
            proxyRs(res.asInstanceOf[java.sql.ResultSet], rec)
          case _ => res
        }
      }).asInstanceOf[T]
  }

  private def proxyRs(real: java.sql.ResultSet, rec: Rec): java.sql.ResultSet =
    java.lang.reflect.Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.ResultSet]),
      (_, m, args) => {
        val res = invoke(real, m, args)
        if (m.getName == "next" && res == java.lang.Boolean.TRUE) {
          // a new simulated server round-trip every fetchSize rows; a
          // fetchSize of 0 means "driver default" = one unbounded slurp
          if (rec.fetchSize > 0 && rec.rows % rec.fetchSize == 0) rec.batches += 1
          else if (rec.fetchSize <= 0 && rec.rows == 0) rec.batches = 1
          rec.rows += 1
        }
        res
      }).asInstanceOf[java.sql.ResultSet]
}

/** Top-level (Spark's DriverRegistry re-registers the driver by its
  * CANONICAL class name, which must equal the binary name — a nested
  * class would not resolve). Delegates all recording to
  * [[FetchRecordingDriver]]. */
final class GraftRecordingJdbcDriver extends java.sql.Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(FetchRecordingDriver.Prefix)
  override def connect(url: String, info: java.util.Properties): java.sql.Connection =
    if (!acceptsURL(url)) null
    else FetchRecordingDriver.proxyConn(java.sql.DriverManager.getConnection(
      "jdbc:duckdb:" + url.stripPrefix(FetchRecordingDriver.Prefix), info))
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def getPropertyInfo(u: String, i: java.util.Properties): Array[java.sql.DriverPropertyInfo] =
    Array.empty
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger = throw new java.sql.SQLFeatureNotSupportedException()
}

/** bbox struct shape of the fuzz leg's normalized native frame
  * (field names are the Cql2 spatial contract: bbox.xmin …). */
case class FuzzBbox(xmin: Double, ymin: Double, xmax: Double, ymax: Double)
