package graft.stac

import org.scalatest.funsuite.AnyFunSuite

/** Pure query-assembly tests for the pgstac path (S5/S6/K6) — a live
  * Postgres is unavailable here (the reference tests use Docker), so the
  * SQL building and partition-file naming are pinned exactly. */
class PgstacReaderSpec extends AnyFunSuite {

  test("items query forms: all / collection / collection+range (pgstac_reader.py:178-199)") {
    assert(PgstacReader.itemsSql() ===
      "SELECT id, geometry, collection, datetime, end_datetime, content FROM items")
    assert(PgstacReader.itemsSql(collection = Some("naip")).endsWith("WHERE collection = 'naip'"))
    val ranged = PgstacReader.itemsSql(Some("naip"), Some("2020-01-01"), Some("2021-01-01"))
    assert(ranged.endsWith(
      "WHERE collection = 'naip' AND datetime >= '2020-01-01' AND datetime < '2021-01-01'"))
  }

  test("CQL2 filter delegates to pgstac search() with quote escaping (F2)") {
    val sql = PgstacReader.itemsSql(cql2Json = Some("""{"op":"=","args":["a","o'b"]}"""))
    assert(sql.contains("search_query("))
    assert(sql.contains("o''b"))
  }

  test("partitions query carries the last_updated watermark and ordering (S6)") {
    val sql = PgstacReader.partitionsSql(Some("2024-05-01T00:00:00Z"))
    assert(sql.contains("WHERE last_updated >= '2024-05-01T00:00:00Z'"))
    assert(sql.trim.endsWith("ORDER BY last_updated asc"))
    assert(PgstacReader.partitionsSql(None).contains("FROM partitions_view ORDER BY"))
  }

  test("partitions query pins the reference SQL semantics (pgstac_reader.py:312-333)") {
    val sql = PgstacReader.partitionsSql(None)
    // filename derives from the partition CONSTRAINT range…
    assert(sql.contains("to_char(lower(partition_dtrange),'YYYYMMDD')"))
    assert(sql.contains("format('items_%s_%s.parquet'"))
    // …with the infinite-bounds collapse to a plain name…
    assert(sql.contains("lower(partition_dtrange) = '-infinity'"))
    assert(sql.contains("'items.parquet'"))
    // …while the read-slice bounds come from the DATA range, end +1µs so
    // the inclusive range bound composes with the items query's exclusive <
    assert(sql.contains("lower(dtrange) AS start"))
    assert(sql.contains("""upper(dtrange) + '.000001 seconds' AS "end""""))
  }

  test("partition file naming matches items_YYYYMMDD_YYYYMMDD (pgstac_reader.py:315-323)") {
    assert(PgstacReader.partitionFileName(Some("2020-01-01T00:00:00Z"), Some("2020-02-01T00:00:00Z"))
      === "items_20200101_20200201.parquet")
    // unbounded partition → the reference's '-infinity'/'infinity' branch
    assert(PgstacReader.partitionFileName(None, None) === "items.parquet")
    assert(PgstacReader.partitionFileName(Some("2020-01-01"), None) === "items.parquet")
  }

  test("syncPartitions: changed-only export, reference layout, idempotent overwrite") {
    import PgstacReader.PgPartition
    val spark = SparkSpec.spark
    val s = spark; import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("psync").toString
    val parts = Seq(
      PgPartition("c1", Some("2020-01-01T00:00:00Z"),
        Some("2020-02-01T00:00:00Z"), "2024-01-01T00:00:00Z"),
      PgPartition("c1", None, None, "2024-03-01T00:00:00Z"),
      PgPartition("c2", Some("2021-01-01T00:00:00Z"),
        Some("2021-02-01T00:00:00Z"), "2024-02-01T00:00:00Z"))
    var reads = 0
    def rp(p: PgPartition) = {
      reads += 1
      Seq((p.collection, p.lastUpdated)).toDF("collection", "lu")
    }
    val st1 = PgstacReader.syncPartitions(spark, parts, None, out, rp)
    assert(st1.exported.sorted == Seq(
      "c1/items.parquet", "c1/items_20200101_20200201.parquet",
      "c2/items_20210101_20210201.parquet"))
    assert(st1.skipped == 0 && reads == 3)
    assert(st1.newWatermark.contains("2024-03-01T00:00:00Z"))
    // incremental pass: only partitions at/after the watermark re-read
    val st2 = PgstacReader.syncPartitions(spark, parts,
      Some("2024-01-15T00:00:00Z"), out, rp)
    assert(st2.exported.sorted == Seq(
      "c1/items.parquet", "c2/items_20210101_20210201.parquet"))
    assert(st2.skipped == 1 && reads == 5,
      "the stale partition must not be READ, let alone rewritten")
    // layout readable; overwrite was atomic and idempotent
    assert(spark.read.parquet(s"$out/c1").count() == 2L)
    assert(spark.read.parquet(s"$out/c2").select("lu").collect()
      .map(_.getString(0)).toSeq == Seq("2024-02-01T00:00:00Z"))
    // every export is ONE file with the reference's name
    val c1Files = new java.io.File(out, "c1").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted
    assert(c1Files.toSeq == Seq("items.parquet", "items_20200101_20200201.parquet"))
  }

  test("syncPartitions: concurrent exports produce the sequential result") {
    import PgstacReader.PgPartition
    val spark = SparkSpec.spark
    val s = spark; import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("psyncc").toString
    val parts = (0 until 8).map(i =>
      PgPartition(s"c$i", Some(f"2020-0${i % 4 + 1}-01T00:00:00Z"),
        Some(f"2020-0${i % 4 + 2}-01T00:00:00Z"), f"2024-01-0${i + 1}T00:00:00Z"))
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def rp(p: PgPartition) = {
      seen.add(p.collection)
      Seq((p.collection, p.lastUpdated)).toDF("collection", "lu")
    }
    val st = PgstacReader.syncPartitions(spark, parts, None, out, rp,
      maxConcurrent = 4)
    // order, watermark, and layout are exactly the sequential contract
    assert(st.exported == parts.map(p =>
      s"${p.collection}/${PgstacReader.partitionFileName(p.start, p.end)}"))
    assert(st.newWatermark.contains("2024-01-08T00:00:00Z"))
    assert(seen.size() == 8)
    parts.foreach { p =>
      val d = spark.read.parquet(s"$out/${p.collection}")
      assert(d.count() == 1L &&
        d.select("lu").collect().head.getString(0) == p.lastUpdated)
    }
  }
}
