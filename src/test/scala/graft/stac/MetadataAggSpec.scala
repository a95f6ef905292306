package graft.stac

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** [[PortableDelta.aggregateFromStats]] — metadata-only COUNT/MIN/MAX
  * from the log's per-file stats. Value equality to the full scan on
  * every supported type, exact DV-subtracted counts, refusals by name
  * (DV min/max, missing stats, partition/mapped columns), and the
  * structural no-data-read proof: a synthetic checkpoint whose add
  * entries name files that DO NOT EXIST aggregates correctly — any
  * data-file open would throw. */
class MetadataAggSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("metaagg").toString + "/tbl"

  /** INT96 timestamp footers are deprecated-unordered, so DeltaStats
    * records no min/max for them (and aggregateFromStats then refuses by
    * name — correct, tested below). The fixture writes MICROS so the
    * timestamp leg exercises the supported path. */
  private def withMicrosTs[T](body: => T): T = {
    val key = "spark.sql.parquet.outputTimestampType"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try body finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def fixture(): String = withMicrosTs {
    val s = spark; import s.implicits._
    val path = tmp()
    def batch(lo: Long, hi: Long, nullC: Boolean) =
      (lo to hi).map(i => (i, i * 1.5 - 10.0, s"tag-${i % 7}",
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(18000 + i)),
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(i * 1000, 123456000L))))
        .toDF("k", "price", "tag", "d", "ts")
        .withColumn("c", if (nullC) lit(null).cast("long") else col("k") * 3)
    PortableDelta.write(batch(0L, 49L, nullC = true), path)        // c all null
    PortableDelta.write(batch(50L, 99L, nullC = false), path, mode = "append")
    PortableDelta.write(batch(100L, 129L, nullC = false), path, mode = "append")
    path
  }

  test("count/min/max equal the full scan on bigint, double, string, date, timestamp") {
    val path = fixture()
    val got = PortableDelta.aggregateFromStats(spark, path,
      Seq("k", "price", "tag", "d", "ts", "c")).head()
    val full = PortableDelta.readTable(spark, path)
      .agg(count(lit(1)), min("k"), max("k"), min("price"), max("price"),
        min("tag"), max("tag"), min("d"), max("d"), min("ts"), max("ts"),
        min("c"), max("c")).head()
    assert(got.getLong(0) == full.getLong(0), "count")
    (1 until 13).foreach { i =>
      assert(got.get(i) == full.get(i), s"field $i: ${got.get(i)} != ${full.get(i)}")
    }
    // the all-null-in-one-file column still aggregated (file skipped,
    // exactly like SQL MIN/MAX over nulls)
    assert(got.getLong(got.fieldIndex("min_c")) == 150L)
  }

  test("INT96 timestamps (no sound footer stats) refuse by name") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write(Seq((1L,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(100))))
      .toDF("k", "ts"), path)
    val e = intercept[IllegalStateException] {
      PortableDelta.aggregateFromStats(spark, path, Seq("ts"))
    }
    assert(e.getMessage.contains("no min/max for ts"), e.getMessage)
    // count is still answerable — numRecords never depends on the type
    assert(PortableDelta.aggregateFromStats(spark, path).head().getLong(0) == 1L)
  }

  test("deletion vectors: count subtracts cardinality exactly; min/max refuses by name") {
    val path = fixture()
    val d = PortableDelta.delete(spark, path, col("k") % 5 === 0)
    assert(d.deletedRows > 0)
    val got = PortableDelta.aggregateFromStats(spark, path).head()
    assert(got.getLong(0) == PortableDelta.readTable(spark, path).count(),
      "DV-subtracted count must equal the live row count")
    val e = intercept[IllegalStateException] {
      PortableDelta.aggregateFromStats(spark, path, Seq("k"))
    }
    assert(e.getMessage.contains("deletion vector"), e.getMessage)
  }

  test("structural proof: fake-file checkpoint aggregates without any data read") {
    val s = spark; import s.implicits._
    val ProtoT = "struct<minReaderVersion:int,minWriterVersion:int," +
      "readerFeatures:array<string>,writerFeatures:array<string>>"
    val MetaT = "struct<id:string,format:struct<provider:string,options:map<string,string>>," +
      "schemaString:string,partitionColumns:array<string>," +
      "configuration:map<string,string>,createdTime:bigint>"
    val DvT = "struct<storageType:string,pathOrInlineDv:string,offset:int," +
      "sizeInBytes:int,cardinality:bigint>"
    val AddT = "struct<path:string,partitionValues:map<string,string>,size:bigint," +
      s"modificationTime:bigint,dataChange:boolean,deletionVector:$DvT,stats:string>"
    val TxnT = "struct<appId:string,version:bigint,lastUpdated:bigint>"
    val root = java.nio.file.Files.createTempDirectory("metaaggfake").toString + "/tbl"
    new java.io.File(s"$root/_delta_log").mkdirs()
    val tableSchema = StructType(Seq(StructField("id", LongType)))
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
        struct(lit("fake-1").as("id"),
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
    val fakeAdds = spark.range(50000).select(
      lit(null).cast(ProtoT).as("protocol"),
      lit(null).cast(MetaT).as("metaData"),
      struct(
        concat(lit("z-"), col("id").cast("string"), lit(".parquet")).as("path"),
        map().cast("map<string,string>").as("partitionValues"),
        lit(1000L).as("size"), lit(1L).as("modificationTime"),
        lit(true).as("dataChange"),
        lit(null).cast(DvT).as("deletionVector"),
        statsJson.as("stats")).cast(AddT).as("add"),
      lit(null).cast(TxnT).as("txn"))
    val tmpw = java.nio.file.Files.createTempDirectory("metaagg-w").toString + "/p"
    smallDf.unionByName(fakeAdds).coalesce(1).write.parquet(tmpw)
    val part = new java.io.File(tmpw).listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
    java.nio.file.Files.move(part.toPath, new java.io.File(
      s"$root/_delta_log/${"%020d".format(0L)}.checkpoint.parquet").toPath)
    val lc = new java.io.FileWriter(s"$root/_delta_log/_last_checkpoint")
    try lc.write("""{"version":0,"size":50002}""") finally lc.close()
    val w = new java.io.FileWriter(s"$root/_delta_log/${"%020d".format(0L)}.json")
    try w.write("""{"commitInfo":{"operation":"WRITE","timestamp":1}}""" + "\n")
    finally w.close()

    val got = PortableDelta.aggregateFromStats(spark, root, Seq("id")).head()
    assert(got.getLong(0) == 5000000L, "count from 50k fake adds")
    assert(got.getLong(1) == 0L && got.getLong(2) == 4999999L, "min/max id")

    // one more add whose stats are ABSENT: min/max and count both refuse
    // naming the file (never guess)
    val w1 = new java.io.FileWriter(s"$root/_delta_log/${"%020d".format(1L)}.json")
    try w1.write(
      """{"add":{"path":"y-nostats.parquet","partitionValues":{},"size":10,""" +
        """"modificationTime":1,"dataChange":true}}""" + "\n")
    finally w1.close()
    val e = intercept[IllegalStateException] {
      PortableDelta.aggregateFromStats(spark, root)
    }
    assert(e.getMessage.contains("y-nostats.parquet"), e.getMessage)
  }

  test("partition-column min/max answers from partitionValues, DV-exact") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write(
      (0L to 9L).map(i => (i, s"p${i % 3}", i * 2.5)).toDF("k", "part", "v")
        .coalesce(1), // one multi-row file per partition dir
      path, partitionBy = Seq("part"))
    def check(): Unit = {
      val got = PortableDelta.aggregateFromStats(spark, path,
        Seq("part", "k")).head()
      val full = PortableDelta.readTable(spark, path)
        .agg(count(lit(1)), min("part"), max("part"), min("k"), max("k")).head()
      assert((0 until 5).forall(i => got.get(i) == full.get(i)),
        s"$got vs $full")
    }
    check()
    // kill ONE partition's rows entirely: its value must vanish from
    // the metadata answer exactly like the full scan's
    val d = PortableDelta.delete(spark, path, col("part") === "p2")
    assert(d.deletedRows > 0)
    val after = PortableDelta.aggregateFromStats(spark, path, Seq("part")).head()
    assert(after.getString(after.fieldIndex("max_part")) == "p1",
      s"a fully-dead partition's value must drop: $after")
    assert(after.getLong(0) == PortableDelta.readTable(spark, path).count())
    // a PARTIAL delete leaves a DV: data-column min/max refuses, but the
    // partition answer stays exact (the file still has live rows)
    val d2 = PortableDelta.delete(spark, path, col("k") === 0L)
    assert(d2.deletedRows == 1L && d2.removedFiles == 0)
    intercept[IllegalStateException] {
      PortableDelta.aggregateFromStats(spark, path, Seq("k"))
    }
    val dv = PortableDelta.aggregateFromStats(spark, path, Seq("part")).head()
    assert(dv.getString(dv.fieldIndex("min_part")) == "p0" &&
      dv.getLong(0) == PortableDelta.readTable(spark, path).count())
  }

  test("refusals: timestamp partition column, unknown column, column-mapped table") {
    val s = spark; import s.implicits._
    val path = tmp()
    PortableDelta.write(
      (0L to 3L).map(i => (i,
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(i * 86400))))
        .toDF("k", "ts"),
      path, partitionBy = Seq("ts"))
    val e1 = intercept[IllegalStateException] {
      PortableDelta.aggregateFromStats(spark, path, Seq("ts"))
    }
    assert(e1.getMessage.contains("timestamp partition"), e1.getMessage)
    intercept[IllegalArgumentException] {
      PortableDelta.aggregateFromStats(spark, path, Seq("nope"))
    }
    val mapped = tmp()
    PortableDelta.write((0L to 9L).map(i => Tuple1(i)).toDF("k"), mapped,
      properties = Map("delta.columnMapping.mode" -> "name"))
    val e2 = intercept[IllegalStateException] {
      PortableDelta.aggregateFromStats(spark, mapped, Seq("k"))
    }
    assert(e2.getMessage.contains("column mapping"))
  }
}
