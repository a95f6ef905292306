package graft.stac

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Identity columns (`delta.identity.*` field metadata, the legacy
  * writer-6 / `identityColumns` feature): the WRITER generates bigint
  * values `start + k*step`, tracks the farthest generated value in the
  * field's `delta.identity.highWaterMark`, serializes allocation
  * through the commit race (losers regenerate), accepts explicit
  * values only under allowExplicit, and refuses UPDATE/GENERATED-
  * ALWAYS-MERGE by name. */
class IdentitySpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pident").toString + "/tbl"

  private def identMeta(start: Long, step: Long,
                        allowExplicit: Boolean = false): Metadata =
    new MetadataBuilder()
      .putLong("delta.identity.start", start)
      .putLong("delta.identity.step", step)
      .putBoolean("delta.identity.allowExplicit", allowExplicit)
      .build()

  /** An empty table whose schema declares `ident` (start/step) plus a
    * `tag` column. */
  private def createTable(path: String, start: Long, step: Long,
                          allowExplicit: Boolean = false): Unit = {
    val schema = StructType(Seq(
      StructField("ident", LongType, nullable = true,
        identMeta(start, step, allowExplicit)),
      StructField("tag", StringType)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    PortableDelta.write(empty, path)
  }

  private def tags(n: Int, pre: String) = {
    val s = spark; import s.implicits._
    (0 until n).map(i => s"$pre$i").toDF("tag")
  }

  private def readPairs(path: String): Set[(Long, String)] =
    PortableDelta.readTable(spark, path)
      .select(col("ident"), col("tag")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def hwmOf(path: String): Option[Long] = {
    val f = PortableDelta.snapshot(spark, path).schema("ident")
    if (f.metadata.contains("delta.identity.highWaterMark"))
      Some(f.metadata.getLong("delta.identity.highWaterMark"))
    else None
  }

  test("appends generate start + k*step across batches; feature declared") {
    val path = tmp()
    createTable(path, start = 100L, step = 7L)
    val snap0 = PortableDelta.snapshot(spark, path)
    assert(snap0.minWriterVersion == 7 &&
      snap0.writerFeatures.contains("identityColumns"),
      s"got ${snap0.minWriterVersion}/${snap0.writerFeatures}")
    // first append: 5 rows over 2 partitions — values must be exactly
    // the next 5 multiples regardless of partitioning
    PortableDelta.write(tags(5, "a").repartition(2), path, mode = "append")
    val got1 = readPairs(path)
    assert(got1.map(_._1) == (0 until 5).map(k => 100L + 7L * k).toSet,
      s"got $got1")
    assert(hwmOf(path).contains(100L + 7L * 4))
    // second append continues PAST the mark — ranges never overlap
    PortableDelta.write(tags(3, "b").repartition(3), path, mode = "append")
    val got2 = readPairs(path)
    assert(got2.map(_._1) == (0 until 8).map(k => 100L + 7L * k).toSet,
      s"got $got2")
    assert(hwmOf(path).contains(100L + 7L * 7))
    // each batch's values land on ITS rows (no cross-batch shuffling)
    assert(got2.filter(_._2.startsWith("b")).map(_._1) ==
      (5 until 8).map(k => 100L + 7L * k).toSet)
    // the mark survives checkpoint + truncation (it lives in metaData)
    PortableDelta.checkpoint(spark, path)
    PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), path)
    assert(hwmOf(path).contains(100L + 7L * 7))
    PortableDelta.write(tags(1, "c").coalesce(1), path, mode = "append")
    assert(readPairs(path).map(_._1).max == 100L + 7L * 8)
  }

  test("negative step descends; explicit values under allowExplicit move the mark") {
    val path = tmp()
    createTable(path, start = 0L, step = -3L, allowExplicit = true)
    PortableDelta.write(tags(3, "a").coalesce(1), path, mode = "append")
    assert(readPairs(path).map(_._1) == Set(0L, -3L, -6L))
    assert(hwmOf(path).contains(-6L))
    // explicit batch BELOW the mark: accepted, mark follows
    val s = spark; import s.implicits._
    PortableDelta.write(Seq((-30L, "x")).toDF("ident", "tag").coalesce(1),
      path, mode = "append")
    assert(hwmOf(path).contains(-30L))
    // generation resumes past it, still on the start + k*step lattice
    PortableDelta.write(tags(1, "b").coalesce(1), path, mode = "append")
    assert(readPairs(path).map(_._1).min == -33L)
  }

  test("GENERATED ALWAYS refuses explicit appends, UPDATE, and MERGE by name") {
    val path = tmp()
    createTable(path, start = 1L, step = 1L, allowExplicit = false)
    PortableDelta.write(tags(2, "a").coalesce(1), path, mode = "append")
    val s = spark; import s.implicits._
    val e1 = intercept[IllegalArgumentException] {
      PortableDelta.write(Seq((99L, "x")).toDF("ident", "tag"),
        path, mode = "append")
    }
    assert(e1.getMessage.contains("GENERATED ALWAYS"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      PortableDelta.update(spark, path, col("tag") === "a0",
        Map("ident" -> lit(50L)))
    }
    assert(e2.getMessage.contains("cannot UPDATE identity column"),
      e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      PortableDelta.merge(spark, path,
        Seq((1L, "m")).toDF("ident", "tag"), keys = Seq("tag"))
    }
    assert(e3.getMessage.contains("GENERATED ALWAYS"), e3.getMessage)
    // MERGE works under allowExplicit, and the mark chases the source
    val path2 = tmp()
    createTable(path2, start = 1L, step = 1L, allowExplicit = true)
    PortableDelta.write(tags(2, "a").coalesce(1), path2, mode = "append")
    PortableDelta.merge(spark, path2,
      Seq((40L, "m0"), (2L, "a1")).toDF("ident", "tag"), keys = Seq("tag"))
    assert(hwmOf(path2).contains(40L))
    PortableDelta.write(tags(1, "z").coalesce(1), path2, mode = "append")
    assert(readPairs(path2).collect { case (i, t) if t == "z0" => i } ==
      Set(41L))
  }

  test("race: two concurrent generating appends land disjoint monotonic ranges") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val path = tmp()
    createTable(path, start = 0L, step = 1L)
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    try {
      val futs = Seq("L", "R").map { t =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            start.await()
            PortableDelta.write(tags(10, t).repartition(2), path,
              mode = "append")
          }
        })
      }
      start.countDown()
      futs.foreach(_.get(120, TimeUnit.SECONDS))
    } finally pool.shutdown()
    // both landed: 20 rows, ids exactly 0..19 (the loser regenerated
    // from the winner's mark — no duplicate, no gap)
    val got = readPairs(path)
    assert(got.size == 20, s"got ${got.size}")
    assert(got.map(_._1) == (0L until 20L).toSet, s"got ${got.map(_._1)}")
    // each batch's 10 ids are CONTIGUOUS (allocation is per-commit)
    Seq("L", "R").foreach { t =>
      val ids = got.filter(_._2.startsWith(t)).map(_._1)
      assert(ids.size == 10 && ids.max - ids.min == 9,
        s"$t ids not contiguous: $ids")
    }
    assert(hwmOf(path).contains(19L))
  }
}
