package graft.stac

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Minor log compaction (`<start>.<end>.compacted.json`): one file
  * carrying the action reconciliation of a commit span; replay
  * substitutes it wherever the span fits (longest-first), commit JSONs
  * stay for mid-span granularity, and cleanupLog reclaims superseded
  * spans with the commits they cover. */
class LogCompactionSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pcompact").toString + "/tbl"

  private def df(ids: Seq[Long], tag: String) = {
    val s = spark; import s.implicits._
    ids.map(i => (i, s"$tag$i")).toDF("id", "tag")
  }

  private def ids(path: String): Set[Long] =
    PortableDelta.readTable(spark, path)
      .select(col("id")).collect().map(_.getLong(0)).toSet

  private def jsonOf(path: String, v: Long) =
    new java.io.File(s"$path/_delta_log/${"%020d".format(v)}.json")

  test("compacted span reconciles adds/removes/meta; replay USES it") {
    val conf = spark.sessionState.newHadoopConf()
    val path = tmp()
    PortableDelta.write(df(0L until 4L, "a").coalesce(1), path)       // v0
    (1 to 3).foreach(k => PortableDelta.write(
      df(10L * k until 10L * k + 3, "a").coalesce(1), path,
      mode = "append"))                                               // v1-3
    PortableDelta.delete(spark, path, col("id") === 11L)              // v4
    PortableDelta.addCheckConstraint(spark, path, "idnn", "id >= 0")  // v5
    PortableDelta.write(df(Seq(99L), "z").coalesce(1), path,
      mode = "append")                                                // v6
    val expect = ids(path)
    val f = PortableDelta.compactLog(conf, path, 2L, 5L)
    assert(f.getName == "%020d.%020d.compacted.json".format(2L, 5L))
    // current snapshot unchanged with the span present
    assert(ids(path) == expect)
    // delete the covered JSONs: replay MUST go through the span —
    // data, DV state, and the mid-span constraint all survive
    (2L to 5L).foreach(v => assert(jsonOf(path, v).delete()))
    assert(ids(path) == expect)
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.version == 6L)
    assert(snap.configuration.contains(
      PortableDelta.ConstraintPrefix + "idnn"),
      "mid-span metaData must ride the compacted file")
    // the constraint is ENFORCED from the compacted state
    intercept[IllegalArgumentException] {
      PortableDelta.write(df(Seq(-1L), "bad").coalesce(1), path,
        mode = "append")
    }
    // time travel: a version at the span's END works (plan = 0,1,span),
    // a MID-span version does not (its granularity needs the JSONs)
    assert(PortableDelta.readTable(spark, path, 5L).count() ==
      expect.size - 1L) // v6's append hasn't landed at v5
    assert(PortableDelta.readTable(spark, path, 1L).count() == 7L)
    intercept[IllegalArgumentException] {
      PortableDelta.readTable(spark, path, 3L).count()
    }
    // appends continue fine on the compacted-substituted log
    PortableDelta.write(df(Seq(100L), "w").coalesce(1), path,
      mode = "append")                                                // v7
    assert(ids(path) == expect + 100L)
  }

  test("longest usable span wins; overlapping spans compose") {
    val conf = spark.sessionState.newHadoopConf()
    val path = tmp()
    PortableDelta.write(df(0L until 2L, "a").coalesce(1), path)       // v0
    (1 to 6).foreach(k => PortableDelta.write(
      df(Seq(100L + k), "a").coalesce(1), path, mode = "append"))     // v1-6
    PortableDelta.compactLog(conf, path, 1L, 3L)
    PortableDelta.compactLog(conf, path, 1L, 5L)
    PortableDelta.compactLog(conf, path, 4L, 6L)
    val expect = ids(path)
    // drop every JSON the spans cover: [1,5] + v6, or [1,3] + [4,6]
    (1L to 6L).foreach(v => assert(jsonOf(path, v).delete()))
    assert(ids(path) == expect)
    assert(PortableDelta.snapshot(spark, path).version == 6L)
  }

  test("cleanupLog reclaims spans subsumed by the checkpoint") {
    val conf = spark.sessionState.newHadoopConf()
    val path = tmp()
    PortableDelta.write(df(0L until 3L, "a").coalesce(1), path)       // v0
    (1 to 4).foreach(k => PortableDelta.write(
      df(Seq(50L + k), "a").coalesce(1), path, mode = "append"))      // v1-4
    val span = PortableDelta.compactLog(conf, path, 1L, 3L)
    val fs = span.getFileSystem(conf)
    PortableDelta.checkpoint(spark, path)                             // @4
    PortableDelta.cleanupLog(conf, path)
    assert(!fs.exists(span), "superseded span must be reclaimed")
    assert(ids(path) == Set(0L, 1L, 2L, 51L, 52L, 53L, 54L))
  }
}
