package graft.stac

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The [[GraftLogStore]] put-if-absent seam. Contracts: every commit
  * publishes through the conf-resolved store (a recording impl sees
  * each version exactly once); a store refusing (dest exists /
  * external arbiter says lost) surfaces as the concurrent-commit
  * rebase path, never a clobbered log; a misconfigured class fails
  * loudly at first commit; the default keeps rename semantics. */
class LogStoreSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pdlogstore").toString + "/tbl"

  private def df(n: Long) = {
    val s = spark; import s.implicits._
    (0L until n).map(i => (i, s"d$i")).toDF("id", "b")
  }

  test("commits route through the conf-named store; versions publish once each") {
    val path = tmp()
    RecordingLogStore.published.clear()
    val conf = spark.sessionState.newHadoopConf()
    spark.sparkContext.hadoopConfiguration.set(GraftLogStore.ImplKey,
      classOf[RecordingLogStore].getName)
    try {
      PortableDelta.write(df(10L), path)                       // v0
      PortableDelta.write(df(5L), path, mode = "append")       // v1
      PortableDelta.delete(spark, path, col("id") === 0L)      // v2
      val names = RecordingLogStore.published.toArray.toSeq
        .collect { case p: String if p.contains(path) => new Path(p).getName }
      assert(names.count(_ == "00000000000000000000.json") == 1 &&
        names.count(_ == "00000000000000000001.json") == 1 &&
        names.count(_ == "00000000000000000002.json") == 1,
        s"each version must publish through the store exactly once: $names")
      // the published log is a real table
      assert(PortableDelta.readTable(spark, path).count() == 13L)
    } finally spark.sparkContext.hadoopConfiguration.unset(GraftLogStore.ImplKey)
    conf.size() // keep conf referenced
  }

  test("a refusing store surfaces as the concurrent-commit rebase, never a clobber") {
    val path = tmp()
    PortableDelta.write(df(10L), path) // v0 through the default store
    spark.sparkContext.hadoopConfiguration.set(GraftLogStore.ImplKey,
      classOf[RefuseOnceLogStore].getName)
    RefuseOnceLogStore.refusals.set(1)
    try {
      // the verb loses the first "race" (store refuses), rebases, and
      // commits on the retry — exactly the multi-writer contract
      val st = PortableDelta.delete(spark, path, col("id") === 1L)
      assert(st.deletedRows == 1L && st.version == 1L, s"$st")
      assert(RefuseOnceLogStore.refusals.get() == 0, "the refusal must be consumed")
      assert(PortableDelta.readTable(spark, path).count() == 9L)
      // the log has exactly v0 and v1 — no clobbered or duplicate files
      val dir = new Path(path, "_delta_log")
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val versions = fs.listStatus(dir).map(_.getPath.getName)
        .filter(_.matches("\\d{20}\\.json")).sorted.toSeq
      assert(versions == Seq("00000000000000000000.json",
        "00000000000000000001.json"), s"log files: $versions")
    } finally spark.sparkContext.hadoopConfiguration.unset(GraftLogStore.ImplKey)
  }

  test("a misconfigured store class fails loudly at first commit") {
    val path = tmp()
    spark.sparkContext.hadoopConfiguration.set(GraftLogStore.ImplKey,
      "com.example.NoSuchStore")
    try {
      val e = intercept[Exception](PortableDelta.write(df(3L), path))
      assert(e.getMessage.contains("NoSuchStore"), e.getMessage)
      assert(!new java.io.File(path, "_delta_log").isDirectory ||
        new java.io.File(path, "_delta_log").listFiles()
          .forall(f => !f.getName.endsWith(".json")),
        "nothing may publish through a store that failed to resolve")
    } finally spark.sparkContext.hadoopConfiguration.unset(GraftLogStore.ImplKey)
  }
}

/** Records every destination it publishes; delegates to the default
  * semantics. Public zero-arg class — the conf seam instantiates it. */
class RecordingLogStore extends GraftLogStore {
  private val inner = new RenameLogStore
  override def putIfAbsent(fs: FileSystem, tmp: Path, dest: Path): Boolean = {
    val ok = inner.putIfAbsent(fs, tmp, dest)
    if (ok) RecordingLogStore.published.add(dest.toString)
    ok
  }
}
object RecordingLogStore {
  val published = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

/** Refuses the next `refusals` publishes (simulating a lost external
  * arbitration), then behaves normally. */
class RefuseOnceLogStore extends GraftLogStore {
  private val inner = new RenameLogStore
  override def putIfAbsent(fs: FileSystem, tmp: Path, dest: Path): Boolean =
    if (RefuseOnceLogStore.refusals.getAndUpdate(n => math.max(0, n - 1)) > 0)
      false
    else inner.putIfAbsent(fs, tmp, dest)
}
object RefuseOnceLogStore {
  val refusals = new java.util.concurrent.atomic.AtomicInteger(0)
}
