package graft.stac

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Chaos test for the GeoParquet footer-rewrite crash protocol
  * (GeoParquetWriter.rewriteWithMetadata / recoverOrphans): a process
  * killed between the two renames must never lose the data file —
  * the hidden `.geo.bak` IS the data, and the next pass restores it. */
class GeoParquetWriterSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  import spark.implicits._

  /** A clean Configuration routed at the (well-behaved) local FS. */
  private def cleanConf: Configuration = {
    val c = new Configuration(spark.sparkContext.hadoopConfiguration)
    c.set("fs.file.impl.disable.cache", "true")
    c
  }

  /** A Configuration whose file:// FS throws on the protocol's SECOND
    * rename (tmp → visible name) while armed — the process-kill moment
    * the scaladoc claims is survivable. */
  private def crashingConf: Configuration = {
    val c = cleanConf
    c.set("fs.file.impl", classOf[CrashingLocalFileSystem].getName)
    c
  }

  private def writeOnePart(dir: String): String = {
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .head.getAbsolutePath
  }

  test("crash between the renames loses nothing; recoverOrphans restores the data file") {
    val dir = java.nio.file.Files.createTempDirectory("gpw_chaos").toString
    val part = writeOnePart(dir)
    val kv = Map("geo" -> """{"version":"1.1.0"}""")

    // inject the kill: first rename (visible → .geo.bak) succeeds, second
    // (tmp → visible) throws mid-protocol, like a lost executor would
    CrashingLocalFileSystem.armed = true
    val boom = intercept[java.io.IOException] {
      try GeoParquetWriter.rewriteWithMetadata(crashingConf, part, kv)
      finally CrashingLocalFileSystem.armed = false
    }
    assert(boom.getMessage.contains("injected crash"))

    // post-crash state: the visible name is GONE but the backup holds the
    // only copy of the data — the no-loss window the protocol guarantees
    val partFile = new java.io.File(part)
    val bak = new java.io.File(partFile.getParent, s".${partFile.getName}.geo.bak")
    assert(!partFile.exists(), "crash happened after the visible file moved aside")
    assert(bak.exists(), "the backup must survive the crash")

    // next pass: recovery restores the visible file, data intact
    GeoParquetWriter.recoverOrphans(cleanConf, dir)
    assert(partFile.exists() && !bak.exists())
    assert(spark.read.parquet(dir).as[(Long, String)].collect().sorted ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))

    // and the retried rewrite completes: footer carries the metadata,
    // rows unchanged, no hidden residue
    GeoParquetWriter.rewriteWithMetadata(cleanConf, part, kv)
    val footer = GeoParquetWriter.readFooterMetadata(cleanConf, part)
    assert(footer.get("geo").contains("""{"version":"1.1.0"}"""))
    assert(spark.read.parquet(dir).count() == 3)
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".geo.bak")))
  }

  test("geoparquet format writes footers at commit time — born with metadata, no rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("gpw_born").toString + "/t"
    Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      .repartition(2) // multiple part files: every one must carry the KV
      .write.format("geoparquet")
      .option("kv.geo", """{"version":"1.1.0"}""")
      .option("kv.stac-geoparquet", """{"version":"1.0.0"}""")
      .save(dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(parts.length == 2)
    parts.foreach { p =>
      val kv = GeoParquetWriter.readFooterMetadata(cleanConf, p.getAbsolutePath)
      assert(kv.get("geo").contains("""{"version":"1.1.0"}"""))
      assert(kv.get("stac-geoparquet").contains("""{"version":"1.0.0"}"""))
      // Spark's own footer entry survives alongside ours (the WriteContext
      // was merged, not replaced) — readers still recover the Spark schema
      assert(kv.contains("org.apache.spark.sql.parquet.row.metadata"))
    }
    // born-with means the rewrite protocol never ran: no hidden residue
    assert(!new java.io.File(dir).listFiles().exists(f =>
      f.getName.contains(".geo.bak") || f.getName.contains(".geo.tmp")))
    // and the format reads back as plain parquet
    assert(spark.read.format("geoparquet").load(dir).count() == 2)
  }

  test("GeoParquetWriter.write produces born-with-footer files end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("gpw_write").toString + "/t"
    val df = Seq((1L, Array[Byte](1, 2)), (2L, Array[Byte](3))).toDF("id", "geometry")
    GeoParquetWriter.write(df, dir, collectionsJson = Some("""{"c":1}"""))
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).head
    val kv = GeoParquetWriter.readFooterMetadata(cleanConf, part.getAbsolutePath)
    assert(kv.contains("geo") && kv.contains("stac-geoparquet"))
    assert(kv("stac-geoparquet").contains("""{"c":1}"""))
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("512-part parallel write: every footer born with the KV, no residue") {
    // the chaos legs above are small-N; this is the wide-job shape a
    // real export runs (file count IS the parallelism dial at 100 TB) —
    // every one of 512 task-committed parts must carry the footer KV
    val dir = java.nio.file.Files.createTempDirectory("gpw_512").toString + "/t"
    spark.range(2048L).selectExpr("id", "cast(id as string) as v")
      .repartition(512)
      .write.format("geoparquet")
      .option("kv.geo", """{"version":"1.1.0"}""")
      .option("kv.stac-geoparquet", """{"version":"1.0.0"}""")
      .save(dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(parts.length == 512, s"expected 512 parts, got ${parts.length}")
    // footer reads are metadata-only: check every single one
    val conf = cleanConf
    val missing = parts.filter { p =>
      val kv = GeoParquetWriter.readFooterMetadata(conf, p.getAbsolutePath)
      !kv.get("geo").contains("""{"version":"1.1.0"}""") ||
        !kv.get("stac-geoparquet").contains("""{"version":"1.0.0"}""")
    }
    assert(missing.isEmpty,
      s"${missing.length} of 512 footers missing KV: ${missing.take(3).mkString(", ")}")
    assert(!new java.io.File(dir).listFiles().exists(f =>
      f.getName.contains(".geo.bak") || f.getName.contains(".geo.tmp")))
    assert(spark.read.parquet(dir).count() == 2048L)
  }

  test("torn batch rewrite: crash mid-sweep, recover, re-run — idempotent convergence") {
    // a footer-rewrite SWEEP over many files dies partway (some done,
    // one mid-protocol, the rest untouched); recovery + a full re-run
    // must converge with every footer stamped and no data loss
    val dir = java.nio.file.Files.createTempDirectory("gpw_torn").toString + "/t"
    spark.range(64L).selectExpr("id", "cast(id as string) as v")
      .repartition(8).write.parquet(dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(_.getAbsolutePath).sorted
    assert(parts.length == 8)
    val kv = Map("geo" -> """{"version":"1.1.0"}""")
    // files 0-2 complete, file 3 crashes between the renames, 4-7 untouched
    parts.take(3).foreach(GeoParquetWriter.rewriteWithMetadata(cleanConf, _, kv))
    CrashingLocalFileSystem.armed = true
    intercept[java.io.IOException] {
      try GeoParquetWriter.rewriteWithMetadata(crashingConf, parts(3), kv)
      finally CrashingLocalFileSystem.armed = false
    }
    assert(!new java.io.File(parts(3)).exists(), "file 3 is mid-protocol")
    // recovery restores the torn file; the re-run sweep stamps everything
    GeoParquetWriter.recoverOrphans(cleanConf, dir)
    parts.foreach(GeoParquetWriter.rewriteWithMetadata(cleanConf, _, kv))
    parts.foreach { p =>
      assert(GeoParquetWriter.readFooterMetadata(cleanConf, p)
        .get("geo").contains("""{"version":"1.1.0"}"""), s"footer missing on $p")
    }
    assert(spark.read.parquet(dir).count() == 64L)
    assert(!new java.io.File(dir).listFiles().exists(f =>
      f.getName.contains(".geo.bak") || f.getName.contains(".geo.tmp")))
  }

  test("recoverOrphans treats a leftover backup beside a completed rewrite as garbage") {
    val dir = java.nio.file.Files.createTempDirectory("gpw_leftover").toString
    val part = writeOnePart(dir)
    GeoParquetWriter.rewriteWithMetadata(cleanConf, part, Map("k" -> "v"))
    // crash AFTER the second rename but before the backup delete: both
    // the rewritten visible file and the stale backup exist
    val partFile = new java.io.File(part)
    val bak = new java.io.File(partFile.getParent, s".${partFile.getName}.geo.bak")
    java.nio.file.Files.copy(partFile.toPath, bak.toPath)
    GeoParquetWriter.recoverOrphans(cleanConf, dir)
    assert(partFile.exists() && !bak.exists(), "completed rewrite wins; backup is residue")
    assert(GeoParquetWriter.readFooterMetadata(cleanConf, part).get("k").contains("v"))
  }
}

/** file:// FileSystem that throws on the footer protocol's second rename
  * (…/.geo.tmp → visible …parquet) while armed — simulating a process
  * kill at the exact point the crash-safety scaladoc promises to
  * survive. Instantiated reflectively by Hadoop via `fs.file.impl`. */
class CrashingLocalFileSystem extends org.apache.hadoop.fs.LocalFileSystem {
  override def rename(src: Path, dst: Path): Boolean = {
    if (CrashingLocalFileSystem.armed &&
        src.getName.endsWith(".geo.tmp") && dst.getName.endsWith(".parquet"))
      throw new java.io.IOException(s"injected crash between renames: $src -> $dst")
    super.rename(src, dst)
  }
}

object CrashingLocalFileSystem {
  @volatile var armed = false
}
