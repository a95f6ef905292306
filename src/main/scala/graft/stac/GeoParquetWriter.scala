package graft.stac

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{BinaryType, StructType}
import scala.jdk.CollectionConverters._

/** K1: GeoParquet sink — part files are BORN with the `geo` and
  * `stac-geoparquet` key-value footer metadata
  * (`stac_geoparquet/arrow/_to_parquet.py:23-175`) via the
  * [[GeoParquetFileFormat]] commit-time seam: the KV entries ride the
  * write job's conf and parquet writes them into each footer at file
  * close, inside the normal commit protocol (no second pass, no
  * transient double-write window).
  *
  * The per-file footer REWRITE path below ([[addFooterMetadata]] /
  * [[rewriteWithMetadata]]) remains for attaching metadata to tables
  * that already exist (the K6 partitioned layouts, or parquet written
  * by other engines): each part file's row groups are block-copied
  * (`ParquetFileWriter.appendFile` — no decode/re-encode) into a file
  * whose footer carries the merged metadata, embarrassingly parallel,
  * fanned out over executors above a threshold, with a crash-safe
  * rename protocol (chaos-tested in GeoParquetWriterSpec).
  */
object GeoParquetWriter {

  def write(
      df: DataFrame,
      path: String,
      schemaVersion: String = StacSchema.DefaultGeoParquetVersion,
      collectionsJson: Option[String] = None,
      mode: String = "overwrite"): Unit = {
    val hasProjGeometry = df.schema.fields.exists(f =>
      f.name == "proj:geometry" && f.dataType == BinaryType)
    val kv = Map(
      "geo" -> StacSchema.geoMetadata(schemaVersion, hasProjGeometry),
      "stac-geoparquet" -> StacSchema.stacGeoParquetMetadata(collectionsJson))
    val w = df.write.mode(mode).format("geoparquet")
    kv.foreach { case (k, v) => w.option(GeoParquetFileFormat.OptionPrefix + k, v) }
    w.save(path)
  }

  /** Attach KV metadata to every part file under `dir`. */
  def addFooterMetadata(spark: org.apache.spark.sql.SparkSession,
                        dir: String, kv: Map[String, String]): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(hconf)
    // recursive: partitionBy layouts (K6's per-collection dirs) nest part
    // files under partition subdirectories
    recoverOrphans(hconf, dir) // restore any crashed prior rewrite first
    val base = p.toUri.getPath
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next().getPath
      // Spark hiddenFileFilter semantics on the whole relative path: skip
      // anything under _temporary/.staging dirs, not just hidden leaf names
      val rel = f.toUri.getPath.stripPrefix(base).split('/').filter(_.nonEmpty)
      val hidden = rel.exists(c => c.startsWith("_") || c.startsWith("."))
      if (f.getName.endsWith(".parquet") && !hidden) buf += f.toString
    }
    val parts = buf.toIndexedSeq
    if (parts.size <= 8) parts.foreach(f => rewriteWithMetadata(new Configuration(hconf), f, kv))
    else {
      // distribute the rewrite: one task per file. Hadoop Configuration is
      // not serializable — ship its entries and rebuild per task, so
      // spark.hadoop.* settings (object-store credentials, endpoints,
      // defaultFS) reach the executors.
      val confEntries = hconf.asScala.map(e => e.getKey -> e.getValue).toSeq
      val kvB = kv
      spark.sparkContext.parallelize(parts, math.min(parts.size, 64))
        .foreach { f =>
          val c = new Configuration(false)
          confEntries.foreach { case (k, v) => c.set(k, v) }
          rewriteWithMetadata(c, f, kvB)
        }
    }
  }

  /** Rewrite one parquet file with extra footer KV entries (row groups are
    * byte-copied, statistics and encodings preserved).
    *
    * Crash safety: the original is renamed to a hidden `.geo.bak` (atomic)
    * before the rewritten file takes its name, so no window exists where
    * the data's only copy has been deleted. A crash mid-protocol leaves
    * the hidden backup; [[recoverOrphans]] restores it on the next pass.
    */
  def rewriteWithMetadata(conf: Configuration, file: String, kv: Map[String, String]): Unit = {
    val src = new Path(file)
    val fs = src.getFileSystem(conf)
    val inFile = HadoopInputFile.fromPath(src, conf)
    val reader = ParquetFileReader.open(inFile)
    val (schema, existing) =
      try {
        val md = reader.getFooter.getFileMetaData
        (md.getSchema, md.getKeyValueMetaData.asScala.toMap)
      } finally reader.close()
    val tmp = new Path(src.getParent, s".${src.getName}.geo.tmp")
    val writer = new ParquetFileWriter(
      HadoopOutputFile.fromPath(tmp, conf), schema,
      ParquetFileWriter.Mode.OVERWRITE,
      128L * 1024 * 1024, 8 * 1024 * 1024)
    writer.start()
    writer.appendFile(inFile)
    writer.end((existing ++ kv).asJava)
    val bak = new Path(src.getParent, s".${src.getName}.geo.bak")
    if (!fs.rename(src, bak))
      throw new java.io.IOException(s"footer rewrite: could not move $file aside")
    if (!fs.rename(tmp, src)) {
      fs.rename(bak, src) // restore; the original was never lost
      throw new java.io.IOException(s"footer rewrite failed for $file")
    }
    fs.delete(bak, false)
  }

  /** Restore any part file whose previous rewrite crashed between renames
    * (hidden `.geo.bak` present): if the visible file is missing the
    * backup IS the data; otherwise the rewrite completed and the backup
    * is just leftover. */
  def recoverOrphans(conf: Configuration, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.startsWith(".") && f.getName.endsWith(".geo.bak")) {
        val orig = new Path(f.getParent, f.getName.stripPrefix(".").stripSuffix(".geo.bak"))
        if (!fs.exists(orig)) fs.rename(f, orig) else fs.delete(f, false)
      }
    }
  }

  /** Read back the KV metadata of one parquet file (test/verification aid). */
  def readFooterMetadata(conf: Configuration, file: String): Map[String, String] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try reader.getFooter.getFileMetaData.getKeyValueMetaData.asScala.toMap
    finally reader.close()
  }
}
