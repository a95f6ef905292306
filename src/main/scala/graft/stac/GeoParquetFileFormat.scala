package graft.stac

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.Job
import org.apache.parquet.hadoop.ParquetOutputFormat
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.{ParquetFileFormat, ParquetWriteSupport}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType

/** Parquet FileFormat whose part files are BORN with user key-value
  * footer metadata — the commit-time seam the after-the-fact footer
  * rewrite ([[GeoParquetWriter.addFooterMetadata]]) exists to
  * approximate. Registered as `geoparquet` (ServiceLoader), used as
  *
  * {{{ df.write.format("geoparquet").option("kv.geo", json).save(path) }}}
  *
  * Every `kv.<name>` write option lands in each part file's footer as
  * `<name>` at file-close time, alongside Spark's own row-schema entry:
  * one write, no second pass, no transient double-write window, and
  * crash-consistency is inherited from the normal commit protocol
  * (files materialize under `_temporary` and rename in).
  *
  * How the seam works (Spark 4.1): `ParquetFileFormat.prepareWrite`
  * hard-codes `ParquetWriteSupport` as the parquet WriteSupport class;
  * it is public and non-final, and parquet merges the `WriteContext`
  * extra metadata returned by `init()` into the footer. So this format
  * calls `super.prepareWrite` (keeping every compression/codec/option
  * behavior), then re-points the write-support class at
  * [[GeoParquetWriteSupport]], which reads the KV entries back out of
  * the serialized Hadoop conf on each executor. The rewrite path stays
  * for ATTACHING metadata to pre-existing tables.
  *
  * Reads are inherited untouched — `spark.read.format("geoparquet")`
  * behaves exactly like parquet.
  */
class GeoParquetFileFormat extends ParquetFileFormat with DataSourceRegister {

  override def shortName(): String = "geoparquet"

  override def toString: String = "GeoParquet"

  // FileFormat equality gates schema-merge and relation caching; all
  // instances of this stateless format are interchangeable (the KV
  // payload travels in the job conf, not the format instance)
  override def hashCode(): Int = getClass.hashCode()
  override def equals(other: Any): Boolean = other.isInstanceOf[GeoParquetFileFormat]

  override def prepareWrite(sparkSession: SparkSession, job: Job,
                            options: Map[String, String],
                            dataSchema: StructType): OutputWriterFactory = {
    val factory = super.prepareWrite(sparkSession, job, options, dataSchema)
    val conf = job.getConfiguration
    options.foreach { case (k, v) =>
      if (k.startsWith(GeoParquetFileFormat.OptionPrefix))
        conf.set(GeoParquetFileFormat.ConfPrefix +
          k.stripPrefix(GeoParquetFileFormat.OptionPrefix), v)
    }
    // conf mutations here serialize with the write job (FileFormatWriter
    // snapshots the conf AFTER prepareWrite returns), so executors see
    // both the class override and the KV entries
    ParquetOutputFormat.setWriteSupportClass(job, classOf[GeoParquetWriteSupport])
    factory
  }
}

object GeoParquetFileFormat {
  /** Write-option prefix: `kv.geo` → footer key `geo`. */
  val OptionPrefix = "kv."
  /** Hadoop-conf prefix carrying the entries to executors. */
  val ConfPrefix = "graft.geoparquet.kv."
}

/** [[ParquetWriteSupport]] that merges `graft.geoparquet.kv.*` conf
  * entries into the footer's key-value metadata at init time (parquet
  * carries the WriteContext map through to the footer it writes at
  * file close). Instantiated reflectively by parquet on each task. */
class GeoParquetWriteSupport extends ParquetWriteSupport {
  override def init(configuration: Configuration): WriteSupport.WriteContext = {
    val base = super.init(configuration)
    val extra = new java.util.HashMap[String, String](base.getExtraMetaData)
    val it = configuration.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(GeoParquetFileFormat.ConfPrefix))
        extra.put(e.getKey.stripPrefix(GeoParquetFileFormat.ConfPrefix), e.getValue)
    }
    new WriteSupport.WriteContext(base.getSchema, extra)
  }
}
