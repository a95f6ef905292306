package graft.stac

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's public API surface, one method per export
  * (`stac_geoparquet/__init__.py`, `stac_geoparquet/arrow/__init__.py`) —
  * a user of stac-geoparquet switches here and finds every entry point
  * under its own name, returning DataFrames where the reference returns
  * Arrow tables/record-batch readers (the DataFrame IS the engine's
  * columnar stream: lazily planned, batch-pipelined, never materialized
  * until an action).
  */
object Stac {

  /** `DEFAULT_JSON_CHUNK_SIZE` (`_constants.py:5`). Spark's unit of
    * streaming is the scan partition, sized by
    * `spark.sql.files.maxPartitionBytes` — constant kept for API parity. */
  val DefaultJsonChunkSize: Int = 65536

  /** `SUPPORTED_PARQUET_SCHEMA_VERSIONS` (`_constants.py`). */
  val SupportedParquetSchemaVersions: Seq[String] = Seq("1.0.0", "1.1.0")

  val DefaultParquetSchemaVersion: String = StacSchema.DefaultGeoParquetVersion

  /** `parse_stac_items_to_arrow` (`_api.py:65-155`): in-memory items →
    * spec-shape DataFrame. */
  def parseStacItemsToArrow(spark: SparkSession, items: Seq[String],
                            strategy: StacJsonReader.SchemaStrategy = StacJsonReader.InferFull): DataFrame = {
    val ds: Dataset[String] = spark.createDataset(items)(Encoders.STRING)
      .map(StacJsonReader.geometryToWkbHex)(Encoders.STRING)
    val raw = strategy match {
      case StacJsonReader.Explicit(s) => spark.read.schema(s).json(ds)
      case StacJsonReader.InferFull => spark.read.json(ds)
      case StacJsonReader.InferSample(n) =>
        val sample = spark.createDataset(ds.take(n).toSeq)(Encoders.STRING)
        spark.read.schema(spark.read.json(sample).schema)
          .option("mode", "FAILFAST").json(ds)
    }
    Normalize(StacJsonReader.hexGeometryToBinary(raw))
  }

  /** `parse_stac_ndjson_to_arrow` (`_api.py:219-278`): files (ndjson /
    * JSON array / FeatureCollection, autodetected) → spec-shape DataFrame. */
  def parseStacNdjsonToArrow(spark: SparkSession, paths: Seq[String],
                             strategy: StacJsonReader.SchemaStrategy = StacJsonReader.InferFull): DataFrame =
    Normalize(StacJsonReader.read(spark, paths, strategy))

  /** `parse_stac_ndjson_to_parquet` (`_api.py:281-344`). */
  def parseStacNdjsonToParquet(spark: SparkSession, paths: Seq[String], out: String,
                               schemaVersion: String = DefaultParquetSchemaVersion,
                               collectionsJson: Option[String] = None): Unit =
    GeoParquetWriter.write(parseStacNdjsonToArrow(spark, paths), out,
      schemaVersion, collectionsJson)

  /** `parse_stac_items_to_parquet` (`_api.py:158-216`). */
  def parseStacItemsToParquet(spark: SparkSession, items: Seq[String], out: String,
                              schemaVersion: String = DefaultParquetSchemaVersion): Unit =
    GeoParquetWriter.write(parseStacItemsToArrow(spark, items), out, schemaVersion)

  /** `parse_stac_ndjson_to_delta_lake` (`_delta_lake.py:28-71`) —
    * runtime-gated on delta-spark being on the classpath. */
  def parseStacNdjsonToDeltaLake(spark: SparkSession, paths: Seq[String], out: String,
                                 schemaVersion: String = DefaultParquetSchemaVersion): Unit =
    DeltaSink.write(parseStacNdjsonToArrow(spark, paths), out, schemaVersion)

  /** `to_parquet` (`_to_parquet.py:23-79`): spec-shape DataFrame →
    * GeoParquet with footer metadata. */
  def toParquet(df: DataFrame, out: String,
                schemaVersion: String = DefaultParquetSchemaVersion,
                collectionsJson: Option[String] = None): Unit =
    GeoParquetWriter.write(df, out, schemaVersion, collectionsJson)

  /** `stac_table_to_items` (`_api.py:347-367`): streaming row pivot —
    * a local iterator of item-JSON strings (one batch at a time, like the
    * reference's RecordBatchReader pipeline). */
  def stacTableToItems(df: DataFrame): Iterator[String] = {
    import scala.jdk.CollectionConverters._
    Denormalize.toItemJson(df).toLocalIterator().asScala
  }

  /** `stac_table_to_ndjson` (`_api.py:370-403`). */
  def stacTableToNdjson(df: DataFrame, out: String): Unit =
    Denormalize.writeNdjson(df, out)

  /** Legacy `to_geodataframe` (`stac_geoparquet.py:37-197`): the
    * DataFrame IS the geodataframe; `add_self_link` adds the F4
    * self-href column (`stac_geoparquet.py:119-129`). */
  def toGeoDataFrame(spark: SparkSession, items: Seq[String],
                     addSelfLink: Boolean = false): DataFrame = {
    val df = parseStacItemsToArrow(spark, items)
    if (!addSelfLink) df
    else df.withColumn("self_link", selfHref(col("links")))
  }

  /** First link with rel=self, JSON-ish type, per F4. */
  def selfHref(links: Column): Column =
    element_at(
      filter(links, l => l.getField("rel") === "self" &&
        coalesce(l.getField("type"), lit(""))
          .isin("application/json", "application/geo+json", "")),
      1).getField("href")

  /** Legacy `to_dict` / `to_item_collection` (`stac_geoparquet.py:200-269`):
    * row pivots — same streaming pivot as [[stacTableToItems]]. */
  def toItemCollection(df: DataFrame): Seq[String] = stacTableToItems(df).toSeq
}
