package graft.stac

import org.apache.spark.sql.DataFrame

/** K3: Delta Lake sink (`stac_geoparquet/arrow/_delta_lake.py:28-71`).
  *
  * The reference writes the normalized Arrow stream with `write_deltalake`,
  * carrying the same `geo` metadata on the table. The Spark mapping is
  * `df.write.format("delta")` with the geo/stac metadata as table
  * properties (Delta has first-class table properties; parquet footer
  * rewriting is not needed).
  *
  * delta-spark is not on this environment's classpath (zero-egress build;
  * `/opt/spark/jars` has no delta jar, and the offline coursier cache was
  * re-probed round 4: no io.delta artifacts either), so availability is
  * probed at runtime and the writer fails with a clear message instead of
  * a ClassNotFoundException mid-job.
  */
object DeltaSink {

  /** True when delta-spark is on the classpath. */
  lazy val available: Boolean =
    try { Class.forName("org.apache.spark.sql.delta.sources.DeltaDataSource"); true }
    catch { case _: ClassNotFoundException => false }

  /** Write a normalized STAC table as a Delta table with the geo metadata
    * as table properties. With delta-spark on the classpath this goes
    * through the full engine (`spark.sql.extensions=io.delta.sql.
    * DeltaSparkSessionExtension` required); without it, the write falls
    * back to [[PortableDelta.writeStac]] — the SAME on-disk transaction-
    * log format (open protocol: JSON actions, add/remove replay), so the
    * produced table is readable by delta-spark/delta-rs/DuckDB later.
    *
    * Writer `.option(...)` calls are NOT persisted as table properties by
    * Delta — the metadata is attached with `ALTER TABLE ... SET
    * TBLPROPERTIES` on the path-based table after the write (custom,
    * non-`delta.`-prefixed keys are allowed there). */
  def write(df: DataFrame, path: String,
            schemaVersion: String = StacSchema.DefaultGeoParquetVersion,
            mode: String = "error"): Unit = {
    if (!available) {
      PortableDelta.writeStac(df, path, schemaVersion, mode = mode)
      return
    }
    df.write.format("delta").mode(mode).save(path)
    def q(s: String) = s.replace("'", "''")
    df.sparkSession.sql(
      s"""ALTER TABLE delta.`$path` SET TBLPROPERTIES (
         |  'geo' = '${q(StacSchema.geoMetadata(schemaVersion))}',
         |  'stac-geoparquet' = '${q(StacSchema.stacGeoParquetMetadata())}'
         |)""".stripMargin)
  }
}
