package graft.stac

import org.apache.spark.sql.{Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand

/** Routes SQL `INSERT INTO` / `INSERT OVERWRITE` a PARTITIONED
  * `portable-delta` table through the Delta write protocol.
  *
  * Why a rule at all: Catalyst's `DataSourceAnalysis` sends an insert to
  * the relation's [[org.apache.spark.sql.sources.InsertableRelation]]
  * seam ONLY when the statement's partitionSpec is empty — and
  * `PreprocessTableInsertion` fills an all-dynamic spec for every
  * partitioned relation, so partitioned tables always plan the stock
  * [[InsertIntoHadoopFsRelationCommand]] (whose raw file write
  * [[PortableDeltaReadOnlyFormat.prepareWrite]] refuses). This POST-HOC
  * RESOLUTION rule (custom rules run after `DataSourceAnalysis`, so the
  * stock command is already planned) rewrites that command into
  * [[PortableDeltaInsertCommand]] when — and only when — every
  * partition is dynamic: the batch's own partition-column values drive
  * the layout, exactly like the DataFrame write path.
  *
  * Static `PARTITION (col=value)` specs keep the stock command and its
  * loud prepareWrite refusal: Delta semantics for static specs
  * (per-partition overwrite) are not implemented, and a silent
  * append-instead-of-replace would be data corruption.
  *
  * Registered by [[graft.GraftExtensions]] (`spark.sql.extensions` —
  * the delta-spark integration contract). Sessions without the
  * extension keep the refusal, never a log bypass. Unpartitioned tables
  * need none of this: they insert through the InsertableRelation seam
  * with no extension at all.
  *
  * Reference thesis: the reference's tables are consumed by whatever
  * engine reads the format (docs/usage.md:50-57) — SQL DML completes
  * that surface for Spark SQL users. */
object RewriteDeltaSqlInserts extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case c: InsertIntoHadoopFsRelationCommand
        if c.fileFormat.isInstanceOf[PortableDeltaReadOnlyFormat] &&
          c.staticPartitions.isEmpty =>
      c.fileIndex match {
        case Some(idx: PortableDeltaFileIndex) =>
          PortableDeltaInsertCommand(idx.path,
            idx.snapBase.schema.fieldNames.toSeq,
            idx.snapBase.partitionColumns,
            c.outputColumnNames, c.query,
            overwrite = c.mode == SaveMode.Overwrite)
        case _ => c // a foreign index under our format: keep the refusal
      }
  }
}

/** The planned form of a dynamic-partition SQL insert into a
  * `portable-delta` table: run the (already analyzed and type-coerced)
  * query, restore the LOG's column order, and commit through
  * [[PortableDelta.write]] — stats harvest, constraint/feature gates,
  * optimistic concurrency, partition layout from the table. Mirrors
  * [[PortableDeltaHadoopFsRelation.insert]], which serves the
  * unpartitioned case without any extension. */
private[stac] final case class PortableDeltaInsertCommand(
    tablePath: String,
    tableColumnOrder: Seq[String],
    partitionColumns: Seq[String],
    outputColumnNames: Seq[String],
    query: LogicalPlan,
    overwrite: Boolean) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = query :: Nil

  override def run(spark: SparkSession): Seq[Row] = {
    // the query's output is positional against the relation's
    // (data ++ partition) column layout; name it explicitly, then
    // restore the table's declared order for the protocol write
    val df = org.apache.spark.sql.GraftSqlShim.ofRows(spark, query)
      .toDF(outputColumnNames: _*)
    val cols = tableColumnOrder.map(StacSchema.quotedCol)
    PortableDelta.write(df.select(cols: _*), tablePath,
      mode = if (overwrite) "overwrite" else "append",
      partitionBy = partitionColumns)
    // drop stale cached relations/plans of this table (pinned snapshots)
    spark.sessionState.catalog.invalidateAllCachedTables()
    spark.catalog.refreshByPath(tablePath)
    Seq.empty
  }
}
