package graft.stac

import org.apache.spark.sql.{Column, Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, EqualTo, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InsertIntoHadoopFsRelationCommand, LogicalRelation}
import org.apache.spark.sql.types.LongType

/** SQL DML over `portable-delta` tables: `INSERT INTO` (partitioned),
  * `DELETE FROM`, `UPDATE`, and the canonical `MERGE INTO` shapes, each
  * rewritten into the engine's protocol verbs ([[PortableDelta.delete]]
  * / [[PortableDelta.update]] / [[PortableDelta.mergeInto]] /
  * [[PortableDelta.write]]) — stats harvest, writer-feature gates, DV
  * death paths, CDF, optimistic concurrency, all inherited.
  *
  * Why a POST-HOC RESOLUTION rule: Spark's analyzer accepts
  * DELETE/UPDATE/MERGE only for DSv2 tables (`checkAnalysis` rejects a
  * V1 relation) — but custom post-hoc rules run AFTER resolution and
  * BEFORE that check, so the statements arrive here fully resolved and
  * leave as planned commands. Same seam delta-spark occupies with its
  * own extension. Registered by [[graft.GraftExtensions]]
  * (`spark.sql.extensions` — the documented deployment); sessions
  * without the extension keep Spark's loud v2-only error, never a
  * silent wrong write. The INSERT leg additionally needs this rule
  * only for PARTITIONED tables (`PreprocessTableInsertion` fills an
  * all-dynamic partitionSpec, which skips the InsertableRelation
  * seam); unpartitioned INSERT works with no extension at all.
  *
  * MERGE covers the FULL clause surface (round 16): any number of
  * ordered WHEN MATCHED (UPDATE SET/DELETE), WHEN NOT MATCHED
  * (INSERT), and WHEN NOT MATCHED BY SOURCE (UPDATE SET/DELETE)
  * clauses, each with an optional AND condition — routed through
  * [[PortableDelta.mergeIntoFull]]'s per-row first-match semantics.
  * `UPDATE SET *` / `INSERT *` work too (the analyzer expands them to
  * name-aligned assignment lists before this rule runs). Unsupported
  * shapes refuse BY NAME (subquery conditions, nested SET keys,
  * non-equi merge conditions, static PARTITION specs) — a refusal
  * names the supported alternative; nothing silently approximates.
  *
  * Reference thesis: the reference's tables are consumed by whatever
  * engine reads the format (docs/usage.md:50-57) — SQL DML completes
  * that surface for Spark SQL users. */
object RewriteDeltaSqlDml extends Rule[LogicalPlan] {

  /** The target-relation extractor: a resolved `portable-delta`
    * relation (possibly under aliases), yielding its table path and
    * pinned index. */
  private object DeltaRel {
    @scala.annotation.tailrec
    def unapply(p: LogicalPlan): Option[PortableDeltaFileIndex] = p match {
      case SubqueryAlias(_, child) => unapply(child)
      case LogicalRelation(h: HadoopFsRelation, _, _, _, _)
          if h.location.isInstanceOf[PortableDeltaFileIndex] =>
        Some(h.location.asInstanceOf[PortableDeltaFileIndex])
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case c: InsertIntoHadoopFsRelationCommand
        if c.fileFormat.isInstanceOf[PortableDeltaReadOnlyFormat] &&
          c.staticPartitions.isEmpty =>
      c.fileIndex match {
        case Some(idx: PortableDeltaFileIndex) =>
          // INSERT OVERWRITE under partitionOverwriteMode=dynamic means
          // "replace only the partitions present in the data" — this
          // command's overwrite is whole-table, which would silently
          // truncate every OTHER partition. Refuse by name (the per-
          // insert option overrides the session conf, Spark's rule).
          val dynamicMode = c.options.get("partitionOverwriteMode")
            .map(_.equalsIgnoreCase("dynamic"))
            .getOrElse(conf.partitionOverwriteMode ==
              org.apache.spark.sql.internal.SQLConf.PartitionOverwriteMode.DYNAMIC)
          if (c.mode == SaveMode.Overwrite &&
              idx.snapBase.partitionColumns.nonEmpty && dynamicMode)
            throw new UnsupportedOperationException(
              s"INSERT OVERWRITE ${idx.path}: " +
                "spark.sql.sources.partitionOverwriteMode=dynamic asks for " +
                "per-partition replacement, but portable-delta INSERT " +
                "OVERWRITE replaces the WHOLE table — honoring it would " +
                "silently truncate partitions absent from the inserted " +
                "data. Set partitionOverwriteMode=static (whole-table " +
                "overwrite), or DELETE FROM the target partitions and " +
                "INSERT INTO for per-partition replacement")
          PortableDeltaInsertCommand(idx.path,
            idx.snapBase.schema.fieldNames.toSeq,
            idx.snapBase.partitionColumns,
            c.outputColumnNames, c.query,
            overwrite = c.mode == SaveMode.Overwrite)
        case _ => c // a foreign index under our format: keep the refusal
      }

    case DeleteFromTable(t @ DeltaRel(idx), condition) =>
      PortableDeltaDeleteCommand(idx.path,
        DmlExprs(unresolve(condition, t.outputSet, "DELETE condition")))

    case UpdateTable(t @ DeltaRel(idx), assignments, condition) =>
      val sets = assignments.map { a =>
        val name = a.key match {
          case attr: Attribute => attr.name
          case other => throw new UnsupportedOperationException(
            s"UPDATE of ${idx.path}: SET target $other is not a top-level " +
              "column — nested SET is not supported; update the whole " +
              "struct column instead")
        }
        name -> unresolve(a.value, t.outputSet, s"UPDATE SET $name")
      }
      PortableDeltaUpdateCommand(idx.path, sets.map(_._1),
        DmlExprs(Seq(condition.getOrElse(
          org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral))
          .map(unresolve(_, t.outputSet, "UPDATE condition")) ++
          sets.map(_._2): _*))

    case MergeIntoTable(t @ DeltaRel(idx), sourceTable, mergeCondition,
        matchedActions, notMatchedActions, notMatchedBySource, withSchemaEvo) =>
      rewriteMerge(idx, t, sourceTable, mergeCondition, matchedActions,
        notMatchedActions, notMatchedBySource, withSchemaEvo)
  }

  /** Detach a resolved expression from its relation: attribute
    * references become name-based lookups that re-resolve inside the
    * verb's own scan frame. Subqueries refuse (the verbs evaluate
    * predicates per-row over one frame). */
  private def unresolve(e: Expression, allowed: AttributeSet,
                        what: String): Expression = {
    require(!e.exists(_.isInstanceOf[PlanExpression[_]]),
      s"$what: subqueries are not supported in portable-delta SQL DML — " +
        "materialize the subquery into a column or use the Scala API")
    e.transform {
      case a: AttributeReference =>
        require(allowed.contains(a),
          s"$what references $a from outside the target table")
        UnresolvedAttribute.quoted(a.name)
    }
  }

  /** Two-sided rewrite for MERGE expressions: target attrs → `t`.col,
    * source attrs → `s`.col — the alias contract
    * [[PortableDelta.mergeInto]]'s joined frame evaluates under. */
  private def unresolveMerge(e: Expression, targetOut: AttributeSet,
                             sourceOut: AttributeSet, what: String): Expression = {
    require(!e.exists(_.isInstanceOf[PlanExpression[_]]),
      s"$what: subqueries are not supported in portable-delta SQL MERGE")
    e.transform {
      case a: AttributeReference if targetOut.contains(a) =>
        UnresolvedAttribute(Seq("t", a.name))
      case a: AttributeReference if sourceOut.contains(a) =>
        UnresolvedAttribute(Seq("s", a.name))
      case a: AttributeReference => throw new UnsupportedOperationException(
        s"$what references $a from neither MERGE side")
    }
  }

  /** Target-only rewrite for BY-SOURCE expressions: target attrs →
    * `t`.col; a source reference refuses (the SQL scope rule). The
    * analyzer resolves by-source conditions against the TARGET only,
    * so a source reference arrives as a leftover UnresolvedAttribute —
    * caught here by name rather than surfacing a generic
    * UNRESOLVED_COLUMN later. */
  private def unresolveTarget(e: Expression, targetOut: AttributeSet,
                              what: String): Expression = {
    require(!e.exists(_.isInstanceOf[PlanExpression[_]]),
      s"$what: subqueries are not supported in portable-delta SQL MERGE")
    e.transform {
      case a: AttributeReference if targetOut.contains(a) =>
        UnresolvedAttribute(Seq("t", a.name))
      case a: AttributeReference => throw new UnsupportedOperationException(
        s"$what references $a — WHEN NOT MATCHED BY SOURCE sees only the " +
          "target table")
      case u: UnresolvedAttribute => throw new UnsupportedOperationException(
        s"$what references ${u.name} — WHEN NOT MATCHED BY SOURCE sees " +
          "only the target table")
    }
  }

  private def rewriteMerge(idx: PortableDeltaFileIndex, target: LogicalPlan,
      source: LogicalPlan, mergeCondition: Expression,
      matchedActions: Seq[MergeAction], notMatchedActions: Seq[MergeAction],
      notMatchedBySource: Seq[MergeAction], withSchemaEvo: Boolean): LogicalPlan = {
    def refuse(why: String): Nothing = throw new UnsupportedOperationException(
      s"MERGE INTO ${idx.path}: $why — the supported SQL shape is an " +
        "equi-key ON clause with any number of ordered WHEN MATCHED " +
        "(UPDATE SET .../DELETE), WHEN NOT MATCHED (INSERT), and WHEN NOT " +
        "MATCHED BY SOURCE (UPDATE SET .../DELETE) clauses, each with an " +
        "optional AND condition")
    if (withSchemaEvo) refuse("WITH SCHEMA EVOLUTION is not supported")
    val tOut = target.outputSet
    val sOut = source.outputSet

    // ON: a conjunction of target-attr = source-attr equalities; the
    // key name is the TARGET column's, the source side names the
    // source column that must align to it
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val keyPairs: Seq[(String, String)] = conjuncts(mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tOut.contains(a) && sOut.contains(b) => a.name -> b.name
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if sOut.contains(a) && tOut.contains(b) => b.name -> a.name
      case other => refuse(s"ON conjunct $other is not target-col = source-col")
    }

    def assignName(a: Assignment, what: String): String = a.key match {
      case attr: Attribute => attr.name
      case other => refuse(s"$what target $other is not a top-level column")
    }

    // one flat expression stream, per clause [condition?] ++ values —
    // the command replays it against the clause specs
    val specs = Seq.newBuilder[SqlMergeClause]
    val exprs = Seq.newBuilder[Expression]
    matchedActions.foreach {
      case UpdateAction(cond, assignments, _) =>
        val sets = assignments.map { a =>
          val name = assignName(a, "UPDATE SET")
          name -> unresolveMerge(a.value, tOut, sOut, s"UPDATE SET $name")
        }
        specs += SqlMergeClause("matched", "update", cond.isDefined,
          sets.map(_._1))
        exprs ++= cond.map(unresolveMerge(_, tOut, sOut, "WHEN MATCHED AND"))
        exprs ++= sets.map(_._2)
      case DeleteAction(cond) =>
        specs += SqlMergeClause("matched", "delete", cond.isDefined, Nil)
        exprs ++= cond.map(unresolveMerge(_, tOut, sOut, "WHEN MATCHED AND"))
      case other => refuse(s"unsupported WHEN MATCHED action $other")
    }
    notMatchedActions.foreach {
      case InsertAction(cond, assignments) =>
        // condition and values see ONLY the source side
        val vals = assignments.map { a =>
          val name = assignName(a, "INSERT")
          name -> unresolve(a.value, sOut, s"INSERT value for $name")
        }
        specs += SqlMergeClause("notMatched", "insert", cond.isDefined,
          vals.map(_._1))
        exprs ++= cond.map(unresolve(_, sOut, "WHEN NOT MATCHED AND"))
        exprs ++= vals.map(_._2)
      case other => refuse(s"unsupported WHEN NOT MATCHED action $other")
    }
    notMatchedBySource.foreach {
      case UpdateAction(cond, assignments, _) =>
        val sets = assignments.map { a =>
          val name = assignName(a, "BY SOURCE UPDATE SET")
          name -> unresolveTarget(a.value, tOut, s"BY SOURCE UPDATE SET $name")
        }
        specs += SqlMergeClause("bySource", "update", cond.isDefined,
          sets.map(_._1))
        exprs ++= cond.map(unresolveTarget(_, tOut,
          "WHEN NOT MATCHED BY SOURCE AND"))
        exprs ++= sets.map(_._2)
      case DeleteAction(cond) =>
        specs += SqlMergeClause("bySource", "delete", cond.isDefined, Nil)
        exprs ++= cond.map(unresolveTarget(_, tOut,
          "WHEN NOT MATCHED BY SOURCE AND"))
      case other => refuse(s"unsupported WHEN NOT MATCHED BY SOURCE action $other")
    }

    // the source frame handed to mergeIntoFull must carry the TARGET's
    // key column names (from the ON equalities) for the join. A raw
    // source column whose name collides with a DIFFERENTLY-mapped key
    // would make the join ambiguous — refuse. INSERT values are now
    // per-clause value maps, so a key column's inserted value is free
    // to differ from the join key (s.id + 1 works).
    val derived: Seq[(String, Expression)] = keyPairs.map {
      case (tName, sName) => tName -> UnresolvedAttribute.quoted(sName)
    }
    source.output.foreach { a =>
      derived.find(_._1 == a.name).foreach {
        case (_, u: UnresolvedAttribute) if u.nameParts == Seq(a.name) => ()
        case (tName, _) => refuse(s"source column ${a.name} collides with " +
          s"the ON clause's $tName key mapping")
      }
    }

    PortableDeltaMergeCommand(idx.path, source, keyPairs.map(_._1),
      specs.result(), derived.map(_._1),
      DmlExprs((exprs.result() ++ derived.map(_._2)): _*))
  }
}

/** Opaque expression holder: keeps detached (UnresolvedAttribute-based)
  * expressions OUT of the command's `expressions` traversal, so the
  * analyzer's resolved-plan check never sees them. */
private[stac] final case class DmlExprs(es: Expression*)

/** Planned `DELETE FROM <portable-delta table> WHERE ...` — routes
  * through [[PortableDelta.delete]] (stats-narrowed snapshot, DV death
  * path, CDF, optimistic commit) and reports `num_affected_rows`. */
private[stac] final case class PortableDeltaDeleteCommand(
    tablePath: String, cond: DmlExprs) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("num_affected_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val st = PortableDelta.delete(spark, tablePath,
      org.apache.spark.sql.GraftSqlShim.column(cond.es.head))
    DmlCacheDrop(spark, tablePath)
    Seq(Row(st.deletedRows))
  }
}

/** Planned `UPDATE <portable-delta table> SET ... WHERE ...` — routes
  * through [[PortableDelta.update]]; `exprs` = condition, then one SET
  * value per `setCols` entry. */
private[stac] final case class PortableDeltaUpdateCommand(
    tablePath: String, setCols: Seq[String], exprs: DmlExprs)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("num_affected_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val cond = org.apache.spark.sql.GraftSqlShim.column(exprs.es.head)
    val sets = setCols.zip(exprs.es.tail).map { case (n, e) =>
      n -> org.apache.spark.sql.GraftSqlShim.column(e)
    }.toMap
    val st = PortableDelta.update(spark, tablePath, cond, sets)
    DmlCacheDrop(spark, tablePath)
    Seq(Row(st.updatedRows))
  }
}

/** One SQL MERGE clause as the command carries it: `kind` in
  * matched|notMatched|bySource, `action` in update|delete|insert,
  * `cols` the SET/INSERT column names in expression-stream order. */
private[stac] final case class SqlMergeClause(kind: String, action: String,
    hasCond: Boolean, cols: Seq[String])

/** Planned `MERGE INTO` — routes through [[PortableDelta.mergeIntoFull]]
  * (multi-clause, per-row first-match routing, BY SOURCE). `exprs`
  * packs, per clause in `clauses` order, the optional condition then
  * one value per `cols` entry; the trailing expressions are the
  * derived target-named key columns (in `derivedCols` order) added to
  * the source frame. The source plan rides as an inner child (already
  * analyzed). */
private[stac] final case class PortableDeltaMergeCommand(
    tablePath: String,
    source: LogicalPlan,
    keys: Seq[String],
    clauses: Seq[SqlMergeClause],
    derivedCols: Seq[String],
    exprs: DmlExprs) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = source :: Nil

  override val output: Seq[Attribute] = Seq(
    AttributeReference("num_affected_rows", LongType, nullable = false)(),
    AttributeReference("num_updated_rows", LongType, nullable = false)(),
    AttributeReference("num_deleted_rows", LongType, nullable = false)(),
    AttributeReference("num_inserted_rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.GraftSqlShim.column
    val es = exprs.es
    var i = 0
    def pop(): org.apache.spark.sql.Column = { val e = es(i); i += 1; column(e) }
    val matched = Seq.newBuilder[PortableDelta.MergeMatched]
    val notMatched = Seq.newBuilder[PortableDelta.MergeNotMatched]
    val bySource = Seq.newBuilder[PortableDelta.MergeBySource]
    clauses.foreach { c =>
      val cond = if (c.hasCond) Some(pop()) else None
      val vals = c.cols.map(n => n -> pop())
      c.kind match {
        case "matched" =>
          matched += PortableDelta.MergeMatched(c.action, cond,
            if (c.action == "update") Some(vals.toMap) else None)
        case "notMatched" =>
          notMatched += PortableDelta.MergeNotMatched(cond, Some(vals.toMap))
        case "bySource" =>
          bySource += PortableDelta.MergeBySource(c.action, cond, vals.toMap)
        case other =>
          throw new IllegalStateException(s"unknown merge clause kind $other")
      }
    }
    var src = org.apache.spark.sql.GraftSqlShim.ofRows(spark, source)
    derivedCols.zip(es.drop(i)).foreach { case (n, e) =>
      src = src.withColumn(n, column(e))
    }
    val st = PortableDelta.mergeIntoFull(spark, tablePath, src, keys,
      matched.result(), notMatched.result(), bySource.result())
    DmlCacheDrop(spark, tablePath)
    Seq(Row(st.updatedRows + st.deletedRows + st.insertedRows,
      st.updatedRows, st.deletedRows, st.insertedRows))
  }
}

/** Drop stale cached relations/plans of a mutated table — the pinned
  * snapshots behind any cached LogicalRelation are now behind. */
private[stac] object DmlCacheDrop {
  def apply(spark: SparkSession, tablePath: String): Unit = {
    spark.sessionState.catalog.invalidateAllCachedTables()
    spark.catalog.refreshByPath(tablePath)
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
    DmlCacheDrop(spark, tablePath)
    Seq.empty
  }
}
