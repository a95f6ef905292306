package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Expression, GetStructField, GreaterThanOrEqual, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, DoubleType, Metadata, MetadataBuilder, StructType}

/** Consume the GeoParquet `covering` footer declaration on READ — the
  * reader-side half of what the reference's writer emits
  * (`_to_parquet.py:99-107` writes `covering.bbox` so "readers can
  * prune"): a spatial predicate over the GEOMETRY column of a foreign
  * GeoParquet file is automatically strengthened with pushable bounds
  * conjuncts over whatever bbox columns the file DECLARES — not just
  * this engine's own `bbox.xmin` struct convention.
  *
  * Flow: [[GeoParquetCovering.read]] parses one part file's `geo`
  * footer, stamps the declared covering paths into the geometry
  * column's FIELD METADATA (riding Catalyst resolution, the idiomatic
  * carrier), and [[RewriteCoveringIntersects]] opens
  * [[StIntersectsRect]] filters over such columns into
  * `cov.xmin <= qxmax AND cov.xmax >= qxmin AND …` + the exact JTS
  * check — the bounds land in `PushedFilters`, so row-group min/max
  * stats prune before any geometry is decoded. At 100 TB this is the
  * difference between decoding WKB for every row and reading the
  * handful of row groups a query rectangle touches.
  *
  * Null semantics note: the GeoParquet spec requires declared covering
  * values to BE the geometry's bounds, so the added conjuncts are
  * necessary conditions; the rewrite fires only inside Filter, where
  * null and false coincide. */
object GeoParquetCovering {

  @transient private lazy val mapper = new ObjectMapper()

  /** Field-metadata key carrying the covering paths (JSON:
    * {"xmin": ["col","field"], …}). */
  val MetadataKey = "graft.geoparquet.covering.bbox"

  /** Parse the `covering.bbox` declaration of `path`'s primary geometry
    * column from the `geo` footer of one part file (they are identical
    * by construction — the writer stamps every part). Returns
    * (geometryColumn, bound → [column, field]) when declared. */
  def coveringOf(conf: org.apache.hadoop.conf.Configuration,
                 path: String): Option[(String, Map[String, Seq[String]])] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val it = fs.listFiles(p, true)
    var part: Option[String] = None
    while (part.isEmpty && it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet") && !f.getName.startsWith(".") &&
          !f.getName.startsWith("_")) part = Some(f.toString)
    }
    for {
      f <- part
      geoJson <- GeoParquetWriter.readFooterMetadata(conf, f).get("geo")
      geo = mapper.readTree(geoJson)
      primary <- Option(geo.get("primary_column")).map(_.asText())
      colNode <- Option(geo.get("columns")).flatMap(c => Option(c.get(primary)))
      cov <- Option(colNode.get("covering")).flatMap(c => Option(c.get("bbox")))
    } yield {
      import scala.jdk.CollectionConverters._
      val paths = Seq("xmin", "ymin", "xmax", "ymax").flatMap { b =>
        Option(cov.get(b)).map(arr =>
          b -> arr.elements().asScala.map(_.asText()).toSeq)
      }.toMap
      (primary, paths)
    }
  }

  /** Read a (possibly foreign) GeoParquet layout, stamping any declared
    * covering into the geometry column's field metadata so
    * [[RewriteCoveringIntersects]] can prune on it. Files without a
    * covering read unchanged (the exact predicate still works — no
    * pruning, no error). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    coveringOf(spark.sessionState.newHadoopConf(), path) match {
      case Some((geomCol, paths))
          if paths.size == 4 && df.columns.contains(geomCol) =>
        val node = mapper.createObjectNode()
        paths.foreach { case (b, p) =>
          val arr = node.putArray(b); p.foreach(arr.add)
        }
        val md = new MetadataBuilder()
          .withMetadata(Metadata.fromJson(
            df.schema(geomCol).metadata.json))
          .putString(MetadataKey, mapper.writeValueAsString(node))
          .build()
        df.withColumn(geomCol,
          org.apache.spark.sql.functions.col(geomCol).as(geomCol, md))
      case _ => df
    }
  }

  /** Column builder for [[StIntersectsRect]]. */
  def stIntersectsRect(geom: Column, xmin: Double, ymin: Double,
                       xmax: Double, ymax: Double): Column =
    org.apache.spark.sql.GraftSqlShim.column(StIntersectsRect(
      org.apache.spark.sql.GraftSqlShim.expression(geom),
      Literal(xmin), Literal(ymin), Literal(xmax), Literal(ymax)))

}

/** `st_intersects_rect(geometry, xmin, ymin, xmax, ymax)` — exact JTS
  * intersection of a WKB geometry with a query rectangle. Fully
  * evaluable on its own; [[RewriteCoveringIntersects]] strengthens it
  * with pushable covering-column bounds when the scanned file declared
  * them (`opened` marks an already-rewritten occurrence). */
case class StIntersectsRect(geom: Expression, qxmin: Expression,
                            qymin: Expression, qxmax: Expression,
                            qymax: Expression, opened: Boolean = false)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(geom, qxmin, qymin, qxmax, qymax)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "st_intersects_rect"

  override def checkInputDataTypes(): TypeCheckResult =
    if (geom.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"st_intersects_rect needs a WKB binary geometry, got ${geom.dataType.sql}")
    else if (!children.tail.forall(_.dataType == DoubleType))
      TypeCheckResult.TypeCheckFailure("query bounds must be doubles")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val g = geom.eval(input)
    if (g == null) return null
    val (x0, y0, x1, y1) = (qxmin.eval(input), qymin.eval(input),
      qxmax.eval(input), qymax.eval(input))
    if (x0 == null || y0 == null || x1 == null || y1 == null) return null
    val jts = GeoFunctions.jtsRead(g.asInstanceOf[Array[Byte]])
    val env = new org.locationtech.jts.geom.Envelope(
      x0.asInstanceOf[Double], x1.asInstanceOf[Double],
      y0.asInstanceOf[Double], y1.asInstanceOf[Double])
    jts.getFactory.toGeometry(env).intersects(jts)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): StIntersectsRect =
    copy(geom = c(0), qxmin = c(1), qymin = c(2), qxmax = c(3), qymax = c(4))
}

/** Sibling of [[graft.plans.RewriteBboxIntersects]] for FOREIGN
  * GeoParquet layouts: a Filter's [[StIntersectsRect]] over a geometry
  * attribute whose field metadata carries a covering declaration gains
  * the four pushable bounds conjuncts over the DECLARED bbox columns,
  * resolved against the child plan's output. The exact JTS check stays
  * (covering bounds are a necessary condition only).
  *
  * Injected as a POST-HOC RESOLUTION rule ([[graft.GraftExtensions]]),
  * not an optimizer rule: it must fire while the covering columns are
  * still in the filter child's output and the geometry attribute still
  * carries the reader-stamped metadata — the optimizer's predicate
  * pushdown substitutes the alias away and column pruning drops the
  * covering struct before any late-batch rule would run. Idempotent via
  * the `opened` marker. */
object RewriteCoveringIntersects extends Rule[LogicalPlan] {
  @transient private lazy val mapper = new ObjectMapper()

  private def coveringPaths(a: Attribute): Option[Map[String, Seq[String]]] =
    if (!a.metadata.contains(GeoParquetCovering.MetadataKey)) None
    else {
      import scala.jdk.CollectionConverters._
      val node = mapper.readTree(
        a.metadata.getString(GeoParquetCovering.MetadataKey))
      val m = Seq("xmin", "ymin", "xmax", "ymax").flatMap { b =>
        Option(node.get(b)).map(arr =>
          b -> arr.elements().asScala.map(_.asText()).toSeq)
      }.toMap
      if (m.size == 4) Some(m) else None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f: Filter =>
      val out = f.child.output
      def boundRef(path: Seq[String]): Option[Expression] = path match {
        case Seq(c, fld) =>
          out.find(_.name == c).flatMap { attr =>
            attr.dataType match {
              case st: StructType if st.fieldNames.contains(fld) &&
                  st(fld).dataType == DoubleType =>
                Some(GetStructField(attr, st.fieldIndex(fld), Some(fld)))
              case _ => None
            }
          }
        case Seq(c) =>
          out.find(a => a.name == c && a.dataType == DoubleType)
        case _ => None
      }
      f.copy(condition = f.condition.transform {
        case si @ StIntersectsRect(geom: Attribute, x0, y0, x1, y1, false) =>
          coveringPaths(geom).flatMap { paths =>
            for {
              cxmin <- boundRef(paths("xmin"))
              cymin <- boundRef(paths("ymin"))
              cxmax <- boundRef(paths("xmax"))
              cymax <- boundRef(paths("ymax"))
            } yield And(
              And(And(LessThanOrEqual(cxmin, x1), GreaterThanOrEqual(cxmax, x0)),
                And(LessThanOrEqual(cymin, y1), GreaterThanOrEqual(cymax, y0))),
              si.copy(opened = true))
          }.getOrElse(si.copy(opened = true))
      })
  }
}
