package graft.stac

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** Registered geometry UDFs (SURVEY §2.4 G1/G2/G4).
  *
  * These run only at the ingest/egress boundary (same position as the
  * reference's shapely calls, `stac_geoparquet/arrow/_batch.py:93-118,
  * 150-161`); the normalized table keeps geometry as WKB binary so scans
  * and filters stay codegen'd.
  */
object GeoFunctions {

  case class Bounds(xmin: Double, ymin: Double, xmax: Double, ymax: Double)

  val geojsonToWkbUdf = udf((s: String) => Wkb.geoJsonToWkb(s))
  val wkbToGeojsonUdf = udf((b: Array[Byte]) => Wkb.wkbToGeoJson(b))
  val wkbBoundsUdf = udf((b: Array[Byte]) =>
    Wkb.bounds(b).map { case (x0, y0, x1, y1) => Bounds(x0, y0, x1, y1) })

  def geojson_to_wkb(c: Column): Column = geojsonToWkbUdf(c)
  def wkb_to_geojson(c: Column): Column = wkbToGeojsonUdf(c)
  def wkb_bounds(c: Column): Column = wkbBoundsUdf(c)

  /** Register for SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("geojson_to_wkb", geojsonToWkbUdf)
    spark.udf.register("wkb_to_geojson", wkbToGeojsonUdf)
    spark.udf.register("wkb_bounds", wkbBoundsUdf)
    spark.udf.register("st_intersects", stIntersectsUdf)
    spark.udf.register("st_within", stWithinUdf)
    spark.udf.register("st_contains", stContainsUdf)
  }

  // ------------------------- exact JTS predicates -------------------------
  // The envelope tests above are the PUSHDOWN layer (bbox.* conjuncts the
  // parquet scan prunes on); these are the exact-shape verify BEHIND that
  // prefilter — polygons whose envelopes overlap but shapes don't are the
  // rows only this layer rejects. JTS robust predicates over the stored
  // ISO WKB (the reference stores real WKB too: arrow/_batch.py:93-118).
  // Deliberately UDFs, not codegen expressions: they run post-prefilter on
  // the surviving fraction, never against the full scan.

  /** JTS parse of our ISO WKB (2-D and 1000+ Z codes). Geometries are
    * parsed per call — these predicates sit behind the envelope prefilter,
    * so the parse count is the candidate count, not the corpus size. The
    * reader is per-thread (WKBReader is stateful during a read but holds
    * no cross-read state), so the hot path allocates nothing. */
  private val readerTl = new ThreadLocal[org.locationtech.jts.io.WKBReader] {
    override def initialValue() = new org.locationtech.jts.io.WKBReader()
  }
  private[stac] def jtsRead(wkb: Array[Byte]): org.locationtech.jts.geom.Geometry =
    readerTl.get().read(wkb)

  private def relate(op: String, a: Array[Byte], b: Array[Byte]): Boolean = {
    if (a == null || b == null) false
    else {
      val (ga, gb) = (jtsRead(a), jtsRead(b))
      op match {
        case "intersects" => ga.intersects(gb)
        case "within"     => ga.within(gb)   // non-strict: equal shapes are within
        case "contains"   => ga.contains(gb)
      }
    }
  }

  val stIntersectsUdf = udf((a: Array[Byte], b: Array[Byte]) => relate("intersects", a, b))
  val stWithinUdf = udf((a: Array[Byte], b: Array[Byte]) => relate("within", a, b))
  val stContainsUdf = udf((a: Array[Byte], b: Array[Byte]) => relate("contains", a, b))

  def st_intersects(a: Column, b: Column): Column = stIntersectsUdf(a, b)
  def st_within(a: Column, b: Column): Column = stWithinUdf(a, b)
  def st_contains(a: Column, b: Column): Column = stContainsUdf(a, b)

  /** Column-vs-literal exact predicate with the literal PREPARED once per
    * task (JTS PreparedGeometry caches the literal's edge index — the
    * filter-by-region shape where one geometry meets millions of rows).
    * `op`: intersects | within (column within literal) | contains
    * (column contains literal) | touches | crosses | overlaps | equals
    * (the last four are symmetric, so no role mapping is needed). */
  def relateLiteral(op: String, geomWkb: Column, literalWkb: Array[Byte]): Column = {
    require(Set("intersects", "within", "contains",
      "touches", "crosses", "overlaps", "equals")(op), s"unknown spatial op: $op")
    val f = new PreparedRelate(op, literalWkb)
    udf((b: Array[Byte]) => f(b)).apply(geomWkb)
  }

  /** Serializable holder: the prepared literal is rebuilt lazily on each
    * executor after closure deserialization (PreparedGeometry itself is
    * not serializable and must not ship). CQL2 "within literal" means the
    * prepared side is the CONTAINER, so within maps to prep.contains. */
  private final class PreparedRelate(op: String, litWkb: Array[Byte]) extends Serializable {
    @transient private lazy val prep =
      org.locationtech.jts.geom.prep.PreparedGeometryFactory.prepare(jtsRead(litWkb))
    def apply(wkb: Array[Byte]): Boolean =
      if (wkb == null) false
      else op match {
        case "intersects" => prep.intersects(jtsRead(wkb))
        case "within"     => prep.contains(jtsRead(wkb)) // column within literal
        case "contains"   => prep.within(jtsRead(wkb))   // column contains literal
        case "touches"    => prep.touches(jtsRead(wkb))
        case "crosses"    => prep.crosses(jtsRead(wkb))
        case "overlaps"   => prep.overlaps(jtsRead(wkb))
        // topological equality; PreparedGeometry has no equals accessor
        case "equals"     => prep.getGeometry.equalsTopo(jtsRead(wkb))
      }
  }

  /** All four exact relations of a WKB column against one prepared
    * literal, with the envelope prefilter folded in — ONE JTS parse per
    * row (the reference's one-decode-per-geometry discipline,
    * `_batch.py:150-161`), versus one parse per predicate when each
    * relation is its own [[relateLiteral]] column. The row's envelope
    * comes in as the four bbox struct fields so envelope-disjoint rows
    * short-circuit `(false,false,false,true)` without touching WKB, and
    * within/contains skip their JTS call when the envelope necessary
    * condition already fails. Null geometry → null struct, so all four
    * relations drop the row under three-valued logic (the s_disjoint
    * null-consistency fix). */
  def relateLiteralAll(geomWkb: Column, bbox: Column, literalWkb: Array[Byte],
                       lx0: Double, ly0: Double, lx1: Double, ly1: Double): Column = {
    val f = new PreparedRelateAll(literalWkb, lx0, ly0, lx1, ly1)
    udf((b: Array[Byte], x0: Double, y0: Double, x1: Double, y1: Double) => f(b, x0, y0, x1, y1))
      .apply(geomWkb, bbox.getField("xmin"), bbox.getField("ymin"),
        bbox.getField("xmax"), bbox.getField("ymax"))
  }

  /** N exact relations of ONE row geometry against N prepared literals,
    * as array<boolean> aligned with `specs` — the general parse-once
    * form: a workload probing k predicates (possibly against different
    * regions) pays ONE JTS parse per row, not k. Null geometry → null
    * array (all relations drop the row). */
  def relateLiterals(specs: Seq[(String, Array[Byte])], geomWkb: Column): Column = {
    val allowed = Set("intersects", "within", "contains",
      "touches", "crosses", "overlaps", "equals")
    specs.foreach { case (op, _) =>
      require(allowed(op), s"unknown spatial op: $op") }
    val f = new PreparedRelateArray(specs)
    udf((b: Array[Byte]) => f(b)).apply(geomWkb)
  }

  private final class PreparedRelateArray(specs: Seq[(String, Array[Byte])])
      extends Serializable {
    @transient private lazy val preps = specs.map { case (op, lit) =>
      op -> org.locationtech.jts.geom.prep.PreparedGeometryFactory.prepare(jtsRead(lit))
    }
    def apply(wkb: Array[Byte]): Seq[Boolean] =
      if (wkb == null) null
      else {
        val g = jtsRead(wkb) // the ONE parse
        preps.map {
          case ("intersects", p) => p.intersects(g)
          case ("within", p)     => p.contains(g) // column within literal
          case ("contains", p)   => p.within(g)   // column contains literal
          case ("touches", p)    => p.touches(g)
          case ("crosses", p)    => p.crosses(g)
          case ("overlaps", p)   => p.overlaps(g)
          case ("equals", p)     => p.getGeometry.equalsTopo(g)
          case (op, _)           => throw new IllegalStateException(op)
        }
      }
  }

  case class Relations(intersects: Boolean, within: Boolean,
                       contains: Boolean, disjoint: Boolean)

  private final class PreparedRelateAll(litWkb: Array[Byte],
      lx0: Double, ly0: Double, lx1: Double, ly1: Double) extends Serializable {
    @transient private lazy val prep =
      org.locationtech.jts.geom.prep.PreparedGeometryFactory.prepare(jtsRead(litWkb))
    def apply(wkb: Array[Byte], x0: Double, y0: Double, x1: Double, y1: Double): Relations =
      if (wkb == null) null
      else {
        val overlap = x0 <= lx1 && x1 >= lx0 && y0 <= ly1 && y1 >= ly0
        if (!overlap) Relations(intersects = false, within = false,
          contains = false, disjoint = true)
        else {
          val g = jtsRead(wkb) // the ONE parse
          val it = prep.intersects(g)
          // envelope containment is necessary for exact containment, so a
          // failed envelope test skips the (more expensive) JTS relate
          val envWithin = x0 >= lx0 && x1 <= lx1 && y0 >= ly0 && y1 <= ly1
          val envContains = x0 <= lx0 && x1 >= lx1 && y0 <= ly0 && y1 >= ly1
          Relations(it,
            within = envWithin && prep.contains(g), // column within literal
            contains = envContains && prep.within(g),
            disjoint = !it)
        }
      }
  }

  /** ISO WKB for the axis-aligned rectangle [xmin,xmax]×[ymin,ymax] — the
    * bbox-literal face of the exact predicates (a bbox argument IS this
    * polygon per the CQL2 spec). */
  def bboxPolygonWkb(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Array[Byte] = {
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    import org.locationtech.jts.geom.Coordinate
    val ring = Array(
      new Coordinate(xmin, ymin), new Coordinate(xmax, ymin),
      new Coordinate(xmax, ymax), new Coordinate(xmin, ymax),
      new Coordinate(xmin, ymin))
    new org.locationtech.jts.io.WKBWriter(2).write(gf.createPolygon(ring))
  }

  val bboxPolygonWkbUdf = udf((x0: Double, y0: Double, x1: Double, y1: Double) =>
    bboxPolygonWkb(x0, y0, x1, y1))

  /** Column form: the rectangle polygon WKB of per-row bbox bounds — how a
    * synthetic/bbox-only frame materializes a `geometry` column the exact
    * predicates can run on. */
  def bbox_polygon_wkb(x0: Column, y0: Column, x1: Column, y1: Column): Column =
    bboxPolygonWkbUdf(x0, y0, x1, y1)
}
