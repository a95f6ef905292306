package graft.stac

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** CQL2 (JSON encoding) filter → Catalyst `Column` translator.
  *
  * The reference delegates CQL2 to pgstac's `search()` SQL function
  * (`pgstac_reader.py:178-181`) — it never evaluates a filter itself. Here
  * the filter becomes a native Spark predicate over the spec-shape table
  * (top-level property columns, µs timestamps, struct bbox), so it
  * participates in Catalyst pushdown: a translated `datetime >=` or
  * `bbox.xmin <=` lands in the parquet scan's PushedFilters and prunes row
  * groups — the STAC-GeoParquet spec's motivating access path
  * (`_to_arrow.py:124-130`).
  *
  * Supported (CQL2 "basic" + the operator set pgstac's `search()`
  * accepts):
  *   and/or/not; = <> < <= > >=; between, in, like, isNull;
  *   casei / accenti (case- and accent-insensitive wrappers, CQL2
  *   "Case-insensitive Comparison" / unaccent-equivalent via NFD);
  *   a_equals/a_contains/a_containedBy/a_overlaps over array columns
  *   (CQL2 "Array Operators", e.g. stac_extensions);
  *   the FULL temporal algebra (OGC 21-065 Allen relations) over
  *   instants and intervals — t_before/t_after/t_disjoint/t_intersects/
  *   t_equals/t_during/t_contains/t_overlaps/t_overlappedBy/t_meets/
  *   t_metBy/t_starts/t_startedBy/t_finishes/t_finishedBy, with
  *   interval bounds from timestamps, dates, property references, or
  *   ".." (open);
  *   s_intersects/s_disjoint/s_within/s_contains (and the symmetric
  *   s_equals/s_touches/s_crosses/s_overlaps) with EXACT geometry
  *   semantics on the `geometry` property: the planar envelope test over
  *   the struct bbox column is the PUSHDOWN prefilter (a necessary
  *   condition the parquet scan prunes row groups on), conjoined with a
  *   JTS robust-predicate verify over the stored WKB — polygons whose
  *   envelopes overlap but shapes don't are rejected by the verify, not
  *   by the prefilter (gate stac19 pins a population where the two
  *   answers differ). On the `bbox` property the envelope test IS exact
  *   (the property is an axis-aligned rectangle). Anything beyond this
  *   set stays on the reference's delegation path (PgstacReader →
  *   `search()`).
  *
  * Literals: strings, numbers, booleans, arrays, {"timestamp": s},
  * {"date": s}, {"interval": [lo, hi]}, {"property": name}, GeoJSON
  * geometry objects, and {"bbox": [xmin,ymin,xmax,ymax]}.
  */
object Cql2 {

  @transient private lazy val mapper = new ObjectMapper()

  /** OGC 21-065 conformance-class URIs this translator implements —
    * the self-declaration a STAC API `filter` extension advertises in
    * its landing page `conformsTo`. Both encodings (cql2-text and
    * cql2-json) cover every listed class; anything beyond stays on the
    * reference's delegation path (PgstacReader → pgstac `search()`). */
  val ConformanceClasses: Seq[String] = Seq(
    "http://www.opengis.net/spec/cql2/1.0/conf/cql2-text",
    "http://www.opengis.net/spec/cql2/1.0/conf/cql2-json",
    "http://www.opengis.net/spec/cql2/1.0/conf/basic-cql2",
    "http://www.opengis.net/spec/cql2/1.0/conf/advanced-comparison-operators",
    "http://www.opengis.net/spec/cql2/1.0/conf/case-insensitive-comparison",
    "http://www.opengis.net/spec/cql2/1.0/conf/accent-insensitive-comparison",
    "http://www.opengis.net/spec/cql2/1.0/conf/basic-spatial-functions",
    "http://www.opengis.net/spec/cql2/1.0/conf/basic-spatial-functions-plus",
    "http://www.opengis.net/spec/cql2/1.0/conf/spatial-functions",
    "http://www.opengis.net/spec/cql2/1.0/conf/temporal-functions",
    "http://www.opengis.net/spec/cql2/1.0/conf/array-functions",
    "http://www.opengis.net/spec/cql2/1.0/conf/property-property",
    "http://www.opengis.net/spec/cql2/1.0/conf/functions",
    "http://www.opengis.net/spec/cql2/1.0/conf/arithmetic")

  /** A function registry for OGC 21-065's "Functions" conformance
    * class: lower-cased name → Column builder over the translated
    * argument columns. */
  type Functions = Map[String, Seq[Column] => Column]

  /** Standard scalar functions shipped registered — the common set a
    * server would advertise; callers extend per deployment via the
    * `functions` parameter of [[filter]]/[[filterText]]. Every entry
    * is a plain `org.apache.spark.sql.functions` composition, so the
    * call stays codegen'd and pushdown-friendly. */
  val StandardFunctions: Functions = Map(
    "upper" -> (a => upper(a(0))),
    "lower" -> (a => lower(a(0))),
    "abs" -> (a => abs(a(0))),
    "ceil" -> (a => ceil(a(0))),
    "floor" -> (a => floor(a(0))),
    "min" -> (a => least(a: _*)),
    "max" -> (a => greatest(a: _*)))

  /** Parse a cql2-json document into a Spark predicate. `functions`
    * extends [[StandardFunctions]] for the spec's
    * `{"function":{"name":…},"args":[…]}` call form (names matched
    * case-insensitively; an unknown name fails BY NAME at parse time,
    * never silently). */
  def filter(cql2Json: String,
             functions: Functions = Map.empty): Column = {
    implicit val fns: Functions = effectiveFns(functions)
    toColumn(mapper.readTree(cql2Json))
  }

  /** Parse a cql2-TEXT document (OGC 21-065 text encoding — the STAC
    * API GET default) into a Spark predicate: [[Cql2Text]] parses to
    * the same AST the JSON path consumes, so both encodings share ONE
    * semantics (and one fuzz surface). */
  def filterText(cql2Text: String,
                 functions: Functions = Map.empty): Column = {
    implicit val fns: Functions = effectiveFns(functions)
    toColumn(Cql2Text.parse(cql2Text))
  }

  private def effectiveFns(user: Functions): Functions =
    StandardFunctions ++ user.map { case (k, v) => k.toLowerCase -> v }

  /** cql2-text → cql2-json string — the bridge to every JSON-consuming
    * seam (pgstac `search_query()` delegation via
    * [[PgstacReader.readItems]]'s `cql2Json` argument, stored filters). */
  def textToJson(cql2Text: String): String = Cql2Text.parse(cql2Text).toString

  private def toColumn(n: JsonNode)(implicit fns: Functions): Column = {
    if (n.isObject && n.has("function")) {
      // OGC 21-065 functionRef: {"function": {"name": …, "args": […]}}
      val f = n.get("function")
      val name = f.get("name").asText
      val builder = fns.getOrElse(name.toLowerCase,
        throw new IllegalArgumentException(
          s"unknown CQL2 function: $name (registered: " +
            s"${fns.keys.toSeq.sorted.mkString(", ")})"))
      val args = Option(f.get("args")).filterNot(_.isNull)
        .map(_.elements().asScala.toIndexedSeq).getOrElse(IndexedSeq.empty)
      builder(args.map(toColumn))
    } else if (n.isObject && n.has("op")) {
      val op = n.get("op").asText
      val args = n.get("args").elements().asScala.toIndexedSeq
      op match {
        case "and" => args.map(toColumn).reduce(_ && _)
        case "or"  => args.map(toColumn).reduce(_ || _)
        case "not" => !toColumn(args(0))
        case "="   => toColumn(args(0)) === toColumn(args(1))
        case "<>"  => toColumn(args(0)) =!= toColumn(args(1))
        case "<"   => toColumn(args(0)) < toColumn(args(1))
        case "<="  => toColumn(args(0)) <= toColumn(args(1))
        case ">"   => toColumn(args(0)) > toColumn(args(1))
        case ">="  => toColumn(args(0)) >= toColumn(args(1))
        case "between" =>
          val e = toColumn(args(0))
          e >= toColumn(args(1)) && e <= toColumn(args(2))
        case "in" =>
          val list = args(1).elements().asScala.toSeq.map(toColumn)
          toColumn(args(0)).isInCollection(list)
        case "like"   => toColumn(args(0)).like(args(1).asText)
        case "isNull" => toColumn(args(0)).isNull
        case "casei"  => lower(toColumn(args(0)))
        // accent-insensitive wrapper: NFD-decompose then drop combining
        // marks (the portable equivalent of Postgres unaccent). A UDF, not
        // an expression — accenti terms are rare and tiny (filter
        // literals/ids), never a hot scan column.
        case "accenti" => stripAccents(toColumn(args(0)))
        // CQL2 array operators: a_contains(a,b) ⇔ every element of b is in
        // a; a_containedBy is the converse; a_equals is mutual containment
        // (order- AND duplicate-insensitive — pgstac's `a @> b AND a <@ b`;
        // a sorted-array compare would wrongly distinguish ["eo","eo"]
        // from ["eo"])
        case "a_equals" =>
          val (a, b) = (toColumn(args(0)), toColumn(args(1)))
          size(array_except(a, b)) === 0 && size(array_except(b, a)) === 0
        case "a_contains" =>
          size(array_except(toColumn(args(1)), toColumn(args(0)))) === 0
        case "a_containedBy" =>
          size(array_except(toColumn(args(0)), toColumn(args(1)))) === 0
        case "a_overlaps" =>
          arrays_overlap(toColumn(args(0)), toColumn(args(1)))
        // full CQL2 temporal algebra (OGC 21-065 "Temporal Operators" —
        // Allen's interval relations): every operand is a closed interval
        // [start, end]; instants are the degenerate [t, t]. The spec's
        // definitions are STRICT where they read < / > (t_during excludes
        // bound-touching; the inclusive reading belongs to t_intersects).
        case "t_before" | "t_after" | "t_disjoint" | "t_intersects" | "t_equals"
           | "t_during" | "t_contains" | "t_overlaps" | "t_overlappedBy"
           | "t_meets" | "t_metBy" | "t_starts" | "t_startedBy"
           | "t_finishes" | "t_finishedBy" =>
          val (s1, e1) = tInterval(args(0))
          val (s2, e2) = tInterval(args(1))
          op match {
            case "t_before"       => bLt(e1, s2)
            case "t_after"        => bGt(s1, e2)
            case "t_disjoint"     => bLt(e1, s2) || bGt(s1, e2)
            case "t_intersects"   => bLe(s1, e2) && bGe(e1, s2)
            case "t_equals"       => bEq(s1, s2) && bEq(e1, e2)
            case "t_during"       => bGt(s1, s2) && bLt(e1, e2)
            case "t_contains"     => bLt(s1, s2) && bGt(e1, e2)
            case "t_overlaps"     => bLt(s1, s2) && bGt(e1, s2) && bLt(e1, e2)
            case "t_overlappedBy" => bGt(s1, s2) && bLt(s1, e2) && bGt(e1, e2)
            case "t_meets"        => bEq(e1, s2)
            case "t_metBy"        => bEq(s1, e2)
            case "t_starts"       => bEq(s1, s2) && bLt(e1, e2)
            case "t_startedBy"    => bEq(s1, s2) && bGt(e1, e2)
            case "t_finishes"     => bGt(s1, s2) && bEq(e1, e2)
            case "t_finishedBy"   => bLt(s1, s2) && bEq(e1, e2)
          }
        case "s_intersects" | "s_disjoint" | "s_within" | "s_contains"
           | "s_equals" | "s_touches" | "s_crosses" | "s_overlaps" =>
          spatial(op, args(0), args(1))
        // OGC CQL2 arithmetic class (21-065 "Arithmetic Expressions"):
        // + - * / plus the advanced operators % (modulo, sign of the
        // dividend — the Spark, DuckDB, and Postgres convention), div
        // (integer division truncating toward zero) and ^
        // (exponentiation). Arithmetic terms appear INSIDE comparisons
        // — plain Column arithmetic, so a pushable predicate over an
        // arithmetic of literals constant-folds in Catalyst and still
        // reaches the scan.
        case "+" => toColumn(args(0)) + toColumn(args(1))
        case "-" =>
          if (args.length == 1) negate(toColumn(args(0)))
          else toColumn(args(0)) - toColumn(args(1))
        case "*" => toColumn(args(0)) * toColumn(args(1))
        case "/" => toColumn(args(0)) / toColumn(args(1))
        case "%" => toColumn(args(0)) % toColumn(args(1))
        case "div" =>
          (toColumn(args(0)).cast("double") / toColumn(args(1)))
            .cast("long")
        case "^" => pow(toColumn(args(0)), toColumn(args(1)))
        case other => throw new IllegalArgumentException(s"unsupported CQL2 op: $other")
      }
    } else if (n.isObject && n.has("property")) {
      // nested property paths ("properties.datetime") work via getField
      n.get("property").asText.split('.').toSeq match {
        case head +: rest => rest.foldLeft(col(head))(_ getField _)
        case _            => throw new IllegalArgumentException("empty property name")
      }
    } else if (n.isObject && n.has("timestamp")) tsLit(n.get("timestamp").asText)
    else if (n.isObject && n.has("date")) to_date(lit(n.get("date").asText))
    else if (n.isArray) array(n.elements().asScala.toSeq.map(toColumn): _*)
    else if (n.isTextual) lit(n.asText)
    else if (n.isIntegralNumber) lit(n.asLong)
    else if (n.isNumber) lit(n.asDouble)
    else if (n.isBoolean) lit(n.asBoolean)
    else if (n.isNull) lit(null)
    else throw new IllegalArgumentException(s"unsupported CQL2 term: $n")
  }

  private def tsLit(s: String): Column = to_timestamp(lit(s))

  /** An interval bound: finite (a Column), or TRULY unbounded (CQL2's
    * ".." open bound). ±∞ are resolved at PARSE time — each of the 15
    * Allen comparisons folds to a constant or a plain column compare, so
    * finite/finite predicates stay pushable and an open bound can never
    * mis-evaluate against extreme real timestamps (the round-7 advice on
    * the previous sentinel-clamp encoding: a property inside the
    * sentinel's final second compared wrongly). */
  private sealed trait Bnd
  private case object NegInf extends Bnd
  private case object PosInf extends Bnd
  private final case class Fin(c: Column) extends Bnd

  /** The folded constant, but NULL when the finite operand is NULL — SQL
    * three-valued logic survives the fold (`-∞ < x` is true for every
    * KNOWN x; for unknown x the comparison is unknown, and the fuzz
    * harness's independent DuckDB evaluation holds us to exactly that). */
  private def nullT(c: Column): Column =
    when(c.isNull, lit(null).cast("boolean")).otherwise(lit(true))
  private def nullF(c: Column): Column =
    when(c.isNull, lit(null).cast("boolean")).otherwise(lit(false))

  private def bLt(a: Bnd, b: Bnd): Column = (a, b) match {
    case (NegInf, NegInf)   => lit(false)
    case (NegInf, Fin(y))   => nullT(y)
    case (NegInf, PosInf)   => lit(true)
    case (Fin(x), NegInf)   => nullF(x)
    case (Fin(x), PosInf)   => nullT(x)
    case (PosInf, Fin(y))   => nullF(y)
    case (PosInf, _)        => lit(false)
    case (Fin(x), Fin(y))   => x < y
  }
  private def bGt(a: Bnd, b: Bnd): Column = bLt(b, a)
  private def bLe(a: Bnd, b: Bnd): Column = (a, b) match {
    case (NegInf, NegInf)   => lit(true)
    case (NegInf, Fin(y))   => nullT(y)
    case (NegInf, PosInf)   => lit(true)
    case (Fin(x), NegInf)   => nullF(x)
    case (Fin(x), PosInf)   => nullT(x)
    case (PosInf, Fin(y))   => nullF(y)
    case (PosInf, NegInf)   => lit(false)
    case (PosInf, PosInf)   => lit(true)
    case (Fin(x), Fin(y))   => x <= y
  }
  private def bGe(a: Bnd, b: Bnd): Column = bLe(b, a)
  private def bEq(a: Bnd, b: Bnd): Column = (a, b) match {
    case (NegInf, NegInf)   => lit(true)
    case (PosInf, PosInf)   => lit(true)
    case (Fin(x), Fin(y))   => x === y
    case (Fin(x), _)        => nullF(x)
    case (_, Fin(y))        => nullF(y)
    case _                  => lit(false)
  }

  /** A temporal operand as a closed interval (start, end): an instant
    * (property reference, {"timestamp"}, {"date"}) is the degenerate
    * [t, t]; {"interval": [lo, hi]} takes each bound from a
    * timestamp/date string, a nested {"property"} reference (the
    * start_datetime/end_datetime shape STAC interval properties use),
    * or ".." (unbounded → ±∞, folded at parse time). */
  private def tInterval(n: JsonNode)(implicit fns: Functions): (Bnd, Bnd) =
    if (n.isObject && n.has("interval")) {
      val iv = n.get("interval")
      def bound(b: JsonNode, open: Bnd): Bnd =
        if (b.isTextual && b.asText == "..") open
        else if (b.isTextual) Fin(tsLit(b.asText))
        else Fin(toColumn(b))
      (bound(iv.get(0), NegInf), bound(iv.get(1), PosInf))
    } else {
      val c = toColumn(n)
      (Fin(c), Fin(c))
    }

  private val stripAccents = udf { (s: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}", "")
  }

  /** Spatial predicate: envelope prefilter (pushable bbox.* conjuncts)
    * AND, on the `geometry` property, a JTS exact verify over the WKB
    * column. One side must be the `geometry`/`bbox` property; the other
    * a GeoJSON object or bbox array. Argument ORDER matters for the
    * asymmetric operators: s_within(a, b) means a within b, so when the
    * property is the second argument the roles flip (within ↔ contains).
    *
    * Envelope necessity (why the prefilter never drops a true row):
    * a ∩ b ≠ ∅ ⇒ env(a) ∩ env(b) ≠ ∅, and a ⊆ b ⇒ env(a) ⊆ env(b) —
    * each exact relation implies its envelope counterpart. s_disjoint is
    * the negation of the exact intersects, so envelope-disjoint rows
    * short-circuit true without ever parsing WKB. */
  private def spatial(op: String, a: JsonNode, b: JsonNode): Column = {
    val propFirst = a.isObject && a.has("property")
    val (propSide, litSide) =
      if (propFirst) (a, b)
      else if (b.isObject && b.has("property")) (b, a)
      else throw new IllegalArgumentException(s"$op needs a property argument")
    val prop = propSide.get("property").asText
    require(prop == "geometry" || prop == "bbox",
      s"$op supported on geometry/bbox, got $prop")
    val (xmin, ymin, xmax, ymax) = envelope(litSide)
    val overlap = col("bbox.xmin") <= xmax && col("bbox.xmax") >= xmin &&
      col("bbox.ymin") <= ymax && col("bbox.ymax") >= ymin
    val propWithinLit = col("bbox.xmin") >= xmin && col("bbox.xmax") <= xmax &&
      col("bbox.ymin") >= ymin && col("bbox.ymax") <= ymax
    val propContainsLit = col("bbox.xmin") <= xmin && col("bbox.xmax") >= xmax &&
      col("bbox.ymin") <= ymin && col("bbox.ymax") >= ymax
    // interiors (open sets) intersect — the strict form of `overlap`;
    // rectangles touch exactly when their closed envelopes meet but
    // their interiors do not
    val strictOverlap = col("bbox.xmin") < xmax && col("bbox.xmax") > xmin &&
      col("bbox.ymin") < ymax && col("bbox.ymax") > ymin
    if (prop == "bbox") {
      // the bbox property IS an axis-aligned rectangle: envelope = exact
      op match {
        case "s_intersects" => overlap
        case "s_disjoint"   => !overlap
        case "s_within"     => if (propFirst) propWithinLit else propContainsLit
        case "s_contains"   => if (propFirst) propContainsLit else propWithinLit
        case "s_equals"     => propWithinLit && propContainsLit
        case "s_touches"    => overlap && !strictOverlap
        // crosses requires the intersection's dimension to be LESS than
        // both operands' max dimension — impossible for two areas
        case "s_crosses"    => lit(false)
        case "s_overlaps"   => strictOverlap && !propWithinLit && !propContainsLit
      }
    } else {
      val litWkb = literalWkb(litSide)
      def exact(jtsOp: String) =
        GeoFunctions.relateLiteral(jtsOp, col("geometry"), litWkb)
      op match {
        case "s_intersects" => overlap && exact("intersects")
        // null geometry must not satisfy disjoint: relate() maps null WKB
        // to false, and !(overlap && false) would otherwise be true —
        // inconsistent with s_intersects/s_within, which drop such rows
        case "s_disjoint"   => col("geometry").isNotNull && !(overlap && exact("intersects"))
        case "s_within" =>
          if (propFirst) propWithinLit && exact("within")
          else propContainsLit && exact("contains")
        case "s_contains" =>
          if (propFirst) propContainsLit && exact("contains")
          else propWithinLit && exact("within")
        // the remaining four are symmetric — argument order is irrelevant.
        // Each keeps a pushable envelope necessary condition in front of
        // the JTS verify: equal shapes have equal envelopes; touching,
        // crossing, or overlapping shapes have intersecting envelopes.
        case "s_equals"   => propWithinLit && propContainsLit && exact("equals")
        case "s_touches"  => overlap && exact("touches")
        case "s_crosses"  => overlap && exact("crosses")
        case "s_overlaps" => overlap && exact("overlaps")
      }
    }
  }

  /** All four exact spatial relations of the row's `geometry`/`bbox`
    * columns against one literal (GeoJSON object or `{"bbox": [...]}`),
    * as `struct(intersects, within, contains, disjoint)` — the parse-once
    * path for workloads that evaluate several spatial predicates against
    * the same region. Each per-predicate [[filter]] column JTS-parses the
    * row geometry independently; this evaluates ONE UDF that parses once
    * and derives all four (envelope short-circuits inside, so
    * envelope-disjoint rows never touch WKB). Null geometry → null
    * struct: every relation, disjoint included, drops the row. */
  def spatialRelations(literalJson: String): Column = {
    val n = mapper.readTree(literalJson)
    val (xmin, ymin, xmax, ymax) = envelope(n)
    GeoFunctions.relateLiteralAll(col("geometry"), col("bbox"), literalWkb(n),
      xmin, ymin, xmax, ymax)
  }

  /** The literal argument as ISO WKB: a GeoJSON object directly, a bbox
    * array as its rectangle polygon (the CQL2 spec's reading of a bbox
    * operand). */
  private def literalWkb(n: JsonNode): Array[Byte] =
    // the GeoJSON branch must win over the bbox branch: a geometry object
    // may legally carry an optional `bbox` member (GeoJSON §5), and taking
    // the rectangle then would silently evaluate the exact predicates
    // against the envelope. Only envelope() gets the bbox shortcut.
    if (n.isObject && n.has("type")) Wkb.nodeToWkb(n)
    else if (n.isObject && n.has("bbox")) {
      val b = n.get("bbox").elements().asScala.toIndexedSeq.map(_.asDouble)
      if (b.length == 6) GeoFunctions.bboxPolygonWkb(b(0), b(1), b(3), b(4))
      else GeoFunctions.bboxPolygonWkb(b(0), b(1), b(2), b(3))
    } else throw new IllegalArgumentException(s"unsupported spatial literal: $n")

  private def envelope(n: JsonNode): (Double, Double, Double, Double) = {
    if (n.isObject && n.has("bbox")) {
      val b = n.get("bbox").elements().asScala.toIndexedSeq.map(_.asDouble)
      // 6-element bbox carries z bounds in the middle positions
      if (b.length == 6) (b(0), b(1), b(3), b(4)) else (b(0), b(1), b(2), b(3))
    } else if (n.isObject && n.has("type")) {
      Wkb.bounds(Wkb.nodeToWkb(n))
        .getOrElse(throw new IllegalArgumentException("empty geometry in s_intersects"))
    } else throw new IllegalArgumentException(s"unsupported spatial literal: $n")
  }
}
