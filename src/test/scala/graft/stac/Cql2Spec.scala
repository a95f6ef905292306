package graft.stac

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CQL2-JSON → Column translation, evaluated over a small spec-shape table. */
class Cql2Spec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  import spark.implicits._

  private lazy val items = Seq(
    // id, collection, datetime, cloud, (xmin, ymin, xmax, ymax)
    ("a", "s2", "2024-06-01T00:00:00Z", 5.0, (0.0, 0.0, 1.0, 1.0)),
    ("b", "s2", "2024-07-15T12:00:00Z", 40.0, (10.0, 10.0, 11.0, 11.0)),
    ("c", "landsat", "2023-01-01T00:00:00Z", 0.5, (-120.0, 30.0, -119.0, 31.0)),
    ("d", "s2", "2024-06-20T06:30:00Z", 19.9, (0.5, 0.5, 2.0, 2.0))
  ).toDF("id", "collection", "dt", "eo:cloud_cover", "b")
    .select(col("id"), col("collection"), to_timestamp(col("dt")).as("datetime"),
      col("eo:cloud_cover"),
      struct(col("b._1").as("xmin"), col("b._2").as("ymin"),
        col("b._3").as("xmax"), col("b._4").as("ymax")).as("bbox"),
      // geometry = the bbox rectangle, so exact and envelope answers agree
      // on this fixture (the shapes-differ population lives in ExactSpatialSpec)
      GeoFunctions.bbox_polygon_wkb(col("b._1"), col("b._2"),
        col("b._3"), col("b._4")).as("geometry"))

  private def ids(cql: String): Seq[String] =
    items.filter(Cql2.filter(cql)).select("id").as[String].collect().toSeq.sorted

  test("the README motivating query: collection + datetime range + cloud + bbox") {
    val cql = """{"op":"and","args":[
      {"op":"=","args":[{"property":"collection"},"s2"]},
      {"op":">=","args":[{"property":"datetime"},{"timestamp":"2024-06-01T00:00:00Z"}]},
      {"op":"<","args":[{"property":"datetime"},{"timestamp":"2024-07-01T00:00:00Z"}]},
      {"op":"<","args":[{"property":"eo:cloud_cover"},20]},
      {"op":"s_intersects","args":[{"property":"geometry"},
        {"type":"Polygon","coordinates":[[[1.2,1.2],[3.0,1.2],[3.0,3.0],[1.2,3.0],[1.2,1.2]]]}]}]}"""
    assert(ids(cql) == Seq("d"))
  }

  test("or / not / <>") {
    val cql = """{"op":"or","args":[
      {"op":"<>","args":[{"property":"collection"},"s2"]},
      {"op":"not","args":[{"op":"<","args":[{"property":"eo:cloud_cover"},30]}]}]}"""
    assert(ids(cql) == Seq("b", "c"))
  }

  test("between and in") {
    val cql = """{"op":"and","args":[
      {"op":"between","args":[{"property":"eo:cloud_cover"},1,25]},
      {"op":"in","args":[{"property":"collection"},["s2","landsat"]]}]}"""
    assert(ids(cql) == Seq("a", "d"))
  }

  test("arithmetic: + - * / % div ^ inside comparisons") {
    // cloud covers: a=5.0 b=40.0 c=0.5 d=19.9
    assert(ids("""{"op":">","args":[{"op":"+","args":[{"property":"eo:cloud_cover"},10]},25]}""") ==
      Seq("b", "d"))
    assert(ids("""{"op":"<","args":[{"op":"-","args":[{"property":"eo:cloud_cover"},0.5]},0.1]}""") ==
      Seq("c"))
    assert(ids("""{"op":">=","args":[{"op":"*","args":[{"property":"eo:cloud_cover"},2]},39.8]}""") ==
      Seq("b", "d"))
    assert(ids("""{"op":"=","args":[{"op":"/","args":[{"property":"eo:cloud_cover"},2]},2.5]}""") ==
      Seq("a"))
    // % keeps the dividend's sign (Spark/DuckDB/Postgres convention)
    assert(ids("""{"op":"=","args":[{"op":"%","args":[{"property":"eo:cloud_cover"},2]},1.0]}""") ==
      Seq("a"))
    // div truncates toward zero; 40 div 6 = 6, 19.9 div 6 = 3
    assert(ids("""{"op":"=","args":[{"op":"div","args":[{"property":"eo:cloud_cover"},6]},3]}""") ==
      Seq("d"))
    // ^ is exponentiation: 0.5^2 = 0.25 (exact in binary floating point)
    assert(ids("""{"op":"=","args":[{"op":"^","args":[{"property":"eo:cloud_cover"},2]},0.25]}""") ==
      Seq("c"))
    // unary minus; nested arithmetic precedence comes from the AST shape
    assert(ids("""{"op":"<","args":[{"op":"-","args":[{"property":"eo:cloud_cover"}]},-30]}""") ==
      Seq("b"))
    assert(ids("""{"op":"=","args":[{"op":"*","args":[{"op":"+","args":[{"property":"eo:cloud_cover"},5]},2]},20]}""") ==
      Seq("a"))
  }

  test("truly open interval bounds: extreme timestamps compare correctly") {
    // a row INSIDE the old sentinel's final second (9999-12-31 23:59:59.5)
    // and one before year 1 sentinel semantics could bite — the round-7
    // advice: sentinel clamping evaluated these wrongly against ".."
    val far = Seq(("x", "9999-12-31T23:59:59.5Z"), ("y", "2020-01-01T00:00:00Z"))
      .toDF("id", "s").select(col("id"), to_timestamp(col("s")).as("datetime"))
    def fids(cql: String): Seq[String] =
      far.filter(Cql2.filter(cql)).select("id").as[String].collect().toSeq.sorted
    // t_before(datetime, [.., 2021]): x (year 9999) must NOT pass; with
    // the old hi-sentinel encoding this was decided against 23:59:59.0
    assert(fids("""{"op":"t_intersects","args":[{"property":"datetime"},
      {"interval":["..","2021-01-01T00:00:00Z"]}]}""") == Seq("y"))
    // open upper bound: everything from 2021 on intersects, including the
    // final-second row the sentinel clamp would have excluded
    assert(fids("""{"op":"t_intersects","args":[{"property":"datetime"},
      {"interval":["2021-01-01T00:00:00Z",".."]}]}""") == Seq("x"))
    // fully open interval intersects every instant
    assert(fids("""{"op":"t_intersects","args":[{"property":"datetime"},
      {"interval":["..",".."]}]}""") == Seq("x", "y"))
    // an instant can never be BEFORE an interval open at the low end
    assert(fids("""{"op":"t_before","args":[{"property":"datetime"},
      {"interval":["..","2021-01-01T00:00:00Z"]}]}""") == Seq())
  }

  test("like and isNull") {
    assert(ids("""{"op":"like","args":[{"property":"collection"},"s%"]}""") == Seq("a", "b", "d"))
    assert(ids("""{"op":"not","args":[{"op":"isNull","args":[{"property":"id"}]}]}""") ==
      Seq("a", "b", "c", "d"))
  }

  test("temporal operators") {
    assert(ids("""{"op":"t_before","args":[{"property":"datetime"},{"timestamp":"2024-01-01T00:00:00Z"}]}""") ==
      Seq("c"))
    assert(ids("""{"op":"t_after","args":[{"property":"datetime"},{"timestamp":"2024-07-01T00:00:00Z"}]}""") ==
      Seq("b"))
    // t_during is STRICT per OGC 21-065 (Allen's "during"): "a" sits
    // exactly on the interval's low bound and is excluded; the inclusive
    // reading is t_intersects
    assert(ids(
      """{"op":"t_during","args":[{"property":"datetime"},
        {"interval":["2024-06-01T00:00:00Z","2024-06-30T00:00:00Z"]}]}""") == Seq("d"))
    assert(ids(
      """{"op":"t_intersects","args":[{"property":"datetime"},
        {"interval":["2024-06-01T00:00:00Z","2024-06-30T00:00:00Z"]}]}""") == Seq("a", "d"))
    // open bound: everything from June 1 on (boundary included — the
    // instant [t,t] intersects [t, ..])
    assert(ids(
      """{"op":"t_intersects","args":[{"property":"datetime"},
        {"interval":["2024-06-01T00:00:00Z",".."]}]}""") == Seq("a", "b", "d"))
    // interval-vs-interval Allen relations: the month of June strictly
    // contains [a's instant .. d's instant]
    assert(ids(
      """{"op":"t_metBy","args":[{"property":"datetime"},
        {"interval":["2024-05-01T00:00:00Z","2024-06-01T00:00:00Z"]}]}""") == Seq("a"))
  }

  test("s_intersects with a bbox literal, including 3-D bbox") {
    assert(ids("""{"op":"s_intersects","args":[{"property":"bbox"},{"bbox":[-125.0,25.0,-110.0,35.0]}]}""") ==
      Seq("c"))
    assert(ids("""{"op":"s_intersects","args":[{"property":"bbox"},{"bbox":[-125.0,25.0,0.0,-110.0,35.0,100.0]}]}""") ==
      Seq("c"))
  }

  test("date literal and unsupported op") {
    assert(ids("""{"op":">=","args":[{"property":"datetime"},{"date":"2024-07-01"}]}""") == Seq("b"))
    val e = intercept[IllegalArgumentException](Cql2.filter("""{"op":"s_frobnicate","args":[]}"""))
    assert(e.getMessage.contains("unsupported CQL2 op"))
  }

  test("symmetric spatial ops: s_equals / s_touches / s_overlaps / s_crosses") {
    // geometry property (JTS exact path behind the envelope prefilter)
    assert(ids("""{"op":"s_equals","args":[{"property":"geometry"},{"bbox":[0.0,0.0,1.0,1.0]}]}""")
      == Seq("a"))
    // "a" shares only the edge x=1 with the literal; "d" overlaps its interior
    assert(ids("""{"op":"s_touches","args":[{"property":"geometry"},{"bbox":[1.0,0.0,2.0,1.0]}]}""")
      == Seq("a"))
    // partial interior overlap, neither side contains the other
    assert(ids("""{"op":"s_overlaps","args":[{"property":"geometry"},{"bbox":[0.75,0.75,3.0,3.0]}]}""")
      == Seq("a", "d"))
    // a line through "a"'s interior; it runs ALONG "d"'s bottom edge
    // (boundary, not interior), so only "a" is crossed — a distinction
    // rectangle arithmetic cannot express
    assert(ids("""{"op":"s_crosses","args":[{"property":"geometry"},
      {"type":"LineString","coordinates":[[-1.0,0.5],[3.0,0.5]]}]}""") == Seq("a"))
    // bbox property: pure rectangle semantics, no JTS
    assert(ids("""{"op":"s_equals","args":[{"property":"bbox"},{"bbox":[0.0,0.0,1.0,1.0]}]}""")
      == Seq("a"))
    assert(ids("""{"op":"s_touches","args":[{"property":"bbox"},{"bbox":[1.0,0.0,2.0,1.0]}]}""")
      == Seq("a"))
    // two areas can never cross
    assert(ids("""{"op":"s_crosses","args":[{"property":"bbox"},{"bbox":[0.0,0.0,1.0,1.0]}]}""").isEmpty)
  }

  test("casei compares case-insensitively on both sides") {
    val cql = """{"op":"=","args":[
      {"op":"casei","args":[{"property":"collection"}]},
      {"op":"casei","args":["LANDSAT"]}]}"""
    assert(ids(cql) == Seq("c"))
  }

  test("accenti strips diacritics on both sides") {
    val cql = """{"op":"=","args":[
      {"op":"accenti","args":[{"property":"collection"}]},
      {"op":"accenti","args":["lándsât"]}]}"""
    assert(ids(cql) == Seq("c"))
  }

  private lazy val tagged = Seq(
    ("a", Seq("eo", "proj")),
    ("b", Seq("proj", "eo")),      // same set, different order
    ("c", Seq("eo", "proj", "sar")),
    ("d", Seq("view"))
  ).toDF("id", "stac_extensions")

  private def tids(cql: String): Seq[String] =
    tagged.filter(Cql2.filter(cql)).select("id").as[String].collect().toSeq.sorted

  test("array operators: a_equals / a_contains / a_containedBy / a_overlaps") {
    // a_equals is order-insensitive (set-style, like pgstac's SQL)
    assert(tids("""{"op":"a_equals","args":[{"property":"stac_extensions"},["proj","eo"]]}""") ==
      Seq("a", "b"))
    // a_contains: the column contains every listed element
    assert(tids("""{"op":"a_contains","args":[{"property":"stac_extensions"},["eo","sar"]]}""") ==
      Seq("c"))
    // a_containedBy: every column element is in the listed set
    assert(tids("""{"op":"a_containedBy","args":[{"property":"stac_extensions"},["eo","proj","view"]]}""") ==
      Seq("a", "b", "d"))
    assert(tids("""{"op":"a_overlaps","args":[{"property":"stac_extensions"},["sar","view"]]}""") ==
      Seq("c", "d"))
  }

  test("spatial operators: s_disjoint / s_within / s_contains, either argument order") {
    // disjoint = exact negation of intersects under envelope semantics
    assert(ids("""{"op":"s_disjoint","args":[{"property":"bbox"},{"bbox":[-125.0,25.0,-110.0,35.0]}]}""") ==
      Seq("a", "b", "d"))
    // a and d within [0,0,5,5]; b is not
    assert(ids("""{"op":"s_within","args":[{"property":"bbox"},{"bbox":[0.0,0.0,5.0,5.0]}]}""") ==
      Seq("a", "d"))
    // property contains the literal point-ish box
    assert(ids("""{"op":"s_contains","args":[{"property":"bbox"},{"bbox":[0.1,0.1,0.2,0.2]}]}""") ==
      Seq("a"))
    // flipped argument order: literal within property ⇔ property contains it
    assert(ids("""{"op":"s_within","args":[{"bbox":[0.1,0.1,0.2,0.2]},{"property":"bbox"}]}""") ==
      Seq("a"))
  }

  test("translated predicate reaches the parquet scan as pushed filters") {
    val dir = java.nio.file.Files.createTempDirectory("cql2push").toString
    items.write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir).filter(Cql2.filter(
      """{"op":"and","args":[
        {"op":"=","args":[{"property":"collection"},"s2"]},
        {"op":"s_intersects","args":[{"property":"bbox"},{"bbox":[0.0,0.0,5.0,5.0]}]}]}"""))
    val physical = scan.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: ["))
    assert(physical.contains("IsNotNull(collection)") || physical.contains("EqualTo(collection,s2)"))
    // nested bbox.* predicates push down as parquet filters on the struct leaves
    assert(physical.contains("bbox.xmin") || physical.contains("`bbox`.`xmin`"))
  }
}
