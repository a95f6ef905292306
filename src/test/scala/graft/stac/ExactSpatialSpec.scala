package graft.stac

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-geometry spatial predicates (JTS verify behind the envelope
  * prefilter) — the fidelity upgrade over pure bbox semantics. Pins:
  * the motivating envelope-overlap/shape-disjoint rejection, asymmetric
  * operator order, 3-D WKB interop (our ISO Z codes through JTS),
  * null tolerance, and that the pushable bbox conjuncts still reach the
  * parquet scan when the exact UDF is conjoined. */
class ExactSpatialSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  /** Triangle items: lower-left right triangles (x,y)-(x+2,y)-(x,y+2). */
  private def triangles(pts: (String, Double, Double)*) =
    pts.toSeq.toDF("id", "x", "y")
      .select(col("id"),
        struct(col("x").as("xmin"), col("y").as("ymin"),
          (col("x") + 2.0).as("xmax"), (col("y") + 2.0).as("ymax")).as("bbox"),
        GeoFunctions.geojson_to_wkb(format_string(
          """{"type":"Polygon","coordinates":[[[%s,%s],[%s,%s],[%s,%s],[%s,%s]]]}""",
          col("x"), col("y"), col("x") + 2.0, col("y"),
          col("x"), col("y") + 2.0, col("x"), col("y"))).as("geometry"))

  private def ids(df: org.apache.spark.sql.DataFrame, cql: String): Seq[String] =
    df.filter(Cql2.filter(cql)).select("id").as[String].collect().toSeq.sorted

  test("envelope overlaps but shapes don't: exact s_intersects rejects") {
    // two lower-left triangles on the anti-diagonal: boxes overlap on
    // [1,2]² but the shapes stay on opposite sides of x+y = 3
    val items = triangles(("near", 0.0, 0.0), ("far", 1.5, 1.5))
    val lit = """{"type":"Polygon","coordinates":[[[1.4,1.4],[3.5,1.4],[1.4,3.5],[1.4,1.4]]]}"""
    // "far" intersects the query triangle; "near"'s shape (x+y ≤ 2) can't
    // reach it even though near's bbox [0,2]² overlaps the literal's bbox
    assert(ids(items, s"""{"op":"s_intersects","args":[{"property":"geometry"},$lit]}""")
      == Seq("far"))
    // bbox property = envelope semantics keeps both (the prefilter answer)
    assert(ids(items, """{"op":"s_intersects","args":[{"property":"bbox"},{"bbox":[1.4,1.4,3.5,3.5]}]}""")
      == Seq("far", "near"))
    // s_disjoint is the exact negation
    assert(ids(items, s"""{"op":"s_disjoint","args":[{"property":"geometry"},$lit]}""")
      == Seq("near"))
  }

  test("asymmetric within/contains honor argument order with real shapes") {
    val items = triangles(("t", 1.0, 1.0))
    val big = """{"type":"Polygon","coordinates":[[[0.0,0.0],[10.0,0.0],[0.0,10.0],[0.0,0.0]]]}"""
    val tiny = """{"type":"Polygon","coordinates":[[[1.1,1.1],[1.2,1.1],[1.1,1.2],[1.1,1.1]]]}"""
    assert(ids(items, s"""{"op":"s_within","args":[{"property":"geometry"},$big]}""") == Seq("t"))
    assert(ids(items, s"""{"op":"s_within","args":[$tiny,{"property":"geometry"}]}""") == Seq("t"))
    assert(ids(items, s"""{"op":"s_contains","args":[{"property":"geometry"},$tiny]}""") == Seq("t"))
    assert(ids(items, s"""{"op":"s_contains","args":[$big,{"property":"geometry"}]}""") == Seq("t"))
    // a triangle poking out of the container fails exact within even
    // though its bbox is inside the container's bbox
    val poke = triangles(("p", 8.5, 8.5)) // bbox [8.5,10.5]² ⊄ big's triangle
    assert(ids(poke, s"""{"op":"s_within","args":[{"property":"geometry"},$big]}""").isEmpty)
  }

  test("JTS reads our 3-D ISO WKB (1000+ type codes)") {
    val tri3d =
      """{"type":"Polygon","coordinates":[[[0,0,5],[2,0,5],[0,2,5],[0,0,5]]]}"""
    val wkb = Wkb.geoJsonToWkb(tri3d)
    val g = GeoFunctions.jtsRead(wkb)
    assert(g.getGeometryType == "Polygon")
    // planar predicate ignores Z
    val pt = GeoFunctions.jtsRead(Wkb.geoJsonToWkb("""{"type":"Point","coordinates":[0.5,0.5]}"""))
    assert(g.intersects(pt))
  }

  test("null geometry rows are rejected, not NPE'd") {
    val items = triangles(("a", 0.0, 0.0))
      .union(Seq(("n", 50.0, 50.0)).toDF("id", "x", "y")
        .select(col("id"),
          struct(col("x").as("xmin"), col("y").as("ymin"),
            (col("x") + 2.0).as("xmax"), (col("y") + 2.0).as("ymax")).as("bbox"),
          lit(null).cast("binary").as("geometry")))
    val all = """{"type":"Polygon","coordinates":[[[-10.0,-10.0],[100.0,-10.0],[-10.0,100.0],[-10.0,-10.0]]]}"""
    assert(ids(items, s"""{"op":"s_intersects","args":[{"property":"geometry"},$all]}""") == Seq("a"))
  }

  test("exact filter keeps the bbox conjuncts pushable into the parquet scan") {
    val tmp = java.nio.file.Files.createTempDirectory("exact_push").toString + "/items"
    triangles(("a", 0.0, 0.0), ("b", 30.0, 30.0), ("c", 60.0, 60.0))
      .write.mode("overwrite").parquet(tmp)
    val lit = """{"type":"Polygon","coordinates":[[[0.5,0.5],[5.0,0.5],[0.5,5.0],[0.5,0.5]]]}"""
    val out = spark.read.parquet(tmp)
      .filter(Cql2.filter(s"""{"op":"s_intersects","args":[{"property":"geometry"},$lit]}"""))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("bbox.xmin"),
      s"envelope conjuncts must stay pushable beside the exact UDF:\n$plan")
    assert(out.select("id").as[String].collect().toSeq == Seq("a"))
  }

  test("spatialRelations (parse-once) ≡ the per-predicate filter columns") {
    // a grid population straddling the literal: some envelope-disjoint,
    // some envelope-overlap/shape-disjoint, some intersecting, some within
    val pts = for { i <- 0 until 12; j <- 0 until 12 }
      yield (s"g$i-$j", i * 1.3 - 4.0, j * 1.3 - 4.0)
    val items = triangles(pts: _*)
    val lit = """{"type":"Polygon","coordinates":[[[0.0,0.0],[9.0,0.0],[0.0,9.0],[0.0,0.0]]]}"""
    def cql(op: String) = s"""{"op":"$op","args":[{"property":"geometry"},$lit]}"""
    val both = items
      .withColumn("rel", Cql2.spatialRelations(lit))
      .withColumn("p_int", Cql2.filter(cql("s_intersects")))
      .withColumn("p_win", Cql2.filter(cql("s_within")))
      .withColumn("p_con", Cql2.filter(cql("s_contains")))
      .withColumn("p_dis", Cql2.filter(cql("s_disjoint")))
    val mismatch = both.filter(
      col("rel.intersects") =!= col("p_int") || col("rel.within") =!= col("p_win") ||
        col("rel.contains") =!= col("p_con") || col("rel.disjoint") =!= col("p_dis"))
    assert(mismatch.count() == 0,
      s"parse-once struct must agree with per-predicate filters:\n${mismatch.select("id").as[String].collect().mkString(",")}")
    // and the population is non-trivial: every relation fires somewhere
    assert(both.filter(col("p_int")).count() > 0 && both.filter(col("p_win")).count() > 0
      && both.filter(col("p_dis")).count() > 0)
  }

  test("geometry literal carrying a bbox member is the shape, not its envelope") {
    // GeoJSON §5 allows a geometry object to carry an optional bbox; the
    // literal must still be evaluated as the SHAPE. "corner" overlaps the
    // triangle's bbox but not the triangle itself — a bbox-first reading
    // of the literal would wrongly keep it.
    val items = triangles(("hit", 0.0, 0.0), ("corner", 7.0, 7.0))
    val lit =
      """{"type":"Polygon","bbox":[-1.0,-1.0,10.0,10.0],"coordinates":[[[-1.0,-1.0],[10.0,-1.0],[-1.0,10.0],[-1.0,-1.0]]]}"""
    assert(ids(items, s"""{"op":"s_intersects","args":[{"property":"geometry"},$lit]}""")
      == Seq("hit"))
    // parse-once path agrees
    val rel = items.withColumn("rel", Cql2.spatialRelations(lit))
    assert(rel.filter(col("rel.intersects")).select("id").as[String].collect().toSeq == Seq("hit"))
  }

  test("null geometry does not satisfy s_disjoint") {
    val items = triangles(("a", 0.0, 0.0))
      .union(Seq(("n", 50.0, 50.0)).toDF("id", "x", "y")
        .select(col("id"),
          struct(col("x").as("xmin"), col("y").as("ymin"),
            (col("x") + 2.0).as("xmax"), (col("y") + 2.0).as("ymax")).as("bbox"),
          lit(null).cast("binary").as("geometry")))
    val far = """{"type":"Polygon","coordinates":[[[90.0,90.0],[92.0,90.0],[90.0,92.0],[90.0,90.0]]]}"""
    // both rows are far from the literal, but "n"'s geometry is unknown —
    // three-valued logic must drop it, same as s_intersects would
    assert(ids(items, s"""{"op":"s_disjoint","args":[{"property":"geometry"},$far]}""")
      == Seq("a"))
    val rel = items.withColumn("rel", Cql2.spatialRelations(far))
    assert(rel.filter(col("rel.disjoint")).select("id").as[String].collect().toSeq == Seq("a"))
  }

  test("geomJoin rejects corner pairs the bbox join keeps") {
    // dx = 1, dy = 2 → boxes overlap, hexagon |dx+dy| ≤ 2 violated
    val a = Seq(("a1", 1.0, 2.0)).toDF("ida", "xa0", "ya0")
      .withColumn("wkb_a", GeoFunctions.geojson_to_wkb(format_string(
        """{"type":"Polygon","coordinates":[[[%s,%s],[%s,%s],[%s,%s],[%s,%s]]]}""",
        col("xa0"), col("ya0"), col("xa0") + 2.0, col("ya0"),
        col("xa0"), col("ya0") + 2.0, col("xa0"), col("ya0"))))
      .withColumn("xa1", col("xa0") + 2.0).withColumn("ya1", col("ya0") + 2.0)
    val b = Seq(("b1", 0.0, 0.0), ("b2", 1.0, 1.0)).toDF("idb", "xb0", "yb0")
      .withColumn("wkb_b", GeoFunctions.geojson_to_wkb(format_string(
        """{"type":"Polygon","coordinates":[[[%s,%s],[%s,%s],[%s,%s],[%s,%s]]]}""",
        col("xb0"), col("yb0"), col("xb0") + 2.0, col("yb0"),
        col("xb0"), col("yb0") + 2.0, col("xb0"), col("yb0"))))
      .withColumn("xb1", col("xb0") + 2.0).withColumn("yb1", col("yb0") + 2.0)
    val boxPairs = graft.operators.SpatialJoin.bboxJoin(a, b, 2.0,
      Seq("xa0", "ya0", "xa1", "ya1"), Seq("xb0", "yb0", "xb1", "yb1"))
      .select("idb").as[String].collect().toSeq.sorted
    val exactPairs = graft.operators.SpatialJoin.geomJoin(a, b, 2.0,
      Seq("xa0", "ya0", "xa1", "ya1"), Seq("xb0", "yb0", "xb1", "yb1"),
      "wkb_a", "wkb_b")
      .select("idb").as[String].collect().toSeq.sorted
    assert(boxPairs == Seq("b1", "b2")) // envelope keeps both
    assert(exactPairs == Seq("b2"))     // a1 at (1,2) vs b1 at (0,0): dx+dy = 3 → shapes miss
  }
}
