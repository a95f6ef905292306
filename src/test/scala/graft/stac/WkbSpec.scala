package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

class WkbSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def hex(b: Array[Byte]) = java.util.HexFormat.of().formatHex(b)

  test("point ISO WKB bytes match the spec layout") {
    val wkb = Wkb.geoJsonToWkb("""{"type":"Point","coordinates":[1.5,2.5]}""")
    // 01 (LE) 01000000 (Point) + 1.5 + 2.5 little-endian doubles
    assert(hex(wkb) == "0101000000000000000000f83f0000000000000440")
  }

  test("3-D geometry gets ISO +1000 type code") {
    val wkb = Wkb.geoJsonToWkb(
      """{"type":"Point","coordinates":[1.0,2.0,3.0]}""")
    // 03e9 = 1001 (PointZ)
    assert(hex(wkb).startsWith("01e9030000"))
    assert(wkb.length == 1 + 4 + 24)
  }

  test("round trip preserves every geometry type, 2-D and 3-D") {
    val geoms = Seq(
      """{"type":"Point","coordinates":[1.5,-2.5]}""",
      """{"type":"LineString","coordinates":[[0.0,0.0],[1.0,1.0]]}""",
      """{"type":"Polygon","coordinates":[[[0.0,0.0],[2.0,0.0],[2.0,2.0],[0.0,0.0]]]}""",
      """{"type":"Polygon","coordinates":[[[0.0,0.0,10.0],[1.0,0.0,11.0],[1.0,1.0,12.0],[0.0,0.0,10.0]]]}""",
      """{"type":"MultiPoint","coordinates":[[1.0,2.0],[3.0,4.0]]}""",
      """{"type":"MultiLineString","coordinates":[[[0.0,0.0],[1.0,1.0]],[[2.0,2.0],[3.0,3.0]]]}""",
      """{"type":"MultiPolygon","coordinates":[[[[0.0,0.0],[2.0,0.0],[2.0,2.0],[0.0,0.0]]],[[[5.0,5.0],[6.0,5.0],[6.0,6.0],[5.0,5.0]]]]}""",
      """{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[1.0,2.0]},{"type":"LineString","coordinates":[[0.0,0.0],[1.0,1.0]]}]}""")
    geoms.foreach { g =>
      val back = Wkb.wkbToGeoJson(Wkb.geoJsonToWkb(g))
      JsonEquals.assertEqual(mapper.readTree(g), mapper.readTree(back))
    }
  }

  test("empty polygon shells in a MultiPolygon are dropped (G3)") {
    val g = """{"type":"MultiPolygon","coordinates":[[],[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]]]}"""
    val back = mapper.readTree(Wkb.wkbToGeoJson(Wkb.geoJsonToWkb(g)))
    assert(back.get("coordinates").size() == 1)
  }

  test("EWKB with SRID flag parses (PostGIS pgstac geometry)") {
    val recordHex = {
      val arr = mapper.readTree(new java.io.File(SparkSpec.resource("/record_sentinel2_l2a.json")))
      arr.get(1).asText()
    }
    val wkb = java.util.HexFormat.of().parseHex(recordHex)
    val node = Wkb.wkbToNode(wkb)
    assert(node.get("type").asText() == "Polygon")
    assert(node.get("coordinates").get(0).size() == 30)
    val b = Wkb.bounds(wkb).get
    assert(b._1 > 32 && b._3 < 37 && b._2 > 71 && b._4 < 73) // Sentinel-2 tile over 72N
  }

  test("M ordinates (ISO 2000+/3000+ and EWKB 0x40000000) are consumed and dropped") {
    def le(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    def i32(v: Int) = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def f64(v: Double) = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(v).array()
    // ISO XYM LineString (code 2002), 2 points: (1,2,M=99), (3,4,M=98)
    val xym = le(Array(1.toByte), i32(2002), i32(2),
      f64(1), f64(2), f64(99), f64(3), f64(4), f64(98))
    val n1 = Wkb.wkbToNode(xym)
    assert(n1.get("type").asText == "LineString")
    assert(n1.get("coordinates").toString == "[[1.0,2.0],[3.0,4.0]]")
    // ISO XYZM Point (code 3001): z kept, M dropped
    val xyzm = le(Array(1.toByte), i32(3001), f64(1), f64(2), f64(5), f64(99))
    assert(Wkb.wkbToNode(xyzm).get("coordinates").toString == "[1.0,2.0,5.0]")
    // EWKB M-flagged Point (0x40000000 | 1)
    val ewkbM = le(Array(1.toByte), i32(0x40000001), f64(7), f64(8), f64(99))
    assert(Wkb.wkbToNode(ewkbM).get("coordinates").toString == "[7.0,8.0]")
  }

  test("MultiPolygon with an empty first shell keeps Z of later polygons") {
    val gj = """{"type":"MultiPolygon","coordinates":[[],[[[1.0,2.0,5.0],[3.0,4.0,5.0],[1.0,4.0,5.0],[1.0,2.0,5.0]]]]}"""
    val node = Wkb.wkbToNode(Wkb.geoJsonToWkb(gj))
    val firstPos = node.get("coordinates").get(0).get(0).get(0)
    assert(firstPos.size() == 3, s"Z must survive: $node")
    assert(firstPos.get(2).asDouble() == 5.0)
  }

  test("empty point round-trips as empty coordinates, not POINT(0 0)") {
    val gj = """{"type":"Point","coordinates":[]}"""
    val once = Wkb.wkbToGeoJson(Wkb.geoJsonToWkb(gj))
    assert(mapper.readTree(once).get("coordinates").size() == 0, once)
    // and a second round trip is stable
    val twice = Wkb.wkbToGeoJson(Wkb.geoJsonToWkb(once))
    assert(mapper.readTree(twice).get("coordinates").size() == 0, twice)
  }

  test("bounds (G4)") {
    val wkb = Wkb.geoJsonToWkb("""{"type":"Polygon","coordinates":[[[-1.0,-2.0],[3.0,-2.0],[3.0,4.0],[-1.0,-2.0]]]}""")
    assert(Wkb.bounds(wkb).contains((-1.0, -2.0, 3.0, 4.0)))
  }

  test("null and 'null' geometry stay null") {
    assert(Wkb.geoJsonToWkb(null) == null)
    assert(Wkb.nodeToWkb(mapper.readTree("null")) == null)
    assert(Wkb.wkbToGeoJson(null) == null)
  }
}
