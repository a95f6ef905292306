package graft.stac

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** GeoJSON ⇄ ISO-flavor WKB codec, hand-rolled (z-aware, little-endian).
  *
  * Mirrors the reference's geometry boundary ops:
  *  - G1 GeoJSON→WKB: `stac_geoparquet/arrow/_batch.py:93-118` (shapely
  *    `to_wkb(..., flavor="iso")`) — ISO flavor means Z adds +1000 to the
  *    geometry type code (no 0x80000000 EWKB flag).
  *  - G2 WKB→GeoJSON: `stac_geoparquet/arrow/_batch.py:150-171` with
  *    list (not tuple) coordinates.
  *  - G3 empty-shell filtering: `stac_geoparquet/utils.py:89-101` — empty
  *    polygon shells inside a MultiPolygon are dropped at parse time.
  *  - G4 bbox from geometry: `stac_geoparquet/pgstac_reader.py:80-82`
  *    (`list(geom.bounds)`).
  */
object Wkb {

  private val mapper = new ObjectMapper()

  // geometry type codes (ISO 19125 / SFA); +1000 for Z variants
  private val TypeCodes: Map[String, Int] = Map(
    "Point" -> 1, "LineString" -> 2, "Polygon" -> 3,
    "MultiPoint" -> 4, "MultiLineString" -> 5, "MultiPolygon" -> 6,
    "GeometryCollection" -> 7)
  private val CodeTypes: Map[Int, String] = TypeCodes.map(_.swap)

  private final class LeBuf {
    private val bos = new ByteArrayOutputStream(64)
    private val scratch = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    def putByte(b: Byte): Unit = bos.write(b)
    def putInt(i: Int): Unit = {
      scratch.clear(); scratch.putInt(i)
      bos.write(scratch.array(), 0, 4)
    }
    def putDouble(d: Double): Unit = {
      scratch.clear(); scratch.putDouble(d)
      bos.write(scratch.array(), 0, 8)
    }
    def bytes: Array[Byte] = bos.toByteArray
  }

  // ---------------------------------------------------------------- G1

  def geoJsonToWkb(json: String): Array[Byte] =
    if (json == null) null else nodeToWkb(mapper.readTree(json))

  def nodeToWkb(node: JsonNode): Array[Byte] = {
    if (node == null || node.isNull) return null
    val buf = new LeBuf
    writeGeometry(node, buf)
    buf.bytes
  }

  private def writeGeometry(node: JsonNode, buf: LeBuf): Unit = {
    val typ = node.get("type").asText()
    if (typ == "GeometryCollection") {
      val geoms = node.get("geometries")
      buf.putByte(1)
      buf.putInt(7) // collection Z-ness is per-member in ISO WKB
      buf.putInt(geoms.size())
      var i = 0
      while (i < geoms.size()) { writeGeometry(geoms.get(i), buf); i += 1 }
      return
    }
    val coords = node.get("coordinates")
    val hasZ = firstPositionLength(coords) >= 3
    val code = TypeCodes.getOrElse(typ,
      throw new IllegalArgumentException(s"unknown GeoJSON type: $typ")) +
      (if (hasZ) 1000 else 0)
    buf.putByte(1)
    buf.putInt(code)
    typ match {
      case "Point" => writePosition(coords, hasZ, buf)
      case "LineString" | "MultiPoint" => writePointSeq(coords, hasZ, buf)
      case "Polygon" => writeRings(coords, hasZ, buf)
      case "MultiLineString" =>
        buf.putInt(coords.size())
        forEach(coords) { line =>
          buf.putByte(1); buf.putInt(TypeCodes("LineString") + (if (hasZ) 1000 else 0))
          writePointSeq(line, hasZ, buf)
        }
      case "MultiPolygon" =>
        // G3: drop empty polygon shells (utils.py:89-101)
        val polys = children(coords).filter(p => p.size() > 0 && p.get(0).size() > 0)
        buf.putInt(polys.size)
        polys.foreach { poly =>
          buf.putByte(1); buf.putInt(TypeCodes("Polygon") + (if (hasZ) 1000 else 0))
          writeRings(poly, hasZ, buf)
        }
    }
  }

  private def children(arr: JsonNode): Seq[JsonNode] =
    (0 until arr.size()).map(arr.get)

  private def forEach(arr: JsonNode)(f: JsonNode => Unit): Unit = {
    var i = 0
    while (i < arr.size()) { f(arr.get(i)); i += 1 }
  }

  /** Length of the first NON-EMPTY position anywhere in the coordinate
    * tree — drilling only into `get(0)` would return 0 for a geometry
    * whose first subtree is an empty shell (e.g. a MultiPolygon opening
    * with an empty polygon) and silently flatten 3-D parts to 2-D. */
  private def firstPositionLength(coords: JsonNode): Int = {
    def search(n: JsonNode): Option[Int] = {
      if (n == null || !n.isArray || n.size() == 0) None
      else if (n.get(0).isArray) children(n).iterator.flatMap(search(_).iterator).nextOption()
      else Some(n.size())
    }
    search(coords).getOrElse(2)
  }

  private def writePosition(pos: JsonNode, hasZ: Boolean, buf: LeBuf): Unit = {
    if (pos == null || pos.size() == 0) { // empty point: NaN coords (ISO)
      buf.putDouble(Double.NaN); buf.putDouble(Double.NaN)
      if (hasZ) buf.putDouble(Double.NaN)
      return
    }
    buf.putDouble(pos.get(0).asDouble())
    buf.putDouble(pos.get(1).asDouble())
    if (hasZ) buf.putDouble(if (pos.size() > 2) pos.get(2).asDouble() else 0.0)
  }

  private def writePointSeq(arr: JsonNode, hasZ: Boolean, buf: LeBuf): Unit = {
    buf.putInt(arr.size())
    forEach(arr)(writePosition(_, hasZ, buf))
  }

  private def writeRings(rings: JsonNode, hasZ: Boolean, buf: LeBuf): Unit = {
    // drop empty rings within a polygon
    val rs = children(rings).filter(_.size() > 0)
    buf.putInt(rs.size)
    rs.foreach(writePointSeq(_, hasZ, buf))
  }

  // ---------------------------------------------------------------- G2

  def wkbToGeoJson(wkb: Array[Byte]): String = {
    if (wkb == null) return null
    mapper.writeValueAsString(wkbToNode(wkb))
  }

  def wkbToNode(wkb: Array[Byte]): JsonNode = {
    if (wkb == null) return null
    val bb = ByteBuffer.wrap(wkb)
    readGeometry(bb)
  }

  private def readGeometry(bb: ByteBuffer): ObjectNode = {
    val order = bb.get()
    bb.order(if (order == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    var code = bb.getInt()
    // tolerate EWKB flags on read (Z / M / embedded SRID); M ordinates are
    // consumed and dropped (GeoJSON positions carry no M)
    val ewkbZ = (code & 0x80000000) != 0
    val ewkbM = (code & 0x40000000) != 0
    val ewkbSrid = (code & 0x20000000) != 0
    code &= 0x0fffffff
    if (ewkbSrid) bb.getInt() // skip SRID
    val isoZ = code >= 1000 && code < 2000
    val isoM = code >= 2000 && code < 3000
    val isoZM = code >= 3000 && code < 4000
    val baseCode = code % 1000
    val hasZ = isoZ || isoZM || ewkbZ
    val hasM = isoM || isoZM || ewkbM
    val typ = CodeTypes.getOrElse(baseCode,
      throw new IllegalArgumentException(s"unknown WKB type code: $code"))
    val f = JsonNodeFactory.instance
    val obj = f.objectNode()
    obj.put("type", typ)
    typ match {
      case "GeometryCollection" =>
        val n = bb.getInt()
        val geoms = f.arrayNode()
        (0 until n).foreach(_ => geoms.add(readGeometry(bb)))
        obj.set("geometries", geoms)
      case "Point" => obj.set("coordinates", readPosition(bb, hasZ, hasM, f))
      case "LineString" | "MultiPoint" => obj.set("coordinates", readPointSeq(bb, hasZ, hasM, f))
      case "Polygon" => obj.set("coordinates", readRings(bb, hasZ, hasM, f))
      case "MultiLineString" =>
        val n = bb.getInt()
        val arr = f.arrayNode()
        (0 until n).foreach { _ =>
          skipHeader(bb)
          arr.add(readPointSeq(bb, hasZ, hasM, f))
        }
        obj.set("coordinates", arr)
      case "MultiPolygon" =>
        val n = bb.getInt()
        val arr = f.arrayNode()
        (0 until n).foreach { _ =>
          skipHeader(bb)
          arr.add(readRings(bb, hasZ, hasM, f))
        }
        obj.set("coordinates", arr)
    }
    obj
  }

  private def skipHeader(bb: ByteBuffer): Unit = {
    val order = bb.get()
    bb.order(if (order == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    bb.getInt()
  }

  private def readPosition(bb: ByteBuffer, hasZ: Boolean, hasM: Boolean, f: JsonNodeFactory): ArrayNode = {
    val arr = f.arrayNode()
    val x = bb.getDouble(); val y = bb.getDouble()
    val z = if (hasZ) Some(bb.getDouble()) else None
    if (hasM) bb.getDouble() // M is not representable in GeoJSON — dropped
    // ISO empty point = NaN ordinates; emit empty coordinates (Jackson
    // would serialize NaN as the STRING "NaN" — invalid GeoJSON whose
    // re-ingest turns the empty point into POINT(0 0))
    if (x.isNaN && y.isNaN) return arr
    arr.add(x); arr.add(y)
    z.foreach(arr.add)
    arr
  }

  private def readPointSeq(bb: ByteBuffer, hasZ: Boolean, hasM: Boolean, f: JsonNodeFactory): ArrayNode = {
    val n = bb.getInt()
    val arr = f.arrayNode()
    (0 until n).foreach(_ => arr.add(readPosition(bb, hasZ, hasM, f)))
    arr
  }

  private def readRings(bb: ByteBuffer, hasZ: Boolean, hasM: Boolean, f: JsonNodeFactory): ArrayNode = {
    val n = bb.getInt()
    val arr = f.arrayNode()
    (0 until n).foreach(_ => arr.add(readPointSeq(bb, hasZ, hasM, f)))
    arr
  }

  // ---------------------------------------------------------------- G4

  /** 2-D bounds (xmin, ymin, xmax, ymax) of a WKB geometry. */
  def bounds(wkb: Array[Byte]): Option[(Double, Double, Double, Double)] = {
    if (wkb == null) return None
    var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
    var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
    var seen = false
    def visit(node: JsonNode): Unit = {
      if (node.isArray && node.size() > 0) {
        if (node.get(0).isNumber) {
          val x = node.get(0).asDouble(); val y = node.get(1).asDouble()
          if (!x.isNaN && !y.isNaN) {
            seen = true
            if (x < xmin) xmin = x; if (x > xmax) xmax = x
            if (y < ymin) ymin = y; if (y > ymax) ymax = y
          }
        } else forEach(node)(visit)
      }
    }
    val node = wkbToNode(wkb)
    if (node == null) return None
    def visitGeom(g: JsonNode): Unit =
      if (g.get("type").asText() == "GeometryCollection")
        forEach(g.get("geometries"))(visitGeom)
      else visit(g.get("coordinates"))
    visitGeom(node)
    if (seen) Some((xmin, ymin, xmax, ymax)) else None
  }
}
