package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** J1 hydration semantics (`stac_geoparquet/pgstac_reader.py:91-114`,
  * pypgstac `hydration.hydrate`), exercised against the reference's
  * base/record sentinel-2 fixture pair. */
class HydrateSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  test("item wins, base supplies defaults, objects merge recursively") {
    val base = """{"a":1,"nested":{"x":1,"y":2},"only_base":"b"}"""
    val item = """{"a":9,"nested":{"y":99,"z":3},"only_item":"i"}"""
    val out = mapper.readTree(Hydrate.hydrate(base, item))
    assert(out.get("a").asInt() == 9)
    assert(out.get("nested").get("x").asInt() == 1)
    assert(out.get("nested").get("y").asInt() == 99)
    assert(out.get("nested").get("z").asInt() == 3)
    assert(out.get("only_base").asText() == "b")
    assert(out.get("only_item").asText() == "i")
  }

  test("do-not-merge marker removes the key") {
    val base = """{"keep":1,"drop":{"deep":true}}"""
    val item = s"""{"drop":"${Hydrate.DoNotMergeMarker}"}"""
    val out = mapper.readTree(Hydrate.hydrate(base, item))
    assert(out.get("keep").asInt() == 1)
    assert(!out.has("drop"))
  }

  test("equal-length lists merge element-wise") {
    val base = """{"bands":[{"name":"B1","gsd":10},{"name":"B2","gsd":20}]}"""
    val item = """{"bands":[{"desc":"blue"},{"desc":"green","gsd":60}]}"""
    val out = mapper.readTree(Hydrate.hydrate(base, item))
    assert(out.get("bands").get(0).get("name").asText() == "B1")
    assert(out.get("bands").get(0).get("desc").asText() == "blue")
    assert(out.get("bands").get(1).get("gsd").asInt() == 60)
  }

  test("sentinel-2 record hydrates against its base item") {
    val base = mapper.readTree(new java.io.File(SparkSpec.resource("/base_sentinel2_l2a.json")))
    val rec = mapper.readTree(new java.io.File(SparkSpec.resource("/record_sentinel2_l2a.json")))
    // assemble the item like PgstacRowFactory (`pgstac_reader.py:54-94`)
    val item = mapper.createObjectNode()
    item.put("id", rec.get(0).asText())
    item.set("geometry", Wkb.wkbToNode(
      java.util.HexFormat.of().parseHex(rec.get(1).asText())))
    item.put("collection", rec.get(2).asText())
    val content = rec.get(5)
    if (content.has("bbox")) item.set("bbox", content.get("bbox"))
    item.set("assets", content.get("assets"))
    if (content.has("stac_extensions")) item.set("stac_extensions", content.get("stac_extensions"))
    item.set("properties", content.get("properties"))

    val out = mapper.readTree(Hydrate.hydrate(
      mapper.writeValueAsString(base), mapper.writeValueAsString(item)))
    assert(out.get("type").asText() == "Feature") // from base
    assert(out.get("id").asText().startsWith("S2A_MSIL2A_20150704"))
    // base contributes static asset metadata; record contributes hrefs
    val aot = out.get("assets").get("AOT")
    assert(aot.get("title").asText().contains("Aerosol"))
    assert(out.get("geometry").get("type").asText() == "Polygon")
    assert(out.get("properties").get("datetime").asText().startsWith("2015-07-04"))
  }

  test("broadcast-join hydration over a DataFrame") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val items = Seq(
      ("c1", """{"id":"i1","properties":{"p":1}}"""),
      ("c1", """{"id":"i2"}"""),
      ("c2", """{"id":"i3"}""")).toDF("collection", "item")
    val bases = Seq(
      ("c1", """{"properties":{"gsd":10}}""")).toDF("collection", "base_item")
    val out = Hydrate.hydrateItems(items, bases).collect()
      .map(r => r.getString(r.fieldIndex("item")))
    val byId = out.map(j => mapper.readTree(j)).map(n => n.get("id").asText() -> n).toMap
    assert(byId("i1").get("properties").get("gsd").asInt() == 10)
    assert(byId("i1").get("properties").get("p").asInt() == 1)
    assert(byId("i2").get("properties").get("gsd").asInt() == 10)
    assert(!byId("i3").has("properties")) // no base for c2
  }
}
