package graft.stac

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{broadcast, col, udf}

/** J1: pgstac hydration — the reference's only join
  * (`stac_geoparquet/pgstac_reader.py:91-114`; merge semantics from public
  * pypgstac `hydration.hydrate`).
  *
  * Each raw item is merged with its collection's `base_item`: the base
  * supplies defaults, the item wins on conflict, objects merge
  * recursively, equal-length lists merge element-wise, and the magic
  * marker "𒍟※" in the item means "do not hydrate this key" (drop it).
  *
  * Scale design: the per-collection base items are a tiny dimension →
  * broadcast hash join keyed on `collection` (the reference's LRU cache
  * ≙ the broadcast variable), then the merge runs as a scalar UDF — one
  * narrow pass, no shuffle of the item fact table.
  */
object Hydrate {

  val DoNotMergeMarker = "𒍟※"

  // shared thread-safe mapper: per-row ObjectMapper construction would
  // dominate the hydration cost (same reasoning as StacJsonReader)
  @transient private lazy val mapper = new ObjectMapper()

  def hydrate(baseJson: String, itemJson: String): String = {
    if (itemJson == null) return null
    if (baseJson == null) return itemJson
    val merged = merge(mapper.readTree(baseJson), mapper.readTree(itemJson), mapper)
    mapper.writeValueAsString(merged)
  }

  private def merge(base: JsonNode, item: JsonNode, mapper: ObjectMapper): JsonNode = {
    (base, item) match {
      case (b: ObjectNode, i: ObjectNode) =>
        val out = i.deepCopy[ObjectNode]()
        val names = b.fieldNames()
        while (names.hasNext) {
          val key = names.next()
          val bv = b.get(key)
          if (!out.has(key)) out.set(key, bv.deepCopy[JsonNode]())
          else {
            val iv = out.get(key)
            if (iv.isTextual && iv.asText() == DoNotMergeMarker) out.remove(key)
            else out.set(key, merge(bv, iv, mapper))
          }
        }
        out
      case (b: ArrayNode, i: ArrayNode) if b.size() == i.size() =>
        val out = mapper.createArrayNode()
        var idx = 0
        while (idx < i.size()) { out.add(merge(b.get(idx), i.get(idx), mapper)); idx += 1 }
        out
      case _ => item
    }
  }

  val hydrateUdf = udf((base: String, item: String) => hydrate(base, item))

  /** Broadcast-join hydration: `items` must carry (collection, item JSON);
    * `baseItems` is the small (collection, base_item JSON) dimension. */
  def hydrateItems(items: DataFrame, baseItems: DataFrame,
                   itemCol: String = "item", baseCol: String = "base_item"): DataFrame =
    items.join(broadcast(baseItems), Seq("collection"), "left")
      .withColumn(itemCol, hydrateUdf(col(baseCol), col(itemCol)))
      .drop(baseCol)
}
