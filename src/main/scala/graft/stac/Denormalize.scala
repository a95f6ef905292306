package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reverse normalization P5→P6→P7 (+ type injection, asset null-strip,
  * WKB→GeoJSON splice): spec shape → JSON-shape → ndjson
  * (SURVEY §2.3 reverse direction, `stac_geoparquet/arrow/_batch.py:214-221`,
  * K4/K5 `_api.py:347-403`).
  */
object Denormalize {

  /** P5→P6→P7 + type injection; geometry columns stay WKB binary (the
    * GeoJSON splice happens in [[toItemJson]] at the egress boundary). */
  def apply(df: DataFrame): DataFrame = {
    val typed = injectTypeColumn(df)
    val strung = convertTimestampColumnsToString(typed)
    val lowered = lowerPropertiesFromTopLevel(strung)
    convertBboxToArray(lowered)
  }

  /** Inject constant `type = "Feature"` when the column is absent
    * (`_api.py:394-400`). */
  def injectTypeColumn(df: DataFrame): DataFrame =
    if (df.schema.fieldNames.contains("type")) df
    else df.select(lit("Feature").as("type") +:
      df.columns.map(StacSchema.quotedCol(_)).toIndexedSeq: _*)

  /** P5: timestamps → `%Y-%m-%dT%H:%M:%SZ` strings (`_from_arrow.py:8-31`).
    * `date_format` renders in the session timezone, so the instant is first
    * shifted with `to_utc_timestamp(_, sessionTz)` — the emitted wall clock
    * is UTC (matching the literal `Z`) for ANY session timezone, not just
    * the UTC the in-repo mains pin. */
  def convertTimestampColumnsToString(df: DataFrame): DataFrame = {
    val sessionTz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    StacSchema.TimestampColumns.foldLeft(df) { (d, name) =>
      d.schema.fields.find(_.name == name) match {
        case Some(f) if f.dataType == TimestampType =>
          d.withColumn(name,
            date_format(to_utc_timestamp(col(name), sessionTz), StacSchema.Rfc3339Format))
        case _ => d
      }
    }
  }

  /** P6: re-nest every non-top-level column into a `properties` struct
    * (`_from_arrow.py:34-64`), preserving column order. */
  def lowerPropertiesFromTopLevel(df: DataFrame): DataFrame = {
    val propCols = df.columns.filterNot(StacSchema.TopLevelKeys.contains)
    if (propCols.isEmpty) return df
    val keep = df.columns.filter(StacSchema.TopLevelKeys.contains).map(col).toIndexedSeq
    // exact-name references (hoisted property names may contain dots)
    val props = struct(propCols.map(c =>
      StacSchema.quotedCol(c).as(c)).toIndexedSeq: _*).as("properties")
    df.select(keep :+ props: _*)
  }

  /** P7: bbox struct → 4/6-element array (`_from_arrow.py:67-116`). */
  def convertBboxToArray(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "bbox") match {
      case Some(StructField(_, st: StructType, _, _)) =>
        val names =
          if (st.fieldNames.contains("zmin")) Seq("xmin", "ymin", "zmin", "xmax", "ymax", "zmax")
          else Seq("xmin", "ymin", "xmax", "ymax")
        val arr = array(names.map(n => col("bbox").getField(n)): _*)
        df.withColumn("bbox", when(col("bbox").isNull, lit(null)).otherwise(arr))
      case _ => df
    }

  /** Schema walk for WKB paths, mirroring `_batch.py:134-146`: `geometry`,
    * `properties.proj:geometry`, `assets.<k>.proj:geometry`. Paths are
    * discovered on the driver from the schema (binary type). */
  def wkbPaths(schema: StructType): Seq[Seq[String]] = {
    val b = Seq.newBuilder[Seq[String]]
    if (schema.fieldNames.contains("geometry") &&
      schema("geometry").dataType == BinaryType) b += Seq("geometry")
    schema.fields.find(_.name == "properties").map(_.dataType).foreach {
      case st: StructType if st.fieldNames.contains("proj:geometry") &&
        st("proj:geometry").dataType == BinaryType =>
        b += Seq("properties", "proj:geometry")
      case _ =>
    }
    schema.fields.find(_.name == "assets").map(_.dataType).foreach {
      case st: StructType =>
        st.fields.foreach {
          case StructField(assetKey, at: StructType, _, _)
            if at.fieldNames.contains("proj:geometry") &&
              at("proj:geometry").dataType == BinaryType =>
            b += Seq("assets", assetKey, "proj:geometry")
          case _ =>
        }
      case _ =>
    }
    b.result()
  }

  /** K4/K5 egress: JSON-shape rows → item JSON strings.
    *
    * `to_json` drops null fields (missing-key ≡ null, F7/`json_equals.py:
    * 144-159`) and base64-encodes binary; a Jackson pass then splices WKB
    * geometry back to GeoJSON objects (G2) and strips all-null asset
    * entries, which survive as `{}` (F5, `_batch.py:173-179`).
    */
  def toItemJson(df: DataFrame): Dataset[String] = {
    val jsonShaped = apply(df)
    val paths = wkbPaths(jsonShaped.schema)
    val rows = jsonShaped.select(
      to_json(struct(jsonShaped.columns.map(col).toIndexedSeq: _*)).as("json"))
    import jsonShaped.sparkSession.implicits._
    rows.as[String].mapPartitions { it =>
      val mapper = new ObjectMapper()
      val b64 = java.util.Base64.getDecoder
      it.map { rowJson =>
        val node = mapper.readTree(rowJson).asInstanceOf[ObjectNode]
        paths.foreach { path =>
          var parent: ObjectNode = node
          var ok = true
          path.init.foreach { seg =>
            val next = if (parent != null) parent.get(seg) else null
            if (next == null || !next.isObject) ok = false
            else parent = next.asInstanceOf[ObjectNode]
          }
          if (ok) {
            val leaf = parent.get(path.last)
            if (leaf != null && leaf.isTextual) {
              val wkb = b64.decode(leaf.asText())
              parent.set(path.last, Wkb.wkbToNode(wkb))
            }
          }
        }
        // F5: drop asset entries that serialized to an empty object
        val assets = node.get("assets")
        if (assets != null && assets.isObject) {
          val obj = assets.asInstanceOf[ObjectNode]
          val empty = new java.util.ArrayList[String]()
          val fields = obj.fields()
          while (fields.hasNext) {
            val e = fields.next()
            if (e.getValue.isObject && e.getValue.isEmpty) empty.add(e.getKey)
          }
          empty.forEach(k => obj.remove(k))
        }
        mapper.writeValueAsString(node)
      }
    }
  }

  /** K4: write ndjson (one item per line). */
  def writeNdjson(df: DataFrame, path: String): Unit =
    toItemJson(df).write.mode("overwrite").text(path)
}
