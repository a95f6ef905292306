package graft.stac

import com.fasterxml.jackson.databind.JsonNode
import scala.jdk.CollectionConverters._

/** Minimal draft-07 JSON-Schema validator (test scope) covering exactly
  * the keywords the vendored STAC-GeoParquet metadata schema uses:
  * `type` (object/string), `const`, `required`, `properties`, and
  * schema-form `additionalProperties`. No jsonschema library resolves in
  * this offline environment; the reference validates the same instance
  * against the same schema with Python `jsonschema`
  * (`tests/test_parquet.py:108-111`).
  *
  * Returns every violation (path + message); empty = valid. Unknown
  * keywords are ignored, like any JSON-Schema validator.
  */
object JsonSchemaLite {

  def validate(schema: JsonNode, instance: JsonNode, path: String = "$"): Seq[String] = {
    val errs = Seq.newBuilder[String]

    Option(schema.get("type")).map(_.asText()).foreach {
      case "object" if !instance.isObject => errs += s"$path: expected object, got ${instance.getNodeType}"
      case "string" if !instance.isTextual => errs += s"$path: expected string, got ${instance.getNodeType}"
      case "array" if !instance.isArray => errs += s"$path: expected array, got ${instance.getNodeType}"
      case "number" if !instance.isNumber => errs += s"$path: expected number, got ${instance.getNodeType}"
      case "boolean" if !instance.isBoolean => errs += s"$path: expected boolean, got ${instance.getNodeType}"
      case "integer" if !instance.isIntegralNumber => errs += s"$path: expected integer, got ${instance.getNodeType}"
      case "null" if !instance.isNull => errs += s"$path: expected null, got ${instance.getNodeType}"
      case _ => ()
    }

    Option(schema.get("const")).foreach { c =>
      if (instance != c) errs += s"$path: expected const $c, got $instance"
    }

    if (instance.isObject) {
      Option(schema.get("required")).foreach { req =>
        req.elements().asScala.foreach { k =>
          if (!instance.has(k.asText())) errs += s"$path: missing required key '${k.asText()}'"
        }
      }
      val props = Option(schema.get("properties"))
      props.foreach { p =>
        p.properties().asScala.foreach { e =>
          if (instance.has(e.getKey))
            errs ++= validate(e.getValue, instance.get(e.getKey), s"$path.${e.getKey}")
        }
      }
      Option(schema.get("additionalProperties")).filter(_.isObject).foreach { ap =>
        instance.properties().asScala.foreach { e =>
          val declared = props.exists(_.has(e.getKey))
          if (!declared) errs ++= validate(ap, e.getValue, s"$path.${e.getKey}")
        }
      }
    }
    errs.result()
  }
}
