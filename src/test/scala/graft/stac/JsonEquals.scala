package graft.stac

import com.fasterxml.jackson.databind.JsonNode
import scala.jdk.CollectionConverters._

/** Fuzzy JSON equality oracle, reimplementing the reference's test oracle
  * (`tests/json_equals.py:10-167`) with the same four rules:
  *  1. numbers equal within `precision` decimal places (NaN ≡ NaN);
  *  2. missing key ≡ null value, both directions;
  *  3. strings that parse as RFC3339 compare as instants;
  *  4. recursive over arrays/objects with path-labeled failures.
  */
object JsonEquals {

  def assertEqual(expected: JsonNode, actual: JsonNode, precision: Double = 0.0): Unit = {
    val diffs = scala.collection.mutable.ListBuffer[String]()
    compare(expected, actual, "$", precision, diffs)
    if (diffs.nonEmpty)
      throw new AssertionError(s"JSON mismatch (${diffs.size}):\n${diffs.take(20).mkString("\n")}")
  }

  def equal(expected: JsonNode, actual: JsonNode, precision: Double = 0.0): Boolean = {
    val diffs = scala.collection.mutable.ListBuffer[String]()
    compare(expected, actual, "$", precision, diffs)
    diffs.isEmpty
  }

  private def compare(e: JsonNode, a: JsonNode, path: String, prec: Double,
                      diffs: scala.collection.mutable.ListBuffer[String]): Unit = {
    val en = e == null || e.isNull
    val an = a == null || a.isNull
    if (en && an) return
    if (en != an) { diffs += s"$path: ${show(e)} != ${show(a)}"; return }
    (e.isObject, a.isObject, e.isArray, a.isArray) match {
      case (true, true, _, _) =>
        // rule 2: union of keys; a missing key on either side ≡ null
        val keys = (e.fieldNames().asScala ++ a.fieldNames().asScala).toSet
        keys.foreach(k => compare(e.get(k), a.get(k), s"$path.$k", prec, diffs))
      case (_, _, true, true) =>
        if (e.size() != a.size())
          diffs += s"$path: array size ${e.size()} != ${a.size()}"
        else (0 until e.size()).foreach(i =>
          compare(e.get(i), a.get(i), s"$path[$i]", prec, diffs))
      case _ =>
        if (e.isNumber && a.isNumber) {
          val (x, y) = (e.asDouble(), a.asDouble())
          val ok = (x.isNaN && y.isNaN) || x == y || math.abs(x - y) <= prec
          if (!ok) diffs += s"$path: number $x != $y"
        } else if (e.isTextual && a.isTextual) {
          if (e.asText() != a.asText()) {
            // rule 3: RFC3339 strings compare as instants
            (parseInstant(e.asText()), parseInstant(a.asText())) match {
              case (Some(i1), Some(i2)) if i1 == i2 =>
              case _ => diffs += s"$path: '${e.asText()}' != '${a.asText()}'"
            }
          }
        } else if (e.isBoolean && a.isBoolean) {
          if (e.asBoolean() != a.asBoolean()) diffs += s"$path: ${e.asBoolean()} != ${a.asBoolean()}"
        } else if (e.isNumber != a.isNumber || e.isTextual != a.isTextual) {
          diffs += s"$path: type mismatch ${show(e)} vs ${show(a)}"
        } else diffs += s"$path: ${show(e)} != ${show(a)}"
    }
  }

  def parseInstant(s: String): Option[java.time.Instant] = {
    // Python's fromisoformat (the reference oracle's parser) accepts a
    // space separator; normalize it before the strict Java parse.
    val t = if (s.length > 10 && s.charAt(10) == ' ') s.updated(10, 'T') else s
    try Some(java.time.OffsetDateTime.parse(t).toInstant)
    catch {
      case _: Exception =>
        try Some(java.time.Instant.parse(t))
        catch { case _: Exception => None }
    }
  }

  private def show(n: JsonNode): String =
    if (n == null) "<missing>" else n.toString.take(80)
}
