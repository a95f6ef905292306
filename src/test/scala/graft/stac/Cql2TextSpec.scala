package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** cql2-text parser: handwritten text → EXACT expected cql2-json AST
  * (structural JsonNode equality — stricter than evaluation equality),
  * plus a ScalaCheck round-trip: random ASTs rendered to text must
  * parse back to the IDENTICAL tree, and a Spark evaluation leg pinning
  * that `filterText` ≡ `filter` row-for-row on a live frame. */
class Cql2TextSpec extends AnyFunSuite {

  private val M = new ObjectMapper()
  private def assertAst(text: String, json: String): Unit = {
    val got = Cql2Text.parse(text)
    val want = M.readTree(json)
    assert(got == want, s"\n text: $text\n got:  $got\n want: $want")
  }

  test("comparisons, precedence, and grouping") {
    assertAst("cloud < 40", """{"op":"<","args":[{"property":"cloud"},40]}""")
    assertAst("a = 1 AND b > 2 OR c <= 3",
      """{"op":"or","args":[
           {"op":"and","args":[{"op":"=","args":[{"property":"a"},1]},
                               {"op":">","args":[{"property":"b"},2]}]},
           {"op":"<=","args":[{"property":"c"},3]}]}""")
    assertAst("a = 1 AND (b > 2 OR c <= 3)",
      """{"op":"and","args":[
           {"op":"=","args":[{"property":"a"},1]},
           {"op":"or","args":[{"op":">","args":[{"property":"b"},2]},
                              {"op":"<=","args":[{"property":"c"},3]}]}]}""")
    assertAst("NOT a <> 1.5",
      """{"op":"not","args":[{"op":"<>","args":[{"property":"a"},1.5]}]}""")
    assertAst("eo:cloud_cover >= 10",
      """{"op":">=","args":[{"property":"eo:cloud_cover"},10]}""")
    assertAst("\"strange name\" = 'x''y'",
      """{"op":"=","args":[{"property":"strange name"},"x'y"]}""")
    assertAst("properties.datetime IS NOT NULL",
      """{"op":"not","args":[{"op":"isNull","args":[{"property":"properties.datetime"}]}]}""")
  }

  test("BETWEEN / IN / LIKE, plain and negated") {
    assertAst("v BETWEEN 1 AND 5",
      """{"op":"between","args":[{"property":"v"},1,5]}""")
    assertAst("v NOT BETWEEN 1 AND 5",
      """{"op":"not","args":[{"op":"between","args":[{"property":"v"},1,5]}]}""")
    assertAst("s IN ('a', 'b', 'c')",
      """{"op":"in","args":[{"property":"s"},["a","b","c"]]}""")
    assertAst("v IN (1)", """{"op":"in","args":[{"property":"v"},[1]]}""")
    assertAst("s NOT IN ('a')",
      """{"op":"not","args":[{"op":"in","args":[{"property":"s"},["a"]]}]}""")
    assertAst("s LIKE 'caf%'",
      """{"op":"like","args":[{"property":"s"},"caf%"]}""")
    assertAst("s NOT LIKE '_x'",
      """{"op":"not","args":[{"op":"like","args":[{"property":"s"},"_x"]}]}""")
    assertAst("CASEI(s) = 'café'",
      """{"op":"=","args":[{"op":"casei","args":[{"property":"s"}]},"café"]}""")
    assertAst("ACCENTI(s) = 'cafe'",
      """{"op":"=","args":[{"op":"accenti","args":[{"property":"s"}]},"cafe"]}""")
  }

  test("arithmetic precedence: ^ over */% over +-, unary minus, DIV") {
    assertAst("v + 2 * 3 > 1",
      """{"op":">","args":[
           {"op":"+","args":[{"property":"v"},{"op":"*","args":[2,3]}]},1]}""")
    assertAst("(v + 2) * 3 > 1",
      """{"op":">","args":[
           {"op":"*","args":[{"op":"+","args":[{"property":"v"},2]},3]},1]}""")
    assertAst("-v % 2 = 0",
      """{"op":"=","args":[
           {"op":"%","args":[{"op":"-","args":[{"property":"v"}]},2]},0]}""")
    assertAst("v DIV 2 = 3",
      """{"op":"=","args":[{"op":"div","args":[{"property":"v"},2]},3]}""")
    assertAst("2 ^ v ^ 2 < 100", // right-associative
      """{"op":"<","args":[{"op":"^","args":[2,{"op":"^","args":[{"property":"v"},2]}]},100]}""")
    assertAst("v - 1 - 2 = 0", // left-associative
      """{"op":"=","args":[{"op":"-","args":[{"op":"-","args":[{"property":"v"},1]},2]},0]}""")
  }

  test("temporal: TIMESTAMP / DATE / INTERVAL with open + property bounds") {
    assertAst("T_AFTER(datetime, TIMESTAMP('2020-02-01T00:00:00Z'))",
      """{"op":"t_after","args":[{"property":"datetime"},{"timestamp":"2020-02-01T00:00:00Z"}]}""")
    assertAst("T_DURING(datetime, INTERVAL('2020-01-01', '..'))",
      """{"op":"t_during","args":[{"property":"datetime"},{"interval":["2020-01-01",".."]}]}""")
    assertAst("T_OVERLAPPEDBY(INTERVAL(start_datetime, end_datetime), DATE('2020-06-01'))",
      """{"op":"t_overlappedBy","args":[
           {"interval":[{"property":"start_datetime"},{"property":"end_datetime"}]},
           {"date":"2020-06-01"}]}""")
    assertAst("T_METBY(datetime, datetime)",
      """{"op":"t_metBy","args":[{"property":"datetime"},{"property":"datetime"}]}""")
  }

  test("arrays: operand normalization, empty, a_* name casing") {
    assertAst("A_CONTAINS(tags, ('a', 'b'))",
      """{"op":"a_contains","args":[{"property":"tags"},["a","b"]]}""")
    assertAst("A_CONTAINEDBY(tags, ('a'))", // singleton normalizes to array
      """{"op":"a_containedBy","args":[{"property":"tags"},["a"]]}""")
    assertAst("A_EQUALS(tags, ())",
      """{"op":"a_equals","args":[{"property":"tags"},[]]}""")
    assertAst("A_OVERLAPS(('x'), tags)",
      """{"op":"a_overlaps","args":[["x"],{"property":"tags"}]}""")
  }

  test("spatial: WKT literals of every type plus BBOX") {
    assertAst("S_INTERSECTS(geometry, POINT(1 2))",
      """{"op":"s_intersects","args":[{"property":"geometry"},
           {"type":"Point","coordinates":[1,2]}]}""")
    assertAst("S_WITHIN(geometry, POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1)))",
      """{"op":"s_within","args":[{"property":"geometry"},
           {"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]],
                                            [[1,1],[2,1],[2,2],[1,2],[1,1]]]}]}""")
    assertAst("S_CROSSES(geometry, LINESTRING(-1.5 0, 2 3.25))",
      """{"op":"s_crosses","args":[{"property":"geometry"},
           {"type":"LineString","coordinates":[[-1.5,0],[2,3.25]]}]}""")
    assertAst("S_DISJOINT(bbox, BBOX(-10, -10, 10, 10))",
      """{"op":"s_disjoint","args":[{"property":"bbox"},{"bbox":[-10,-10,10,10]}]}""")
    assertAst("S_OVERLAPS(geometry, MULTIPOLYGON(((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5))))",
      """{"op":"s_overlaps","args":[{"property":"geometry"},
           {"type":"MultiPolygon","coordinates":[[[[0,0],[1,0],[1,1],[0,0]]],
                                                 [[[5,5],[6,5],[6,6],[5,5]]]]}]}""")
    assertAst("S_EQUALS(geometry, MULTIPOINT((1 2), (3 4)))",
      """{"op":"s_equals","args":[{"property":"geometry"},
           {"type":"MultiPoint","coordinates":[[1,2],[3,4]]}]}""")
    assertAst("S_TOUCHES(geometry, GEOMETRYCOLLECTION(POINT(1 2), LINESTRING(0 0, 1 1)))",
      """{"op":"s_touches","args":[{"property":"geometry"},
           {"type":"GeometryCollection","geometries":[
             {"type":"Point","coordinates":[1,2]},
             {"type":"LineString","coordinates":[[0,0],[1,1]]}]}]}""")
    assertAst("S_CONTAINS(geometry, POINT(1 2 3))",
      """{"op":"s_contains","args":[{"property":"geometry"},
           {"type":"Point","coordinates":[1,2,3]}]}""")
  }

  test("textToJson bridges text filters onto the JSON delegation path") {
    assert(M.readTree(Cql2.textToJson("cloud < 40 AND s IN ('a')")) ==
      M.readTree("""{"op":"and","args":[
        {"op":"<","args":[{"property":"cloud"},40]},
        {"op":"in","args":[{"property":"s"},["a"]]}]}"""))
  }

  test("errors name the problem") {
    val bads = Seq(
      "a >" -> "unexpected",
      "a = 'unterminated" -> "unterminated",
      "v BETWEEN 1 OR 2" -> "BETWEEN needs AND",
      "a = 1 extra" -> "trailing")
    bads.foreach { case (text, needle) =>
      val e = intercept[IllegalArgumentException](Cql2Text.parse(text))
      assert(e.getMessage.toLowerCase.contains(needle.toLowerCase),
        s"$text → ${e.getMessage}")
    }
    // an unknown CALL form parses as a functionRef (the OGC Functions
    // class) and is refused BY NAME at translation time instead
    val fn = Cql2Text.parse("FOO(a) = 1")
    assert(fn.toString.contains("\"function\""), fn.toString)
    val e2 = intercept[IllegalArgumentException](Cql2.filterText("FOO(a) = 1"))
    assert(e2.getMessage.contains("unknown CQL2 function: FOO"), e2.getMessage)
    // ...but built-ins with the wrong ARITY fail at parse time, and a
    // typo inside the s_/t_/a_ operator families never falls through to
    // the functionRef form — both named errors, never an index crash
    val e3 = intercept[IllegalArgumentException](
      Cql2Text.parse("CASEI() = 'x'"))
    assert(e3.getMessage.contains("casei takes 1 argument"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException](
      Cql2Text.parse("S_INTERSECTS(geom)"))
    assert(e4.getMessage.contains("s_intersects takes 2 argument"),
      e4.getMessage)
    val e5 = intercept[IllegalArgumentException](
      Cql2Text.parse("S_INTERSECTZ(geom, POINT(1 2))"))
    assert(e5.getMessage.contains("unknown spatial/temporal/array operator"),
      e5.getMessage)
  }

  test("function calls: text parses to the OGC functionRef; both encodings evaluate") {
    assertAst("upper(name) = 'ALPHA'",
      """{"op":"=","args":[
           {"function":{"name":"upper","args":[{"property":"name"}]}},
           "ALPHA"]}""")
    assertAst("min(a, 3) < max(b, 4)",
      """{"op":"<","args":[
           {"function":{"name":"min","args":[{"property":"a"},3]}},
           {"function":{"name":"max","args":[{"property":"b"},4]}}]}""")
    // a function of an arithmetic term, and zero args
    assertAst("abs(v - 2) > 1",
      """{"op":">","args":[
           {"function":{"name":"abs","args":[
             {"op":"-","args":[{"property":"v"},2]}]}},
           1]}""")
    assertAst("now() IS NOT NULL",
      """{"op":"not","args":[{"op":"isNull","args":[
           {"function":{"name":"now","args":[]}}]}]}""")
    // both encodings translate through ONE registry and agree row-for-row
    val spark = SparkSpec.spark
    val s = spark; import s.implicits._
    val df = Seq(("a", Some(-3L)), ("B", Some(2L)), ("café", None))
      .toDF("s", "v")
    val text = "upper(s) = 'CAFÉ' OR abs(v) >= 3"
    val json = """{"op":"or","args":[
      {"op":"=","args":[{"function":{"name":"upper","args":[{"property":"s"}]}},"CAFÉ"]},
      {"op":">=","args":[{"function":{"name":"abs","args":[{"property":"v"}]}},3]}]}"""
    val viaText = df.filter(Cql2.filterText(text)).select("s")
      .collect().map(_.getString(0)).toSet
    val viaJson = df.filter(Cql2.filter(json)).select("s")
      .collect().map(_.getString(0)).toSet
    assert(viaText == Set("a", "café") && viaJson == viaText)
    // user-registered functions extend the registry per call
    val custom = Map("reverse" ->
      ((a: Seq[org.apache.spark.sql.Column]) =>
        org.apache.spark.sql.functions.reverse(a(0))))
    val got = df.filter(Cql2.filterText("reverse(s) = 'éfac'", custom))
      .select("s").collect().map(_.getString(0)).toSet
    assert(got == Set("café"))
  }

  // ------------------------------------------------- generator round-trip
  // Random ASTs rendered to text must parse back IDENTICAL. The
  // renderer emits one canonical spelling per node, so equality is
  // exact tree equality — any precedence or tokenization drift fails.
  private def render(n: com.fasterxml.jackson.databind.JsonNode): String = {
    import scala.jdk.CollectionConverters._
    def needsParens(child: com.fasterxml.jackson.databind.JsonNode): Boolean =
      (child.isObject && child.has("op")) ||
        // a bare negative literal left of ^ would re-parse as -(x ^ y)
        (child.isNumber && child.asDouble < 0)
    def r(x: com.fasterxml.jackson.databind.JsonNode): String =
      if (x.isObject && x.has("op")) {
        val op = x.get("op").asText
        val a = x.get("args").elements().asScala.toIndexedSeq
        op match {
          case "and" | "or" => s"(${r(a(0))} ${op.toUpperCase} ${r(a(1))})"
          case "not" => s"NOT (${r(a(0))})"
          case "=" | "<>" | "<" | "<=" | ">" | ">=" =>
            s"${wrap(a(0))} $op ${wrap(a(1))}"
          case "between" => s"${wrap(a(0))} BETWEEN ${wrap(a(1))} AND ${wrap(a(2))}"
          case "in" => s"${wrap(a(0))} IN ${r(a(1))}"
          case "like" => s"${wrap(a(0))} LIKE ${r(a(1))}"
          case "isNull" => s"${wrap(a(0))} IS NULL"
          case "+" | "*" | "/" | "%" | "^" =>
            s"(${wrap(a(0))} ${op} ${wrap(a(1))})"
          case "-" =>
            if (a.size == 1) s"(- ${wrap(a(0))})"
            else s"(${wrap(a(0))} - ${wrap(a(1))})"
          case "div" => s"(${wrap(a(0))} DIV ${wrap(a(1))})"
          case o => s"${o.toUpperCase}(${a.map(r).mkString(", ")})"
        }
      } else if (x.isObject && x.has("property")) x.get("property").asText
      else if (x.isObject && x.has("timestamp"))
        s"TIMESTAMP('${x.get("timestamp").asText}')"
      else if (x.isObject && x.has("date")) s"DATE('${x.get("date").asText}')"
      else if (x.isObject && x.has("interval")) {
        val b = x.get("interval").elements().asScala.toIndexedSeq
        def bd(n0: com.fasterxml.jackson.databind.JsonNode) =
          if (n0.isTextual) s"'${n0.asText}'" else r(n0)
        s"INTERVAL(${bd(b(0))}, ${bd(b(1))})"
      } else if (x.isObject && x.has("bbox")) {
        s"BBOX(${x.get("bbox").elements().asScala.map(_.asText).mkString(", ")})"
      } else if (x.isArray)
        s"(${x.elements().asScala.map(r).mkString(", ")})"
      else if (x.isTextual) s"'${x.asText.replace("'", "''")}'"
      else x.toString
    def wrap(x: com.fasterxml.jackson.databind.JsonNode): String =
      if (needsParens(x)) s"(${r(x)})" else r(x)
    r(n)
  }

  private val genProp = Gen.oneOf("v", "w", "s", "eo:cloud_cover").map(p =>
    s"""{"property":"$p"}""")
  private val genLit = Gen.oneOf(
    Gen.choose(-9L, 9L).map(_.toString),
    Gen.choose(-20, 20).map(i => (i * 0.25).toString),
    Gen.oneOf("alpha", "café", "x'y").map(s =>
      "\"" + s.replace("'", "'") + "\""))
  private def genTerm: Gen[String] = Gen.frequency(3 -> genProp, 2 -> genLit)
  private def genArith(depth: Int): Gen[String] =
    if (depth <= 0) genTerm
    else Gen.frequency(
      3 -> genTerm,
      2 -> (for {
        op <- Gen.oneOf("+", "-", "*", "/", "%", "div", "^")
        a <- genArith(depth - 1); b <- genArith(depth - 1)
      } yield s"""{"op":"$op","args":[$a,$b]}"""),
      1 -> genArith(depth - 1).map(a => s"""{"op":"-","args":[$a]}"""))
  private def genCmp: Gen[String] = for {
    op <- Gen.oneOf("=", "<>", "<", "<=", ">", ">=")
    a <- genArith(2); b <- genArith(2)
  } yield s"""{"op":"$op","args":[$a,$b]}"""
  private def genLeafP: Gen[String] = Gen.frequency(
    4 -> genCmp,
    1 -> (for { a <- genTerm; lo <- genTerm; hi <- genTerm }
      yield s"""{"op":"between","args":[$a,$lo,$hi]}"""),
    1 -> (for { a <- genProp; n <- Gen.choose(1, 3)
                xs <- Gen.listOfN(n, Gen.choose(-5L, 5L)) }
      yield s"""{"op":"in","args":[$a,[${xs.mkString(",")}]]}"""),
    1 -> genProp.map(p => s"""{"op":"isNull","args":[$p]}"""),
    1 -> (for { op <- Gen.oneOf("t_before", "t_metBy", "t_overlappedBy",
                  "t_startedBy", "t_finishedBy")
                ts <- Gen.const("2020-03-04T05:00:00Z") }
      yield s"""{"op":"$op","args":[{"property":"dt"},{"timestamp":"$ts"}]}"""),
    1 -> (for { op <- Gen.oneOf("a_contains", "a_containedBy", "a_equals", "a_overlaps") }
      yield s"""{"op":"$op","args":[{"property":"tags"},["a","b"]]}"""))
  private def genPred(depth: Int): Gen[String] =
    if (depth <= 0) genLeafP
    else Gen.frequency(
      3 -> genLeafP,
      1 -> (for { a <- genPred(depth - 1); b <- genPred(depth - 1) }
        yield s"""{"op":"and","args":[$a,$b]}"""),
      1 -> (for { a <- genPred(depth - 1); b <- genPred(depth - 1) }
        yield s"""{"op":"or","args":[$a,$b]}"""),
      1 -> genPred(depth - 1).map(a => s"""{"op":"not","args":[$a]}"""))

  /** The parser folds unary minus over numeric literals into negative
    * literals (the JSON encoding's spelling); normalize generated ASTs
    * the same way so tree equality is exact. */
  private def normalize(n: com.fasterxml.jackson.databind.JsonNode)
      : com.fasterxml.jackson.databind.JsonNode = {
    import scala.jdk.CollectionConverters._
    val F = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance
    if (n.isObject && n.has("op")) {
      val args = n.get("args").elements().asScala.map(normalize).toIndexedSeq
      if (n.get("op").asText == "-" && args.size == 1 && args(0).isNumber) {
        val x = args(0)
        if (x.isIntegralNumber) {
          val l = -x.asLong
          if (l >= Int.MinValue && l <= Int.MaxValue) F.numberNode(l.toInt)
          else F.numberNode(l)
        } else F.numberNode(-x.asDouble)
      } else {
        val o = F.objectNode()
        o.put("op", n.get("op").asText)
        val a = o.putArray("args")
        args.foreach(a.add)
        o
      }
    } else if (n.isArray) {
      val a = F.arrayNode()
      n.elements().asScala.map(normalize).foreach(a.add)
      a
    } else n
  }

  test("round-trip: 500 random ASTs render to text and parse back identical") {
    val seed = org.scalacheck.rng.Seed(20260814L)
    val params = Gen.Parameters.default
    var s = seed
    (1 to 500).foreach { i =>
      val json = genPred(3).pureApply(params, s)
      s = s.next
      val ast = normalize(M.readTree(json))
      val text = render(ast)
      val back = Cql2Text.parse(text)
      assert(back == ast, s"#$i\n json: $json\n text: $text\n back: $back")
    }
  }

  // ------------------------------------------------- Spark evaluation leg
  test("filterText ≡ filter on a live frame (both encodings, same rows)") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions._
    val s = spark; import s.implicits._
    val df = (0 until 30).map { i =>
      (f"r$i%02d", (i % 11).toLong - 5, (i % 7) * 0.5,
        Seq("eo", s"t${i % 3}"), f"2020-${1 + i % 12}%02d-15 00:00:00")
    }.toDF("id", "v", "w", "tags", "dts")
      .withColumn("dt", to_timestamp(col("dts"))).drop("dts")
      .withColumn("bbox", struct((col("v") * 1.0).as("xmin"), col("w").as("ymin"),
        (col("v") + 2.0).as("xmax"), (col("w") + 1.0).as("ymax")))
    val pairs = Seq(
      "v + 2 * 3 > 4 AND w <= 2.5" ->
        """{"op":"and","args":[
             {"op":">","args":[{"op":"+","args":[{"property":"v"},{"op":"*","args":[2,3]}]},4]},
             {"op":"<=","args":[{"property":"w"},2.5]}]}""",
      "v NOT BETWEEN -1 AND 2 OR A_CONTAINS(tags, ('eo'))" ->
        """{"op":"or","args":[
             {"op":"not","args":[{"op":"between","args":[{"property":"v"},-1,2]}]},
             {"op":"a_contains","args":[{"property":"tags"},["eo"]]}]}""",
      "T_DURING(dt, INTERVAL('2020-03-01', '2020-09-30'))" ->
        """{"op":"t_during","args":[{"property":"dt"},
             {"interval":["2020-03-01","2020-09-30"]}]}""",
      "S_INTERSECTS(bbox, BBOX(-2, 0, 1, 2))" ->
        """{"op":"s_intersects","args":[{"property":"bbox"},{"bbox":[-2,0,1,2]}]}""")
    pairs.foreach { case (text, json) =>
      val a = df.filter(Cql2.filterText(text)).select("id").collect().map(_.getString(0)).toSet
      val b = df.filter(Cql2.filter(json)).select("id").collect().map(_.getString(0)).toSet
      assert(a == b, s"text/json drift for: $text → $a vs $b")
      assert(a.nonEmpty || b.nonEmpty || text.contains("T_DURING"),
        s"zero-coverage predicate: $text")
    }
  }
}
