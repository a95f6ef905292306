package graft.stac

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

/** OGC CQL2 TEXT encoding (21-065 `cql2-text`) → the cql2-json AST
  * [[Cql2]] translates — ONE semantics, two wire formats, exactly the
  * reference's surface (pgstac's `search()` accepts either encoding;
  * STAC API `filter-lang=cql2-text` is the GET-request default).
  *
  * A hand-rolled recursive-descent parser over a token stream, with a
  * unified expression grammar so parenthesized arithmetic and boolean
  * grouping need no backtracking:
  *
  *   or     := and (OR and)*
  *   and    := not (AND not)*
  *   not    := NOT not | cmp
  *   cmp    := add ( =|<>|<|<=|>|>= add
  *                 | [NOT] BETWEEN add AND add
  *                 | [NOT] IN parenList | [NOT] LIKE add
  *                 | IS [NOT] NULL )?
  *   add    := mul (('+'|'-') mul)*
  *   mul    := unary (('*'|'/'|'%'|DIV) unary)*
  *   unary  := '-' unary | pow
  *   pow    := primary ('^' unary)?          (right-associative)
  *   primary:= NUMBER | 'string' | TRUE | FALSE | function | WKT | BBOX
  *           | property | "quoted property" | '(' or [',' or ...] ')'
  *
  * A parenthesized list with a comma is an ARRAY literal (the official
  * grammar's arrayExpression — arrays only appear as array-operator
  * operands, where a scalar non-property operand is normalized to a
  * singleton array, resolving the `('x')` grouping ambiguity the same
  * way the context-sensitive official grammar does). Spatial literals
  * are WKT (`POINT(1 2)`, nested-paren multi shapes, `EMPTY`),
  * translated to the GeoJSON nodes the JSON path consumes; temporal
  * literals are `TIMESTAMP('…')` / `DATE('…')` / `INTERVAL('…','…')`
  * with `'..'` open bounds. Keywords are case-insensitive; property
  * names are not (STAC names like `eo:cloud_cover` lex as identifiers;
  * reserved or exotic names go in double quotes). */
object Cql2Text {

  private val F = JsonNodeFactory.instance

  def parse(text: String): JsonNode = {
    val p = new Parser(lex(text))
    val n = p.parseOr()
    p.expectEnd()
    n
  }

  // ------------------------------------------------------------------ lexer
  private sealed trait Tok
  private final case class TIdent(s: String) extends Tok // bare identifier
  private final case class TQIdent(s: String) extends Tok // "quoted" identifier
  private final case class TNum(s: String) extends Tok
  private final case class TStr(s: String) extends Tok // 'quoted' string
  private final case class TOp(s: String) extends Tok // punctuation/operator
  private case object TEnd extends Tok

  private def lex(text: String): IndexedSeq[Tok] = {
    val out = IndexedSeq.newBuilder[Tok]
    var i = 0
    val n = text.length
    def isIdentStart(c: Char) = c.isLetter || c == '_'
    def isIdentPart(c: Char) = c.isLetterOrDigit || c == '_' || c == ':' || c == '.'
    while (i < n) {
      val c = text.charAt(i)
      if (c.isWhitespace) i += 1
      else if (isIdentStart(c)) {
        val j = i
        while (i < n && isIdentPart(text.charAt(i))) i += 1
        out += TIdent(text.substring(j, i))
      } else if (c.isDigit || (c == '.' && i + 1 < n && text.charAt(i + 1).isDigit)) {
        val j = i
        while (i < n && (text.charAt(i).isDigit || text.charAt(i) == '.')) i += 1
        if (i < n && (text.charAt(i) == 'e' || text.charAt(i) == 'E')) {
          i += 1
          if (i < n && (text.charAt(i) == '+' || text.charAt(i) == '-')) i += 1
          while (i < n && text.charAt(i).isDigit) i += 1
        }
        out += TNum(text.substring(j, i))
      } else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = text.charAt(i)
          if (ch == '\'' && i + 1 < n && text.charAt(i + 1) == '\'') {
            sb.append('\''); i += 2 // '' escape
          } else if (ch == '\'') { closed = true; i += 1 }
          else { sb.append(ch); i += 1 }
        }
        require(closed, s"unterminated string literal at offset $i")
        out += TStr(sb.toString)
      } else if (c == '"') {
        val j = i + 1
        val k = text.indexOf('"', j)
        require(k >= 0, s"unterminated quoted identifier at offset $i")
        out += TQIdent(text.substring(j, k)); i = k + 1
      } else if (c == '<' && i + 1 < n && text.charAt(i + 1) == '>') {
        out += TOp("<>"); i += 2
      } else if (c == '<' && i + 1 < n && text.charAt(i + 1) == '=') {
        out += TOp("<="); i += 2
      } else if (c == '>' && i + 1 < n && text.charAt(i + 1) == '=') {
        out += TOp(">="); i += 2
      } else if ("()=<>+-*/%^,".indexOf(c) >= 0) {
        out += TOp(c.toString); i += 1
      } else throw new IllegalArgumentException(
        s"cql2-text: unexpected character '$c' at offset $i")
    }
    out += TEnd
    out.result()
  }

  // ---------------------------------------------------------------- parser
  /** Mixed-case JSON op names, keyed by their case-insensitive text
    * spelling (T_OVERLAPPEDBY → t_overlappedBy, …). */
  private val FnOps: Map[String, String] = Seq(
    "t_before", "t_after", "t_disjoint", "t_intersects", "t_equals",
    "t_during", "t_contains", "t_overlaps", "t_overlappedBy", "t_meets",
    "t_metBy", "t_starts", "t_startedBy", "t_finishes", "t_finishedBy",
    "a_equals", "a_contains", "a_containedBy", "a_overlaps",
    "s_intersects", "s_disjoint", "s_within", "s_contains",
    "s_equals", "s_touches", "s_crosses", "s_overlaps",
    "casei", "accenti").map(o => o.toUpperCase -> o).toMap

  private val WktTypes: Map[String, String] = Seq(
    "Point", "LineString", "Polygon", "MultiPoint", "MultiLineString",
    "MultiPolygon", "GeometryCollection").map(t => t.toUpperCase -> t).toMap

  private final class Parser(toks: IndexedSeq[Tok]) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def expectOp(s: String): Unit = next() match {
      case TOp(`s`) => ()
      case other => fail(s"expected '$s', got $other")
    }
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"cql2-text: $msg (token ${pos + 1})")
    /** Case-insensitive keyword lookahead. */
    private def atKw(kw: String): Boolean = peek match {
      case TIdent(s) => s.equalsIgnoreCase(kw)
      case _ => false
    }
    private def eatKw(kw: String): Boolean =
      if (atKw(kw)) { pos += 1; true } else false
    def expectEnd(): Unit =
      if (peek != TEnd) fail(s"trailing input from $peek")

    private def opNode(op: String, args: JsonNode*): ObjectNode = {
      val o = F.objectNode()
      o.put("op", op)
      val a = o.putArray("args")
      args.foreach(a.add)
      o
    }
    private def propNode(name: String): ObjectNode = {
      val o = F.objectNode(); o.put("property", name); o
    }

    def parseOr(): JsonNode = {
      var l = parseAnd()
      while (eatKw("OR")) l = opNode("or", l, parseAnd())
      l
    }
    private def parseAnd(): JsonNode = {
      var l = parseNot()
      while (eatKw("AND")) l = opNode("and", l, parseNot())
      l
    }
    private def parseNot(): JsonNode =
      if (eatKw("NOT")) opNode("not", parseNot()) else parseCmp()

    private def parseCmp(): JsonNode = {
      val l = parseAdd()
      peek match {
        case TOp(o @ ("=" | "<>" | "<" | "<=" | ">" | ">=")) =>
          pos += 1
          opNode(o, l, parseAdd())
        case TIdent(kw) if kw.equalsIgnoreCase("BETWEEN") =>
          pos += 1
          val lo = parseAdd()
          if (!eatKw("AND")) fail("BETWEEN needs AND")
          opNode("between", l, lo, parseAdd())
        case TIdent(kw) if kw.equalsIgnoreCase("IN") =>
          pos += 1
          opNode("in", l, asArray(parsePrimary()))
        case TIdent(kw) if kw.equalsIgnoreCase("LIKE") =>
          pos += 1
          opNode("like", l, parseAdd())
        case TIdent(kw) if kw.equalsIgnoreCase("IS") =>
          pos += 1
          val neg = eatKw("NOT")
          if (!eatKw("NULL")) fail("IS [NOT] NULL expected")
          val base = opNode("isNull", l)
          if (neg) opNode("not", base) else base
        case TIdent(kw) if kw.equalsIgnoreCase("NOT") =>
          // the negated predicate suffixes: NOT BETWEEN / NOT IN / NOT LIKE
          pos += 1
          val inner = peek match {
            case TIdent(k2) if k2.equalsIgnoreCase("BETWEEN") =>
              pos += 1
              val lo = parseAdd()
              if (!eatKw("AND")) fail("BETWEEN needs AND")
              opNode("between", l, lo, parseAdd())
            case TIdent(k2) if k2.equalsIgnoreCase("IN") =>
              pos += 1
              opNode("in", l, asArray(parsePrimary()))
            case TIdent(k2) if k2.equalsIgnoreCase("LIKE") =>
              pos += 1
              opNode("like", l, parseAdd())
            case other => fail(s"expected BETWEEN/IN/LIKE after NOT, got $other")
          }
          opNode("not", inner)
        case _ => l
      }
    }

    private def parseAdd(): JsonNode = {
      var l = parseMul()
      var go = true
      while (go) peek match {
        case TOp(o @ ("+" | "-")) => pos += 1; l = opNode(o, l, parseMul())
        case _ => go = false
      }
      l
    }
    private def parseMul(): JsonNode = {
      var l = parseUnary()
      var go = true
      while (go) peek match {
        case TOp(o @ ("*" | "/" | "%")) => pos += 1; l = opNode(o, l, parseUnary())
        case TIdent(kw) if kw.equalsIgnoreCase("DIV") =>
          pos += 1; l = opNode("div", l, parseUnary())
        case _ => go = false
      }
      l
    }
    private def parseUnary(): JsonNode = peek match {
      case TOp("-") =>
        pos += 1
        val inner = parseUnary()
        // fold negation of a numeric literal into the literal (a
        // negative number token, same AST the JSON encoding writes)
        if (inner.isIntegralNumber) intNode(-inner.asLong)
        else if (inner.isNumber) F.numberNode(-inner.asDouble)
        else opNode("-", inner)
      case TOp("+") => pos += 1; parseUnary()
      case _ => parsePow()
    }
    private def parsePow(): JsonNode = {
      val l = parsePrimary()
      peek match {
        case TOp("^") => pos += 1; opNode("^", l, parseUnary())
        case _ => l
      }
    }

    /** A scalar wrapped as a singleton array (the array-operand
      * normalization); arrays pass through. */
    private def asArray(n: JsonNode): JsonNode =
      if (n.isArray) n
      else { val a = F.arrayNode(); a.add(n); a }

    private def parsePrimary(): JsonNode = next() match {
      case TNum(s) => numNode(s)
      case TStr(s) => F.textNode(s)
      case TQIdent(s) => propNode(s)
      case TOp("(") =>
        peek match {
          case TOp(")") => pos += 1; F.arrayNode() // empty array literal
          case _ =>
            val first = parseOr()
            peek match {
              case TOp(",") =>
                val arr = F.arrayNode()
                arr.add(first)
                while (peek == TOp(",")) { pos += 1; arr.add(parseOr()) }
                expectOp(")")
                arr
              case _ => expectOp(")"); first
            }
        }
      case TIdent(s) =>
        val up = s.toUpperCase
        if (up == "TRUE") F.booleanNode(true)
        else if (up == "FALSE") F.booleanNode(false)
        else if (peek == TOp("(") && WktTypes.contains(up)) wktNode(up)
        else if (peek == TOp("(")) {
          pos += 1 // consume '('
          up match {
            case "TIMESTAMP" =>
              val o = F.objectNode(); o.put("timestamp", strArg()); expectOp(")"); o
            case "DATE" =>
              val o = F.objectNode(); o.put("date", strArg()); expectOp(")"); o
            case "INTERVAL" =>
              val o = F.objectNode()
              val a = o.putArray("interval")
              a.add(intervalBound()); expectOp(",")
              a.add(intervalBound()); expectOp(")")
              o
            case "BBOX" =>
              val o = F.objectNode()
              val a = o.putArray("bbox")
              a.add(signedNum())
              while (peek == TOp(",")) { pos += 1; a.add(signedNum()) }
              expectOp(")")
              o
            case _ =>
              val args = scala.collection.mutable.ArrayBuffer.empty[JsonNode]
              if (peek != TOp(")")) {
                args += parseOr()
                while (peek == TOp(",")) { pos += 1; args += parseOr() }
              }
              expectOp(")")
              FnOps.get(up) match {
                case Some(op) =>
                  // parse-time arity gate: every built-in has a fixed
                  // arity (casei/accenti unary, the s_/t_/a_ comparisons
                  // binary) — a wrong-arity call fails HERE by name, not
                  // later as an index error inside translation
                  val arity = if (op == "casei" || op == "accenti") 1 else 2
                  if (args.size != arity)
                    fail(s"$op takes $arity argument(s), got ${args.size}")
                  val fixed =
                    if (op.startsWith("a_"))
                      // array-operand normalization (see asArray)
                      args.map(n =>
                        if (n.isObject && n.has("property")) n else asArray(n))
                    else args
                  opNode(op, fixed.toSeq: _*)
                case None =>
                  // OGC functionRef — any other call form is a user/
                  // registered function, resolved (or refused by name)
                  // at TRANSLATION time by Cql2's registry, exactly as
                  // the JSON encoding's {"function":…} node is. Names
                  // in the spec operator prefix families (s_/t_/a_) that
                  // are NOT registered built-ins are close typos of spec
                  // operators (S_INTERSECTZ) — refuse at parse time
                  // rather than silently emitting a function node
                  if (up.startsWith("S_") || up.startsWith("T_") ||
                      up.startsWith("A_"))
                    fail(s"unknown spatial/temporal/array operator '$s' " +
                      "(not a CQL2 built-in; user functions may not use " +
                      "the s_/t_/a_ prefix)")
                  val o = F.objectNode()
                  val fo = o.putObject("function")
                  fo.put("name", s)
                  val a = fo.putArray("args")
                  args.foreach(a.add)
                  o
              }
          }
        } else propNode(s)
      case other => fail(s"unexpected $other")
    }

    /** Int-range integers become IntNode — the node class Jackson's own
      * readTree produces, so text- and json-parsed ASTs compare equal. */
    private def intNode(l: Long): JsonNode =
      if (l >= Int.MinValue && l <= Int.MaxValue) F.numberNode(l.toInt)
      else F.numberNode(l)
    private def numNode(s: String): JsonNode =
      if (s.forall(_.isDigit)) intNode(s.toLong)
      else F.numberNode(s.toDouble)
    private def signedNum(): JsonNode = next() match {
      case TOp("-") => next() match {
        case TNum(s) =>
          if (s.forall(_.isDigit)) intNode(-s.toLong) else F.numberNode(-s.toDouble)
        case other => fail(s"expected number after '-', got $other")
      }
      case TNum(s) => numNode(s)
      case other => fail(s"expected number, got $other")
    }
    private def strArg(): String = next() match {
      case TStr(s) => s
      case other => fail(s"expected string literal, got $other")
    }
    /** INTERVAL bound: a quoted instant / '..', or a property name. */
    private def intervalBound(): JsonNode = peek match {
      case TStr(s) => pos += 1; F.textNode(s)
      case TIdent(s) if !FnOps.contains(s.toUpperCase) => pos += 1; propNode(s)
      case TQIdent(s) => pos += 1; propNode(s)
      case other => fail(s"bad INTERVAL bound $other")
    }

    // ------------------------------------------------------------- WKT
    /** WKT geometry (the token after the type name is '(') → GeoJSON. */
    private def wktNode(upType: String): JsonNode = {
      val t = WktTypes(upType)
      val o = F.objectNode()
      o.put("type", t)
      t match {
        case "Point" =>
          expectOp("("); o.set[JsonNode]("coordinates", wktPos()); expectOp(")")
        case "LineString" =>
          o.set[JsonNode]("coordinates", wktPosList())
        case "Polygon" =>
          o.set[JsonNode]("coordinates", wktRingList())
        case "MultiPoint" =>
          // both POINT lists and bare-position lists appear in the wild
          expectOp("(")
          val a = F.arrayNode()
          def onePoint(): Unit = peek match {
            case TOp("(") => expectOp("("); a.add(wktPos()); expectOp(")")
            case _ => a.add(wktPos())
          }
          onePoint()
          while (peek == TOp(",")) { pos += 1; onePoint() }
          expectOp(")")
          o.set[JsonNode]("coordinates", a)
        case "MultiLineString" =>
          o.set[JsonNode]("coordinates", wktRingList())
        case "MultiPolygon" =>
          expectOp("(")
          val a = F.arrayNode()
          a.add(wktRingList())
          while (peek == TOp(",")) { pos += 1; a.add(wktRingList()) }
          expectOp(")")
          o.set[JsonNode]("coordinates", a)
        case "GeometryCollection" =>
          expectOp("(")
          val a = F.arrayNode()
          def oneGeom(): Unit = next() match {
            case TIdent(s) if WktTypes.contains(s.toUpperCase) =>
              a.add(wktNode(s.toUpperCase))
            case other => fail(s"expected geometry in GEOMETRYCOLLECTION, got $other")
          }
          oneGeom()
          while (peek == TOp(",")) { pos += 1; oneGeom() }
          expectOp(")")
          o.set[JsonNode]("geometries", a)
      }
      o
    }
    private def wktPos(): ArrayNode = {
      val a = F.arrayNode()
      a.add(signedNum())
      a.add(signedNum())
      peek match { // optional z
        case TNum(_) | TOp("-") => a.add(signedNum())
        case _ => ()
      }
      a
    }
    private def wktPosList(): ArrayNode = {
      expectOp("(")
      val a = F.arrayNode()
      a.add(wktPos())
      while (peek == TOp(",")) { pos += 1; a.add(wktPos()) }
      expectOp(")")
      a
    }
    private def wktRingList(): ArrayNode = {
      expectOp("(")
      val a = F.arrayNode()
      a.add(wktPosList())
      while (peek == TOp(",")) { pos += 1; a.add(wktPosList()) }
      expectOp(")")
      a
    }
  }
}
