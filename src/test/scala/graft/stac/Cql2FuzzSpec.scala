package graft.stac

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** CQL2 translator fuzzing: ScalaCheck-generated random CQL2-JSON ASTs
  * evaluated two independent ways on the same rows —
  *   1. `Cql2.filter` → Catalyst Column (the production translator);
  *   2. a structurally direct CQL2→SQL mapping executed by DuckDB over
  *      JDBC (an INDEPENDENT second implementation of the spec).
  * Any precedence, null-semantics (SQL three-valued logic), casei /
  * accenti, between-bounds, IN, LIKE, temporal, or array-operator drift
  * between the two shows up as a per-row Boolean mismatch. 1200 ASTs at
  * a pinned seed (deterministic), evaluated in batches so Spark runs
  * ~12 jobs, not 1200. Predicates are compared as nullable Booleans
  * (stricter than WHERE-filtered id sets: a null-vs-false disagreement
  * fails even though both would drop the row).
  *
  * Spatial ops are excluded: DuckDB has no JTS; their exactness is
  * pinned separately (ExactSpatialSpec, gates stac19/stac20).
  * Self-skips if no DuckDB JDBC driver jar was found by the build. */
class Cql2FuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def driverPresent: Boolean =
    try { Class.forName("org.duckdb.DuckDBDriver"); true }
    catch { case _: ClassNotFoundException => false }

  // ------------------------------------------------------------ fixture rows
  // 40 rows, nulls sprinkled through every scalar column, accents and
  // mixed case in the string pool, timestamps on a day grid.
  private val strPool =
    Vector("alpha", "Beta", "café", "CAFE", "naïve", "Ünion", "r2d2", "", "a_b%c")
  private val tagPool = Vector("t0", "t1", "t2", "eo")

  private case class R(id: String, v: Option[Long], w: Option[Double],
                       s: Option[String], tags: Seq[String], dt: Option[String],
                       dt0: Option[String], dt1: Option[String],
                       bx0: Double, by0: Double, bx1: Double, by1: Double)

  private val rows: Seq[R] = (0 until 40).map { i =>
    // bboxes on the same 0.5 grid the spatial literals use, so boundary
    // touches (<= vs <) occur in the sample
    val bx0 = (i % 9).toDouble - 4.0 + 0.5 * (i % 2)
    val by0 = (i % 7).toDouble - 3.0 + 0.5 * ((i / 2) % 2)
    // interval property [dt0, dt1] on the same day grid the literals use
    // so bound-equality cases (meets/starts/finishes) occur; i%5 == 0
    // gives degenerate single-instant intervals
    val d0 = 1 + (i * 3) % 24
    val d1 = math.min(28, d0 + i % 5)
    R(f"r$i%02d",
      if (i % 7 == 3) None else Some((i % 11).toLong - 5),
      if (i % 9 == 4) None else Some((i * 37 % 19) * 0.25 - 2.0),
      if (i % 8 == 6) None else Some(strPool(i % strPool.length)),
      (0 until i % 4).map(j => tagPool((i + j) % tagPool.length)),
      if (i % 13 == 5) None
      else Some(f"2020-${1 + i % 12}%02d-${1 + i % 28}%02d 0${i % 10}:00:00"),
      if (i % 11 == 7) None else Some(f"2020-${1 + i % 6}%02d-$d0%02d 00:00:00"),
      if (i % 11 == 7) None else Some(f"2020-${1 + i % 6}%02d-$d1%02d 00:00:00"),
      bx0, by0, bx0 + 1.0 + 0.5 * (i % 3), by0 + 0.5 + 0.5 * (i % 4))
  }

  private lazy val df = {
    val s = spark; import s.implicits._
    rows.map(r => (r.id, r.v, r.w, r.s, r.tags, r.dt, r.dt0, r.dt1,
        r.bx0, r.by0, r.bx1, r.by1))
      .toDF("id", "v", "w", "s", "tags", "dts", "dts0", "dts1",
        "bx0", "by0", "bx1", "by1")
      .withColumn("dt", to_timestamp(col("dts"))).drop("dts")
      .withColumn("dt0", to_timestamp(col("dts0"))).drop("dts0")
      .withColumn("dt1", to_timestamp(col("dts1"))).drop("dts1")
      .withColumn("bbox", struct(col("bx0").as("xmin"), col("by0").as("ymin"),
        col("bx1").as("xmax"), col("by1").as("ymax")))
      .drop("bx0", "by0", "bx1", "by1")
  }

  // ------------------------------------------------- AST + its two renderings
  /** Generated predicates carry BOTH renderings, built together so the
    * mapping is structural (no re-parse): (cql2Json, duckdbSql). */
  private type P = (String, String)

  private def qs(x: String) = "'" + x.replace("'", "''") + "'"
  private def js(x: String) = "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private val genLong = Gen.choose(-6L, 6L)
  private val genDouble = Gen.choose(-10, 10).map(_ * 0.25)
  private val genStr = Gen.oneOf(strPool)
  private val genTs = for {
    m <- Gen.choose(1, 12); d <- Gen.choose(1, 28); h <- Gen.choose(0, 9)
  } yield f"2020-$m%02d-$d%02d 0$h:00:00"

  private val cmpOps = Seq("=" -> "=", "<>" -> "<>", "<" -> "<",
    "<=" -> "<=", ">" -> ">", ">=" -> ">=")

  private val genNumCmp: Gen[P] = for {
    (cop, sop) <- Gen.oneOf(cmpOps)
    useV <- Gen.oneOf(true, false)
    lit <- if (useV) genLong.map(_.toString) else genDouble.map(_.toString)
    prop = if (useV) "v" else "w"
  } yield (s"""{"op":"$cop","args":[{"property":"$prop"},$lit]}""", s"($prop $sop $lit)")

  private val genStrCmp: Gen[P] = for {
    (cop, sop) <- Gen.oneOf(cmpOps.take(2)) // = and <> on strings
    lit <- genStr
    wrap <- Gen.oneOf("none", "casei", "accenti")
  } yield wrap match {
    case "none" =>
      (s"""{"op":"$cop","args":[{"property":"s"},${js(lit)}]}""",
        s"(s $sop ${qs(lit)})")
    case "casei" =>
      (s"""{"op":"$cop","args":[{"op":"casei","args":[{"property":"s"}]},${js(lit.toLowerCase)}]}""",
        s"(lower(s) $sop ${qs(lit.toLowerCase)})")
    case "accenti" =>
      (s"""{"op":"$cop","args":[{"op":"accenti","args":[{"property":"s"}]},${js(lit)}]}""",
        s"(strip_accents(s) $sop ${qs(lit)})")
  }

  private val genBetween: Gen[P] = for {
    lo <- genLong; hi <- genLong
  } yield (s"""{"op":"between","args":[{"property":"v"},$lo,$hi]}""",
    s"(v BETWEEN $lo AND $hi)")

  private val genIn: Gen[P] = for {
    useV <- Gen.oneOf(true, false)
    n <- Gen.choose(1, 4)
    longs <- Gen.listOfN(n, genLong)
    strs <- Gen.listOfN(n, genStr)
  } yield if (useV)
    (s"""{"op":"in","args":[{"property":"v"},[${longs.mkString(",")}]]}""",
      s"(v IN (${longs.mkString(",")}))")
  else
    (s"""{"op":"in","args":[{"property":"s"},[${strs.map(js).mkString(",")}]]}""",
      s"(s IN (${strs.map(qs).mkString(",")}))")

  private val genLike: Gen[P] = Gen.oneOf("r%", "%a%", "%é", "_b%", "%2", "caf_")
    .map(p => (s"""{"op":"like","args":[{"property":"s"},${js(p)}]}""",
      s"(s LIKE ${qs(p)})"))

  private val genIsNull: Gen[P] = Gen.oneOf("v", "w", "s", "dt")
    .map(p => (s"""{"op":"isNull","args":[{"property":"$p"}]}""", s"($p IS NULL)"))

  // ------------------------- full temporal algebra (Allen relations)
  // A temporal operand is (cql2Json, sqlStart, sqlEnd); the SQL rendering
  // of each relation is built from interval endpoints with the SAME
  // formulas the spec defines — but evaluated by DuckDB, so any drift in
  // the translator's comparisons, open-bound sentinels, or null logic
  // shows up as a mismatch.
  private type TOperand = (String, String, String)

  private val genTOperand: Gen[TOperand] = {
    val openLo = "TIMESTAMP '0001-01-01 00:00:00'"
    val openHi = "TIMESTAMP '9999-12-31 23:59:59'"
    Gen.frequency(
      3 -> Gen.const(("""{"property":"dt"}""", "dt", "dt")),
      3 -> Gen.const(
        ("""{"interval":[{"property":"dt0"},{"property":"dt1"}]}""", "dt0", "dt1")),
      2 -> genTs.map(a =>
        (s"""{"timestamp":"$a"}""", s"TIMESTAMP '$a'", s"TIMESTAMP '$a'")),
      3 -> (for { a <- genTs; b <- genTs; open <- Gen.oneOf(0, 0, 0, 1, 2) } yield {
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        open match {
          case 1 => (s"""{"interval":["..","$hi"]}""", openLo, s"TIMESTAMP '$hi'")
          case 2 => (s"""{"interval":["$lo",".."]}""", s"TIMESTAMP '$lo'", openHi)
          case _ => (s"""{"interval":["$lo","$hi"]}""",
            s"TIMESTAMP '$lo'", s"TIMESTAMP '$hi'")
        }
      }))
  }

  private val tOps = Seq("t_before", "t_after", "t_disjoint", "t_intersects",
    "t_equals", "t_during", "t_contains", "t_overlaps", "t_overlappedBy",
    "t_meets", "t_metBy", "t_starts", "t_startedBy", "t_finishes", "t_finishedBy")

  private def tSql(op: String, s1: String, e1: String, s2: String, e2: String): String =
    op match {
      case "t_before"       => s"($e1 < $s2)"
      case "t_after"        => s"($s1 > $e2)"
      case "t_disjoint"     => s"($e1 < $s2 OR $s1 > $e2)"
      case "t_intersects"   => s"($s1 <= $e2 AND $e1 >= $s2)"
      case "t_equals"       => s"($s1 = $s2 AND $e1 = $e2)"
      case "t_during"       => s"($s1 > $s2 AND $e1 < $e2)"
      case "t_contains"     => s"($s1 < $s2 AND $e1 > $e2)"
      case "t_overlaps"     => s"($s1 < $s2 AND $e1 > $s2 AND $e1 < $e2)"
      case "t_overlappedBy" => s"($s1 > $s2 AND $s1 < $e2 AND $e1 > $e2)"
      case "t_meets"        => s"($e1 = $s2)"
      case "t_metBy"        => s"($s1 = $e2)"
      case "t_starts"       => s"($s1 = $s2 AND $e1 < $e2)"
      case "t_startedBy"    => s"($s1 = $s2 AND $e1 > $e2)"
      case "t_finishes"     => s"($s1 > $s2 AND $e1 = $e2)"
      case "t_finishedBy"   => s"($s1 < $s2 AND $e1 = $e2)"
    }

  private val genTemporal: Gen[P] = for {
    op <- Gen.oneOf(tOps)
    a <- genTOperand
    b <- genTOperand
    // at least one side must involve a property, or the predicate is a
    // row-independent constant (legal but zero-coverage)
    if a._2.startsWith("dt") || b._2.startsWith("dt")
  } yield (s"""{"op":"$op","args":[${a._1},${b._1}]}""",
    tSql(op, a._2, a._3, b._2, b._3))

  private val genArrayOp: Gen[P] = for {
    op <- Gen.oneOf("a_equals", "a_contains", "a_containedBy", "a_overlaps")
    n <- Gen.choose(1, 3)
    elems <- Gen.listOfN(n, Gen.oneOf(tagPool))
  } yield {
    val jarr = s"[${elems.map(js).mkString(",")}]"
    val sarr = s"[${elems.map(qs).mkString(",")}]"
    val sql = op match {
      case "a_equals"      => s"(list_has_all(tags, $sarr) AND list_has_all($sarr, tags))"
      case "a_contains"    => s"(list_has_all(tags, $sarr))"
      case "a_containedBy" => s"(list_has_all($sarr, tags))"
      case "a_overlaps"    => s"(list_has_any(tags, $sarr))"
    }
    (s"""{"op":"$op","args":[{"property":"tags"},$jarr]}""", sql)
  }

  // spatial ops on the BBOX property (envelope semantics = exact for
  // rectangles, so the whole predicate is SQL arithmetic both engines
  // evaluate; the geometry-property exact path is pinned in
  // ExactSpatialSpec — DuckDB has no JTS to mirror it)
  private val genSpatial: Gen[P] = for {
    op <- Gen.oneOf("s_intersects", "s_disjoint", "s_within", "s_contains",
      "s_equals", "s_touches", "s_crosses", "s_overlaps")
    x0 <- Gen.choose(-8, 8).map(_ * 0.5); y0 <- Gen.choose(-8, 8).map(_ * 0.5)
    w <- Gen.choose(1, 8).map(_ * 0.5); h <- Gen.choose(1, 8).map(_ * 0.5)
  } yield {
    val (x1, y1) = (x0 + w, y0 + h)
    val overlap = s"(bx0 <= $x1 AND bx1 >= $x0 AND by0 <= $y1 AND by1 >= $y0)"
    val strict = s"(bx0 < $x1 AND bx1 > $x0 AND by0 < $y1 AND by1 > $y0)"
    val propWithin = s"(bx0 >= $x0 AND bx1 <= $x1 AND by0 >= $y0 AND by1 <= $y1)"
    val propContains = s"(bx0 <= $x0 AND bx1 >= $x1 AND by0 <= $y0 AND by1 >= $y1)"
    val sql = op match {
      case "s_intersects" => overlap
      case "s_disjoint"   => s"(NOT $overlap)"
      case "s_within"     => propWithin
      case "s_contains"   => propContains
      case "s_equals"     => s"($propWithin AND $propContains)"
      case "s_touches"    => s"($overlap AND NOT $strict)"
      case "s_crosses"    => "FALSE" // two areas can never cross
      case "s_overlaps"   => s"($strict AND NOT $propWithin AND NOT $propContains)"
    }
    (s"""{"op":"$op","args":[{"property":"bbox"},{"bbox":[$x0,$y0,$x1,$y1]}]}""", sql)
  }

  // ------------------------- arithmetic class (OGC 21-065 arithmetic)
  // Arithmetic terms inside comparisons: (prop ∘ k) cmp lit and the
  // nested ((prop ∘ k1) ∘ k2) cmp lit. Divisors/moduli are nonzero by
  // construction (both engines' div-by-zero behaviors differ and the
  // spec leaves it undefined); long terms stay far from overflow; double
  // terms live on a 0.25 grid, and + - * / are single IEEE ops — both
  // engines produce bit-identical doubles, so even `=` comparisons are
  // engine-stable. `div`/`^`/unary minus are pinned in Cql2Spec instead
  // (DuckDB's // and pow have engine-specific corners).
  private val genArith: Gen[P] = for {
    useV <- Gen.oneOf(true, false)
    (cop, sop) <- Gen.oneOf(cmpOps)
    aop <- if (useV) Gen.oneOf("+", "-", "*", "%") else Gen.oneOf("+", "-", "*", "/")
    k0 <- Gen.choose(1, 5)
    sign <- Gen.oneOf(1, -1)
    nest <- Gen.oneOf(true, false, false)
    aop2 <- Gen.oneOf("+", "-", "*")
    k2 <- Gen.choose(-4, 4)
    lit2 <- if (useV) genLong.map(_.toString) else genDouble.map(_.toString)
  } yield {
    val prop = if (useV) "v" else "w"
    val k = k0 * sign
    val inner = (s"""{"op":"$aop","args":[{"property":"$prop"},$k]}""",
      s"($prop $aop $k)")
    val term =
      if (!nest) inner
      else (s"""{"op":"$aop2","args":[${inner._1},$k2]}""", s"(${inner._2} $aop2 $k2)")
    (s"""{"op":"$cop","args":[${term._1},$lit2]}""", s"(${term._2} $sop $lit2)")
  }

  // ------------------------- functions class (OGC 21-065 functions)
  // The {"function":{"name":…,"args":[…]}} call form over the standard
  // registry, cross-checked against DuckDB's equivalents (min/max are
  // SQL least/greatest in both engines; upper/abs are 1:1). Args avoid
  // engine-divergent corners (no division, integral grids) so any
  // mismatch is translator drift, not numeric noise.
  private val genFunc: Gen[P] = {
    def fn(name: String, args: String*) =
      s"""{"function":{"name":"$name","args":[${args.mkString(",")}]}}"""
    Gen.oneOf(
      genStr.map(l =>
        (s"""{"op":"=","args":[${fn("upper", """{"property":"s"}""")},${js(l.toUpperCase)}]}""",
          s"(upper(s) = ${qs(l.toUpperCase)})")),
      for { k <- genLong; (cop, sop) <- Gen.oneOf(cmpOps) } yield
        (s"""{"op":"$cop","args":[${fn("min", """{"property":"v"}""", k.toString)},0]}""",
          s"(least(v, $k) $sop 0)"),
      for { k <- genLong; (cop, sop) <- Gen.oneOf(cmpOps) } yield
        (s"""{"op":"$cop","args":[${fn("max", """{"property":"v"}""", k.toString)},0]}""",
          s"(greatest(v, $k) $sop 0)"),
      Gen.choose(0L, 5L).map(k =>
        (s"""{"op":"<=","args":[${fn("abs", """{"property":"v"}""")},$k]}""",
          s"(abs(v) <= $k)")),
      // nested: a function of an arithmetic term
      for { k <- Gen.choose(1, 4); m <- Gen.choose(0L, 6L) } yield
        (s"""{"op":">","args":[${fn("abs",
          s"""{"op":"-","args":[{"property":"v"},$k]}""")},$m]}""",
          s"(abs(v - $k) > $m)"))
  }

  // property-property comparisons (the OGC property-property class):
  // both operands are column references — numeric cross-type (v long
  // vs w double, both engines promote) and string-on-string via casei
  private val genPropProp: Gen[P] = Gen.oneOf(
    Gen.oneOf(cmpOps).map { case (cop, sop) =>
      (s"""{"op":"$cop","args":[{"property":"v"},{"property":"w"}]}""",
        s"(v $sop w)")
    },
    Gen.oneOf(cmpOps.take(2)).map { case (cop, sop) =>
      (s"""{"op":"$cop","args":[{"op":"casei","args":[{"property":"s"}]},{"op":"casei","args":[{"property":"s"}]}]}""",
        s"(lower(s) $sop lower(s))") // self-compare: null stays null
    },
    Gen.oneOf(cmpOps).map { case (cop, sop) =>
      (s"""{"op":"$cop","args":[{"op":"+","args":[{"property":"v"},{"property":"v"}]},{"property":"w"}]}""",
        s"((v + v) $sop w)")
    })

  private val genLeaf: Gen[P] = Gen.frequency(
    4 -> genNumCmp, 3 -> genStrCmp, 2 -> genBetween, 2 -> genIn,
    2 -> genLike, 1 -> genIsNull, 2 -> genTemporal, 2 -> genArrayOp,
    2 -> genSpatial, 2 -> genArith, 2 -> genFunc, 1 -> genPropProp)

  private def genPred(depth: Int): Gen[P] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      2 -> (for { a <- genPred(depth - 1); b <- genPred(depth - 1) }
        yield (s"""{"op":"and","args":[${a._1},${b._1}]}""", s"(${a._2} AND ${b._2})")),
      2 -> (for { a <- genPred(depth - 1); b <- genPred(depth - 1) }
        yield (s"""{"op":"or","args":[${a._1},${b._1}]}""", s"(${a._2} OR ${b._2})")),
      1 -> genPred(depth - 1).map(a =>
        (s"""{"op":"not","args":[${a._1}]}""", s"(NOT ${a._2})")))

  test("1200 random CQL2 ASTs: Catalyst translation == independent DuckDB SQL, null-exact") {
    assume(driverPresent, "SKIPPED: no DuckDB JDBC driver jar in the artifact cache")
    // deterministic sample at a pinned seed — reproducible failures
    val preds: Seq[P] = Gen.listOfN(1200, genPred(2))
      .apply(Gen.Parameters.default, rng.Seed(42L))
      .getOrElse(fail("generator returned no sample"))

    val conn = java.sql.DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      st.execute("""CREATE TABLE t (id VARCHAR, v BIGINT, w DOUBLE, s VARCHAR,
        tags VARCHAR[], dt TIMESTAMP, dt0 TIMESTAMP, dt1 TIMESTAMP,
        bx0 DOUBLE, by0 DOUBLE, bx1 DOUBLE, by1 DOUBLE)""")
      val values = rows.map { r =>
        val tags = s"[${r.tags.map(qs).mkString(",")}]"
        Seq(qs(r.id), r.v.map(_.toString).getOrElse("NULL"),
          r.w.map(_.toString).getOrElse("NULL"),
          r.s.map(qs).getOrElse("NULL"), tags,
          r.dt.map(d => s"TIMESTAMP '$d'").getOrElse("NULL"),
          r.dt0.map(d => s"TIMESTAMP '$d'").getOrElse("NULL"),
          r.dt1.map(d => s"TIMESTAMP '$d'").getOrElse("NULL"),
          r.bx0.toString, r.by0.toString, r.bx1.toString, r.by1.toString)
          .mkString("(", ",", ")")
      }
      st.execute(s"INSERT INTO t VALUES ${values.mkString(",")}")

      var mismatches = List.empty[String]
      preds.grouped(100).zipWithIndex.foreach { case (batch, bi) =>
        // Spark: one job evaluating 100 predicates as boolean columns
        val sparkCols = col("id") +: batch.zipWithIndex.map { case ((cql, _), i) =>
          Cql2.filter(cql).as(s"p$i")
        }
        val sparkRes = df.select(sparkCols: _*).collect().map { r =>
          r.getString(0) -> batch.indices.map(i =>
            if (r.isNullAt(i + 1)) None else Some(r.getBoolean(i + 1)))
        }.toMap
        // DuckDB: one query evaluating the same 100 renderings
        val sqlCols = batch.zipWithIndex
          .map { case ((_, sql), i) => s"$sql AS p$i" }.mkString(", ")
        val rs = st.executeQuery(s"SELECT id, $sqlCols FROM t")
        while (rs.next()) {
          val id = rs.getString(1)
          val duck = batch.indices.map { i =>
            val b = rs.getObject(i + 2)
            if (b == null) None else Some(b.asInstanceOf[Boolean])
          }
          val sp = sparkRes(id)
          batch.indices.foreach { i =>
            if (sp(i) != duck(i) && mismatches.length < 5)
              mismatches ::= s"case ${bi * 100 + i} row $id: spark=${sp(i)} duckdb=${duck(i)}\n  cql: ${batch(i)._1}\n  sql: ${batch(i)._2}"
          }
        }
        rs.close()
      }
      assert(mismatches.isEmpty, mismatches.mkString("\n"))
    } finally conn.close()
  }
}
