package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (SURVEY §5 "port strategy"): the geo codec and the
  * schema union-merge, plus the rolling-hash identity that pins the gate
  * oracle's Horner-fold formulation to the O(1) rolling update.
  */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property under the given sample count; fail the
    * suite with the ScalaCheck report on the first falsified case. */
  private def check(min: Int)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  private val mapper = new ObjectMapper()

  // ---------------- GeoJSON ↔ WKB codec ----------------

  /** Finite doubles that survive JSON round-trip exactly: fixed-precision
    * grid coordinates like real item geometries. */
  private val coord: Gen[Double] =
    Gen.chooseNum(-18000L, 18000L).map(_ / 100.0)

  private def position(is3d: Boolean): Gen[Seq[Double]] =
    for {
      x <- coord; y <- coord; z <- coord
    } yield if (is3d) Seq(x, y, z) else Seq(x, y)

  private def ring(is3d: Boolean): Gen[Seq[Seq[Double]]] =
    for {
      n <- Gen.choose(3, 6)
      pts <- Gen.listOfN(n, position(is3d))
    } yield pts :+ pts.head // closed ring

  private def geomJson(is3d: Boolean): Gen[String] = {
    def arr(pos: Seq[Double]) = pos.mkString("[", ",", "]")
    def arr1(ps: Seq[Seq[Double]]) = ps.map(arr).mkString("[", ",", "]")
    def arr2(rs: Seq[Seq[Seq[Double]]]) = rs.map(arr1).mkString("[", ",", "]")
    Gen.oneOf(
      position(is3d).map(p => s"""{"type":"Point","coordinates":${arr(p)}}"""),
      Gen.choose(2, 5).flatMap(n => Gen.listOfN(n, position(is3d)))
        .map(ps => s"""{"type":"LineString","coordinates":${arr1(ps)}}"""),
      Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, ring(is3d)))
        .map(rs => s"""{"type":"Polygon","coordinates":${arr2(rs)}}"""),
      Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, position(is3d)))
        .map(ps => s"""{"type":"MultiPoint","coordinates":${arr1(ps)}}"""),
      Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, ring(is3d)))
        .map(rs => s"""{"type":"MultiPolygon","coordinates":${rs.map(r => arr2(Seq(r))).mkString("[", ",", "]")}}""")
    )
  }

  test("WKB codec round-trips arbitrary 2-D and 3-D geometries value-identically") {
    check(200)(Prop.forAll(Gen.oneOf(false, true).flatMap(geomJson)) { gj =>
      val back = Wkb.wkbToGeoJson(Wkb.geoJsonToWkb(gj))
      mapper.readTree(back) == mapper.readTree(gj)
    })
  }

  test("WKB bounds equal the min/max over all coordinates") {
    check(100)(Prop.forAll(geomJson(false)) { gj =>
      val wkb = Wkb.geoJsonToWkb(gj)
      val Some((xmin, ymin, xmax, ymax)) = Wkb.bounds(wkb)
      val coords = "-?\\d+\\.?\\d*(?:[eE]-?\\d+)?".r.findAllIn(
        mapper.readTree(gj).get("coordinates").toString).map(_.toDouble).toSeq
      val (xs, ys) = coords.grouped(2).map(p => (p(0), p(1))).toSeq.unzip
      xmin == xs.min && xmax == xs.max && ymin == ys.min && ymax == ys.max
    })
  }

  // ---------------- rolling hash ≡ Horner fold ----------------

  private val B = 257L
  private val M = 2147483647L

  private def hornerWindows(s: String, w: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    (0 to cps.length - w).map { i =>
      cps.slice(i, i + w).foldLeft(0L)((a, c) => (a * B + c) % M)
    }
  }

  test("RollingHashStats matches per-window Horner recomputation") {
    val texts = Gen.chooseNum(0, 120).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaLowerChar, Gen.const(' '), Gen.oneOf('é', '漢', '!')))
        .map(_.mkString))
    check(300)(Prop.forAll(texts, Gen.choose(2, 20)) { (s, w) =>
      val expr = graft.functions.RollingHashStats(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s)), w)
      val row = expr.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val expected = hornerWindows(s, w)
      row.getInt(0) == expected.length && {
        if (expected.nonEmpty)
          row.getLong(1) == expected.min && row.getLong(2) == expected.distinct.length.toLong
        else row.isNullAt(1) && row.getLong(2) == 0L
      }
    })
  }

  // ---------------- schema union-merge (A1) ----------------

  private val scalarGen: Gen[DataType] = Gen.oneOf(
    NullType, StringType, IntegerType, LongType, DoubleType, BooleanType,
    TimestampType, BinaryType)

  private def dataTypeGen(depth: Int): Gen[DataType] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      5 -> scalarGen,
      2 -> Gen.lzy(dataTypeGen(depth - 1).map(ArrayType(_, containsNull = true))),
      2 -> Gen.lzy(structGen(depth - 1)))

  private def structGen(depth: Int): Gen[StructType] =
    for {
      n <- Gen.choose(1, 4)
      names <- Gen.pick(n, Seq("a", "b", "c", "d", "e", "f"))
      types <- Gen.listOfN(n, dataTypeGen(depth))
    } yield StructType(names.toSeq.zip(types).map { case (nm, t) => StructField(nm, t) })

  private val schemas: Gen[StructType] = structGen(2)

  test("schema merge is idempotent, absorbs nulls, and unions field sets") {
    check(200)(Prop.forAll(schemas, schemas) { (a, b) =>
      val m = StacSchema.mergeStructTypes(a, b)
      // union field set (left order first); re-merging changes nothing;
      // self-merge is identity on types
      m.fieldNames.toSeq ==
        a.fieldNames.toSeq ++ b.fieldNames.toSeq.filterNot(a.fieldNames.toSet) &&
        StacSchema.mergeStructTypes(m, a) == m &&
        StacSchema.mergeStructTypes(m, b) == m &&
        StacSchema.mergeStructTypes(a, a).map(_.dataType) == a.map(_.dataType)
    })
  }

  test("merge promotes like the reference: null adopts, ints widen, mixed scalars fall back to string") {
    assert(StacSchema.mergeDataTypes(NullType, TimestampType) == TimestampType)
    assert(StacSchema.mergeDataTypes(IntegerType, LongType) == LongType)
    assert(StacSchema.mergeDataTypes(LongType, DoubleType) == DoubleType)
    assert(StacSchema.mergeDataTypes(BooleanType, LongType) == StringType)
    assert(StacSchema.mergeDataTypes(TimestampType, StringType) == StringType)
    assert(StacSchema.mergeDataTypes(
      ArrayType(IntegerType, containsNull = false), ArrayType(DoubleType, containsNull = true)) ==
      ArrayType(DoubleType, containsNull = true))
  }

  /** Canonicalize by sorting struct fields by name at every level (the
    * merge preserves left-side-first field order, so commutativity only
    * holds on the sorted form). */
  private def canon(t: DataType): DataType = t match {
    case s: StructType =>
      StructType(s.fields.sortBy(_.name).map(f => f.copy(dataType = canon(f.dataType))))
    case ArrayType(e, n) => ArrayType(canon(e), n)
    case other => other
  }

  test("merge is commutative up to field order") {
    check(200)(Prop.forAll(schemas, schemas) { (a, b) =>
      canon(StacSchema.mergeStructTypes(a, b)) == canon(StacSchema.mergeStructTypes(b, a))
    })
  }
}
