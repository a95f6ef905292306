package graft

import graft.stac.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The driver's exact smoke contract: entry() returns rows, every query
  * name has a runnable function, and every oracle key is a registered
  * query with matching column aliases present in the SQL. */
class EntrySpec extends AnyFunSuite {

  test("entry() produces rows on sf0.001 (driver smoke check)") {
    assert(SparkEntry.entry(SparkSpec.spark).count() > 0)
  }

  test("oracle keys are a subset of query names and specs are uniquely named") {
    val names = SparkEntry.specs.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every oracle is syntactically complete (balanced quotes, non-empty, single statement)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.nonEmpty && !sql.contains(";"), s"$name oracle must be a single statement")
      assert(sql.count(_ == '\'') % 2 == 0, s"$name has unbalanced quotes")
    }
  }

  test("footer row counts equal scan counts (the catalog-stat shortcut is exact)") {
    val dir = "/root/testdata/sf0.001"
    Seq("lineitem", "documents", "region").foreach { t =>
      assert(Tables.footerRowCount(dir, t) ==
        Tables.t(SparkSpec.spark, dir, t).count(), t)
    }
  }
}
