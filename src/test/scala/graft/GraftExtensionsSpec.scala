package graft

import graft.stac.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the native expressions — both the
  * SparkSessionExtensions injection (fresh session) and the live-session
  * register path. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftFunctions.register exposes the expressions to spark.sql") {
    val spark = SparkSpec.spark
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                 array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d,
        |       word_shingles('a b c d', 3) AS sh,
        |       minhash_sig(word_shingles('a b c d', 3), 2) AS mh,
        |       simhash_sig('hello world') AS sim,
        |       rolling_hash_stats('abcdef', 3).n_windows AS nw,
        |       repetition_stats('a b a a c') AS rep,
        |       long_dot(array(3L, -2L), array(5L, 7L)) AS ld
        |""".stripMargin).collect()(0)
    assert(row.getDouble(0) == 1.5 * 2.0 + 2.0 * 0.5)
    assert(row.getSeq[String](1) == Seq("a b c", "b c d"))
    assert(row.getSeq[String](2).length == 2)
    assert(row.getLong(3) != 0L)
    assert(row.getInt(4) == 4)
    val rep = row.getStruct(5)
    assert((rep.getInt(0), rep.getInt(1), rep.getInt(2)) == ((5, 3, 3)))
    assert(row.getLong(6) == 3L * 5L - 2L * 7L)
  }

  test("GraftExtensions injects the same functions at session build") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // note: getOrCreate may return the shared session; the assertion holds
    // either way because the builder path and register() are the same table
    val d = spark.sql(
      "SELECT float_dot(array(CAST(3.0 AS FLOAT)), array(CAST(4.0 AS FLOAT)))").collect()(0).getDouble(0)
    assert(d == 12.0)
  }

  test("non-literal width argument fails with a clear message") {
    val spark = SparkSpec.spark
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles('a b c', 1 + 2)").collect()
    }
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("shingle width"))
  }
}
