package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row with
  * `rightTime <= leftTime` within the same key — the time-series join Spark
  * has no built-in operator for (DuckDB: ASOF JOIN).
  *
  * Shape: tag both sides, union, one shuffle by key, per-key sort by
  * (time, side, tiebreak), carry the right payload forward with
  * `last(..., ignoreNulls)` over rows-unbounded-preceding, keep left rows.
  * One exchange total, no range-predicate join explosion, skew bounded by
  * the hottest key — the same plan a dedicated as-of physical operator
  * would produce. Right rows sort before left rows at equal times
  * (inclusive `<=` semantics).
  *
  * @param left       left (probe) rows
  * @param right      right (reference) rows
  * @param key        equi-join key column name (present on both sides)
  * @param leftTime   event-time column on `left` (orderable; name may differ)
  * @param rightTime  event-time column on `right`
  * @param rightCols  right columns to carry (become `asof_<name>`, null when
  *                   no right row precedes the left row)
  *
  * Ties among right rows at the same (key, time) resolve deterministically
  * to the greatest carried payload (ordered as a struct).
  */
object AsofJoin {

  def apply(left: DataFrame, right: DataFrame, key: String,
            leftTime: String, rightTime: String,
            rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val t = "__asof_t"
    val side = "__asof_side" // 0 = right, 1 = left → right wins ties (<=)
    val lTagged = left
      .withColumn(t, col(leftTime)).withColumn(side, lit(1))
      .select(Seq(col(key), col(t), col(side)) ++
        leftCols.filterNot(_ == key).map(c => col(c)) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val rTagged = right
      .withColumn(t, col(rightTime)).withColumn(side, lit(0))
      .select(Seq(col(key), col(t), col(side)) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(t), col(side),
        struct(rightCols.map(c => col(s"__r_$c")): _*).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(lTagged.unionByName(rTagged)) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col(side) === 1)
      .select(Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        rightCols.map(c => col(s"asof_$c")): _*)
  }
}
