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
    val pay = "__asof_payload"
    // carry the right payload as ONE struct so the matched right row is
    // attached wholesale — per-column carries could stitch fields from
    // different right rows when payload columns contain nulls
    val payType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))
    val lTagged = left
      .withColumn(t, col(leftTime)).withColumn(side, lit(1))
      .select(Seq(col(key), col(t), col(side)) ++
        leftCols.filterNot(_ == key).map(c => col(c)) :+
        lit(null).cast(payType).as(pay): _*)
    // null-timed right rows can never satisfy rightTime <= leftTime, and
    // under nulls-first ordering their payload would leak into every match
    val rTagged = right.filter(col(rightTime).isNotNull)
      .withColumn(t, col(rightTime)).withColumn(side, lit(0))
      .select(Seq(col(key), col(t), col(side)) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as(pay): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(t), col(side), col(pay).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
    carried.filter(col(side) === 1)
      .select(Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        rightCols.map(c => col(s"$pay.$c").as(s"asof_$c")): _*)
  }
}
