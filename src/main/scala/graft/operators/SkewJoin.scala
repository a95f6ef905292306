package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: each large-side row gets a salt in
  * [0, salts) from `monotonically_increasing_id` — uniform spread even
  * when a hot key's rows are byte-identical (a whole-row hash would
  * collapse duplicates onto one reducer, silently defeating the salt).
  * The small side is replicated once per salt value and the join runs on
  * (key, salt). The salt only routes rows, so the OUTPUT is row-identical
  * to the plain equi-join regardless of salt assignment; the hot key's
  * work is split `salts` ways instead of landing on one reducer.
  *
  * AQE's skew-join split covers sort-merge joins automatically; explicit
  * salting remains the tool when the skewed side feeds an aggregation or
  * window keyed on the same hot key (AQE cannot split those), or when AQE
  * is unavailable. The salt column is dropped from the output.
  */
object SkewJoin {

  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
                     salts: Int = 8): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(!large.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    val salted = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
