package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: the large side gets a deterministic
  * salt in [0, salts) (hash of its whole row — rows of one hot key spread
  * across `salts` reducers), the small side is replicated once per salt
  * value, and the join runs on (key, salt). Row-identical to the plain
  * equi-join; the hot key's work is split `salts` ways instead of landing
  * on one reducer.
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
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
