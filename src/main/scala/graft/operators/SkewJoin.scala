package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual complement to AQE's runtime
  * skew splitting, for when a handful of keys dominate a fact-fact join
  * (the classic 100 TB failure mode: one hot key pins one reducer for
  * hours).
  *
  * The fact side gets a deterministic pseudo-random salt in [0, buckets)
  * derived by hashing the whole row (no RNG state, no reshuffle needed to
  * recompute); the dim side is exploded `buckets` times. The join key
  * becomes (key, salt), spreading each hot key over `buckets` reducers.
  * Join output is identical to the unsalted join for any salt assignment,
  * which the test suite asserts.
  */
object SkewJoin {

  /** Inner-join `fact` with `dim` on `key`, spreading each key over
    * `buckets` shuffle partitions. `dim` is replicated `buckets`× — keep
    * it the smaller side (if it were broadcastable you would not salt).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(buckets.toLong)).cast("int"))
    val exploded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
