package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual complement to AQE's runtime
  * skew splitting, for when a handful of keys dominate a fact-fact join
  * (the classic 100 TB failure mode: one hot key pins one reducer for
  * hours).
  *
  * The fact side gets a per-ROW salt in [0, buckets) derived from the
  * physical row position (`monotonically_increasing_id`), NOT from the
  * row's values: the classic hot key is millions of IDENTICAL rows (a
  * sentinel/default record), and a value-derived salt would hand them
  * all one salt and re-create the hot reducer. The salt assignment
  * varies with partition layout, but the join OUTPUT is identical to the
  * unsalted join for any assignment, which the test suite asserts. The
  * dim side is exploded `buckets` times; the join key becomes
  * (key, salt), spreading each hot key over `buckets` reducers.
  */
object SkewJoin {

  /** Inner-join `fact` with `dim` on `key`, spreading each key over
    * `buckets` shuffle partitions. `dim` is replicated `buckets`× — keep
    * it the smaller side (if it were broadcastable you would not salt).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name")
    val salted = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)).cast("int"))
    val exploded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
