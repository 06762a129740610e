package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — an operator the reference lacks and Spark has no
  * built-in for (SURVEY.md §2: joins absent in the reference).
  *
  * Implemented by composition (preference order (a) of the build rules):
  * tag and union both sides, one window sort per key carrying the last
  * right-side row forward, filter back to left rows. Cost is ONE shuffle
  * of left+right on the key plus a per-key sort — the same complexity as
  * a sort-merge join, with no range explosion and no point-in-interval
  * cross product, so it scales to fact-sized tables on both sides.
  * Skewed keys are split by AQE; a hot key can additionally be salted by
  * time-bucketing the right side.
  */
object AsOfJoin {

  /** For each left row, attach `payloadCol` of the latest right row with
    * the same `keyCol` and rightTs <= leftTs (strictly backward-looking
    * "most recent fact as of event time").
    *
    * Output: left columns + `asof_<payloadCol>` (null when no prior right
    * row exists). Ties on (key, ts) between a left and right row count the
    * right row as visible; right-right ts ties resolve to the larger
    * payload (make (key, ts) unique upstream for full determinism).
    */
  def joinAsOf(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String,
      payloadCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__ts", col(leftTsCol))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(right.schema(payloadCol).dataType))
    val r = right.select(
      col(keyCol),
      col(rightTsCol).as("__ts"),
      lit(0).as("__side"),
      col(payloadCol).as("__payload"))
    // align schemas: right side gets nulls for the left-only columns
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)

    // Right rows sort before left rows at equal ts (__side 0 < 1), so a
    // same-timestamp right row is visible to the left row.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rAligned)
      .withColumn(s"asof_$payloadCol", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__payload")
  }
}
