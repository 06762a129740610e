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
    * Output: left columns + `asof_<payloadCol>` + `asof_matched` (false
    * when no prior right row exists — distinguishable from a matched row
    * whose payload is null, because the carry-forward is a non-null
    * struct per right ROW, not per payload value). Ties on (key, ts)
    * between a left and right row count the right row as visible;
    * right-right ts ties resolve to the larger (ts, payload) struct
    * (make (key, ts) unique upstream for full determinism).
    */
  def joinAsOf(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String,
      payloadCol: String): DataFrame = {
    val leftCols = left.columns
    val carryType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts", right.schema(rightTsCol).dataType),
      org.apache.spark.sql.types.StructField("p", right.schema(payloadCol).dataType)))
    val l = left
      .withColumn("__ts", col(leftTsCol))
      .withColumn("__side", lit(1))
      .withColumn("__carry", lit(null).cast(carryType))
    val r = right.select(
      col(keyCol),
      col(rightTsCol).as("__ts"),
      lit(0).as("__side"),
      struct(col(rightTsCol).as("ts"), col(payloadCol).as("p")).as("__carry"))
    // align schemas: right side gets nulls for the left-only columns
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)

    // Right rows sort before left rows at equal ts (__side 0 < 1), so a
    // same-timestamp right row is visible to the left row. The carry is
    // the whole latest right ROW (struct never null for right rows), so a
    // null payload on the latest row is returned as null, not skipped.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rAligned)
      .withColumn("__last", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn(s"asof_$payloadCol", col("__last.p"))
      .withColumn("asof_matched", col("__last").isNotNull)
      .drop("__ts", "__side", "__carry", "__last")
  }
}
