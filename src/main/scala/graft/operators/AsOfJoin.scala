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
    * right-right ts ties resolve to the larger (ts, payload) struct —
    * enforced by the window ordering, so the result is value-determined
    * for orderable payload types (all atomic types are); unorderable
    * payloads (e.g. map) keep layout-dependent ties instead of failing.
    */
  def joinAsOf(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String,
      payloadCol: String): DataFrame =
    joinAsOf(left, right, keyCol, leftTsCol, rightTsCol, payloadCol,
      Backward, toleranceMs = None)

  sealed trait Direction
  /** Latest right row with rightTs <= leftTs. */
  case object Backward extends Direction
  /** Earliest right row with rightTs >= leftTs. */
  case object Forward extends Direction

  /** Full form: `direction` picks backward (most recent prior fact) or
    * forward (next upcoming fact); `toleranceMs` bounds |rightTs-leftTs|
    * (timestamp columns only) — a match farther away reports
    * asof_matched=false with a null payload, pandas merge_asof-style.
    */
  def joinAsOf(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String,
      payloadCol: String, direction: Direction,
      toleranceMs: Option[Long]): DataFrame = {
    val leftCols = left.columns
    val reserved = Seq("__ts", "__side", "__carry", "__last",
      s"asof_$payloadCol", "asof_matched")
    val collisions = leftCols.filter(reserved.contains)
    require(collisions.isEmpty,
      s"joinAsOf would overwrite left column(s) ${collisions.mkString(", ")} — " +
        "rename them first (chained as-of joins: alias the previous asof_* outputs)")
    // tolerance units are resolved per side from each column's OWN type
    // (ms for timestamps, native units for numerics) — the two sides must
    // agree in kind, otherwise "tol" would silently compare milliseconds
    // against raw numeric ticks. Checked up front, before plan analysis.
    val lIsTs = left.schema(leftTsCol).dataType ==
      org.apache.spark.sql.types.TimestampType
    val rIsTs = right.schema(rightTsCol).dataType ==
      org.apache.spark.sql.types.TimestampType
    if (toleranceMs.isDefined) require(lIsTs == rIsTs,
      s"joinAsOf tolerance needs ts columns of the same kind on both sides: " +
        s"left $leftTsCol is ${left.schema(leftTsCol).dataType}, " +
        s"right $rightTsCol is ${right.schema(rightTsCol).dataType}")
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
    // the whole nearest right ROW (struct never null for right rows), so
    // a null payload on that row is returned as null, not skipped.
    // __carry last in the ordering makes the documented right-right
    // tie-break real: among right rows with equal (key, ts), last() sees
    // the largest (ts, payload) struct — value-determined, not
    // partition-layout-determined. (Left rows all have null __carry and
    // a distinct __side, so the extra key never reorders left vs right.)
    // Unorderable payload types (map, ...) can't join the ordering: for
    // them ties stay layout-dependent rather than failing analysis.
    // Forward mode is the time-mirrored window (desc order, same frame).
    val payloadOrderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(right.schema(payloadCol).dataType)
    val tieBreak = if (payloadOrderable) Seq(col("__carry").asc) else Seq.empty
    val ord = direction match {
      case Backward => Seq(col("__ts").asc, col("__side").asc) ++ tieBreak
      case Forward => Seq(col("__ts").desc, col("__side").asc) ++ tieBreak
    }
    val w = Window.partitionBy(col(keyCol))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(rAligned)
      .withColumn("__last", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inTolerance = toleranceMs match {
      case None => col("__last").isNotNull
      case Some(tol) =>
        def asMs(isTs: Boolean)(c: org.apache.spark.sql.Column) =
          if (isTs) unix_millis(c) else c.cast("long")
        col("__last").isNotNull &&
          abs(asMs(rIsTs)(col("__last.ts")) - asMs(lIsTs)(col("__ts"))) <= tol
    }
    carried
      .withColumn(s"asof_$payloadCol", when(inTolerance, col("__last.p")))
      .withColumn("asof_matched", inTolerance)
      .drop("__ts", "__side", "__carry", "__last")
  }
}
