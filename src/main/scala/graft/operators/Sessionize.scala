package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream — batch form. The streaming
  * form with the same semantics lives in graft.streaming (stateful
  * flatMapGroupsWithState); this window-function version is its batch
  * mirror and the shape the DuckDB oracle can verify.
  *
  * Scale: one shuffle on user_id + per-user sort; the classic
  * lag-gap/cumulative-sum formulation keeps everything inside
  * whole-stage-codegen'd window exec (no UDFs, no state on the driver).
  */
object Sessionize {

  /** Assign session numbers per user (gap > `gapMs` starts a new session)
    * and aggregate one row per session:
    * (user_id, session_no, n_events, start_ms, end_ms).
    */
  def sessions(events: DataFrame, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_millis(col("ts")).as("ts_ms"))
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(w))
      .withColumn("is_start",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum(col("is_start")).over(run))
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_ms")).as("start_ms"),
        max(col("ts_ms")).as("end_ms"))
      .orderBy(col("user_id"), col("session_no"))
  }
}
