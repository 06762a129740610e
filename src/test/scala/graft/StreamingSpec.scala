package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize
import graft.streaming.EventStreams

/** Structured Streaming operators driven by the deterministic events table
  * through a memory sink; results must equal their batch mirrors (the
  * equivalence the reference can't even state — it has no streaming).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming hourly counts == batch hourly counts (complete mode)") {
    // file-stream source needs a directory: stage the single events file
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(TestSpark.sf0001, "events.parquet"),
      dir.resolve("events-000.parquet"))
    val stream = EventStreams.readEventsStream(spark, dir.toString, TestSpark.sf0001)
    val q = EventStreams.hourlyCounts(stream)
      .writeStream.outputMode("complete").format("memory").queryName("hourly").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hourly")
        .select(col("event_type"), col("hour_ms"), col("cnt"))
        .as[(String, Long, Long)].collect().toSet
      val want = Tables.load(spark, TestSpark.sf0001, "events")
        .groupBy(col("event_type"), unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"))
        .agg(count(lit(1)).as("cnt"))
        .as[(String, Long, Long)].collect().toSet
      assert(got == want)
    } finally q.stop()
  }

  test("streaming exact dedup: dropDuplicates over the stream == batch distinct") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-dedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(TestSpark.sf0001, "events.parquet"),
      dir.resolve("events-000.parquet"))
    val stream = EventStreams.readEventsStream(spark, dir.toString, TestSpark.sf0001)
    val q = stream.select("user_id", "event_type").dropDuplicates("user_id", "event_type")
      .writeStream.outputMode("append").format("memory").queryName("dedup_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_stream").as[(Long, String)].collect().toSet
      val want = Tables.load(spark, TestSpark.sf0001, "events")
        .select("user_id", "event_type").distinct().as[(Long, String)].collect().toSet
      assert(got == want)
    } finally q.stop()
  }

  test("stateful streaming sessionization == batch sessionize (closed sessions)") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"))
      .as[EventStreams.Ev]
    // run the same stateful logic in batch context via groupByKey to prove
    // the session semantics, then against the window-based batch mirror
    val stateful = EventStreams.sessionize(ev, 1800000L)
    // flatMapGroupsWithState in batch mode emits only closed sessions;
    // the open (last) session per user stays in state. Compare on the
    // closed prefix.
    val got = stateful.collect()
      .map(s => (s.user_id, s.session_no, s.n_events, s.start_ms, s.end_ms)).toSet
    val batch = Sessionize.sessions(
      Tables.load(spark, TestSpark.sf0001, "events"), 1800000L)
      .as[(Long, Long, Long, Long, Long)].collect()
    val lastPerUser = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val closed = batch.filterNot(s => s._2 == lastPerUser(s._1)).toSet
    assert(got == closed)
    assert(got.nonEmpty)
  }
}
