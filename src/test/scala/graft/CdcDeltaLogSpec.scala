package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** The DELTA-LOG CDC layout (round 15): publish appends the change
  * batch as a delta version (O(batch) write, flat in state size); the
  * checkpoint policy ([[EventStreams.cdcNeedsCheckpoint]]) periodically
  * folds the chain into a full snapshot; reads resolve nearest
  * checkpoint + ordered replay and are BIT-IDENTICAL to the eager
  * (checkpoint-every-publish) twin; vacuum PROMOTES a delta boundary to
  * a sealed twin before dropping its chain.
  */
class CdcDeltaLogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cust = Tables.load(spark, TestSpark.sf0001, "customer")
    .select(col("c_custkey").as("key"), col("c_acctbal").as("bal"))

  // one-job signed-count equality (Checks.multisetEq) instead of the
  // two-job exceptAll pair: same decision, half the jobs per gate
  private def setEq(a: DataFrame, b: DataFrame): Boolean =
    graft.operators.Checks.multisetEq(a, b)

  private def batch(mod: Long, rem: Long, bump: Double, seq: Long,
      op: String): DataFrame =
    cust.filter(pmod(col("key"), lit(mod)) === rem)
      .select(col("key"), (col("bal") + bump).as("bal"),
        lit(seq).as("seq"), lit(op).as("op"))

  test("delta publishes replay to the eager twin bit-identically; the policy folds the chain") {
    val base = Files.createTempDirectory("graft-deltalog").toString
    val (lazyd, eager) = (s"$base/lazy", s"$base/eager")
    val v0 = cust.filter(col("key") % 3 === 0).withColumn("seq", lit(0L))
    EventStreams.initCdcState(v0, lazyd)
    EventStreams.initCdcState(v0, eager)
    val feeds = Seq(
      batch(6, 0, 10.0, 1L, "U"),
      batch(3, 1, 0.0, 1L, "I"),
      batch(6, 3, 0.0, 2L, "D"),
      batch(6, 0, 50.0, 3L, "U"))
    feeds.zipWithIndex.foreach { case (b, i) =>
      // lazy store: chain up to 3 deltas, then the policy checkpoints
      EventStreams.publishCdcBatch(spark, lazyd, b, Seq("key"), "seq", "op",
        maxDeltas = 3, maxDeltaFraction = 1e9)
      // eager twin: checkpoint every publish (the pre-r15 behavior)
      EventStreams.publishCdcBatch(spark, eager, b, Seq("key"), "seq", "op",
        maxDeltas = 0)
      val v = (i + 1).toLong
      assert(setEq(EventStreams.cdcSnapshotAt(spark, lazyd, v),
        EventStreams.cdcSnapshotAt(spark, eager, v)),
        s"delta-log state at v$v must equal the eager twin's")
    }
    // layout: v1..v3 are deltas; v4 hit the maxDeltas=3 policy -> checkpoint
    assert((1L to 3L).forall(EventStreams.isCdcDelta(lazyd, _)))
    assert(!EventStreams.isCdcDelta(lazyd, 4L))
    assert(EventStreams.cdcDeltasSinceCheckpoint(lazyd, 3L) == 3)
    assert(EventStreams.cdcDeltasSinceCheckpoint(lazyd, 4L) == 0)
    // every eager version is a checkpoint
    assert((1L to 4L).forall(!EventStreams.isCdcDelta(eager, _)))
    // diff across the delta chain equals the eager twin's diff
    assert(setEq(EventStreams.cdcDiff(spark, lazyd, 0L, 4L, Seq("key")),
      EventStreams.cdcDiff(spark, eager, 0L, 4L, Seq("key"))))
  }

  test("the size policy leg fires on pending delta rows, not chain length") {
    val base = Files.createTempDirectory("graft-deltapolicy").toString
    val dir = s"$base/cdc"
    EventStreams.initCdcState(
      cust.filter(col("key") % 2 === 0).withColumn("seq", lit(0L)), dir)
    // first publish after a checkpoint is always a delta (no pending
    // chain yet) — even a state-sized one
    EventStreams.publishCdcBatch(spark, dir, batch(2, 0, 1.0, 1L, "U"),
      Seq("key"), "seq", "op", maxDeltas = 1000, maxDeltaFraction = 0.5)
    assert(EventStreams.isCdcDelta(dir, 1L))
    // now the pending delta rows ~= the checkpoint rows >= 0.5 fraction:
    // the SIZE leg folds the chain on the next publish while the
    // count leg (maxDeltas=1000) is nowhere near firing
    assert(EventStreams.cdcNeedsCheckpoint(spark, dir,
      maxDeltas = 1000, maxDeltaFraction = 0.5))
    EventStreams.publishCdcBatch(spark, dir, batch(4, 0, 2.0, 2L, "U"),
      Seq("key"), "seq", "op", maxDeltas = 1000, maxDeltaFraction = 0.5)
    assert(!EventStreams.isCdcDelta(dir, 2L),
      "the fraction leg must have forced a checkpoint")
    // with a tiny pending chain the predicate is quiet again
    assert(!EventStreams.cdcNeedsCheckpoint(spark, dir,
      maxDeltas = 1000, maxDeltaFraction = 0.5))
  }

  test("cdcApplyJoined == cdcApply on every corner: stale, ties, deletes, resurrection") {
    import graft.operators.Merge
    val snap = Seq((1L, "a", 5L), (2L, "b", 5L), (3L, "c", 5L),
      (4L, "d", 5L)).toDF("key", "v", "seq")
    val ch1 = Seq(
      (1L, "a9", 9L, "U"), // fresh update
      (2L, "b4", 4L, "U"), // stale -> dropped
      (3L, "x", 5L, "U"),  // equal seq -> dropped (strict guard)
      (4L, "", 9L, "D"),   // delete
      (5L, "e", 1L, "I"),  // insert new key
      (6L, "f1", 7L, "U"), (6L, "f2", 7L, "U"), // intra-batch tie -> tuple max
      (7L, "g", 3L, "D")   // delete of an absent key -> no-op
    ).toDF("key", "v", "seq", "op")
    // the resurrection corner (the documented cdcApply caveat): key 4
    // was deleted at seq 9, so its seq memory is gone and a LATER step's
    // stale upsert re-inserts — sequential replay must preserve this
    val ch2 = Seq((4L, "z", 2L, "U")).toDF("key", "v", "seq", "op")
    def via(step: (DataFrame, DataFrame, Seq[String], String, String) => DataFrame) =
      step(step(snap, ch1, Seq("key"), "seq", "op"),
        ch2, Seq("key"), "seq", "op")
    val a = via(Merge.cdcApply)
    val j = via(Merge.cdcApplyJoined)
    assert(a.columns.toSeq == j.columns.toSeq)
    assert(setEq(a, j), "the joined formulation must be row-identical")
    val got = j.as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "a9", 9L), (2L, "b", 5L), (3L, "c", 5L),
      (4L, "z", 2L), (5L, "e", 1L), (6L, "f2", 7L)))
  }

  test("vacuum promotes a delta boundary to a sealed twin; history below is reclaimed") {
    val base = Files.createTempDirectory("graft-deltavacuum").toString
    val dir = s"$base/cdc"
    EventStreams.initCdcState(
      cust.filter(col("key") % 3 === 0).withColumn("seq", lit(0L)), dir)
    EventStreams.publishCdcBatch(spark, dir, batch(6, 0, 10.0, 1L, "U"),
      Seq("key"), "seq", "op", maxDeltas = 10, maxDeltaFraction = 1e9)
    EventStreams.publishCdcBatch(spark, dir, batch(6, 3, 0.0, 2L, "D"),
      Seq("key"), "seq", "op", maxDeltas = 10, maxDeltaFraction = 1e9)
    assert(EventStreams.isCdcDelta(dir, 1L) && EventStreams.isCdcDelta(dir, 2L))
    val pre1 = EventStreams.cdcSnapshotAt(spark, dir, 1L).localCheckpoint()
    val pre2 = EventStreams.cdcSnapshotAt(spark, dir, 2L).localCheckpoint()
    // boundary v1 is a delta whose chain reaches the dropped v0: the
    // vacuum must promote it before dropping
    assert(EventStreams.vacuumCdc(spark, dir, keepLast = 2) == Seq(0L))
    assert(!Files.isDirectory(Paths.get(dir, "v0")))
    assert(Files.exists(Paths.get(dir, "v1c", "_SEALED")),
      "the boundary twin must be sealed")
    assert(setEq(EventStreams.cdcSnapshotAt(spark, dir, 1L), pre1),
      "the promoted boundary must serve its pre-vacuum state")
    assert(setEq(EventStreams.cdcSnapshotAt(spark, dir, 2L), pre2),
      "versions above the boundary must resolve through the twin")
    intercept[IllegalArgumentException] {
      EventStreams.cdcSnapshotAt(spark, dir, 0L)
    }
    // an UNSEALED twin (crashed promotion) is ignored by readers
    val dir2 = s"$base/cdc2"
    EventStreams.initCdcState(
      cust.limit(10).withColumn("seq", lit(0L)), dir2)
    EventStreams.publishCdcBatch(spark, dir2,
      cust.limit(3).select(col("key"), (col("bal") + 5).as("bal"),
        lit(1L).as("seq"), lit("U").as("op")),
      Seq("key"), "seq", "op", maxDeltas = 10, maxDeltaFraction = 1e9)
    val good = EventStreams.cdcSnapshotAt(spark, dir2, 1L).localCheckpoint()
    cust.limit(1).write.parquet(s"$dir2/v1c") // unsealed garbage twin
    assert(setEq(EventStreams.cdcSnapshotAt(spark, dir2, 1L), good),
      "an unsealed twin must be invisible to readers")
  }

  test("checkpointCdc: explicit fold; no-op on a checkpoint-current store; schema guard on deltas") {
    val base = Files.createTempDirectory("graft-ckpt").toString
    val dir = s"$base/cdc"
    EventStreams.initCdcState(
      cust.filter(col("key") % 2 === 0).withColumn("seq", lit(0L)), dir)
    // no-op while current is already a checkpoint
    assert(EventStreams.checkpointCdc(spark, dir) == 0L)
    EventStreams.publishCdcBatch(spark, dir, batch(4, 0, 7.0, 1L, "U"),
      Seq("key"), "seq", "op", maxDeltas = 10, maxDeltaFraction = 1e9)
    val pre = EventStreams.currentCdcSnapshot(spark, dir).localCheckpoint()
    assert(EventStreams.checkpointCdc(spark, dir) == 2L)
    assert(!EventStreams.isCdcDelta(dir, 2L))
    assert(EventStreams.cdcDeltasSinceCheckpoint(dir, 2L) == 0)
    assert(setEq(EventStreams.currentCdcSnapshot(spark, dir), pre),
      "an explicit checkpoint is state-preserving")
    // the delta schema guard: a batch missing a payload column is
    // refused at PUBLISH time, not at some far-away read
    val e = intercept[IllegalArgumentException] {
      EventStreams.publishCdcBatch(spark, dir,
        cust.limit(1).select(col("key"), lit(5L).as("seq"),
          lit("U").as("op")), // missing bal
        Seq("key"), "seq", "op", maxDeltas = 10, maxDeltaFraction = 1e9)
    }
    assert(e.getMessage.contains("payload"))
  }

  test("merge resolves delta-current sources and byte-copies checkpointed ones; retry wipes a refused attempt's leftovers") {
    val base = Files.createTempDirectory("graft-deltamerge").toString
    val (sa, sb, m) = (s"$base/a", s"$base/b", s"$base/m")
    EventStreams.initCdcState(
      cust.filter(col("key") % 2 === 0).withColumn("seq", lit(0L)), sa)
    EventStreams.initCdcState(
      cust.filter(col("key") % 2 === 1).withColumn("seq", lit(0L)), sb)
    // sa stays delta-current; sb is checkpointed pre-quiesce (the runbook)
    EventStreams.publishCdcBatch(spark, sa, batch(4, 0, 3.0, 1L, "U"),
      Seq("key"), "seq", "op", maxDeltas = 10, maxDeltaFraction = 1e9)
    EventStreams.publishCdcBatch(spark, sb, batch(4, 1, 3.0, 1L, "U"),
      Seq("key"), "seq", "op", maxDeltas = 10, maxDeltaFraction = 1e9)
    EventStreams.checkpointCdc(spark, sb)
    assert(EventStreams.isCdcDelta(sa, 1L))
    assert(!EventStreams.isCdcDelta(sb, 2L))
    val cut = EventStreams.currentCdcSnapshot(spark, sa)
      .unionByName(EventStreams.currentCdcSnapshot(spark, sb))
      .localCheckpoint()
    // a stale leftover from a "crashed previous attempt" must be wiped,
    // not silently unioned into the merged snapshot (ADVICE r14 high)
    cust.limit(7).withColumn("seq", lit(0L))
      .write.parquet(s"$m/v0") // key-overlapping garbage, no pointer
    graft.operators.GenStore.quiesce(sa, m)
    graft.operators.GenStore.quiesce(sb, m)
    assert(EventStreams.mergeCdcStores(spark, Seq(sa, sb), m,
      verifyKeyCols = Seq("key")) == 0L)
    assert(setEq(EventStreams.currentCdcSnapshot(spark, m), cut),
      "merged v0 must be exactly the cut — no stale-attempt leftovers")
  }
}
