package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GenStore
import graft.streaming.EventStreams

/** FEDERATION for the CDC snapshot store ([[EventStreams
  * .mergeCdcStores]]): version counters are per-pipeline clocks, so
  * what federates is the STATE — the merge byte-copies the sources'
  * current snapshots as the merged v0 (a cut) and the merged clock
  * starts fresh. Per-key seq guards carry over soundly because key
  * spaces are disjoint (verified here); overlap is refused before any
  * pointer publishes; quiesced sources refuse further publishes.
  */
class CdcFederationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cust = Tables.load(spark, TestSpark.sf0001, "customer")
    .select(col("c_custkey").as("key"), col("c_acctbal").as("bal"))

  // one-job signed-count equality (Checks.multisetEq) instead of the
  // two-job exceptAll pair: same decision, half the jobs per gate
  private def setEq(a: DataFrame, b: DataFrame): Boolean =
    graft.operators.Checks.multisetEq(a, b)

  test("merged v0 is the cut; the merged clock publishes and per-key seq guards carry over") {
    val base = Files.createTempDirectory("graft-cdcfed").toString
    val (sa, sb, m) = (s"$base/a", s"$base/b", s"$base/m")
    // two pipelines, disjoint halves, each with its own version history
    Seq((sa, 0L), (sb, 1L)).foreach { case (dir, half) =>
      val mine = cust.filter(pmod(col("key"), lit(2)) === half)
      EventStreams.initCdcState(mine.withColumn("seq", lit(0L)), dir)
      EventStreams.publishCdcBatch(spark, dir,
        mine.filter(col("key") % 8 === half)
          .select(col("key"), (col("bal") + 10.0).as("bal"),
            lit(1L).as("seq"), lit("U").as("op")),
        Seq("key"), "seq", "op")
    }
    val cut = EventStreams.currentCdcSnapshot(spark, sa)
      .unionByName(EventStreams.currentCdcSnapshot(spark, sb))
      .localCheckpoint()
    GenStore.quiesce(sa, m)
    GenStore.quiesce(sb, m)
    assert(EventStreams.mergeCdcStores(spark, Seq(sa, sb), m,
      verifyKeyCols = Seq("key")) == 0L)
    assert(setEq(EventStreams.currentCdcSnapshot(spark, m), cut))
    // quiesced source refuses further publishes, naming the successor
    val e = intercept[IllegalStateException] {
      EventStreams.publishCdcBatch(spark, sa,
        cust.limit(1).select(col("key"), col("bal"), lit(9L).as("seq"),
          lit("U").as("op")),
        Seq("key"), "seq", "op")
    }
    assert(e.getMessage.contains(m))
    // the merged clock continues; a STALE pre-merge change replayed
    // into the merged store is dropped by the carried per-key guard
    EventStreams.publishCdcBatch(spark, m,
      cust.filter(col("key") % 8 === 0)
        .select(col("key"), (col("bal") + 999.0).as("bal"),
          lit(1L).as("seq"), lit("U").as("op")),
      Seq("key"), "seq", "op")
    assert(setEq(EventStreams.cdcSnapshotAt(spark, m, 1L), cut),
      "a stale replay must be state-preserving on the merged store")
    // as-of v0 still serves the cut
    assert(setEq(EventStreams.cdcSnapshotAt(spark, m, 0L), cut))
  }

  test("overlapping key spaces are refused before any pointer publishes") {
    val base = Files.createTempDirectory("graft-cdcfed-ovl").toString
    val (sa, sc, bad) = (s"$base/a", s"$base/c", s"$base/bad")
    EventStreams.initCdcState(
      cust.filter(col("key") % 2 === 0).withColumn("seq", lit(0L)), sa)
    EventStreams.initCdcState(
      cust.filter(col("key") % 4 === 0).withColumn("seq", lit(0L)), sc)
    val e = intercept[IllegalArgumentException] {
      EventStreams.mergeCdcStores(spark, Seq(sa, sc), bad,
        verifyKeyCols = Seq("key"))
    }
    assert(e.getMessage.contains("disjoint"))
    assert(!Files.exists(java.nio.file.Paths.get(bad, "_CURRENT")),
      "a refused merge must leave no readable store")
    // a fresh-target merge of genuinely disjoint stores still works
    val sd = s"$base/d"
    EventStreams.initCdcState(
      cust.filter(col("key") % 2 === 1).withColumn("seq", lit(0L)), sd)
    assert(EventStreams.mergeCdcStores(spark, Seq(sa, sd), s"$base/ok",
      verifyKeyCols = Seq("key")) == 0L)
  }
}
