package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, GenStore, KeySetStore}
import graft.streaming.EventStreams

/** MULTI-SINK QUIESCE LANES (round 15): K live builders' sinks all
  * re-point into ONE merged successor, each remapping its micro-batch
  * ids into its own lane (`gen1Seal + 1 + sinkId*laneWidth + batchId`).
  * Gates: zero lost and zero duplicated admissions across the merge
  * versus a single-pipeline twin; the two lanes' post-merge fragments
  * are disjoint ids above the merged seal; replays (restart) are
  * detected per-sink, not via the global high-water mark.
  */
class MultiSinkQuiesceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = Tables.load(spark, TestSpark.sf0001, "documents")
    .select(col("doc_id"), col("text"))

  test("two quiesce-aware sinks re-point into one successor with zero lost/duplicated admissions") {
    val base = Files.createTempDirectory("graft-multisink").toString
    val (ra, rb, m, twin) = (s"$base/a", s"$base/b", s"$base/m", s"$base/twin")
    KeySetStore.init(twin)
    // four quarters: a0/b0 pre-merge (one per sink), a1/b1 post-merge
    val part = (r: Int) => docs.filter(pmod(col("doc_id"), lit(4)) === r)
    val (a0, b0, a1, b1) = (part(0), part(1), part(2), part(3))
    val (feedA, feedB) = (s"$base/feedA", s"$base/feedB")
    a0.repartition(1).write.parquet(feedA)
    b0.repartition(1).write.parquet(feedB)
    def sink(feed: String, root: String, sinkId: Int) =
      EventStreams.signatureIngestQuiesceAware(
        spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(feed),
        "doc_id", "text", root, s"$base/_cp$sinkId", n = 3,
        numHashes = 32, bands = 8, portableKeys = true,
        sinkId = sinkId, laneWidth = 64L)
    val qa = sink(feedA, ra, 0)
    val qb = sink(feedB, rb, 1)
    try {
      qa.processAllAvailable(); qb.processAllAvailable()
      // the merge tick: quiesce BOTH builders into one successor
      GenStore.quiesce(ra, m)
      GenStore.quiesce(rb, m)
      KeySetStore.mergeStores(spark, Seq(ra, rb), m)
      // both sinks keep ingesting — each re-points into its own lane
      a1.repartition(1).write.mode("append").parquet(feedA)
      b1.repartition(1).write.mode("append").parquet(feedB)
      qa.processAllAvailable(); qb.processAllAvailable()
    } finally { qa.stop(); qb.stop() }
    // the single-pipeline twin admits all four quarters
    Seq(a0, b0, a1, b1).zipWithIndex.foreach { case (p, i) =>
      Dedup.admitMinHashBatch(p, "doc_id", "text", n = 3, numHashes = 32,
        bands = 8, batchId = i.toLong, root = twin, portableKeys = true)
    }
    val mk = KeySetStore.keysCurrent(spark, m).distinct()
    val tk = KeySetStore.keysCurrent(spark, twin).distinct()
    assert(graft.operators.Checks.multisetEq(mk, tk),
      "zero lost, zero duplicated: merged key set == single-pipeline twin")
    // lane layout: the post-merge fragments sit in DISJOINT per-sink
    // lanes above the merged seal
    val seal = GenStore.compactedHwm(m, 1L)
    val ids = GenStore.listBatchIds(spark, GenStore.genDir(m, 1L))
      .filter(_ > seal)
    assert(ids.size == 2, s"expected one post-merge fragment per sink, got $ids")
    assert(ids.contains(seal + 1 + 0 * 64 + 1) && // sink 0, micro-batch 1
      ids.contains(seal + 1 + 1 * 64 + 1), // sink 1, micro-batch 1
      s"fragments $ids must land in per-sink lanes above seal $seal")
    // per-sink lane progress recorded at the successor
    assert((0 to 1).forall(k => Files.exists(
      java.nio.file.Paths.get(m, "_LANES", s"sink$k"))))
  }

  test("replay detection is per-sink: one sink's replay is skipped while the other's fresh batch admits") {
    val base = Files.createTempDirectory("graft-lanereplay").toString
    val root = s"$base/s"
    KeySetStore.init(root)
    val keys = (d: org.apache.spark.sql.DataFrame) =>
      Dedup.minHashBandKeys(d, "doc_id", "text", n = 3, numHashes = 32,
        bands = 8).select("band", "bucket")
    // simulate two lanes on one (already-merged) store directly through
    // the admission front: sink 0 admitted id 5, sink 1 lags at id 68
    KeySetStore.admitBatch(keys(docs.limit(30)), 5L, root)
    // a compaction folds everything and seals hwm=5
    KeySetStore.compactStore(spark, root, expectedGen = 1L)
    assert(GenStore.compactedHwm(root, 2L) == 5L)
    // sink 1's FRESH admission at id 68 (> hwm) is unaffected by the
    // other lane's seal; a replay of sink 0's folded id 5 is refused by
    // the clobber fence — loud, never a silent drop
    KeySetStore.admitBatch(keys(docs.limit(10)), 68L, root)
    val e = intercept[IllegalArgumentException] {
      KeySetStore.admitBatch(keys(docs.limit(10)), 5L, root)
    }
    assert(e.getMessage.contains("compacted high-water"))
  }
}
