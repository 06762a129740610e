package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, GenStore, KeySetStore}
import graft.streaming.EventStreams

/** Checkpoint-replay (at-least-once recovery) semantics of the
  * streaming curation sink, window by window — driven through the
  * [[EventStreams.curationStep]] seam so every crash interleaving is a
  * plain sequential call pattern:
  *
  *  1. a replayed micro-batch must probe only fragments admitted
  *     BEFORE it — never the keys its own crashed first attempt landed
  *     (probing those rejects every doc as its own clone and overwrites
  *     the fragment and the retained output with EMPTY sets);
  *  2. the retained corpus must be on disk before any compaction can
  *     seal the batch id (a sealed replay is a no-op, so anything not
  *     yet written by then is lost forever);
  *  3. a sealed replay changes nothing.
  */
class CurationReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs: DataFrame =
    Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("source"), col("text"))

  private def step(base: String, batch: DataFrame, batchId: Long,
      maxFragments: Int = 100): Unit =
    EventStreams.curationStep(batch, batchId, "doc_id", "text",
      s"$base/store", s"$base/retained", maxFragments,
      qualityThreshold = 0.5, n = 3, numHashes = 32, bands = 8,
      portableKeys = false)

  private def retained(base: String, batchId: Long): Set[Long] =
    spark.read.parquet(s"$base/retained/batch_id=$batchId")
      .select("doc_id").as[Long].collect().toSet

  /** Admission decisions a fresh probe of the store would make. */
  private def probe(base: String, b: DataFrame): Map[Long, Boolean] =
    Dedup.admitAgainstMinHashStoreGen(b, "doc_id", "text",
        n = 3, numHashes = 32, bands = 8, root = s"$base/store")
      .as[(Long, Long, Boolean)].collect().map(p => p._1 -> p._3).toMap

  private def fresh(): String = {
    val base = Files.createTempDirectory("graft-cur-replay").toString
    GenStore.initIfAbsent(s"$base/store")
    base
  }

  test("replay of an uncompacted micro-batch re-lands identical data, never an empty set") {
    val base = fresh()
    val b0 = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val b1 = docs.filter(pmod(col("doc_id"), lit(3)) === 1)
    step(base, b0, 0L)
    step(base, b1, 1L)
    val r1 = retained(base, 1L)
    assert(r1.nonEmpty, "fixture degenerate: batch 1 retained nothing")
    // the crash-recovery interleaving: batch 1 replays wholesale after
    // its first attempt fully landed (keys in the store, retained on
    // disk) but before the trigger committed
    step(base, b1, 1L)
    assert(retained(base, 1L) === r1,
      "replay changed the retained output (re-probed its own keys?)")
    // the fragment is intact too: the keys of every RETAINED doc still
    // reject a re-crawl (quality-rejected docs never landed keys, so
    // the probe covers the retained set, not the raw batch)
    def retainedOf(b: DataFrame, ids: Set[Long]) =
      b.filter(col("doc_id").isInCollection(ids))
    assert(probe(base, retainedOf(b1, r1)).forall(!_._2),
      "replay emptied batch 1's own fragment — a re-crawl of its docs admits")
    // and the replay didn't weaken cross-batch dedup: b0's retained
    // docs still reject
    assert(probe(base, retainedOf(b0, retained(base, 0L))).forall(!_._2))
  }

  test("replay after a crash between the key admit and the trigger commit re-derives the first attempt's decision") {
    val base = fresh()
    val twin = fresh()
    val b0 = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val b1 = docs.filter(pmod(col("doc_id"), lit(3)) === 1)
    for (t <- Seq(base, twin)) step(t, b0, 0L)
    // crashed first attempt of batch 1 on `base`: its keys landed in
    // the store, nothing else did (with retained-first ordering this
    // exact state needs the retained write to have been lost too — the
    // most adversarial recovery state either ordering can leave)
    val qual1 = b1.filter(
      graft.functions.TextFunctions.qualityScore(col("text")) >= 0.5)
    Dedup.admitMinHashBatch(qual1, "doc_id", "text", n = 3, numHashes = 32,
      bands = 8, batchId = 1L, root = s"$base/store")
    // the replay: must decide as if the crashed attempt never probed
    step(base, b1, 1L)
    step(twin, b1, 1L)
    assert(retained(base, 1L) === retained(twin, 1L),
      "crash-replay decision diverges from the uncrashed twin run")
    assert(retained(base, 1L).nonEmpty,
      "crash-replay rejected every doc as its own clone")
    assert(probe(base, b1) === probe(twin, b1))
  }

  test("a sealed replay is a no-op — and the retained output it skips already exists") {
    val base = fresh()
    val b0 = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val b1 = docs.filter(pmod(col("doc_id"), lit(3)) === 1)
    // maxFragments=2: batch 1's own step compacts and seals hwm=1 — the
    // retained-first ordering is what makes this window lossless
    step(base, b0, 0L, maxFragments = 2)
    step(base, b1, 1L, maxFragments = 2)
    val root = s"$base/store"
    assert(GenStore.compactedHwm(root, GenStore.currentGen(root)) >= 1L,
      "fixture degenerate: the in-step compaction never fired")
    val r1 = retained(base, 1L)
    assert(r1.nonEmpty,
      "retained output missing for a sealed batch — it must be written " +
        "BEFORE the keys admit so the seal can never orphan it")
    val gen = GenStore.currentGen(root)
    step(base, b1, 1L, maxFragments = 2) // sealed replay
    assert(retained(base, 1L) === r1)
    assert(GenStore.currentGen(root) === gen,
      "a sealed replay moved the store generation")
    assert(KeySetStore.fragmentCount(spark, root) === 1L,
      "a sealed replay re-admitted a fragment")
  }
}
