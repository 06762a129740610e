package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.{Dedup, GenStore, InvertedIndex, KeySetStore}
import graft.streaming.EventStreams

/** The LIVE-MERGE QUIESCE contract ([[GenStore.quiesce]]): merging
  * stores whose sources have continuous admission sinks. The mark is a
  * CAS naming the successor; every admission front refuses a quiesced
  * store loudly; the merge's post-copy movement fence refuses to seal
  * if an admission landed inside the copy window (the racing
  * interleaving, driven through the `mergeFlatStoresHooked` seam); and
  * the quiesce-aware streaming sink re-points itself at the merged
  * store with zero lost and zero duplicated admissions (q196's gate,
  * exercised here at spec scale).
  */
class StoreQuiesceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = Tables.load(spark, TestSpark.sf0001, "documents")
    .select(col("doc_id"), col("text"))

  test("quiesce is CAS and every admission front refuses, naming the successor") {
    val base = Files.createTempDirectory("graft-quiesce").toString
    val (ra, succ) = (s"$base/a", s"$base/m")
    KeySetStore.init(ra)
    Dedup.admitMinHashBatch(docs.limit(50), "doc_id", "text", n = 3,
      numHashes = 32, bands = 8, batchId = 0L, root = ra)
    GenStore.quiesce(ra, succ)
    // CAS: a second quiesce is refused, not a silent re-point
    val e0 = intercept[IllegalStateException] {
      GenStore.quiesce(ra, s"$base/other")
    }
    assert(e0.getMessage.contains("already quiesced"))
    assert(GenStore.quiescedSuccessor(ra) == Some(succ))
    // admission fronts refuse, naming the successor
    val e1 = intercept[IllegalStateException] {
      Dedup.admitMinHashBatch(docs.limit(5), "doc_id", "text", n = 3,
        numHashes = 32, bands = 8, batchId = 1L, root = ra)
    }
    assert(e1.getMessage.contains(succ))
    val e2 = intercept[IllegalStateException] {
      Dedup.deleteMinHashBatch(docs.limit(5), "doc_id", "text", n = 3,
        numHashes = 32, bands = 8, batchId = 0L, root = ra)
    }
    assert(e2.getMessage.contains(succ))
    // the index store's fronts share the fence
    val ir = s"$base/i"
    InvertedIndex.initStore(ir)
    val toks = docs.limit(20).select(col("doc_id"),
      TextFunctions.tokens(col("text")).as("tk"))
    InvertedIndex.admitBatch(spark, toks, "doc_id", "tk", 7L, 0L, ir)
    GenStore.quiesce(ir, succ)
    val e3 = intercept[IllegalStateException] {
      InvertedIndex.admitBatch(spark, toks, "doc_id", "tk", 7L, 1L, ir)
    }
    assert(e3.getMessage.contains(succ))
    val e4 = intercept[IllegalStateException] {
      InvertedIndex.admitDeleteBatch(spark, docs.limit(1).select("doc_id"),
        "doc_id", 0L, ir)
    }
    assert(e4.getMessage.contains(succ))
  }

  test("an admission landing inside the merge's copy window makes the merge refuse to seal; the retry includes it") {
    val base = Files.createTempDirectory("graft-quiesce-race").toString
    val (ra, rb, m) = (s"$base/a", s"$base/b", s"$base/m")
    Seq(ra, rb).foreach(KeySetStore.init)
    Dedup.admitMinHashBatch(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", n = 3, numHashes = 32, bands = 8, batchId = 0L,
      root = ra)
    Dedup.admitMinHashBatch(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", n = 3, numHashes = 32, bands = 8, batchId = 0L,
      root = rb)
    val straggler = docs.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
    // the racing interleaving: an in-flight admission (it passed its
    // quiesce pre-check before the mark) lands AFTER the merge's
    // fragment listing — the movement fence must refuse to seal
    val e = intercept[IllegalStateException] {
      GenStore.mergeFlatStoresHooked(spark, Seq(ra, rb), m, () =>
        Dedup.admitMinHashBatch(straggler, "doc_id", "text", n = 3,
          numHashes = 32, bands = 8, batchId = 1L, root = ra))
    }
    assert(e.getMessage.contains("changed during the merge"))
    assert(GenStore.compactedHwm(m, 1L) == -1L,
      "a refused merge must not have sealed the target")
    // the retry — the source now quiet — wipes the partial target and
    // includes the straggler
    assert(KeySetStore.mergeStores(spark, Seq(ra, rb), m) == 1L)
    val probe = straggler.limit(20)
    val hit = Dedup.admitAgainstMinHashStoreGen(probe, "doc_id", "text",
        n = 3, numHashes = 32, bands = 8, root = m)
      .filter(!col("admit")).count()
    assert(hit == probe.count(),
      "the straggler's signatures must be in the merged store")
  }

  test("a quiesce-aware sink re-points mid-stream: merged store equals the all-phases twin") {
    val base = Files.createTempDirectory("graft-quiesce-sink").toString
    val (ra, rb, m, twin) =
      (s"$base/a", s"$base/b", s"$base/m", s"$base/twin")
    Seq(rb, twin).foreach(KeySetStore.init)
    val pa = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
    val pb = docs.filter(pmod(col("doc_id"), lit(4)) === 1)
    val pc = docs.filter(pmod(col("doc_id"), lit(4)) === 2)
    Dedup.admitMinHashBatch(pb, "doc_id", "text", n = 3, numHashes = 32,
      bands = 8, batchId = 0L, root = rb, portableKeys = true)
    val feed = s"$base/feed"
    pa.repartition(2).write.parquet(feed)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(feed)
    val q = EventStreams.signatureIngestQuiesceAware(stream, "doc_id",
      "text", ra, s"$base/_cp", n = 3, numHashes = 32, bands = 8,
      portableKeys = true)
    try {
      q.processAllAvailable()
      GenStore.quiesce(ra, m)
      GenStore.quiesce(rb, m)
      KeySetStore.mergeStores(spark, Seq(ra, rb), m)
      pc.repartition(2).write.mode("append").parquet(feed)
      q.processAllAvailable()
    } finally q.stop()
    Seq(pa -> 0L, pb -> 1L, pc -> 2L).foreach { case (p, b) =>
      Dedup.admitMinHashBatch(p, "doc_id", "text", n = 3, numHashes = 32,
        bands = 8, batchId = b, root = twin, portableKeys = true)
    }
    val mk = KeySetStore.keysCurrent(spark, m).distinct()
    val tk = KeySetStore.keysCurrent(spark, twin).distinct()
    assert(graft.operators.Checks.multisetEq(mk, tk),
      "zero lost, zero duplicated: the merged store's key set must " +
        "equal the single-pipeline twin's")
    // the re-pointed fragments live ABOVE the merged seal: replaying a
    // pre-merge batch id is still refused
    val e = intercept[IllegalArgumentException] {
      KeySetStore.admitBatch(
        KeySetStore.keysCurrent(spark, twin).limit(1), 0L, m)
    }
    assert(e.getMessage.contains("seal"))
  }
}
