package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HeavyHitters

/** The Misra-Gries guarantees, asserted where they are provable:
  * exactness below capacity, the N/(m+1) bound above it, and bound
  * preservation under arbitrary partitioning (= arbitrary merge trees).
  */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("below capacity the summary IS the exact histogram") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
      .select(col("event_type").as("k"))
    val exact = ev.groupBy("k").count().as[(String, Long)].collect().toMap
    assert(exact.size <= 16, "fixture premise: event_type cardinality <= m")
    val got = HeavyHitters.summarize(ev, "k", m = 16)
      .as[(String, Long)].collect().toMap
    assert(got == exact)
  }

  test("guaranteed-heavy keys survive eviction with in-bound estimates, any partitioning") {
    // 2 hot keys (1000 each) drowned in 3000 singletons; N = 5000, m = 8
    // -> threshold N/(m+1) ~ 556: the hot keys are guaranteed present
    val stream = ((1 to 1000).map(_ => "hot_a") ++ (1 to 1000).map(_ => "hot_b")
      ++ (1 to 3000).map(i => s"tail_$i"))
    val n = stream.size.toLong
    for (parts <- Seq(1, 4, 32)) {
      val df = stream.toDF("k").repartition(parts)
      val got = HeavyHitters.summarize(df, "k", m = 8)
        .as[(String, Long)].collect().toMap
      assert(got.size <= 8, s"parts=$parts: more than m counters")
      for (hot <- Seq("hot_a", "hot_b")) {
        val est = got.getOrElse(hot, fail(s"parts=$parts: $hot evicted"))
        assert(est <= 1000L, s"parts=$parts: MG must never overcount")
        assert(1000L - est <= n / 9 + 1, s"parts=$parts: est $est out of bound")
      }
    }
  }

  test("null keys are excluded, not counted") {
    val df = Seq(Some("a"), Some("a"), None, Some("b")).toDF("k")
    val got = HeavyHitters.summarize(df, "k", m = 4)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }

  test("persisted per-batch summaries merge without rescan and keep the additive bound") {
    // 3 ingest batches, each summarized independently (as a stream of
    // appendBatch-style writes would persist them), then merged: the hot
    // key spanning all batches must survive with the ADDED error bounds.
    def batch(hot: Int, tag: String): Seq[String] =
      (1 to hot).map(_ => "hot") ++ (1 to 400).map(i => s"${tag}_$i")
    val batches = Seq(batch(300, "b1"), batch(250, "b2"), batch(350, "b3"))
    val perBatch = batches.map(b =>
      HeavyHitters.summarize(b.toDF("k"), "k", m = 8))
    val merged = HeavyHitters.mergeSummaries(
      perBatch.reduce(_ unionByName _), m = 8)
      .as[(String, Long)].collect().toMap
    assert(merged.size <= 8)
    // total hot = 900; additive bound = sum(N_i/(m_i+1)) = (700+650+750)/9
    val bound = batches.map(b => b.size.toLong / 9).sum
    val est = merged.getOrElse("hot", fail("hot key lost in merge"))
    assert(est <= 900L)
    assert(900L - est <= bound + batches.size, s"est $est out of additive bound")
  }

  test("appendBatch is idempotent per batch id (micro-batch retry safe)") {
    // foreachBatch re-executes a failed micro-batch with the SAME
    // batchId; a re-run appendBatch must replace, not double-count —
    // otherwise the merged est would exceed the true count.
    val dir = java.nio.file.Files.createTempDirectory("mg_store").toString
    val b0 = (1 to 100).map(_ => "hot") ++ (1 to 50).map(i => s"t$i")
    val b1 = (1 to 80).map(_ => "hot") ++ (1 to 50).map(i => s"u$i")
    HeavyHitters.appendBatch(b0.toDF("k"), "k", m = 8, batchId = 0L, dir)
    HeavyHitters.appendBatch(b1.toDF("k"), "k", m = 8, batchId = 1L, dir)
    // retry of batch 1 with identical data
    HeavyHitters.appendBatch(b1.toDF("k"), "k", m = 8, batchId = 1L, dir)
    val store = spark.read.parquet(dir)
    assert(store.select("batch_id").distinct().count() == 2L)
    val merged = HeavyHitters.mergeSummaries(store, m = 8)
      .as[(String, Long)].collect().toMap
    val est = merged.getOrElse("hot", fail("hot key lost"))
    assert(est <= 180L, s"retry double-counted: est $est > true count 180")
  }

  test("store compaction: MG contract preserved, fragments collapse, CAS retry no-ops, sealed ids refused, race fence") {
    // The q149 lifecycle, spec-gated: compaction is lossy (an early MG
    // prune can lower estimates) but the mergeable-summaries contract —
    // guaranteed-heavy survival, est <= exact <= est + N/(m+1) — holds
    // over any merge tree, including (compacted prefix) + appended batch.
    val root = java.nio.file.Files.createTempDirectory("mg_genstore")
      .toString + "/hh"
    val m = 8
    def batch(hot: Int, tag: String): Seq[String] =
      (1 to hot).map(_ => "hot") ++ (1 to 300).map(i => s"${tag}_$i")
    val batches = Seq(batch(400, "b0"), batch(350, "b1"),
      batch(450, "b2"), batch(500, "b3"))
    HeavyHitters.initStore(root)
    (0 to 2).foreach(b =>
      HeavyHitters.admitBatch(spark, batches(b).toDF("k"), "k", m, b.toLong, root))
    assert(HeavyHitters.fragmentCount(spark, root) === 3L)
    assert(HeavyHitters.compactStore(spark, root, expectedGen = 1L, m) === 2L)
    assert(HeavyHitters.fragmentCount(spark, root) === 1L)
    // contract over the 3-batch prefix from the compacted store
    val nPrefix = batches.take(3).map(_.size.toLong).sum
    val prefixEst = HeavyHitters.hittersCurrent(spark, root, m)
      .as[(String, Long)].collect().toMap
    assert(prefixEst.size <= m)
    val pe = prefixEst.getOrElse("hot", fail("guaranteed-heavy key lost in compaction"))
    assert(pe <= 1200L && (1200L - pe) * (m + 1) <= nPrefix + (m + 1) * 3,
      s"prefix est $pe out of the additive merge-tree bound")
    // CAS: stale expectedGen no-ops, no gen=3 appears
    assert(HeavyHitters.compactStore(spark, root, expectedGen = 1L, m) === 2L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "gen=3")))
    // sealed batch ids are refused
    val sealedErr = intercept[IllegalArgumentException] {
      HeavyHitters.admitBatch(spark, batches(0).toDF("k"), "k", m, 2L, root)
    }
    assert(sealedErr.getMessage.contains("compact"))
    // admissions append on top; contract holds over the FULL stream
    HeavyHitters.admitBatch(spark, batches(3).toDF("k"), "k", m, 3L, root)
    assert(HeavyHitters.fragmentCount(spark, root) === 2L)
    val n = batches.map(_.size.toLong).sum
    val fullEst = HeavyHitters.hittersCurrent(spark, root, m)
      .as[(String, Long)].collect().toMap
    val fe = fullEst.getOrElse("hot", fail("guaranteed-heavy key lost post-append"))
    assert(fe <= 1700L && (1700L - fe) * (m + 1) <= n + (m + 1) * 4,
      s"full-stream est $fe out of the additive merge-tree bound")
    // race fence: a pointer move between admit's gen read and its write
    // is detected (simulate by admitting to a root whose pointer we bump
    // mid-flight is not interleavable single-threaded; the fence itself
    // is exercised via the post-write pointer re-check in admitBatch,
    // asserted here structurally: current gen is still 2)
    assert(graft.operators.GenStore.currentGen(root) === 2L)
  }

  test("rebuildBatches: affected fragment recomputed from survivors, others carried, replay of the rebuilt id refused") {
    import graft.operators.GenStore
    val root = java.nio.file.Files
      .createTempDirectory("graft-hh-rebuild-").toString + "/h"
    val m = 8
    // dead_hot is heavy ONLY through taken-down docs (batch 0); live_hot
    // is heavy through surviving rows in both batches
    val b0 = ((1 to 500).map(_ => "dead_hot") ++ (1 to 400).map(_ => "live_hot")
      ++ (1 to 200).map(i => s"a_$i")).toDF("k")
    val b1 = ((1 to 450).map(_ => "live_hot") ++ (1 to 200).map(i => s"b_$i"))
      .toDF("k")
    HeavyHitters.initStore(root)
    HeavyHitters.admitBatch(spark, b0, "k", m, 0L, root)
    HeavyHitters.admitBatch(spark, b1, "k", m, 1L, root)
    val stale = HeavyHitters.hittersCurrent(spark, root, m)
      .as[(String, Long)].collect().toMap
    assert(stale.contains("dead_hot"), "fixture degenerate: dead_hot not heavy")
    // the takedown removes every dead_hot row; batch 0's survivors
    val survivors0 = b0.filter(col("k") =!= "dead_hot")
    assert(HeavyHitters.rebuildBatches(spark, root, expectedGen = 1L,
      "k", m, Seq(0L -> survivors0)) === 2L)
    // CAS: stale retry no-ops
    assert(HeavyHitters.rebuildBatches(spark, root, expectedGen = 1L,
      "k", m, Seq(0L -> survivors0)) === 2L)
    val rebuilt = HeavyHitters.hittersCurrent(spark, root, m)
      .as[(String, Long)].collect().toMap
    assert(!rebuilt.contains("dead_hot"),
      "a key heavy only through taken-down docs survived the rebuild")
    // live_hot keeps the mergeable-summaries contract over the
    // SURVIVING stream: est <= exact, exact - est <= sum(N_i/(m+1))
    val exact = 850L
    val n0 = 600L; val n1 = 650L
    val est = rebuilt.getOrElse("live_hot", fail("surviving heavy key lost"))
    assert(est <= exact, "MG overcounted after rebuild")
    assert(exact - est <= n0 / (m + 1) + n1 / (m + 1) + 2,
      s"live_hot est $est out of the additive bound on the surviving stream")
    // the rebuilt id is sealed: an admission replay of pre-takedown
    // batch 0 must be refused, or the dead rows' counts resurrect
    val err = intercept[IllegalArgumentException] {
      HeavyHitters.admitBatch(spark, b0, "k", m, 0L, root)
    }
    assert(err.getMessage.contains("compact"))
    // ids above the seal still admit
    HeavyHitters.admitBatch(spark, b1, "k", m, 2L, root)
    assert(GenStore.currentGen(root) === 2L)
  }
}
