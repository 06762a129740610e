package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.{GenStore, HeavyHitters, InvertedIndex, QuantileStore, SketchStore}

/** The admit-vs-compact straggler race, fenced across the whole
  * [[GenStore]] family: a batch admitted AFTER a compaction's fragment
  * listing but BEFORE its pointer move reports success (its own
  * pointer re-check still sees the old generation), so the compaction
  * must carry it into the published generation — the re-list sweep
  * [[graft.operators.KeySetStore.compactStore]] and
  * [[graft.operators.VectorStore.compactGen]] already had, applied to
  * the index/sketch/frequency/quantile stores. Each test drives the
  * interleaving through the `compactStoreHooked` seam and asserts the
  * straggler's data is served by the NEW generation.
  */
class StoreRaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag-").toString + "/store"

  test("InvertedIndex: an admit inside the compaction window lands in the published generation") {
    val root = fresh("race-idx")
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
    InvertedIndex.initStore(root)
    InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 10 < 5),
      "doc_id", "tk", 7L, batchId = 0L, root = root)
    // the race: batch 1 admits after the compactor listed fragments —
    // its pointer re-check passes (still gen 1), it reports success
    InvertedIndex.compactStoreHooked(spark, root, expectedGen = 1L, () =>
      InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 10 >= 5),
        "doc_id", "tk", 7L, batchId = 1L, root = root))
    assert(InvertedIndex.currentGen(root) === 2L)
    // gen 2 must serve the WHOLE corpus — straggler postings, doclens
    // AND stats — exactly like a flat store of the same corpus
    val flat = java.nio.file.Files.createTempDirectory("graft-race-flat-").toString
    InvertedIndex.appendBatch(docs, "doc_id", "tk", 7L, 0L, flat)
    val terms = Seq("join", "vector", "stream", "window")
    def rows(df: DataFrame) =
      df.collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows(InvertedIndex.bm25SearchCurrent(spark, root, terms, 15)) ===
      rows(InvertedIndex.bm25SearchStore(spark, flat, terms, 15)))
  }

  test("SketchStore: an admit inside the compaction window lands in the published generation") {
    val root = fresh("race-sk")
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    SketchStore.initStore(root)
    SketchStore.admitBatch(spark, ev.filter(pmod(col("event_id"), lit(2)) === 0),
      Seq("event_type"), "user_id", 0L, root)
    SketchStore.compactStoreHooked(spark, root, 1L, Seq("event_type"), () =>
      SketchStore.admitBatch(spark, ev.filter(pmod(col("event_id"), lit(2)) === 1),
        Seq("event_type"), "user_id", 1L, root))
    assert(GenStore.currentGen(root) === 2L)
    def est(path: String) =
      SketchStore.mergedEstimates(spark, path, Seq("event_type"))
        .select("event_type", "est").collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    // estimates equal a flat store holding BOTH batches (HLL union is
    // order- and split-insensitive, so equality is exact)
    val flat = java.nio.file.Files.createTempDirectory("graft-race-skflat-").toString
    SketchStore.appendBatch(ev, Seq("event_type"), "user_id", 0L, flat)
    assert(est(GenStore.genDir(root, 2L)) === est(flat))
  }

  test("HeavyHitters: an admit inside the compaction window lands in the published generation") {
    val root = fresh("race-hh")
    val m = 8
    val b0 = ((1 to 400).map(_ => "hot") ++ (1 to 300).map(i => s"a_$i")).toDF("k")
    val b1 = ((1 to 500).map(_ => "hot") ++ (1 to 300).map(i => s"b_$i")).toDF("k")
    HeavyHitters.initStore(root)
    HeavyHitters.admitBatch(spark, b0, "k", m, 0L, root)
    HeavyHitters.compactStoreHooked(spark, root, 1L, m, () =>
      HeavyHitters.admitBatch(spark, b1, "k", m, 1L, root))
    assert(GenStore.currentGen(root) === 2L)
    // the straggler's 500 "hot" rows count: with batch 1 dropped the
    // estimate could never exceed batch 0's size (700)
    val estim = HeavyHitters.hittersCurrent(spark, root, m)
      .as[(String, Long)].collect().toMap
    val hot = estim.getOrElse("hot", fail("guaranteed-heavy key lost"))
    assert(hot > 700L, s"straggler batch dropped: hot est $hot <= 700")
  }

  test("QuantileStore: an admit inside the compaction window lands in the published generation") {
    val root = fresh("race-qs")
    val df = spark.range(1000).select(col("id"),
      (pmod(col("id"), lit(97L)) + 1).cast("double").as("v"),
      lit("k").as("k"))
    QuantileStore.initStore(root)
    QuantileStore.admitBatch(spark, df.filter(col("id") % 2 === 0),
      Seq("k"), "v", 1.0, 1.0, 97, 0L, root)
    QuantileStore.compactStoreHooked(spark, root, 1L, Seq("k"), () =>
      QuantileStore.admitBatch(spark, df.filter(col("id") % 2 === 1),
        Seq("k"), "v", 1.0, 1.0, 97, 1L, root))
    assert(GenStore.currentGen(root) === 2L)
    // total count through the published generation covers BOTH batches
    val n = QuantileStore.mergedHistogram(spark,
        GenStore.genDir(root, 2L), Seq("k"))
      .agg(sum("cnt")).as[Long].head()
    assert(n === 1000L, s"straggler batch dropped: merged count $n != 1000")
  }

  test("initStore on an advanced store is a no-op, never a pointer rewind") {
    val root = fresh("race-init")
    val df = Seq((0L, "k", 1.0), (1L, "k", 2.0)).toDF("id", "k", "v")
    QuantileStore.initStore(root)
    QuantileStore.admitBatch(spark, df, Seq("k"), "v", 1.0, 1.0, 10, 0L, root)
    QuantileStore.compactStore(spark, root, 1L, Seq("k"))
    assert(GenStore.currentGen(root) === 2L)
    // a restart calling initStore again must not re-point readers at
    // the superseded generation 1
    QuantileStore.initStore(root)
    InvertedIndex.initStore(root)
    SketchStore.initStore(root)
    HeavyHitters.initStore(root)
    assert(GenStore.currentGen(root) === 2L)
  }

  test("KeySetStore: a DELETE inside the compaction window stays pending in the published generation") {
    import graft.operators.{Dedup, KeySetStore}
    val root = fresh("race-del")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "omega psi chi phi upsilon tau")).toDF("doc_id", "text")
    KeySetStore.init(root)
    Dedup.admitMinHashBatch(docs.filter($"doc_id" === 1L), "doc_id", "text",
      n = 3, numHashes = 32, bands = 8, batchId = 0L, root = root)
    Dedup.admitMinHashBatch(docs.filter($"doc_id" === 2L), "doc_id", "text",
      n = 3, numHashes = 32, bands = 8, batchId = 1L, root = root)
    // the race: doc 1's takedown lands AFTER the compactor listed the
    // delete fragments — its pointer re-check passes (still gen 1), it
    // reports success; the sweep must carry it into gen 2 as PENDING,
    // never silently drop it
    KeySetStore.compactStoreHooked(spark, root, expectedGen = 1L, () =>
      Dedup.deleteMinHashBatch(docs.filter($"doc_id" === 1L), "doc_id",
        "text", n = 3, numHashes = 32, bands = 8, batchId = 0L, root = root))
    assert(GenStore.currentGen(root) === 2L)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "gen=2", "deletes")),
      "the straggler delete fragment was not swept into the new generation")
    def probe() = Dedup.admitAgainstMinHashStoreGen(docs, "doc_id", "text",
        n = 3, numHashes = 32, bands = 8, root = root)
      .as[(Long, Long, Boolean)].collect().map(p => p._1 -> p._3).toMap
    // the swept delete is LIVE: doc 1's re-crawl admits, doc 2 rejects
    assert(probe() == Map(1L -> true, 2L -> false))
    // the NEXT compaction applies it physically
    assert(KeySetStore.compactStore(spark, root, expectedGen = 2L) === 3L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "gen=3", "deletes")))
    assert(probe() == Map(1L -> true, 2L -> false),
      "the purging compaction changed takedown decisions")
  }
}
