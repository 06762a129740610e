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

  // -------------------------------------------------------------------------
  // The INVERSE interleaving: the DELETE is listed by the compactor and a
  // DATA batch it targets admits inside the window (delete lands → listing
  // runs → admit slips in). The listed delete is purged by this compaction,
  // not carried pending — so the sweep must re-apply it to the straggler
  // copy, or the takedown silently vanishes while both admits reported
  // success. Reads applied the pending set to EVERY fragment of the old
  // generation; the published generation must serve the same answers.
  // -------------------------------------------------------------------------

  test("KeySetStore: a LISTED delete reaches a data straggler admitted inside the window") {
    import graft.operators.{Dedup, KeySetStore}
    val root = fresh("race-deldata")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "omega psi chi phi upsilon tau")).toDF("doc_id", "text")
    KeySetStore.init(root)
    Dedup.admitMinHashBatch(docs.filter($"doc_id" === 1L), "doc_id", "text",
      n = 3, numHashes = 32, bands = 8, batchId = 0L, root = root)
    // the takedown lands FIRST (targeting keys no fragment holds yet —
    // allowed) and is listed; doc 2's data batch admits inside the window
    Dedup.deleteMinHashBatch(docs.filter($"doc_id" === 2L), "doc_id",
      "text", n = 3, numHashes = 32, bands = 8, batchId = 0L, root = root)
    KeySetStore.compactStoreHooked(spark, root, expectedGen = 1L, () =>
      Dedup.admitMinHashBatch(docs.filter($"doc_id" === 2L), "doc_id",
        "text", n = 3, numHashes = 32, bands = 8, batchId = 1L, root = root))
    assert(GenStore.currentGen(root) === 2L)
    // listed deletes are purged, never carried pending
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "gen=2", "deletes")))
    val dec = Dedup.admitAgainstMinHashStoreGen(docs, "doc_id", "text",
        n = 3, numHashes = 32, bands = 8, root = root)
      .as[(Long, Long, Boolean)].collect().map(p => p._1 -> p._3).toMap
    // doc 2's straggler keys were subtracted in the sweep: a re-crawl
    // re-admits; doc 1 (untouched by the delete) still rejects
    assert(dec == Map(1L -> false, 2L -> true),
      s"listed delete lost on the swept straggler: decisions $dec")
  }

  test("InvertedIndex: a LISTED delete reaches a data straggler admitted inside the window") {
    val root = fresh("race-idxdeldata")
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
    val straggler = docs.filter(col("doc_id") % 10 >= 5)
    val deadPred = col("doc_id") % 10 >= 5 && col("doc_id") % 3 === 0
    InvertedIndex.initStore(root)
    InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 10 < 5),
      "doc_id", "tk", 7L, batchId = 0L, root = root)
    // delete (targeting docs the store has not admitted yet) lands and
    // is LISTED; the data batch holding those docs admits in the window
    InvertedIndex.admitDeleteBatch(spark,
      docs.filter(deadPred).select("doc_id"), "doc_id", 0L, root)
    InvertedIndex.compactStoreHooked(spark, root, expectedGen = 1L, () =>
      InvertedIndex.admitBatch(spark, straggler,
        "doc_id", "tk", 7L, batchId = 1L, root = root))
    assert(InvertedIndex.currentGen(root) === 2L)
    // every read surface equals a flat store built WITHOUT the deleted
    // docs — postings entries, doclens rows AND the straggler's stats
    val flat = java.nio.file.Files.createTempDirectory("graft-race-ddflat-")
      .toString
    InvertedIndex.appendBatch(docs.filter(!deadPred), "doc_id", "tk", 7L,
      0L, flat)
    val terms = Seq("join", "vector", "stream", "window")
    def rows(df: DataFrame) =
      df.collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows(InvertedIndex.bm25SearchCurrent(spark, root, terms, 15)) ===
      rows(InvertedIndex.bm25SearchStore(spark, flat, terms, 15)),
      "listed delete lost on the swept straggler fragment")
  }

  test("VectorStore: a LISTED delete reaches a data straggler admitted inside the window") {
    import graft.operators.{Similarity, VectorStore}
    val root = fresh("race-vecdeldata")
    val corpus = spark.range(0, 300).select(col("id").as("vec_id"),
      array((0 until 16).map(j =>
        ((pmod(xxhash64(col("id"), lit(j)), lit(2001L)) - 1000L) / 1000.0)
          .cast("double")): _*).as("embedding"))
    val (nlist, km, m, kc, pq) = (8, 2, 8, 16, 2)
    val (c, b) = Similarity.fitIvfPq(corpus, "vec_id", "embedding",
      nlist, km, m, kc, pq)
    VectorStore.init(spark, root, c, b)
    VectorStore.admit(spark, root, corpus.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", 0L)
    // the takedown covers ids of BOTH the merged batch and the straggler
    VectorStore.admitDeletes(spark, root,
      corpus.filter(col("vec_id") % 5 === 2).select("vec_id"), "vec_id", 0L)
    VectorStore.compactGenHooked(spark, root, expectedGen = 1L, () =>
      VectorStore.admit(spark, root, corpus.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", 1L))
    assert(VectorStore.currentGen(root) === 2L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "gen=2", "deletes")))
    // no deleted id survives in ANY coded fragment — merged or swept
    val left = spark.read.parquet(VectorStore.codedDir(root, 2L))
      .filter(col("cid") % 5 === 2).count()
    assert(left === 0L,
      s"listed delete lost on the swept straggler: $left coded rows remain")
    // and serving equals a store built from the survivors
    val cleanRoot = fresh("race-vecdeldata-clean")
    VectorStore.init(spark, cleanRoot, c, b)
    VectorStore.admit(spark, cleanRoot,
      corpus.filter(col("vec_id") % 5 =!= 2), "vec_id", "embedding", 0L)
    def top(r: String) = VectorStore.search(spark, r,
        corpus.filter(col("vec_id") < 8), "vec_id", "embedding", k = 5,
        nprobe = nlist, shortlistFactor = 1000)
      .select(col("query_id"), col("rank").cast("long"), col("neighbor_id"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(top(root) === top(cleanRoot),
      "post-compaction search diverges from the survivors-only store")
  }
}
