package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.{Dedup, GenStore, InvertedIndex, KeySetStore}

/** FEDERATION MERGE (`mergeStores`): K independently-built stores fold
  * into one serving store by fragment copies — merged serving is
  * bit-identical to a single pipeline that ingested everything, pending
  * deletes ride along, occupied ids seal, and the post-merge lifecycle
  * (admission, compaction) continues as if the store had one history.
  */
class StoreFederationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tokenized: DataFrame =
    Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))

  private val terms = Seq("join", "vector", "stream", "window")

  test("index federation: merged store serves every surface identically to a single-pipeline twin, then compacts") {
    val docs = tokenized
    val base = Files.createTempDirectory("graft-fed-idx").toString
    val (ra, rb, twin, merged) =
      (s"$base/a", s"$base/b", s"$base/twin", s"$base/m")
    Seq(ra, rb, twin).foreach(InvertedIndex.initStore)
    (0L to 1L).foreach { b =>
      InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 4 === b),
        "doc_id", "tk", 7L, batchId = b, root = ra)
      InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 4 === b + 2),
        "doc_id", "tk", 7L, batchId = b, root = rb)
      InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 4 === b),
        "doc_id", "tk", 7L, batchId = b, root = twin)
      InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 4 === b + 2),
        "doc_id", "tk", 7L, batchId = b + 2, root = twin)
    }
    // builder B carries a pending takedown into the merge
    val dead = docs.filter(col("doc_id") % 4 >= 2 && col("doc_id") % 7 === 3)
      .select("doc_id")
    InvertedIndex.admitDeleteBatch(spark, dead, "doc_id", 0L, rb)
    InvertedIndex.admitDeleteBatch(spark, dead, "doc_id", 0L, twin)
    assert(InvertedIndex.mergeStores(spark, Seq(ra, rb), merged) == 1L)
    def surfaces(r: String) = (
      InvertedIndex.lookupCurrent(spark, r, terms).orderBy("tok")
        .collect().toSeq,
      InvertedIndex.bm25SearchCurrent(spark, r, terms, 15).collect().toSeq,
      InvertedIndex.phraseSearchCurrent(spark, r, Seq("window", "join"))
        .collect().toSeq)
    assert(surfaces(merged) == surfaces(twin),
      "merged serving must equal the single-pipeline twin on every surface")
    // occupied ids sealed; a fresh id lands
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 4 === 0),
        "doc_id", "tk", 7L, batchId = 3L, root = merged)
    }
    assert(e.getMessage.contains("seal"))
    InvertedIndex.admitBatch(spark,
      docs.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("tk")),
      "doc_id", "tk", 7L, batchId = 10L, root = merged)
    // the ordinary lifecycle continues: compaction purges the pending set
    InvertedIndex.compactStore(spark, merged, expectedGen = 1L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      InvertedIndex.genDir(merged, 2L), "deletes")))
    val postDocs = spark.read
      .parquet(InvertedIndex.genDir(merged, 2L) + "/doclens")
    assert(postDocs.join(dead, Seq("doc_id"), "left_semi").count() == 0L,
      "compaction after the merge must purge the carried takedown")
  }

  test("signature federation: merged memory decides like a single-pipeline twin") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val pa = docs.filter(col("doc_id") % 3 === 0)
    val pb = docs.filter(col("doc_id") % 3 === 1)
    val probe = docs.filter(col("doc_id") % 3 === 2)
    val base = Files.createTempDirectory("graft-fed-sig").toString
    val (ra, rb, twin, merged) =
      (s"$base/a", s"$base/b", s"$base/twin", s"$base/m")
    Seq(ra, rb, twin).foreach(KeySetStore.init)
    Dedup.admitMinHashBatch(pa, "doc_id", "text", n = 3, numHashes = 32,
      bands = 8, batchId = 0L, root = ra, portableKeys = true)
    Dedup.admitMinHashBatch(pb, "doc_id", "text", n = 3, numHashes = 32,
      bands = 8, batchId = 0L, root = rb, portableKeys = true)
    Dedup.admitMinHashBatch(pa, "doc_id", "text", n = 3, numHashes = 32,
      bands = 8, batchId = 0L, root = twin, portableKeys = true)
    Dedup.admitMinHashBatch(pb, "doc_id", "text", n = 3, numHashes = 32,
      bands = 8, batchId = 1L, root = twin, portableKeys = true)
    assert(KeySetStore.mergeStores(spark, Seq(ra, rb), merged) == 1L)
    def dec(r: String) = Dedup.admitAgainstMinHashStoreGen(probe, "doc_id",
        "text", n = 3, numHashes = 32, bands = 8, root = r,
        portableKeys = true)
      .collect().toSeq.map(x => (x.getLong(0), x.getBoolean(2)))
    assert(dec(merged) == dec(twin))
    // compaction distincts the union; decisions hold
    val want = dec(merged)
    KeySetStore.compactStore(spark, merged, expectedGen = 1L)
    assert(dec(merged) == want)
  }

  test("vector federation: same-artifact stores merge and serve like one pipeline; alien artifacts refused") {
    import graft.operators.{Similarity, VectorStore}
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val (c1, b1) = Similarity.fitIvfPq(emb, "vec_id", "embedding",
      nlist = 16, kmeansIters = 2, m = 8, kcode = 16, pqIters = 2)
    val base = Files.createTempDirectory("graft-fed-vec").toString
    val (ra, rb, twin, merged) =
      (s"$base/a", s"$base/b", s"$base/twin", s"$base/m")
    Seq(ra, rb, twin).foreach(r => VectorStore.init(spark, r, c1, b1))
    VectorStore.admit(spark, ra, emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", 0L)
    VectorStore.admit(spark, rb, emb.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding", 0L)
    VectorStore.admit(spark, twin, emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", 0L)
    VectorStore.admit(spark, twin, emb.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding", 1L)
    assert(VectorStore.mergeStores(spark, Seq(ra, rb), merged) == 1L)
    def served(r: String) = VectorStore.search(spark, r, q, "vec_id",
      "embedding", 5, nprobe = 8, shortlistFactor = 16).collect().toSeq
    assert(served(merged) == served(twin))
    // different artifact: refused before any file lands
    val (c2, b2) = Similarity.fitIvfPq(
      emb.filter(col("vec_id") % 3 === 0), "vec_id", "embedding",
      nlist = 16, kmeansIters = 2, m = 8, kcode = 16, pqIters = 2)
    val alien = s"$base/alien"
    VectorStore.init(spark, alien, c2, b2)
    val e = intercept[IllegalArgumentException] {
      VectorStore.mergeStores(spark, Seq(ra, alien), s"$base/bad")
    }
    assert(e.getMessage.contains("artifact"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/bad", "_CURRENT")))
  }

  test("mergeable-family federation: sketch/frequency/quantile merged stores answer like single pipelines") {
    import graft.operators.{HeavyHitters, QuantileStore, SketchStore}
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val base = Files.createTempDirectory("graft-fed-mrg").toString
    def half(h: Long) = ev.filter(pmod(col("event_id"), lit(2)) === h)
    val vframe = (df: DataFrame) => df.select(col("event_type"),
      (col("user_id") % 10 + 1).cast("double").as("v"))
    val (sa, sb, sm, st) = (s"$base/sa", s"$base/sb", s"$base/sm", s"$base/st")
    val (ha, hb, hm, ht) = (s"$base/ha", s"$base/hb", s"$base/hm", s"$base/ht")
    val (qa, qb, qm, qt) = (s"$base/qa", s"$base/qb", s"$base/qm", s"$base/qt")
    Seq(sa, sb, st).foreach(SketchStore.initStore)
    Seq(ha, hb, ht).foreach(HeavyHitters.initStore)
    Seq(qa, qb, qt).foreach(QuantileStore.initStore)
    Seq(0L, 1L).foreach { h =>
      SketchStore.admitBatch(spark, half(h), Seq("event_type"), "user_id",
        0L, Seq(sa, sb)(h.toInt))
      HeavyHitters.admitBatch(spark, half(h), "event_type", 64, 0L,
        Seq(ha, hb)(h.toInt))
      QuantileStore.admitBatch(spark, vframe(half(h)), Seq("event_type"),
        "v", lo = 1.0, width = 1.0, nbins = 10, batchId = 0L,
        root = Seq(qa, qb)(h.toInt))
      SketchStore.admitBatch(spark, half(h), Seq("event_type"), "user_id",
        h, st)
      HeavyHitters.admitBatch(spark, half(h), "event_type", 64, h, ht)
      QuantileStore.admitBatch(spark, vframe(half(h)), Seq("event_type"),
        "v", lo = 1.0, width = 1.0, nbins = 10, batchId = h, root = qt)
    }
    SketchStore.mergeStores(spark, Seq(sa, sb), sm)
    HeavyHitters.mergeStores(spark, Seq(ha, hb), hm)
    QuantileStore.mergeStores(spark, Seq(qa, qb), qm)
    def rows(df: DataFrame) = df.collect().map(_.toString).sorted.toSeq
    assert(rows(SketchStore.estimatesCurrent(spark, sm, Seq("event_type"))
        .select("event_type", "est")) ==
      rows(SketchStore.estimatesCurrent(spark, st, Seq("event_type"))
        .select("event_type", "est")))
    assert(rows(HeavyHitters.hittersCurrent(spark, hm, 64)) ==
      rows(HeavyHitters.hittersCurrent(spark, ht, 64)))
    val qs = Seq(("p50", 1, 2), ("p95", 19, 20))
    assert(rows(QuantileStore.quantilesCurrent(spark, qm, Seq("event_type"),
        qs, lo = 1.0, width = 1.0)) ==
      rows(QuantileStore.quantilesCurrent(spark, qt, Seq("event_type"),
        qs, lo = 1.0, width = 1.0)))
    // the merged store keeps the ordinary lifecycle: compaction folds it
    QuantileStore.compactStore(spark, qm, expectedGen = 1L, Seq("event_type"))
    assert(rows(QuantileStore.quantilesCurrent(spark, qm, Seq("event_type"),
        qs, lo = 1.0, width = 1.0)) ==
      rows(QuantileStore.quantilesCurrent(spark, qt, Seq("event_type"),
        qs, lo = 1.0, width = 1.0)))
  }

  test("compactFirst merge folds each source before the copy: one fragment per source, pending deletes applied, serving identical to a plain merge") {
    import graft.operators.{Similarity, VectorStore}
    val docs = tokenized
    val base = Files.createTempDirectory("graft-fed-cf").toString

    // --- index family: 3 fragments per builder + a pending takedown on A
    val (ia, ib) = (s"$base/ia", s"$base/ib")
    Seq(ia, ib).foreach(InvertedIndex.initStore)
    (0L to 2L).foreach { b =>
      InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 6 === b),
        "doc_id", "tk", 7L, batchId = b, root = ia)
      InvertedIndex.admitBatch(spark,
        docs.filter(col("doc_id") % 6 === b + 3),
        "doc_id", "tk", 7L, batchId = b, root = ib)
    }
    val dead = docs.filter(col("doc_id") % 6 < 3 && col("doc_id") % 5 === 2)
      .select("doc_id")
    InvertedIndex.admitDeleteBatch(spark, dead, "doc_id", 0L, ia)
    def idxFrags(root: String) = {
      val d = InvertedIndex.genDir(root, InvertedIndex.currentGen(root))
      (GenStore.listBatchIds(spark, s"$d/postings").size,
        GenStore.listBatchIds(spark, s"$d/deletes").size)
    }
    // plain first — compactFirst mutates the sources (gen bump)
    InvertedIndex.mergeStores(spark, Seq(ia, ib), s"$base/ip")
    InvertedIndex.mergeStores(spark, Seq(ia, ib), s"$base/if",
      compactFirst = true)
    assert(idxFrags(s"$base/ip") == ((6, 1)),
      "the plain merge carries every fragment and the pending delete")
    assert(idxFrags(s"$base/if") == ((2, 0)),
      "compactFirst must fold each source to one fragment and apply " +
        "its pending deletes before the copy")
    assert(idxFrags(ia) == ((1, 0)) && idxFrags(ib) == ((1, 0)))
    def bm(r: String) =
      InvertedIndex.bm25SearchCurrent(spark, r, terms, 15).collect().toSeq
    assert(bm(s"$base/if") == bm(s"$base/ip"),
      "folded-merge serving must equal the plain merge's")

    // --- signature family: 2 overlapping fragments per source fold +
    // distinct; admission decisions unchanged
    val raw = Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val (sa, sb) = (s"$base/sa", s"$base/sb")
    Seq(sa, sb).foreach(KeySetStore.init)
    Seq(sa, sb).zipWithIndex.foreach { case (r, i) =>
      (0L to 1L).foreach { b => // batch 1 re-admits batch 0's docs
        Dedup.admitMinHashBatch(raw.filter(col("doc_id") % 3 === i),
          "doc_id", "text", n = 3, numHashes = 32, bands = 8,
          batchId = b, root = r, portableKeys = true)
      }
    }
    val probe = raw.filter(col("doc_id") % 3 === 2)
    def dec(r: String) = Dedup.admitAgainstMinHashStoreGen(probe, "doc_id",
        "text", n = 3, numHashes = 32, bands = 8, root = r,
        portableKeys = true)
      .collect().toSeq.map(x => (x.getLong(0), x.getBoolean(2)))
    KeySetStore.mergeStores(spark, Seq(sa, sb), s"$base/sp")
    KeySetStore.mergeStores(spark, Seq(sa, sb), s"$base/sf",
      compactFirst = true)
    def sigFrags(root: String) = GenStore.listBatchIds(spark,
      GenStore.genDir(root, GenStore.currentGen(root))).size
    assert(sigFrags(s"$base/sp") == 4 && sigFrags(s"$base/sf") == 2)
    assert(dec(s"$base/sf") == dec(s"$base/sp"))

    // --- vector family: 2 fragments per source fold to one
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val (c1, b1) = Similarity.fitIvfPq(emb, "vec_id", "embedding",
      nlist = 16, kmeansIters = 2, m = 8, kcode = 16, pqIters = 2)
    val (va, vb) = (s"$base/va", s"$base/vb")
    Seq(va, vb).foreach(r => VectorStore.init(spark, r, c1, b1))
    Seq(va, vb).zipWithIndex.foreach { case (r, i) =>
      (0L to 1L).foreach { b =>
        VectorStore.admit(spark, r,
          emb.filter(col("vec_id") % 4 === i + 2 * b),
          "vec_id", "embedding", b)
      }
    }
    VectorStore.mergeStores(spark, Seq(va, vb), s"$base/vp")
    VectorStore.mergeStores(spark, Seq(va, vb), s"$base/vf",
      compactFirst = true)
    def vecFrags(root: String) = GenStore.listBatchIds(spark,
      VectorStore.codedDir(root, VectorStore.currentGen(root))).size
    assert(vecFrags(s"$base/vp") == 4 && vecFrags(s"$base/vf") == 2)
    val q = emb.filter(col("vec_id") < 5)
    def served(r: String) = VectorStore.search(spark, r, q, "vec_id",
      "embedding", 5, nprobe = 8, shortlistFactor = 16).collect().toSeq
    assert(served(s"$base/vf") == served(s"$base/vp"))
  }

  test("mergeStores refuses a non-fresh target") {
    val docs = tokenized
    val base = Files.createTempDirectory("graft-fed-dirty").toString
    val (ra, rb, dirty, sealed0) =
      (s"$base/a", s"$base/b", s"$base/d", s"$base/s")
    Seq(ra, rb, dirty).foreach(InvertedIndex.initStore)
    Seq(ra, rb, dirty).foreach { r =>
      InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 4 === 0),
        "doc_id", "tk", 7L, batchId = 0L, root = r)
    }
    // a LIVE never-compacted store (fragments, no _MERGE_PENDING mark)
    // must be refused — byte-copy retry semantics may never wipe it
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.mergeStores(spark, Seq(ra, rb), dirty)
    }
    assert(e.getMessage.contains("live store"))
    // a SEALED store (a completed previous merge) is refused too
    assert(InvertedIndex.mergeStores(spark, Seq(ra, rb), sealed0) == 1L)
    val e2 = intercept[IllegalArgumentException] {
      InvertedIndex.mergeStores(spark, Seq(ra, rb), sealed0)
    }
    assert(e2.getMessage.contains("fresh"))
  }

  test("a crashed merge retries cleanly; a sourceless merge refuses to seal empty") {
    val docs = tokenized
    val base = Files.createTempDirectory("graft-fed-retry").toString
    val (ra, rb, m) = (s"$base/a", s"$base/b", s"$base/m")
    Seq(ra, rb).foreach(InvertedIndex.initStore)
    InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "tk", 7L, batchId = 0L, root = ra)
    InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "tk", 7L, batchId = 0L, root = rb)
    // simulate a crash mid-copy: target holds the _MERGE_PENDING mark
    // plus a garbage partial fragment, but no seal (the seal is last)
    GenStore.initIfAbsent(m)
    val gdir = java.nio.file.Paths.get(InvertedIndex.genDir(m, 1L))
    Files.createDirectories(gdir.resolve("postings/batch_id=0"))
    Files.write(gdir.resolve("_MERGE_PENDING"), Array.emptyByteArray)
    Files.write(gdir.resolve("postings/batch_id=0/garbage.parquet"),
      "not parquet".getBytes)
    // the retry wipes the partial prefix and completes
    assert(InvertedIndex.mergeStores(spark, Seq(ra, rb), m) == 1L)
    assert(InvertedIndex.bm25SearchCurrent(spark, m, terms, 15)
      .count() > 0L)
    assert(!Files.exists(gdir.resolve("_MERGE_PENDING")),
      "a completed merge must drop its pending mark")
    // empty sources: initialized stores with zero fragments must refuse
    val (ea, eb) = (s"$base/ea", s"$base/eb")
    Seq(ea, eb).foreach(InvertedIndex.initStore)
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.mergeStores(spark, Seq(ea, eb), s"$base/em")
    }
    assert(e.getMessage.contains("no data fragments"))
  }

  test("merge seals the renumbered delete-id space: a post-merge takedown cannot clobber a carried one") {
    val docs = tokenized
    val base = Files.createTempDirectory("graft-fed-dhwm").toString
    val (ra, rb, m) = (s"$base/a", s"$base/b", s"$base/m")
    Seq(ra, rb).foreach(InvertedIndex.initStore)
    InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "tk", 7L, batchId = 0L, root = ra)
    InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "tk", 7L, batchId = 0L, root = rb)
    // each builder carries a pending takedown, both under batch_id=0 in
    // their own id spaces — the merge renumbers them to 0 and 1
    val deadA = docs.filter(col("doc_id") % 2 === 0 && col("doc_id") % 5 === 0)
      .select("doc_id")
    val deadB = docs.filter(col("doc_id") % 2 === 1 && col("doc_id") % 5 === 0)
      .select("doc_id")
    InvertedIndex.admitDeleteBatch(spark, deadA, "doc_id", 0L, ra)
    InvertedIndex.admitDeleteBatch(spark, deadB, "doc_id", 0L, rb)
    InvertedIndex.mergeStores(spark, Seq(ra, rb), m)
    assert(GenStore.deletesHwm(m, 1L) == 1L)
    // a post-merge takedown under a renumbered id is refused — admitting
    // it would mode-overwrite a carried pending compliance delete
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.admitDeleteBatch(spark,
        docs.limit(1).select("doc_id"), "doc_id", 1L, m)
    }
    assert(e.getMessage.contains("delete-id high-water mark"))
    // a fresh id above the mark lands, and compaction purges everything
    InvertedIndex.admitDeleteBatch(spark,
      docs.filter(col("doc_id") === 2).select("doc_id"), "doc_id", 2L, m)
    InvertedIndex.compactStore(spark, m, expectedGen = 1L)
    val survivors = spark.read
      .parquet(InvertedIndex.genDir(m, 2L) + "/doclens")
    assert(survivors.join(deadA.union(deadB), Seq("doc_id"), "left_semi")
      .count() == 0L, "both carried takedowns must be applied")
    // the new generation starts unfenced: the renumbered fragments were
    // consumed, so low delete ids clobber nothing
    assert(GenStore.deletesHwm(m, 2L) == -1L)
    InvertedIndex.admitDeleteBatch(spark,
      docs.limit(1).select("doc_id"), "doc_id", 0L, m)
  }
}
