package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.{Dedup, InvertedIndex, KeySetStore}

/** AGE-OUT RETENTION across the fragment stores (`expireBatches` — the
  * time-based sibling of the takedown surface): fragments below the
  * watermark drop whole, serving equals a store that never saw them,
  * expired batch ids stay sealed against replay, and the aged-out
  * content re-enters as a new admission.
  */
class StoreRetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tokenized: DataFrame =
    Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))

  private val terms = Seq("join", "vector", "stream", "window")

  test("index expiry: serving equals an index never built over the expired batch; replay sealed; re-admission open") {
    val docs = tokenized
    val root = Files.createTempDirectory("graft-ret-idx").toString + "/istore"
    InvertedIndex.initStore(root)
    (0L to 2L).foreach { b =>
      InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 3 === b),
        "doc_id", "tk", 7L, batchId = b, root = root)
    }
    val gen2 = InvertedIndex.expireBatches(spark, root, expectedGen = 1L,
      minRetainedBatch = 1L)
    assert(gen2 == 2L)
    // twin that never saw batch 0
    val twin = Files.createTempDirectory("graft-ret-twin").toString + "/istore"
    InvertedIndex.initStore(twin)
    (1L to 2L).foreach { b =>
      InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 3 === b),
        "doc_id", "tk", 7L, batchId = b, root = twin)
    }
    val got = InvertedIndex.bm25SearchCurrent(spark, root, terms, 15)
      .collect().toSeq
    val want = InvertedIndex.bm25SearchCurrent(spark, twin, terms, 15)
      .collect().toSeq
    assert(got == want, "post-expiry serving must equal the never-saw-it store")
    // the expired id is sealed; a replay would resurrect the aged-out docs
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 3 === 0),
        "doc_id", "tk", 7L, batchId = 0L, root = root)
    }
    assert(e.getMessage.contains("seal"))
    // stats shrank exactly to the survivors
    val nSurv = docs.filter(col("doc_id") % 3 =!= 0).count()
    val n = spark.read.parquet(InvertedIndex.genDir(root, gen2) + "/stats")
      .agg(sum(col("n_docs"))).head.getLong(0)
    assert(n == nSurv, s"stats n_docs $n != survivors $nSurv")
    // re-ingesting the aged-out content is a NEW admission
    InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "tk", 7L, batchId = 10L, root = root)
    val back = spark.read.parquet(InvertedIndex.genDir(root, gen2) + "/doclens")
      .filter(col("doc_id") % 3 === 0).count()
    assert(back > 0, "re-admission under a fresh id must land")
  }

  test("index expiry refuses to empty the store") {
    val docs = tokenized
    val root = Files.createTempDirectory("graft-ret-empty").toString + "/istore"
    InvertedIndex.initStore(root)
    InvertedIndex.admitBatch(spark, docs, "doc_id", "tk", 7L,
      batchId = 0L, root = root)
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.expireBatches(spark, root, expectedGen = 1L,
        minRetainedBatch = 99L)
    }
    assert(e.getMessage.contains("retention"))
  }

  test("signature expiry: old crawl re-admits after its signatures age out; a later compaction keeps the survivors") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val old = docs.filter(col("doc_id") % 3 === 0)
    val newer = docs.filter(col("doc_id") % 3 === 1)
    val root = Files.createTempDirectory("graft-ret-sig").toString + "/sig"
    KeySetStore.init(root)
    Dedup.admitMinHashBatch(old, "doc_id", "text", n = 3, numHashes = 32,
      bands = 8, batchId = 0L, root = root, portableKeys = true)
    Dedup.admitMinHashBatch(newer, "doc_id", "text", n = 3, numHashes = 32,
      bands = 8, batchId = 1L, root = root, portableKeys = true)
    def probe(df: DataFrame) = Dedup.admitAgainstMinHashStoreGen(df,
        "doc_id", "text", n = 3, numHashes = 32, bands = 8, root = root,
        portableKeys = true)
      .collect().toSeq.map(r => (r.getLong(0), r.getBoolean(2))).toMap
    // pre-expiry: every old doc with shingles rejects as its own clone
    val hasKeys = old
      .filter(size(TextFunctions.tokens(col("text"))) >= 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(probe(old).forall { case (id, admit) => admit == !hasKeys(id) })
    KeySetStore.expireBatches(spark, root, expectedGen = 1L,
      minRetainedBatch = 1L)
    // post-expiry: decisions equal a store holding ONLY the newer crawl
    val twin = Files.createTempDirectory("graft-ret-sigtwin").toString + "/sig"
    KeySetStore.init(twin)
    Dedup.admitMinHashBatch(newer, "doc_id", "text", n = 3, numHashes = 32,
      bands = 8, batchId = 1L, root = twin, portableKeys = true)
    val want = Dedup.admitAgainstMinHashStoreGen(old, "doc_id", "text",
        n = 3, numHashes = 32, bands = 8, root = twin, portableKeys = true)
      .collect().toSeq.map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(probe(old) == want,
      "post-expiry decisions must equal the newer-crawl-only store")
    // a later plain compaction keeps the surviving keys bit-identically
    KeySetStore.compactStore(spark, root, expectedGen = 2L)
    assert(probe(old) == want, "compaction after expiry must not move decisions")
    // expired id sealed
    val e = intercept[IllegalArgumentException] {
      Dedup.admitMinHashBatch(old, "doc_id", "text", n = 3, numHashes = 32,
        bands = 8, batchId = 0L, root = root, portableKeys = true)
    }
    assert(e.getMessage.contains("seal"))
  }
}
