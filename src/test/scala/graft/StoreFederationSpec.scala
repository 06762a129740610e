package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.{Dedup, InvertedIndex, KeySetStore}

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

  test("mergeStores refuses a non-fresh target") {
    val docs = tokenized
    val base = Files.createTempDirectory("graft-fed-dirty").toString
    val (ra, rb, dirty) = (s"$base/a", s"$base/b", s"$base/d")
    Seq(ra, rb, dirty).foreach(InvertedIndex.initStore)
    Seq(ra, rb, dirty).foreach { r =>
      InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 4 === 0),
        "doc_id", "tk", 7L, batchId = 0L, root = r)
    }
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.mergeStores(spark, Seq(ra, rb), dirty)
    }
    assert(e.getMessage.contains("fresh"))
  }
}
