package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.InvertedIndex

/** Bucketed inverted index: the array form behind the catalog's
  * string-joined postings, bucket-merge correctness across bucket widths,
  * and the one-shuffle build plan.
  */
class RetrievalOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def postings(dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))

  /** Flat reference posting lists: term -> globally sorted distinct ids. */
  private def flat(dir: String): Map[String, Seq[Long]] =
    postings(dir).groupBy(col("tok"))
      .agg(sort_array(collect_set(col("doc_id"))).as("p"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap

  test("q76 string postings encode exactly the sorted distinct doc-id array") {
    val expect = flat(TestSpark.sf0001)
    val got = Queries.queries("q76_inverted_index")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.nonEmpty)
    got.foreach { case (tok, nDocs, joined) =>
      val arr = expect(tok)
      assert(nDocs == arr.size, s"$tok n_docs")
      assert(joined == arr.mkString(","), s"$tok postings")
    }
  }

  test("bucket merge reassembles the flat posting lists at any bucket width") {
    val expect = flat(TestSpark.sf0001)
    for (b <- Seq(7L, 64L, 1L << 40)) {
      val merged = InvertedIndex.lookup(
          InvertedIndex.build(postings(TestSpark.sf0001), b), expect.keys.toSeq)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2).toList)))
        .toMap
      assert(merged.keySet == expect.keySet, s"B=$b vocab")
      expect.foreach { case (tok, arr) =>
        assert(merged(tok) == ((arr.size.toLong, arr)), s"B=$b term $tok")
      }
    }
  }

  test("fixture premise: some term spans multiple buckets at the catalog width") {
    val multi = InvertedIndex.build(postings(TestSpark.sf0001), 64L)
      .groupBy(col("tok")).agg(count(lit(1)).as("nb"))
      .filter(col("nb") > 1).count()
    assert(multi > 0, "catalog bucket width must actually split some term")
  }

  test("posting arrays are bounded by the bucket width") {
    val over = InvertedIndex.build(postings(TestSpark.sf0001), 16L)
      .filter(size(col("postings")) > 16).count()
    assert(over == 0L)
  }

  test("index build is one shuffle on the composite (tok, bucket) key") {
    val built = InvertedIndex.build(postings(TestSpark.sf0001), 64L)
    built.collect() // materialize so AQE finalizes the plan
    // AQE's toString prints the final plan followed by the initial plan;
    // count shuffles in the final section only
    val plan = built.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, plan.take(3000))
  }

  test("build rejects a non-positive bucket width") {
    assertThrows[IllegalArgumentException] {
      InvertedIndex.build(postings(TestSpark.sf0001), 0L)
    }
  }

  // --- incremental admission store (q139 machinery) ---

  private def tokenized: DataFrame =
    Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))

  private def admitAll(dir: String): Unit = {
    InvertedIndex.appendBatch(tokenized.filter(col("doc_id") % 10 < 8),
      "doc_id", "tk", bucketSize = 7, batchId = 0L, path = dir)
    InvertedIndex.appendBatch(tokenized.filter(col("doc_id") % 10 >= 8),
      "doc_id", "tk", bucketSize = 7, batchId = 1L, path = dir)
  }

  test("store lookup over two admitted batches equals a fresh whole-corpus build") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idxadm-").toString
    admitAll(dir)
    val expect = flat(TestSpark.sf0001)
    // bucket width 7 + an 80/20 doc_id-modulus split puts BOTH batches in
    // the same (term, bucket) cell for most cells — the cross-batch
    // bucket-merge path is actually exercised, not just concatenation
    val merged = InvertedIndex.storeLookup(spark, dir, expect.keys.toSeq)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2).toList)))
      .toMap
    assert(merged.keySet == expect.keySet)
    expect.foreach { case (tok, arr) =>
      assert(merged(tok) == ((arr.size.toLong, arr)), s"term $tok")
    }
  }

  test("admission retry is a storage no-op and history stays untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idxadm-").toString
    admitAll(dir)
    val before = InvertedIndex.bm25SearchStore(spark, dir,
      Seq("join", "vector", "stream", "window"), 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def listFiles(sub: String): Set[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir, sub))
        .iterator().asScala.filter(p => p.toString.endsWith(".parquet"))
        .map(_.toString).toSet
    }
    val b0Before = listFiles("postings/batch_id=0")
    // replay batch 1 (a retried crawl micro-batch): batch 0's files must
    // be byte-identical untouched, and the search answer unchanged
    InvertedIndex.appendBatch(tokenized.filter(col("doc_id") % 10 >= 8),
      "doc_id", "tk", bucketSize = 7, batchId = 1L, path = dir)
    assert(listFiles("postings/batch_id=0") == b0Before, "history rewritten")
    val after = InvertedIndex.bm25SearchStore(spark, dir,
      Seq("join", "vector", "stream", "window"), 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == before, "retried admission changed the search answer")
  }

  test("store BM25 search equals the one-shot in-query BM25 (q68) on the same corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idxadm-").toString
    admitAll(dir)
    val oneShot = Queries.queries("q68_bm25")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val store = InvertedIndex.bm25SearchStore(spark, dir,
      Seq("join", "vector", "stream", "window"), 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(store == oneShot)
  }

  test("filtered BM25: membership restricted, weights unchanged (corpus-level stats), all-pass filter equals unfiltered") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idxadm-").toString
    admitAll(dir)
    val terms = Seq("join", "vector", "stream", "window")
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val allowed = docs.filter(col("doc_id") % 4 =!= 1).select("doc_id")
    val filtered = InvertedIndex.bm25SearchStoreWhere(spark, dir, terms,
        15, allowed)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(filtered.forall(_._1 % 4 != 1), "a disallowed doc ranked")
    assert(filtered.size == 15)
    // the Lucene stance: corpus-level stats, so the filtered top-k IS
    // the unconstrained ranking restricted to allowed docs — weights
    // bit-identical, membership the only difference
    val full = InvertedIndex.bm25SearchStore(spark, dir, terms, 100000)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(filtered ==
      full.filter(_._1 % 4 != 1).sortBy { case (id, s) => (-s, id) }
        .take(15).toSeq)
    // an all-pass filter is the unfiltered search, row for row
    val allPass = InvertedIndex.bm25SearchStoreWhere(spark, dir, terms,
        15, docs.select("doc_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val plain = InvertedIndex.bm25SearchStore(spark, dir, terms, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(allPass == plain)
  }

  // --- positional postings / phrase search (q145 machinery) ---

  test("phrase search: positional intersection, overlapping and repeated-token phrases, across a batch split") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c"), // "a b" x2, "a b c" x2
      (2L, "a c b a"),     // both terms present, never adjacent
      (3L, "b a b a b"),   // "a b" x2; repeated-token "b a b" OVERLAPS: starts 0 and 2
      (4L, "x y z a"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
    val dir = java.nio.file.Files.createTempDirectory("graft-phrase-").toString
    InvertedIndex.appendBatch(docs.filter(col("doc_id") <= 2),
      "doc_id", "tk", bucketSize = 2, batchId = 0L, path = dir)
    InvertedIndex.appendBatch(docs.filter(col("doc_id") >= 3),
      "doc_id", "tk", bucketSize = 2, batchId = 1L, path = dir)
    def hits(terms: String*): Seq[(Long, Long)] =
      InvertedIndex.phraseSearchStore(spark, dir, terms)
        .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(hits("a", "b") === Seq((1L, 2L), (3L, 2L)))
    assert(hits("a", "b", "c") === Seq((1L, 2L)))
    assert(hits("b", "a", "b") === Seq((3L, 2L))) // overlapping starts 0 and 2
    assert(hits("a", "c") === Seq((2L, 1L)))
    assert(hits("z", "q").isEmpty) // one term absent from the corpus
    assertThrows[IllegalArgumentException] {
      InvertedIndex.phraseSearchStore(spark, dir, Seq("a"))
    }
  }

  // --- generational store + compaction (q143 machinery) ---

  test("compaction: serving identical pre/post, fragments collapse, CAS retry no-ops, sealed batch ids refused, admissions append on top") {
    val root = java.nio.file.Files.createTempDirectory("graft-compact-")
      .toString + "/istore"
    val terms = Seq("join", "vector", "stream", "window")
    InvertedIndex.initStore(root)
    InvertedIndex.admitBatch(spark, tokenized.filter(col("doc_id") % 10 < 5),
      "doc_id", "tk", 7L, batchId = 0L, root = root)
    InvertedIndex.admitBatch(spark,
      tokenized.filter(col("doc_id") % 10 >= 5 && col("doc_id") % 10 < 8),
      "doc_id", "tk", 7L, batchId = 1L, root = root)
    InvertedIndex.admitBatch(spark, tokenized.filter(col("doc_id") % 10 === 8),
      "doc_id", "tk", 7L, batchId = 2L, root = root)
    def lookupRows() = InvertedIndex.lookupCurrent(spark, root, terms)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2).toList))
    def bm25Rows() = InvertedIndex.bm25SearchCurrent(spark, root, terms, 15)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    assert(InvertedIndex.fragmentCount(spark, root) === 3L)
    val (preL, preB) = (lookupRows(), bm25Rows())
    assert(InvertedIndex.compactStore(spark, root, expectedGen = 1L) === 2L)
    assert(InvertedIndex.currentGen(root) === 2L)
    assert(InvertedIndex.fragmentCount(spark, root) === 1L)
    assert(lookupRows() === preL, "compaction changed the lookup surface")
    assert(bm25Rows() === preB, "compaction changed BM25 scores")
    // CAS: stale expectedGen no-ops (returns the published gen, no gen=3)
    assert(InvertedIndex.compactStore(spark, root, expectedGen = 1L) === 2L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "gen=3")))
    // the retry barrier: compacted batch ids are sealed
    val sealedErr = intercept[IllegalArgumentException] {
      InvertedIndex.admitBatch(spark, tokenized.filter(col("doc_id") % 10 === 9),
        "doc_id", "tk", 7L, batchId = 2L, root = root)
    }
    assert(sealedErr.getMessage.contains("compact"))
    // admissions append ON TOP: the merged fragment + the new batch
    InvertedIndex.admitBatch(spark, tokenized.filter(col("doc_id") % 10 === 9),
      "doc_id", "tk", 7L, batchId = 3L, root = root)
    assert(InvertedIndex.fragmentCount(spark, root) === 2L)
    // ... and the final store serves the WHOLE corpus exactly like the
    // flat two-batch store of the same corpus
    val flat = java.nio.file.Files.createTempDirectory("graft-compact-flat-").toString
    admitAll(flat)
    val flatB = InvertedIndex.bm25SearchStore(spark, flat, terms, 15)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    assert(bm25Rows() === flatB)
    // race fence: an admit whose pointer read predates a compaction throws
    val staleErr = intercept[IllegalStateException] {
      InvertedIndex.admitBatchAt(spark,
        tokenized.filter(col("doc_id") % 10 === 9),
        "doc_id", "tk", 7L, batchId = 9L, root = root, gen = 1L)
    }
    assert(staleErr.getMessage.contains("raced a compaction"))
  }
}
