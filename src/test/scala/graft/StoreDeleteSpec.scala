package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.{InvertedIndex, Similarity, VectorStore}

/** DELETION/TAKEDOWN across the admission-store family (the q161
  * machinery): pending delete sets excluded on every read, applied
  * physically at compaction, carried across a refit — and always equal
  * to a from-scratch store built without the deleted documents.
  */
class StoreDeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- inverted index ------------------------------------------------------

  private def tokenized: DataFrame =
    Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))

  private val terms = Seq("join", "vector", "stream", "window")
  private val phrase = Seq("window", "join")
  private def deletedPred = col("doc_id") % 7 === 3

  /** Every read surface of an index store, collected eagerly. */
  private def surfaces(root: String): (Seq[Any], Seq[Any], Seq[Any]) = (
    InvertedIndex.lookupCurrent(spark, root, terms)
      .orderBy("tok").collect().toSeq,
    InvertedIndex.bm25SearchCurrent(spark, root, terms, 15)
      .collect().toSeq,
    InvertedIndex.phraseSearchCurrent(spark, root, phrase)
      .collect().toSeq)

  private def freshIndexStore(tag: String, docs: DataFrame): String = {
    val root = Files.createTempDirectory(s"graft-del-$tag").toString + "/istore"
    InvertedIndex.initStore(root)
    InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 10 < 5),
      "doc_id", "tk", 7L, batchId = 0L, root = root)
    InvertedIndex.admitBatch(spark, docs.filter(col("doc_id") % 10 >= 5),
      "doc_id", "tk", 7L, batchId = 1L, root = root)
    root
  }

  test("index takedown: pending reads, then physical compaction, equal a store built without the docs") {
    val root = freshIndexStore("idx", tokenized)
    val clean = freshIndexStore("idx-clean", tokenized.filter(!deletedPred))
    val want = surfaces(clean)
    InvertedIndex.admitDeleteBatch(spark,
      tokenized.filter(deletedPred).select("doc_id"), "doc_id", 0L, root)
    // PENDING: every read surface — lookup (postings + n_docs), BM25
    // (N, avgdl, df all shrink exactly), phrase — equals the clean store
    assert(surfaces(root) === want, "pending-delete reads diverge from clean store")
    // a REPLAYED delete batch is a no-op, as is deleting unknown ids
    InvertedIndex.admitDeleteBatch(spark,
      tokenized.filter(deletedPred).select("doc_id"), "doc_id", 0L, root)
    InvertedIndex.admitDeleteBatch(spark,
      Seq(999999999L).toDF("doc_id"), "doc_id", 1L, root)
    assert(surfaces(root) === want, "delete replay / unknown-id delete changed reads")
    // PHYSICAL: compaction removes the rows for good — reads still
    // equal, and the compacted fragments contain no trace of the docs
    assert(InvertedIndex.compactStore(spark, root, expectedGen = 1L) === 2L)
    assert(surfaces(root) === want, "post-compaction reads diverge from clean store")
    val gen2 = InvertedIndex.genDir(root, 2L)
    val deadInPostings = spark.read.parquet(s"$gen2/postings")
      .select(explode(col("postings")).as("p")).select(col("p.doc_id").as("doc_id"))
      .filter(deletedPred).count()
    val deadInDoclens = spark.read.parquet(s"$gen2/doclens")
      .filter(deletedPred).count()
    assert(deadInPostings === 0L && deadInDoclens === 0L,
      "compaction left deleted docs in the physical fragments")
    // stats shrink exactly: the compacted stats row equals the clean
    // store's corpus stats bit for bit
    val stat = spark.read.parquet(s"$gen2/stats")
      .agg(sum("n_docs"), sum("sum_dl")).as[(Long, Long)].head()
    val cleanStat = spark.read.parquet(
        s"${InvertedIndex.genDir(clean, 1L)}/stats")
      .agg(sum("n_docs"), sum("sum_dl")).as[(Long, Long)].head()
    assert(stat === cleanStat, "compacted stats differ from the clean store's")
    // the compacted generation starts with no pending set
    assert(!Files.exists(java.nio.file.Paths.get(gen2, "deletes")))
  }

  test("index takedown: a delete racing a compaction fails loudly at its pointer re-check") {
    val root = freshIndexStore("idx-race", tokenized)
    // the delete's pointer read (gen 1) predates a compaction publish;
    // its post-write re-check must throw, never lose the delete silently
    InvertedIndex.compactStore(spark, root, expectedGen = 1L)
    val e = intercept[IllegalStateException] {
      InvertedIndex.admitDeleteBatchAt(spark, Seq(1L).toDF("doc_id"),
        "doc_id", 5L, root, gen = 1L)
    }
    assert(e.getMessage.contains("raced a compaction"))
    // a delete admitted inside the compaction window is swept through
    // as PENDING in the published generation
    val root2 = freshIndexStore("idx-race2", tokenized)
    InvertedIndex.compactStoreHooked(spark, root2, expectedGen = 1L, () =>
      InvertedIndex.admitDeleteBatch(spark,
        tokenized.filter(deletedPred).select("doc_id"), "doc_id", 0L, root2))
    assert(InvertedIndex.currentGen(root2) === 2L)
    val clean = freshIndexStore("idx-race2-clean", tokenized.filter(!deletedPred))
    assert(surfaces(root2) === surfaces(clean),
      "a delete admitted mid-compaction was lost")
  }

  // ---- vector store --------------------------------------------------------

  private def corpus(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(col("id").as("vec_id"),
      array((0 until 16).map(j =>
        ((pmod(xxhash64(col("id"), lit(j)), lit(2001L)) - 1000L) / 1000.0)
          .cast("double")): _*).as("embedding"))

  private val Fit = (8, 2, 8, 16, 2) // nlist, kmIters, m, kcode, pqIters

  /** Exhaustive-probe search: nprobe covers every cell and the
    * shortlist covers the corpus, so the exact-cosine re-rank makes the
    * result INDEX-INDEPENDENT — comparable across stores and refits.
    */
  private def searchAll(root: String, q: DataFrame, tier: String): Seq[(Long, Long, Long)] =
    VectorStore.search(spark, root, q, "vec_id", "embedding", k = 5,
        nprobe = Fit._1, shortlistFactor = 1000, tier = tier)
      .select(col("query_id"), col("rank").cast("long"), col("neighbor_id"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  private def freshVecStore(tag: String, batches: Seq[DataFrame],
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]]): String = {
    val root = Files.createTempDirectory(s"graft-del-$tag").toString + "/vstore"
    VectorStore.init(spark, root, cents, books)
    batches.zipWithIndex.foreach { case (df, i) =>
      VectorStore.admit(spark, root, df, "vec_id", "embedding", i.toLong)
    }
    root
  }

  test("vector takedown: search excludes pending deletes, survives compaction AND refit, equals a clean store") {
    val all = corpus(0, 300)
    val (nlist, km, m, kc, pq) = Fit
    val (c, b) = Similarity.fitIvfPq(all, "vec_id", "embedding", nlist, km, m, kc, pq)
    val dead = all.filter(col("vec_id") % 5 === 2).select("vec_id")
    val q = corpus(0, 8)
    // same index artifact on both stores, so equality is exact even
    // before the exhaustive-probe re-rank argument
    val root = freshVecStore("vec", Seq(
      all.filter(col("vec_id") % 2 === 0), all.filter(col("vec_id") % 2 === 1)), c, b)
    val clean = freshVecStore("vec-clean", Seq(
      all.filter(col("vec_id") % 5 =!= 2)), c, b)
    VectorStore.admitDeletes(spark, root, dead, "vec_id", batchId = 0L)
    val wantPq = searchAll(clean, q, "pq")
    val wantSq = searchAll(clean, q, "sq")
    assert(searchAll(root, q, "pq") === wantPq, "pq-tier pending-delete search diverges")
    assert(searchAll(root, q, "sq") === wantSq, "sq-tier pending-delete search diverges")
    // replay is a no-op
    VectorStore.admitDeletes(spark, root, dead, "vec_id", batchId = 0L)
    assert(searchAll(root, q, "pq") === wantPq)
    // COMPACTION applies the set physically: rows gone from the coded
    // fragments, no pending set in the new generation, serving equal
    assert(VectorStore.compactGen(spark, root, expectedGen = 1L) === 2L)
    assert(searchAll(root, q, "pq") === wantPq, "post-compaction search diverges")
    val deadLeft = spark.read.parquet(VectorStore.codedDir(root, 2L))
      .filter(col("cid") % 5 === 2).count()
    assert(deadLeft === 0L, "compaction left deleted vectors in the coded fragments")
    assert(!Files.exists(java.nio.file.Paths.get(root, "gen=2", "deletes")))
    // REFIT with a still-pending set: delete before refit, then refit —
    // the pending set rides into the new generation and keeps serving
    VectorStore.admitDeletes(spark, root,
      all.filter(col("vec_id") % 5 === 4).select("vec_id"), "vec_id", batchId = 1L)
    VectorStore.refit(spark, root, expectedGen = 2L, nlist, km, m, kc, pq)
    assert(VectorStore.currentGen(root) === 3L)
    val survivors = searchAll(root, q, "pq")
    val served = survivors.map(_._3).toSet
    assert(!served.exists(id => id % 5 == 2 || id % 5 == 4),
      "deleted vectors served after refit")
    // and the store's own corpus reconstruction excludes them too
    val ids = VectorStore.vectors(spark, root, "vec_id", "embedding")
      .select("vec_id").as[Long].collect().toSet
    assert(!ids.exists(id => id % 5 == 2 || id % 5 == 4))
  }

  test("vector takedown: transitional search excludes deletes from both generations") {
    val all = corpus(0, 200)
    val (nlist, km, m, kc, pq) = Fit
    val (c, b) = Similarity.fitIvfPq(all, "vec_id", "embedding", nlist, km, m, kc, pq)
    val root = freshVecStore("vec-trans", Seq(
      all.filter(col("vec_id") % 2 === 0), all.filter(col("vec_id") % 2 === 1)), c, b)
    VectorStore.admitDeletes(spark, root,
      all.filter(col("vec_id") % 4 === 1).select("vec_id"), "vec_id", batchId = 0L)
    // mid-migration: gen 2 exists with only batch 0 migrated
    val g2 = VectorStore.refitStart(spark, root, 1L, nlist, km, m, kc, pq)
    VectorStore.migrateBatch(spark, root, 1L, g2, 0L)
    val served = VectorStore.searchTransitional(spark, root, 1L, g2,
        corpus(0, 8), "vec_id", "embedding", k = 5,
        nprobe = nlist, shortlistFactor = 1000)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!served.exists(_ % 4 == 1), "transitional search served deleted vectors")
  }
}
