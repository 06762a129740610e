package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, InvertedIndex, KeySetStore, Similarity, VectorStore}
import graft.functions.TextFunctions

/** Scratch (round-16, not shipped): per-stage wall timing of the
  * expensive federation/lifecycle queries, replicated stage by stage
  * with the same operators — the guide §1 measure-first loop.
  * Usage: runMain graft.R16Probe <q192|q161> [sfDir]
  */
object R16Probe {
  private def tm[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val which = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("r16-probe")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    def t(name: String): DataFrame = Tables.load(s, d, name)
    val base = java.nio.file.Files.createTempDirectory(s"r16probe-$which").toString

    which match {
      case "q192" =>
        val emb = t("embeddings")
        val q = emb.filter(col("vec_id") < 10)
        val (c1, b1) = tm("fit c1 (1/3 corpus, 3 iters)") {
          Similarity.fitIvfPq(emb.filter(col("vec_id") % 3 === 0),
            "vec_id", "embedding", nlist = 16, kmeansIters = 3, m = 16,
            kcode = 16, pqIters = 2)
        }
        val (ra, rb, twin, merged) =
          (s"$base/a", s"$base/b", s"$base/twin", s"$base/merged")
        tm("init x3") { Seq(ra, rb, twin).foreach(r => VectorStore.init(s, r, c1, b1)) }
        val pa = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
        val pb = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
        tm("admit ra half") { VectorStore.admit(s, ra, pa, "vec_id", "embedding", 0L) }
        tm("admit rb half") { VectorStore.admit(s, rb, pb, "vec_id", "embedding", 0L) }
        val deadIds = emb.filter(pmod(col("vec_id"), lit(2)) === 1 &&
          col("vec_id") % 7 === 3).select("vec_id")
        tm("admitDeletes rb") { VectorStore.admitDeletes(s, rb, deadIds, "vec_id", 0L) }
        tm("mergeStores") { VectorStore.mergeStores(s, Seq(ra, rb), merged) }
        tm("admit twin half a") { VectorStore.admit(s, twin, pa, "vec_id", "embedding", 0L) }
        tm("admit twin half b") { VectorStore.admit(s, twin, pb, "vec_id", "embedding", 1L) }
        tm("admitDeletes twin") { VectorStore.admitDeletes(s, twin, deadIds, "vec_id", 0L) }
        def served(r: String) = VectorStore.search(s, r, q, "vec_id",
            "embedding", 5, nprobe = 12, shortlistFactor = 32)
          .collect().toSeq
        val pending = tm("served(merged)") { served(merged) }
        tm("served(twin)") { served(twin) }
        val (c2, b2) = tm("fit c2 (alien)") {
          Similarity.fitIvfPq(emb.filter(col("vec_id") % 3 === 1),
            "vec_id", "embedding", nlist = 16, kmeansIters = 2, m = 16,
            kcode = 16, pqIters = 2)
        }
        val alien = s"$base/alien"
        tm("init alien") { VectorStore.init(s, alien, c2, b2) }
        tm("merge refusal") {
          try { VectorStore.mergeStores(s, Seq(ra, alien), s"$base/bad") }
          catch { case _: IllegalArgumentException => () }
        }
        tm("compactGen merged") { VectorStore.compactGen(s, merged, expectedGen = 1L) }
        tm("purged gate read") {
          s.read.parquet(VectorStore.codedDir(merged, 2L))
            .join(deadIds.withColumnRenamed("vec_id", "cid"), Seq("cid"),
              "left_semi").isEmpty
        }
        tm("served(merged) post-fold") { served(merged) == pending }

      case "q161" =>
        val docs = t("documents")
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
        val root = s"$base/istore"
        val bm25Terms = Seq("join", "vector", "stream", "window")
        tm("index init") { InvertedIndex.initStore(root) }
        tm("index admit half1") {
          InvertedIndex.admitBatch(s, docs.filter(col("doc_id") % 10 < 5),
            "doc_id", "tk", 64L, batchId = 0L, root = root)
        }
        tm("index admit half2") {
          InvertedIndex.admitBatch(s, docs.filter(col("doc_id") % 10 >= 5),
            "doc_id", "tk", 64L, batchId = 1L, root = root)
        }
        val dead = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
        tm("admitDeleteBatch") { InvertedIndex.admitDeleteBatch(s, dead, "doc_id", 0L, root) }
        def bm25Rows() = InvertedIndex.bm25SearchCurrent(s, root, bm25Terms, 15)
          .collect().toSeq
        val pending = tm("bm25 #1") { bm25Rows() }
        tm("delete replay x2") {
          InvertedIndex.admitDeleteBatch(s, dead, "doc_id", 0L, root)
          import s.implicits._
          InvertedIndex.admitDeleteBatch(s,
            Seq(Long.MaxValue - 1).toDF("doc_id"), "doc_id", 1L, root)
        }
        tm("bm25 #2") { bm25Rows() == pending }
        tm("index compact") { InvertedIndex.compactStore(s, root, expectedGen = 1L) }
        tm("bm25 #3") { bm25Rows() == pending }
        val gen2 = InvertedIndex.genDir(root, 2L)
        tm("purge gate reads") {
          s.read.parquet(s"$gen2/postings")
            .select(explode(col("postings")).as("p"))
            .filter(col("p.doc_id") % 7 === 3).isEmpty &&
            s.read.parquet(s"$gen2/doclens")
              .filter(col("doc_id") % 7 === 3).isEmpty
        }
        val emb = t("embeddings")
        val (vc, vb) = tm("fitIvfPq") {
          Similarity.fitIvfPq(emb, "vec_id", "embedding",
            nlist = 16, kmeansIters = 2, m = 8, kcode = 16, pqIters = 2)
        }
        val vroot = s"$base/vstore"
        val vclean = s"$base/vclean"
        tm("vstore init+admit even") {
          VectorStore.init(s, vroot, vc, vb)
          VectorStore.admit(s, vroot, emb.filter(col("vec_id") % 2 === 0),
            "vec_id", "embedding", 0L)
        }
        tm("vstore admit odd") {
          VectorStore.admit(s, vroot, emb.filter(col("vec_id") % 2 === 1),
            "vec_id", "embedding", 1L)
        }
        tm("vclean init+admit 80pct") {
          VectorStore.init(s, vclean, vc, vb)
          VectorStore.admit(s, vclean, emb.filter(col("vec_id") % 5 =!= 2),
            "vec_id", "embedding", 0L)
        }
        tm("vstore admitDeletes") {
          VectorStore.admitDeletes(s, vroot,
            emb.filter(col("vec_id") % 5 === 2).select("vec_id"), "vec_id", 0L)
        }
        def vsearch(r: String) = VectorStore.search(s, r,
            emb.filter(col("vec_id") < 8), "vec_id", "embedding", 5,
            nprobe = 16, shortlistFactor = 1000)
          .collect().toSeq
        val vwant = tm("vsearch(vclean)") { vsearch(vclean) }
        tm("vsearch(vroot)") { vsearch(vroot) == vwant }
        tm("vstore compactGen") { VectorStore.compactGen(s, vroot, expectedGen = 1L) }
        tm("vsearch(vroot) #2 + coded read") {
          vsearch(vroot) == vwant &&
            s.read.parquet(VectorStore.codedDir(vroot, 2L))
              .filter(col("cid") % 5 === 2).isEmpty
        }
        tm("bm25 #4 (emit)") { bm25Rows() }
    }
    spark.stop()
  }
}
