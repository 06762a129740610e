package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, VectorStore}

/** Generation-versioned vector store: the refit actuator's
  * compare-and-swap/retry semantics, the drift predicate, and the
  * two-generation transitional serve path (q128 gates the end-to-end
  * equality against the DuckDB oracle; these pin the store mechanics).
  */
class VectorStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Fit = (16, 2, 8, 16, 2) // nlist, kmIters, m, kcode, pqIters

  /** Deterministic synthetic corpus: ids [lo, hi), 16-dim hash-derived
    * components — same recipe as the BenchTune ANN probes.
    */
  private def corpus(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(col("id").as("vec_id"),
      array((0 until 16).map(j =>
        ((pmod(xxhash64(col("id"), lit(j)), lit(2001L)) - 1000L) / 1000.0)
          .cast("double")): _*).as("embedding"))

  private def freshStore(tag: String, batches: Seq[DataFrame]): String = {
    val root = Files.createTempDirectory(s"graft-vstore-$tag").toString + "/s"
    val (nlist, km, m, kc, pq) = Fit
    val (c, b) = Similarity.fitIvfPq(batches.head, "vec_id", "embedding",
      nlist, km, m, kc, pq)
    VectorStore.init(spark, root, c, b)
    batches.zipWithIndex.foreach { case (df, i) =>
      VectorStore.admit(spark, root, df, "vec_id", "embedding", i.toLong)
    }
    root
  }

  private def doRefit(root: String, expected: Long): Long = {
    val (nlist, km, m, kc, pq) = Fit
    VectorStore.refit(spark, root, expected, nlist, km, m, kc, pq)
  }

  test("refit is compare-and-swap: stale expectedGen no-ops, retry after success no-ops") {
    val root = freshStore("cas", Seq(corpus(0, 300), corpus(300, 400)))
    assert(VectorStore.currentGen(root) === 1L)
    // stale guard: a refit planned against a generation that is not
    // current must do nothing at all
    assert(doRefit(root, expected = 7L) === 1L)
    assert(!Files.exists(java.nio.file.Paths.get(root, "gen=2")))
    // real refit publishes gen 2 with every batch migrated
    assert(doRefit(root, expected = 1L) === 2L)
    assert(VectorStore.currentGen(root) === 2L)
    assert(VectorStore.migratedBatchIds(spark, root, 2L) === Seq(0L, 1L))
    // the retry of the SAME planned refit (expectedGen=1) is a no-op:
    // returns the published generation, creates no gen 3
    assert(doRefit(root, expected = 1L) === 2L)
    assert(!Files.exists(java.nio.file.Paths.get(root, "gen=3")))
  }

  test("refitFinish refuses to publish a partial migration") {
    val root = freshStore("guard", Seq(corpus(0, 300), corpus(300, 400)))
    val (nlist, km, m, kc, pq) = Fit
    val g2 = VectorStore.refitStart(spark, root, 1L, nlist, km, m, kc, pq)
    assert(g2 === 2L)
    VectorStore.migrateBatch(spark, root, 1L, 2L, 0L) // batch 1 NOT migrated
    val e = intercept[IllegalArgumentException] {
      VectorStore.refitFinish(spark, root, 2L)
    }
    assert(e.getMessage.contains("not migrated"))
    assert(VectorStore.currentGen(root) === 1L) // pointer never moved
    // completing the migration publishes cleanly — the crash-retry path
    VectorStore.migrateBatch(spark, root, 1L, 2L, 1L)
    VectorStore.refitFinish(spark, root, 2L)
    assert(VectorStore.currentGen(root) === 2L)
  }

  test("drift predicate: fires on an off-distribution batch, not on in-distribution replay") {
    // batch 0 = fit distribution; batch 1 = same recipe (in-dist);
    // batch 2 = one-hot axis vectors the smooth hash-cloud never
    // produces — genuinely off the fitted centroid/codebook geometry
    val inDist = corpus(400, 500)
    val oneHot = spark.range(0, 100).select((col("id") + 1000L).as("vec_id"),
      array((0 until 16).map(j =>
        when(pmod(col("id"), lit(16)) === j, lit(1.0)).otherwise(lit(0.0))): _*)
        .as("embedding"))
    val root = freshStore("drift", Seq(corpus(0, 400), inDist))
    assert(!VectorStore.needsRefit(spark, root, tolerance = 1.5),
      "in-distribution admission must not trigger a refit")
    VectorStore.admit(spark, root, oneHot, "vec_id", "embedding", 2L)
    assert(VectorStore.needsRefit(spark, root, tolerance = 1.5),
      "off-distribution admission must trigger the refit predicate")
    // ... and the actuator consumes it: post-refit, the store-wide
    // latest-batch error drops back under the trigger (the new fit saw
    // the one-hot vectors)
    doRefit(root, expected = 1L)
    assert(!VectorStore.needsRefit(spark, root, tolerance = 1.5),
      "a refit must clear the drift trigger it was fired by")
  }

  test("transitional search: endpoints equal the single-generation searches; recall survives mid-migration") {
    // clone fixture (the q124 pattern): every vector has an exact clone
    // 10_000 ids away, clones split across the two batches
    val base = corpus(0, 200)
    val clones = base.select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val all = base.unionByName(clones)
    val b0 = all.filter(col("vec_id") % 2 === 0)
    val b1 = all.filter(col("vec_id") % 2 === 1)
    val root = freshStore("trans", Seq(b0, b1))
    val q = all.filter(col("vec_id") < 20)
    def rows(df: DataFrame): Seq[(Long, Long, Long)] =
      df.select("query_id", "rank", "neighbor_id")
        .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val g1 = rows(VectorStore.searchGen(spark, root, 1L, q,
      "vec_id", "embedding", 5, nprobe = 12, shortlistFactor = 32))
    val (nlist, km, m, kc, pq) = Fit
    assert(VectorStore.refitStart(spark, root, 1L, nlist, km, m, kc, pq) === 2L)
    // zero batches migrated: transitional IS the gen-1 search, exactly
    assert(rows(VectorStore.searchTransitional(spark, root, 1L, 2L, q,
      "vec_id", "embedding", 5, nprobe = 12, shortlistFactor = 32)) === g1)
    // mid-migration (batch 0 under gen 2, batch 1 still gen 1): the
    // merged serve path must still put every query's exact clone at
    // rank 1 with cos 1 — no recall downtime while the store migrates
    VectorStore.migrateBatch(spark, root, 1L, 2L, 0L)
    val mid = VectorStore.searchTransitional(spark, root, 1L, 2L, q,
      "vec_id", "embedding", 5, nprobe = 12, shortlistFactor = 32)
    val top1 = mid.filter(col("rank") === 1)
      .select("query_id", "neighbor_id", "cos").collect()
    assert(top1.length === 20)
    top1.foreach { r =>
      val (qid, nid) = (r.getLong(0), r.getLong(1))
      assert(nid === (if (qid >= 10000L) qid - 10000L else qid + 10000L),
        s"query $qid lost its exact clone mid-migration")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    }
    // all batches migrated: transitional IS the gen-2 search, exactly
    VectorStore.migrateBatch(spark, root, 1L, 2L, 1L)
    val g2full = rows(VectorStore.searchGen(spark, root, 2L, q,
      "vec_id", "embedding", 5, nprobe = 12, shortlistFactor = 32))
    assert(rows(VectorStore.searchTransitional(spark, root, 1L, 2L, q,
      "vec_id", "embedding", 5, nprobe = 12, shortlistFactor = 32)) === g2full)
    // and the cutover serves the same thing through the pointer
    VectorStore.refitFinish(spark, root, 2L)
    assert(rows(VectorStore.search(spark, root, q,
      "vec_id", "embedding", 5, nprobe = 12, shortlistFactor = 32)) === g2full)
  }

  test("admit-vs-refit race: a batch admitted after the migration listing fails the publish loudly, then lands in both generations") {
    val root = freshStore("race1", Seq(corpus(0, 300), corpus(300, 400)))
    val (nlist, km, m, kc, pq) = Fit
    assert(VectorStore.refitStart(spark, root, 1L, nlist, km, m, kc, pq) === 2L)
    VectorStore.migrateBatch(spark, root, 1L, 2L, 0L)
    VectorStore.migrateBatch(spark, root, 1L, 2L, 1L)
    // the racing admission: pointer still reads 1, so this succeeds and
    // lands in gen 1 — AFTER the refit's migration work already ran
    VectorStore.admit(spark, root, corpus(400, 450), "vec_id", "embedding", 2L)
    // publish must now refuse: the re-list at publish time sees batch 2
    val e = intercept[IllegalArgumentException] {
      VectorStore.refitFinish(spark, root, 2L)
    }
    assert(e.getMessage.contains("not migrated"))
    assert(VectorStore.currentGen(root) === 1L)
    // the documented repair: migrate the straggler, retry the publish —
    // the admitted batch is in BOTH generations, never lost
    VectorStore.migrateBatch(spark, root, 1L, 2L, 2L)
    VectorStore.refitFinish(spark, root, 2L)
    assert(VectorStore.currentGen(root) === 2L)
    assert(VectorStore.migratedBatchIds(spark, root, 2L) === Seq(0L, 1L, 2L))
  }

  test("admit-vs-refit race: an admit whose pointer read predates the publish throws, and a re-admit lands in the new generation") {
    val root = freshStore("race2", Seq(corpus(0, 300), corpus(300, 400)))
    val staleGen = VectorStore.currentGen(root) // the racing admit's read
    assert(doRefit(root, expected = 1L) === 2L) // refit publishes first
    // the admit's write now lands in superseded gen 1 and the post-write
    // pointer re-check must fail loudly — never a silent vanish
    val e = intercept[IllegalStateException] {
      VectorStore.admitAt(spark, root, corpus(400, 450),
        "vec_id", "embedding", 2L, asOfGen = staleGen)
    }
    assert(e.getMessage.contains("raced a refit"))
    // the orphan write sits in dead gen 1; the current generation does
    // not serve it until the caller re-admits properly
    assert(VectorStore.migratedBatchIds(spark, root, 2L) === Seq(0L, 1L))
    VectorStore.admit(spark, root, corpus(400, 450), "vec_id", "embedding", 2L)
    assert(VectorStore.migratedBatchIds(spark, root, 2L) === Seq(0L, 1L, 2L))
  }

  test("sq tier: store search == inline IVF-SQ, survives compaction and refit; pq-only frame fails loudly") {
    val root = freshStore("sqtier", Seq(corpus(0, 200), corpus(200, 400)))
    val q = corpus(0, 5)
    def rows(df: DataFrame): Seq[String] =
      df.select("query_id", "rank", "neighbor_id", "cos")
        .collect().map(_.toString).sorted.toSeq
    val (cents, _) = VectorStore.loadGenIndex(spark, root, 1L)
    val inline = rows(Similarity.ivfSqSearch(q, corpus(0, 400),
      "vec_id", "embedding", 5, cents,
      nprobe = 12, nassign = 2, shortlistFactor = 4))
    val store = rows(VectorStore.search(spark, root, q,
      "vec_id", "embedding", 5, nprobe = 12, shortlistFactor = 4,
      tier = "sq"))
    assert(store == inline,
      "store SQ tier must equal the from-scratch inline IVF-SQ search")
    // layout-only compaction preserves the sq column: serving identical
    VectorStore.compactGen(spark, root, expectedGen = 1L)
    assert(rows(VectorStore.search(spark, root, q, "vec_id", "embedding", 5,
      nprobe = 12, shortlistFactor = 4, tier = "sq")) == store)
    // refit re-encodes both tiers against the new generation's index:
    // the migrated store must equal a fresh inline SQ search under the
    // NEW centroids (not the old result — the geometry changed)
    val g = doRefit(root, expected = 2L)
    val (nc, _) = VectorStore.loadGenIndex(spark, root, g)
    assert(rows(VectorStore.search(spark, root, q, "vec_id", "embedding", 5,
        nprobe = 12, shortlistFactor = 4, tier = "sq")) ==
      rows(Similarity.ivfSqSearch(q, corpus(0, 400), "vec_id", "embedding", 5,
        nc, nprobe = 12, nassign = 2, shortlistFactor = 4)))
    // a frame without the sq column must fail at analysis, not serve
    // degraded results (the pre-SQ8-store contract)
    val (c1, b1) = VectorStore.loadGenIndex(spark, root, g)
    val pqOnly = spark.read.parquet(VectorStore.codedDir(root, g))
      .select("cid", "cv", "cell", "codes")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      Similarity.searchCodedFrame(pqOnly, q, "vec_id", "embedding", 5,
        c1, b1, nprobe = 12, shortlistFactor = 4, tier = "sq").collect()
    }
    assertThrows[IllegalArgumentException] {
      Similarity.searchCodedFrame(pqOnly, q, "vec_id", "embedding", 5,
        c1, b1, tier = "flat")
    }
  }

  test("compaction: serving row-identical, seal survives a later refit, stale-pointer admit fence holds") {
    // interleavings q150 can't express: compaction then refit (the seal
    // must ride into the refitted generation), and the admit whose
    // pointer read predates the compaction's publish
    val root = freshStore("compact", Seq(corpus(0, 200), corpus(200, 300),
      corpus(300, 400)))
    val q = corpus(0, 10)
    def rows(): Seq[String] = VectorStore.search(spark, root, q,
        "vec_id", "embedding", 5, nprobe = 12, shortlistFactor = 32)
      .collect().map(_.toString).toSeq
    val pre = rows()
    val staleGen = VectorStore.currentGen(root)
    assert(VectorStore.compactGen(spark, root, expectedGen = 1L) === 2L)
    assert(VectorStore.migratedBatchIds(spark, root, 2L) === Seq(2L))
    assert(rows() === pre, "compaction changed the serving surface")
    // stale-pointer admit: wrote into dead gen 1, must throw, and a
    // proper re-admit (above the seal) lands in gen 2
    val raceErr = intercept[IllegalStateException] {
      VectorStore.admitAt(spark, root, corpus(400, 450),
        "vec_id", "embedding", 3L, asOfGen = staleGen)
    }
    assert(raceErr.getMessage.contains("raced a refit"))
    VectorStore.admit(spark, root, corpus(400, 450), "vec_id", "embedding", 3L)
    assert(VectorStore.migratedBatchIds(spark, root, 2L) === Seq(2L, 3L))
    // a replay of a compacted id is refused IN THE CURRENT generation...
    val sealedErr = intercept[IllegalArgumentException] {
      VectorStore.admit(spark, root, corpus(0, 200), "vec_id", "embedding", 1L)
    }
    assert(sealedErr.getMessage.contains("compact"))
    // ...and STILL refused after a refit publishes gen 3 (the seal rides
    // along — a per-batch overwrite there would replace a migrated
    // fragment that carries merged pre-compaction history)
    assert(doRefit(root, expected = 2L) === 3L)
    assert(VectorStore.migratedBatchIds(spark, root, 3L) === Seq(2L, 3L))
    val sealedAfterRefit = intercept[IllegalArgumentException] {
      VectorStore.admit(spark, root, corpus(0, 200), "vec_id", "embedding", 0L)
    }
    assert(sealedAfterRefit.getMessage.contains("compact"))
    // new ids above the seal admit normally
    VectorStore.admit(spark, root, corpus(450, 500), "vec_id", "embedding", 4L)
    assert(VectorStore.migratedBatchIds(spark, root, 3L) === Seq(2L, 3L, 4L))
  }

  test("filtered ANN: containment exact, all-allowed equals unfiltered, pending takedown excluded even when allowed") {
    val all = corpus(0, 400)
    val root = freshStore("filt", Seq(all))
    val q = corpus(0, 5)
    // containment: a pre-filter can never return a disallowed neighbor
    val allowed = all.filter(col("vec_id") % 3 === 0).select("vec_id")
    val got = VectorStore.searchWhere(spark, root, q, "vec_id",
      "embedding", 5, allowed, nprobe = 8, shortlistFactor = 16)
    assert(got.join(allowed.withColumnRenamed("vec_id", "neighbor_id"),
      Seq("neighbor_id"), "left_anti").count() == 0L,
      "every returned neighbor must satisfy the filter")
    assert(got.groupBy("query_id").count().collect()
      .forall(_.getLong(1) == 5L), "k results per query")
    // an all-pass filter is the unfiltered search, row for row
    val everything = all.select("vec_id")
    val unfiltered = VectorStore.search(spark, root, q, "vec_id",
      "embedding", 5, nprobe = 8, shortlistFactor = 16)
    assert(VectorStore.searchWhere(spark, root, q, "vec_id", "embedding",
        5, everything, nprobe = 8, shortlistFactor = 16)
        .collect().toSeq.sortBy(_.toString) ==
      unfiltered.collect().toSeq.sortBy(_.toString))
    // a pending takedown wins over the filter: deleted-and-allowed
    // never serves (exact self-match makes vec 0 its own top hit)
    import spark.implicits._
    VectorStore.admitDeletes(spark, root,
      Seq(0L).toDF("vec_id"), "vec_id", 0L)
    val afterDel = VectorStore.searchWhere(spark, root, q, "vec_id",
      "embedding", 5, everything, nprobe = 8, shortlistFactor = 16)
    assert(afterDel.filter(col("neighbor_id") === 0L).count() == 0L,
      "a pending takedown must be excluded even when the filter allows it")
  }

  test("generation vacuum drops superseded generations, never the current one") {
    val root = freshStore("vacuum", Seq(corpus(0, 300), corpus(300, 400)))
    val q = corpus(0, 5)
    assert(doRefit(root, expected = 1L) === 2L)
    assert(VectorStore.listGenerations(root) === Seq(1L, 2L))
    val current = VectorStore.search(spark, root, q,
        "vec_id", "embedding", 5, nprobe = 12, shortlistFactor = 32)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(_.toString).toSeq
    assert(VectorStore.vacuumGenerations(root, keepLast = 1) === Seq(1L))
    assert(VectorStore.listGenerations(root) === Seq(2L))
    // gen-1 readers now fail loudly (the index artifact is gone)...
    assertThrows[Exception] {
      VectorStore.searchGen(spark, root, 1L, q,
        "vec_id", "embedding", 5).collect()
    }
    // ...while the current generation is byte-unaffected
    val after = VectorStore.search(spark, root, q,
        "vec_id", "embedding", 5, nprobe = 12, shortlistFactor = 32)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(_.toString).toSeq
    assert(after === current)
    // idempotent once the window is satisfied; keepLast=0 is refused
    assert(VectorStore.vacuumGenerations(root, keepLast = 1).isEmpty)
    assertThrows[IllegalArgumentException] {
      VectorStore.vacuumGenerations(root, keepLast = 0)
    }
  }
}
