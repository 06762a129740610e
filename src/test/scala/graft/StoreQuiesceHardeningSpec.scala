package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.{Dedup, GenStore, InvertedIndex, KeySetStore}

/** Round-15 hardening of the live-merge quiesce contract:
  *
  *  1. the post-write quiesce re-check
  *     ([[GenStore.requireStillNotQuiesced]]) closes the residual
  *     TOCTOU — an admission that passed its pre-check and completed
  *     its write inside the merge's copy-to-seal gap must FAIL LOUDLY
  *     (so its caller re-admits at the successor), never land silently
  *     invisible to the merged store;
  *  2. the movement fence compares file-level MANIFESTS, not batch-id
  *     sets — an idempotent re-admission overwriting an EXISTING
  *     fragment directory mid-copy leaves the id set unchanged while
  *     the copied bytes may be torn;
  *  3. [[GenStore.abortQuiesce]] un-bricks a mistyped quiesce, but only
  *     while the successor holds no completed merge.
  */
class StoreQuiesceHardeningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = Tables.load(spark, TestSpark.sf0001, "documents")
    .select(col("doc_id"), col("text"))

  private def keysOf(d: org.apache.spark.sql.DataFrame) =
    Dedup.minHashBandKeys(d, "doc_id", "text", n = 3, numHashes = 32,
      bands = 8).select("band", "bucket")

  test("a quiesce landing while an admission's write is in flight makes the ADMIT throw (post-write re-check)") {
    val base = Files.createTempDirectory("graft-toctou").toString
    val (ra, succ) = (s"$base/a", s"$base/m")
    KeySetStore.init(ra)
    KeySetStore.admitBatch(keysOf(docs.limit(40)), 0L, ra)
    // the racing interleaving: admit passes its pre-check, the quiesce
    // mark lands while the write is in flight (the hook runs after the
    // write, before the post-write fences) — the admit must throw so
    // its caller re-admits at the successor, because a merge cutting at
    // that instant may have listed the source BEFORE this fragment
    val e = intercept[IllegalStateException] {
      KeySetStore.admitBatchHooked(keysOf(docs.limit(10)), 1L, ra,
        () => GenStore.quiesce(ra, succ))
    }
    assert(e.getMessage.contains("completed after"))
    assert(e.getMessage.contains(succ))
    // the index store's front shares the seam
    val ir = s"$base/i"
    InvertedIndex.initStore(ir)
    val toks = docs.limit(20).select(col("doc_id"),
      TextFunctions.tokens(col("text")).as("tk"))
    InvertedIndex.admitBatch(spark, toks, "doc_id", "tk", 7L, 0L, ir)
    val e2 = intercept[IllegalStateException] {
      InvertedIndex.admitBatchAt(spark, toks, "doc_id", "tk", 7L, 1L, ir,
        InvertedIndex.currentGen(ir), () => GenStore.quiesce(ir, succ))
    }
    assert(e2.getMessage.contains("completed after"))
  }

  test("the movement fence catches an in-place fragment REWRITE, not just a new fragment id") {
    val base = Files.createTempDirectory("graft-manifest").toString
    val (ra, rb, m) = (s"$base/a", s"$base/b", s"$base/m")
    Seq(ra, rb).foreach(KeySetStore.init)
    KeySetStore.admitBatch(keysOf(docs.filter(col("doc_id") % 2 === 0)), 0L, ra)
    KeySetStore.admitBatch(keysOf(docs.filter(col("doc_id") % 2 === 1)), 0L, rb)
    // the interleaving the old id-set compare MISSED: a re-admission of
    // an EXISTING batch id (mode overwrite — new part-file names, same
    // id set) lands between the merge's listing and its fence
    val e = intercept[IllegalStateException] {
      GenStore.mergeFlatStoresHooked(spark, Seq(ra, rb), m, () =>
        KeySetStore.admitBatch(
          keysOf(docs.filter(col("doc_id") % 4 === 0)), 0L, ra))
    }
    assert(e.getMessage.contains("changed during the merge"))
    assert(GenStore.compactedHwm(m, 1L) == -1L,
      "a refused merge must not have sealed the target")
    // quiet retry converges
    assert(KeySetStore.mergeStores(spark, Seq(ra, rb), m) == 1L)
  }

  test("abortQuiesce restores admission before a merge, refuses after a sealed merge") {
    val base = Files.createTempDirectory("graft-abort").toString
    val (ra, rb, m) = (s"$base/a", s"$base/b", s"$base/m")
    Seq(ra, rb).foreach(KeySetStore.init)
    KeySetStore.admitBatch(keysOf(docs.filter(col("doc_id") % 2 === 0)), 0L, ra)
    KeySetStore.admitBatch(keysOf(docs.filter(col("doc_id") % 2 === 1)), 0L, rb)
    // a quiesce with a mistyped successor: abort while nothing exists
    // there, and admission resumes
    GenStore.quiesce(ra, s"$base/TYPO")
    GenStore.abortQuiesce(ra)
    assert(GenStore.quiescedSuccessor(ra).isEmpty)
    KeySetStore.admitBatch(keysOf(docs.limit(5)), 1L, ra) // no throw
    // aborting a non-quiesced store is refused
    val e0 = intercept[IllegalStateException] { GenStore.abortQuiesce(ra) }
    assert(e0.getMessage.contains("not quiesced"))
    // after a COMPLETED merge at the successor, abort is refused — the
    // fleet may already have re-pointed
    GenStore.quiesce(ra, m)
    GenStore.quiesce(rb, m)
    KeySetStore.mergeStores(spark, Seq(ra, rb), m)
    val e1 = intercept[IllegalStateException] { GenStore.abortQuiesce(ra) }
    assert(e1.getMessage.contains("COMPLETED merge"))
    assert(GenStore.quiescedSuccessor(ra) == Some(m),
      "a refused abort must leave the mark in place")
  }
}
