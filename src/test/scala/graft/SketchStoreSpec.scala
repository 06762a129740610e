package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SketchStore

/** Persisted sketch state: merged-from-storage estimates must track the
  * one-pass whole-data sketch no matter how the data was batched —
  * EXACTLY in the sparse/coupon regime (cardinality well under k/4,
  * where DataSketches HLL stores coupons, not registers), and within 1%
  * once dense (the union gadget's estimator may differ sub-percent from
  * the single-pass sketch; q83 documents the same scoping).
  */
class SketchStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("merging persisted batches equals the one-pass sketch for any batching") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val whole = ev.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"),
        lit(SketchStore.DefaultLgK))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (nBatches <- Seq(2, 5)) {
      val dir = Files.createTempDirectory(s"graft-sketch-$nBatches").toString
      (0 until nBatches).foreach { b =>
        SketchStore.appendBatch(
          ev.filter(pmod(col("event_id"), lit(nBatches)) === b),
          Seq("event_type"), "user_id", b.toLong, dir)
      }
      val merged = SketchStore.mergedEstimates(spark, dir, Seq("event_type"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(merged.map(_._1).toSet == whole.keySet)
      merged.foreach { case (k, nb, est) =>
        assert(nb == nBatches.toLong, s"$k batch count")
        if (whole(k) < 1000) // sparse/coupon regime: merge is exact
          assert(est == whole(k), s"$k: merged $est != whole ${whole(k)}")
        else
          assert(math.abs(est - whole(k)) <= whole(k) / 100,
            s"$k: merged $est drifted >1% from whole ${whole(k)}")
      }
    }
  }

  test("the merge plan scans only the stats table, never the raw data") {
    val dir = Files.createTempDirectory("graft-sketch-plan").toString
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    SketchStore.appendBatch(ev, Seq("event_type"), "user_id", 0L, dir)
    val plan = SketchStore.mergedEstimates(spark, dir, Seq("event_type"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft-sketch-plan"))
    assert(!plan.contains("events.parquet"))
  }

  test("re-appending the same batchId is a storage no-op (micro-batch retry idempotence)") {
    // foreachBatch re-executes a failed micro-batch with the SAME
    // batchId; the per-batch overwrite layout must leave the store —
    // row count AND estimates — exactly as if the batch landed once
    val dir = Files.createTempDirectory("graft-sketch-retry").toString
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    SketchStore.appendBatch(ev.filter(pmod(col("event_id"), lit(2)) === 0),
      Seq("event_type"), "user_id", 0L, dir)
    SketchStore.appendBatch(ev.filter(pmod(col("event_id"), lit(2)) === 1),
      Seq("event_type"), "user_id", 1L, dir)
    def snapshot() = SketchStore.mergedEstimates(spark, dir, Seq("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val rows0 = spark.read.parquet(dir).count()
    val est0 = snapshot()
    // replay batch 1 (same content, same id) twice
    SketchStore.appendBatch(ev.filter(pmod(col("event_id"), lit(2)) === 1),
      Seq("event_type"), "user_id", 1L, dir)
    SketchStore.appendBatch(ev.filter(pmod(col("event_id"), lit(2)) === 1),
      Seq("event_type"), "user_id", 1L, dir)
    assert(spark.read.parquet(dir).count() == rows0,
      "store must not grow under batch replay")
    assert(snapshot() == est0)
    // batch_id comes back as a discovered partition column
    assert(spark.read.parquet(dir).columns.contains("batch_id"))
  }

  test("appendBatch rejects empty key lists eagerly") {
    assertThrows[IllegalArgumentException] {
      SketchStore.appendBatch(
        Tables.load(spark, TestSpark.sf0001, "events"),
        Seq.empty, "user_id", 0L, "/tmp/never-written")
    }
  }

  test("rebuildKeys: affected keys equal a from-scratch store on survivors; others carry bit-for-bit") {
    import spark.implicits._
    import graft.operators.GenStore
    val root = Files.createTempDirectory("graft-sk-rebuild-").toString + "/s"
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val affected = Seq("click", "view")
    val deadPred = col("event_type").isInCollection(affected) &&
      col("user_id") % 10 === 3
    SketchStore.initStore(root)
    (0L to 1L).foreach { b =>
      SketchStore.admitBatch(spark, ev.filter(pmod(col("event_id"), lit(2)) === b),
        Seq("event_type"), "user_id", b, root)
    }
    def ests(r: String) = SketchStore.estimatesCurrent(spark, r, Seq("event_type"))
      .select("event_type", "est").collect()
      .map(x => (x.getString(0), x.getLong(1))).toMap
    val stale = ests(root)
    val survivors = ev.filter(!deadPred)
    assert(SketchStore.rebuildKeys(spark, root, expectedGen = 1L,
      Seq("event_type"), "user_id", affected.toDF("event_type"),
      survivors) === 2L)
    // CAS: a stale retry no-ops
    assert(SketchStore.rebuildKeys(spark, root, expectedGen = 1L,
      Seq("event_type"), "user_id", affected.toDF("event_type"),
      survivors) === 2L)
    val rebuilt = ests(root)
    // from-scratch twin over the surviving rows only: the AFFECTED keys
    // must match exactly (both sides one hll_sketch_agg over the same
    // multiset); carried keys keep their REGISTERS instead — a union of
    // fragment sketches is not estimate-identical to a one-pass sketch
    // at high cardinality (caught by the q176 sf0.1 gate run)
    val fresh = Files.createTempDirectory("graft-sk-fresh-").toString + "/s"
    SketchStore.initStore(fresh)
    SketchStore.admitBatch(spark, survivors, Seq("event_type"), "user_id",
      0L, fresh)
    val freshEsts = ests(fresh)
    affected.foreach(k => assert(rebuilt(k) === freshEsts(k),
      s"scoped rebuild of $k diverges from a from-scratch store on the survivors"))
    // staleness direction: the pre-rebuild store counted dead users
    affected.foreach(k => assert(stale(k) >= rebuilt(k)))
    // unaffected keys: estimates unchanged
    rebuilt.keySet.filterNot(affected.contains)
      .foreach(k => assert(rebuilt(k) === stale(k)))
    // the rebuilt generation serves through the pointer and admits on top
    SketchStore.admitBatch(spark, ev.limit(50), Seq("event_type"),
      "user_id", 5L, root)
    assert(GenStore.currentGen(root) === 2L)
  }
}
