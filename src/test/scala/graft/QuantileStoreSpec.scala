package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QuantileStore

/** The mergeable quantile store's estimator mechanics (q158 gates the
  * lifecycle end-to-end against DuckDB): integer-rank exactness on
  * integral domains, the one-bin-width bound on coarse bins, merge
  * insensitivity to batch split, clamping, and the seal fence.
  */
class QuantileStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Qs = Seq(("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p95", 19, 20))

  /** The definition the store implements: value at integer rank
    * ceil(n * num/den) of the sorted multiset.
    */
  private def exactRank(values: Seq[Double], num: Int, den: Int): Double = {
    val sorted = values.sorted
    val rank = (values.size.toLong * num + den - 1) / den
    sorted((rank - 1).toInt)
  }

  test("unit bins on an integral domain: store quantiles ARE the exact order statistics") {
    // skewed multiset with ties and a heavy mode — the awkward shape
    val vals: Seq[Double] = (1 to 60).map(_.toDouble) ++
      Seq.fill(40)(7.0) ++ Seq.fill(25)(42.0) ++ Seq(1.0, 60.0, 60.0)
    val root = Files.createTempDirectory("graft-qstore").toString + "/s"
    QuantileStore.initStore(root)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "k", v) }
      .toDF("id", "k", "v")
    (0 to 2).foreach { b =>
      QuantileStore.admitBatch(spark, df.filter(pmod(col("id"), lit(3)) === b),
        Seq("k"), "v", lo = 1.0, width = 1.0, nbins = 60, batchId = b.toLong,
        root = root)
    }
    val got = QuantileStore.quantilesCurrent(spark, root, Seq("k"), Qs,
      lo = 1.0, width = 1.0).as[(String, Double, Double, Double, Double)].head()
    val want = ("k", exactRank(vals, 1, 4), exactRank(vals, 1, 2),
      exactRank(vals, 3, 4), exactRank(vals, 19, 20))
    assert(got == want)
  }

  test("merge is split-insensitive and compaction is lossless: 1 batch == 3 batches == compacted") {
    val df = spark.range(1000).select(col("id"),
      (pmod(xxhash64(col("id")), lit(97L)) + 1).cast("double").as("v"),
      concat(lit("g"), pmod(col("id"), lit(3))).as("k"))
    def build(tag: String, splits: Int): String = {
      val root = Files.createTempDirectory(s"graft-qstore-$tag").toString + "/s"
      QuantileStore.initStore(root)
      (0 until splits).foreach { b =>
        QuantileStore.admitBatch(spark,
          df.filter(pmod(col("id"), lit(splits)) === b),
          Seq("k"), "v", lo = 1.0, width = 1.0, nbins = 97,
          batchId = b.toLong, root = root)
      }
      root
    }
    def answers(root: String): Seq[String] =
      QuantileStore.quantilesCurrent(spark, root, Seq("k"), Qs, 1.0, 1.0)
        .collect().map(_.toString).sorted.toSeq
    val (one, three) = (build("one", 1), build("three", 3))
    assert(answers(one) == answers(three))
    QuantileStore.compactStore(spark, three, expectedGen = 1L, Seq("k"))
    assert(QuantileStore.fragmentCount(spark, three) == 1L)
    assert(answers(three) == answers(one), "compaction must be lossless")
    // the seal refuses replays of compacted batches
    assertThrows[IllegalArgumentException] {
      QuantileStore.admitBatch(spark, df.limit(10), Seq("k"), "v",
        1.0, 1.0, 97, batchId = 2L, root = three)
    }
  }

  test("coarse bins: estimate within one bin width below the exact statistic; out-of-range clamps to edges") {
    val vals = (1 to 500).map(_ * 0.37 + 3.0)
    val root = Files.createTempDirectory("graft-qstore-coarse").toString + "/s"
    QuantileStore.initStore(root)
    QuantileStore.admitBatch(spark,
      vals.zipWithIndex.map { case (v, i) => (i.toLong, "k", v) }.toDF("id", "k", "v"),
      Seq("k"), "v", lo = 0.0, width = 10.0, nbins = 20, batchId = 0L, root = root)
    val got = QuantileStore.quantilesCurrent(spark, root, Seq("k"), Qs, 0.0, 10.0)
      .as[(String, Double, Double, Double, Double)].head()
    Seq((got._2, (1, 4)), (got._3, (1, 2)), (got._4, (3, 4)), (got._5, (19, 20)))
      .foreach { case (est, (num, den)) =>
        val exact = exactRank(vals, num, den)
        assert(est <= exact && exact < est + 10.0,
          s"q=$num/$den: est $est not within one bin width below exact $exact")
      }
    // values beyond the range land in the edge bins: the store answers
    // with range endpoints rather than inventing values
    val root2 = Files.createTempDirectory("graft-qstore-clamp").toString + "/s"
    QuantileStore.initStore(root2)
    QuantileStore.admitBatch(spark,
      Seq((0L, "k", -50.0), (1L, "k", 5.0), (2L, "k", 999.0)).toDF("id", "k", "v"),
      Seq("k"), "v", lo = 0.0, width = 1.0, nbins = 10, batchId = 0L, root = root2)
    val c = QuantileStore.quantilesCurrent(spark, root2, Seq("k"),
        Seq(("qlo", 1, 100), ("qhi", 99, 100)), 0.0, 1.0)
      .as[(String, Double, Double)].head()
    assert(c._2 == 0.0 && c._3 == 9.0)
  }

  test("HDR bins: relative-error contract holds across five orders of magnitude where fixed bins clamp") {
    // heavy tail: magnitudes 1..100000, dense low end, sparse top —
    // the domain shape (file sizes, token counts) fixed-range bins
    // cannot cover without either clamping or absurd bin counts
    val vals: Seq[Long] = (1L to 200L) ++ (1L to 50L).map(_ * 97L) ++
      (1L to 20L).map(_ * 4831L) ++ Seq(100000L, 99999L, 12345L, 1L, 0L)
    val subBits = 4
    val root = Files.createTempDirectory("graft-qstore-hdr").toString + "/s"
    QuantileStore.initStore(root)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "k", v) }
      .toDF("id", "k", "v")
    (0 to 2).foreach { b =>
      QuantileStore.admitBatchHdr(spark, df.filter(pmod(col("id"), lit(3)) === b),
        Seq("k"), "v", subBits, nbins = 2048, batchId = b.toLong, root = root)
    }
    def quants() = QuantileStore.quantilesCurrentHdr(spark, root, Seq("k"),
      Qs, subBits).as[(String, Long, Long, Long, Long)].head()
    val got = quants()
    Seq((got._2, (1, 4)), (got._3, (1, 2)), (got._4, (3, 4)), (got._5, (19, 20)))
      .foreach { case (est, (num, den)) =>
        val exact = exactRank(vals.map(_.toDouble), num, den)
        assert(est <= exact && exact < est * (1.0 + math.pow(2, -subBits)) + 1,
          s"q=$num/$den: est $est violates the relative bound around exact $exact")
      }
    // lossless compaction: bit-identical answers, seal fence intact
    QuantileStore.compactStore(spark, root, expectedGen = 1L, Seq("k"))
    assert(quants() == got, "HDR compaction must be lossless")
    assertThrows[IllegalArgumentException] {
      QuantileStore.admitBatchHdr(spark, df.limit(5), Seq("k"), "v",
        subBits, 2048, batchId = 2L, root = root)
    }
    // the linear unit-bin region (v < 2^(subBits+1)) is EXACT
    val small = (0L to 31L) ++ (0L to 31L)
    val root2 = Files.createTempDirectory("graft-qstore-hdr-lin").toString + "/s"
    QuantileStore.initStore(root2)
    QuantileStore.admitBatchHdr(spark,
      small.zipWithIndex.map { case (v, i) => (i.toLong, "k", v) }.toDF("id", "k", "v"),
      Seq("k"), "v", subBits, nbins = 2048, batchId = 0L, root = root2)
    val lin = QuantileStore.quantilesCurrentHdr(spark, root2, Seq("k"), Qs, subBits)
      .as[(String, Long, Long, Long, Long)].head()
    assert((lin._2.toDouble, lin._3.toDouble, lin._4.toDouble, lin._5.toDouble) ==
      (exactRank(small.map(_.toDouble), 1, 4), exactRank(small.map(_.toDouble), 1, 2),
        exactRank(small.map(_.toDouble), 3, 4), exactRank(small.map(_.toDouble), 19, 20)))
  }

  test("exact retraction (both bin modes): == store without the batch; over-retraction refused loudly") {
    // counts form a group, so retraction is the negated fragment —
    // q166 gates the fixed-range lifecycle against DuckDB; this pins
    // the HDR mode and the equivalence/fence mechanics at unit scale
    val keep: Seq[Long] = (1L to 300L).map(i => (i * 7919L) % 100000L)
    val gone: Seq[Long] = (1L to 120L).map(i => (i * 104729L) % 100000L)
    def df(vs: Seq[Long]) = vs.zipWithIndex
      .map { case (v, i) => (i.toLong, "k", v) }.toDF("id", "k", "v")
    val subBits = 4
    val root = Files.createTempDirectory("graft-qretract").toString + "/s"
    val fresh = Files.createTempDirectory("graft-qretract-fresh").toString + "/s"
    QuantileStore.initStore(root)
    QuantileStore.admitBatchHdr(spark, df(keep), Seq("k"), "v", subBits,
      nbins = 2048, batchId = 0L, root = root)
    QuantileStore.admitBatchHdr(spark, df(gone), Seq("k"), "v", subBits,
      nbins = 2048, batchId = 1L, root = root)
    QuantileStore.retractBatchHdr(spark, df(gone), Seq("k"), "v", subBits,
      nbins = 2048, batchId = 2L, root = root)
    QuantileStore.initStore(fresh)
    QuantileStore.admitBatchHdr(spark, df(keep), Seq("k"), "v", subBits,
      nbins = 2048, batchId = 0L, root = fresh)
    def quants(r: String) = QuantileStore
      .quantilesCurrentHdr(spark, r, Seq("k"), Qs, subBits)
      .as[(String, Long, Long, Long, Long)].head()
    val want = quants(fresh)
    assert(quants(root) == want, "pending retraction != store without the batch")
    // compaction: answers bit-identical, fully-retracted cells purged
    QuantileStore.compactStore(spark, root, expectedGen = 1L, Seq("k"))
    QuantileStore.compactStore(spark, fresh, expectedGen = 1L, Seq("k"))
    assert(quants(root) == want, "compaction changed retracted answers")
    val rootRows = spark.read.parquet(s"$root/gen=2").drop("batch_id")
    val freshRows = spark.read.parquet(s"$fresh/gen=2").drop("batch_id")
    assert(graft.operators.Checks.multisetEq(rootRows, freshRows),
      "compacted cells differ from the store built without the batch")
    // a compacted retraction must not replay (it would subtract twice)
    assertThrows[IllegalArgumentException] {
      QuantileStore.retractBatchHdr(spark, df(gone), Seq("k"), "v", subBits,
        nbins = 2048, batchId = 2L, root = root)
    }
    // over-retraction: compaction refuses to publish, readers keep gen 1
    val over = Files.createTempDirectory("graft-qretract-over").toString + "/s"
    QuantileStore.initStore(over)
    QuantileStore.admitBatch(spark, df(keep), Seq("k"), "v",
      lo = 0.0, width = 1.0, nbins = 2048, batchId = 0L, root = over)
    QuantileStore.retractBatch(spark, df(keep ++ gone), Seq("k"), "v",
      lo = 0.0, width = 1.0, nbins = 2048, batchId = 1L, root = over)
    val e = intercept[IllegalArgumentException] {
      QuantileStore.compactStore(spark, over, expectedGen = 1L, Seq("k"))
    }
    assert(e.getMessage.contains("NOT published"))
    assert(graft.operators.GenStore.currentGen(over) == 1L,
      "a failed compaction must not move the pointer")
  }
}
