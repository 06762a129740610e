package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** The bucketed range join's exactness and fences (q154 gates the
  * end-to-end against DuckDB's own range join; these pin the operator
  * mechanics on adversarial fixtures).
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(points: Seq[(Long, Long)],
      ivs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (pid, p) <- points
      (iid, s, e) <- ivs
      if p >= s && p <= e
    } yield (pid, iid)).toSet

  test("pointInInterval == the naive cross check, any bucket width, boundaries inclusive") {
    // intervals overlapping, nested, touching bucket edges, negative
    // coordinates, single-point intervals
    val ivs = Seq((1L, 0L, 100L), (2L, 50L, 60L), (3L, 99L, 250L),
      (4L, -75L, -25L), (5L, 200L, 200L), (6L, -10L, 10L))
    val pts = Seq((10L, 0L), (11L, 50L), (12L, 60L), (13L, 100L),
      (14L, 101L), (15L, 200L), (16L, -50L), (17L, -10L), (18L, 999L),
      (19L, 250L))
    val expect = naive(pts, ivs)
    for (bw <- Seq(7L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(
          pts.toDF("pid", "p"), ivs.toDF("iid", "s", "e"),
          "p", "s", "e", bucketWidth = bw)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == expect, s"bucketWidth=$bw")
    }
  }

  test("an interval spanning many buckets matches each point exactly once") {
    val ivs = Seq((1L, 0L, 1000L)).toDF("iid", "s", "e")
    val pts = (0L to 1000L by 50L).map(p => (p, p)).toDF("pid", "p")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e",
        bucketWidth = 10L)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(got.size == 21, "no duplicate pairs from multi-bucket intervals")
    assert(got.map(_._1).distinct.size == 21)
  }

  test("wide intervals route to the broadcast term; the count fence still trips; empty intervals are refused") {
    val pts = Seq((1L, 5L)).toDF("pid", "p")
    val wide = Seq((1L, 0L, 1000000L)).toDF("iid", "s", "e")
    // a degenerate 100k-bucket interval used to fail loudly; it now
    // ANSWERS through the broadcast predicate term
    val got = RangeJoin.pointInInterval(pts, wide, "p", "s", "e",
        bucketWidth = 10L, maxIntervalBuckets = 100L)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L)))
    // ... behind a COUNT fence: too many wide rows is a misconfigured
    // bucket width, not a broadcast candidate
    val err = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, wide, "p", "s", "e",
        bucketWidth = 10L, maxIntervalBuckets = 100L, maxWideIntervals = 0L)
    }
    assert(err.getMessage.contains("RangeJoin"))
    val empty = Seq((1L, 10L, 5L)).toDF("iid", "s", "e")
    assertThrows[Exception] {
      RangeJoin.pointInInterval(pts, empty, "p", "s", "e",
        bucketWidth = 10L).collect()
    }
    // clashing column names are refused eagerly
    assertThrows[IllegalArgumentException] {
      RangeJoin.pointInInterval(Seq((1L, 2L)).toDF("x", "p"),
        Seq((1L, 0L, 9L)).toDF("x", "s", "e"), "p", "s", "e", 10L)
    }
  }

  test("mixed narrow + year-long intervals: routed union equals the nested-loop reference") {
    // a year of hourly points against maintenance windows, three of
    // which are YEAR-LONG (the degenerate rows that used to throw)
    val pts = (0L until 8760L).map(h => (h, h * 3600000L)).toDF("pid", "p")
    val year = 365L * 24 * 3600000L
    val ivs = ((1L to 200L).map(i =>
        (i, i * 40000000L, i * 40000000L + 7200000L)) ++
      Seq((901L, 0L, year), (902L, -year, year / 2), (903L, 1000L, 2 * year)))
      .toDF("iid", "s", "e")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").as[(Long, Long)].collect().toSet
    val routed = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e",
      bucketWidth = 3600000L, maxIntervalBuckets = 100L)
    val reference = pts.join(ivs,
      col("p") >= col("s") && col("p") <= col("e"))
    assert(key(routed) == key(reference))
    assert(key(routed).size > 8760, "year-long intervals must contribute")
    // intervalOverlap with wide rows on BOTH sides, same equality
    val a = ((1L to 50L).map(i => (i, i * 500000L, i * 500000L + 60000L)) :+
      (800L, 0L, year)).toDF("aid", "as_", "ae")
    val b = ((1L to 50L).map(i => (i + 100, i * 700000L, i * 700000L + 90000L)) :+
      (900L, -100L, 2 * year)).toDF("bid", "bs", "be")
    val routedO = RangeJoin.intervalOverlap(a, b, "as_", "ae", "bs", "be",
        bucketWidth = 60000L, maxIntervalBuckets = 64L)
      .select("aid", "bid").as[(Long, Long)].collect()
    val refO = a.join(b, col("as_") <= col("be") && col("bs") <= col("ae"))
      .select("aid", "bid").as[(Long, Long)].collect()
    assert(routedO.length == routedO.toSet.size, "pair emitted twice")
    assert(routedO.toSet == refO.toSet)
  }

  test("intervalOverlap: each intersecting pair exactly once, disjoint pairs never") {
    val a = Seq((1L, 0L, 100L), (2L, 200L, 300L), (3L, -50L, -10L))
      .toDF("aid", "as_", "ae")
    val b = Seq((10L, 50L, 250L), (11L, 301L, 400L), (12L, -20L, 0L),
      (13L, 100L, 100L)).toDF("bid", "bs", "be")
    val got = RangeJoin.intervalOverlap(a, b, "as_", "ae", "bs", "be",
        bucketWidth = 30L)
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
    val expect = Set((1L, 10L), (2L, 10L), (3L, 12L), (1L, 12L), (1L, 13L))
    assert(got.toSet == expect)
    assert(got.size == expect.size, "a pair sharing k buckets emitted once, not k times")
  }

  test("a nondeterministic interval side is pinned: the fence and the join see the same rows, re-evaluations agree") {
    // rand() makes every re-computation of the interval frame a
    // different set — without the split-time pin, the wide-count fence
    // would validate different rows than the bucketed/broadcast terms
    // later join, and two evaluations of the SAME result frame would
    // disagree
    val points = spark.range(0, 2000).select(col("id").as("p"))
    val intervals = spark.range(0, 300)
      .select(col("id").as("iid"),
        (col("id") * 7).as("s"),
        (col("id") * 7 + (rand() * 4000).cast("long")).as("e"))
      .filter(rand() < 0.5)
    val res = RangeJoin.pointInInterval(points, intervals, "p", "s", "e",
      bucketWidth = 100L, maxIntervalBuckets = 10L)
    val once = res.select("p", "iid").as[(Long, Long)].collect().sorted.toSeq
    val twice = res.select("p", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(once === twice, "re-evaluating the join re-randomized the intervals")
    // and every matched pair satisfies containment against the PINNED
    // bounds it was joined on
    assert(res.filter(col("p") < col("s") || col("p") > col("e")).count() === 0L)
  }
}
