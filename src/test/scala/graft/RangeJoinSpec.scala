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

  test("the replication fence trips on a degenerate interval; empty intervals are refused") {
    val pts = Seq((1L, 5L)).toDF("pid", "p")
    val wide = Seq((1L, 0L, 1000000L)).toDF("iid", "s", "e")
    val err = intercept[Exception] {
      RangeJoin.pointInInterval(pts, wide, "p", "s", "e",
        bucketWidth = 10L, maxIntervalBuckets = 100L).collect()
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
}
