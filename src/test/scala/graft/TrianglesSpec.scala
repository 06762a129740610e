package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Triangles

/** Degree-ordered triangle counting: exactness against a brute-force
  * reference, orientation invariants, and the hub out-degree bound that
  * justifies degree ordering over id ordering.
  */
class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force reference over a small undirected edge set. */
  private def bruteTriangles(edges: Seq[(Long, Long)]): Long = {
    val und = edges.collect {
      case (a, b) if a != b => (math.min(a, b), math.max(a, b))
    }.distinct.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    (for {
      a <- nodes; b <- nodes if a < b && und((a, b))
      c <- nodes if b < c && und((b, c)) && und((a, c))
    } yield 1).size.toLong
  }

  private def runCount(edges: Seq[(Long, Long)]): (Long, Long) = {
    val r = Triangles.countTriangles(edges.toDF("src", "dst"), "src", "dst").head()
    (r.getLong(0), r.getLong(1))
  }

  test("matches brute force on a deterministic random graph") {
    // xorshift-ish deterministic edge set, dense enough for triangles
    val edges = (0 until 400).map { i =>
      val h = i * 2654435761L
      ((h % 30 + 30) % 30, (h / 31 % 30 + 30) % 30)
    }.filter(e => e._1 != e._2)
    val (_, got) = runCount(edges)
    assert(got == bruteTriangles(edges))
    assert(got > 0, "fixture premise: the random graph must contain triangles")
  }

  test("normalizes direction, duplicates and self-loops") {
    // triangle 1-2-3 written messily: reversed dup edges + a self-loop
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (2L, 2L))
    assert(runCount(edges) == ((3L, 1L)))
  }

  test("hub graph: degree orientation bounds the hub's out-degree") {
    // star hub 0 -> 1..100 plus a ring over the leaves: every leaf has
    // degree 3, the hub degree 100. Degree orientation must keep the
    // hub's edges INCOMING (out-degree 0) — id orientation would give
    // the hub out-degree 100 and put 100*99/2 wedge pairs on one key.
    val n = 100L
    val star = (1L to n).map(i => (0L, i))
    val ring = (1L until n).map(i => (i, i + 1)) :+ (n, 1L)
    val edges = (star ++ ring).toDF("src", "dst")
    val outDeg = Triangles.orientByDegree(edges, "src", "dst")
      .groupBy(col("u")).agg(count(lit(1)).as("od"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(outDeg.getOrElse(0L, 0L) == 0L,
      s"hub must source no edges, got ${outDeg.getOrElse(0L, 0L)}")
    assert(outDeg.values.max <= 3L, "leaf out-degree must stay ring-bounded")
    // and the count is still exact: each ring edge closes with the hub
    val (nEdges, nTri) = runCount(star ++ ring)
    assert(nEdges == 2 * n && nTri == n)
  }

  test("catalog q79 output is unchanged by the degree-ordering switch") {
    val r = Queries.queries("q79_triangles")(spark, TestSpark.sf0001).head()
    assert(r.getLong(0) > 0 && r.getLong(1) >= 0)
  }
}
