package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting by joins with DEGREE-ORDERED edge orientation
  * (the standard web-scale formulation, e.g. Suri & Vassilvitskii,
  * "Counting Triangles and the Curse of the Last Reducer", WWW'11).
  *
  * Each undirected edge {u,v} is oriented from the endpoint that is
  * smaller in the total order (degree(v), v) to the larger one; a
  * triangle then has exactly one wedge x->y, y->z with a closing edge
  * x->z, so a wedge join plus an edge join counts each triangle once.
  * Orienting by DEGREE (id as tie-break) instead of raw id is what makes
  * this survive power-law graphs: every vertex's out-degree is bounded
  * by O(sqrt(m)) — a degree-D hub keeps almost all its edges INCOMING,
  * so no join key ever carries the hub's full D-sized adjacency and the
  * wedge join cannot hot-spot (TrianglesSpec proves the bound on a
  * planted hub). With id ordering, a low-id hub would source D edges
  * and the wedge join would put D^2 candidate pairs on one key.
  */
object Triangles {

  /** The undirected simple edge set (a < b): direction, duplicates and
    * self-loops normalized away.
    */
  private def undirected(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") < col("b")).distinct()

  /** The degree-oriented edge list (u ≺ w in the (degree, id) total
    * order) — exposed so tests can assert the out-degree bound that
    * justifies the construction.
    */
  private[graft] def orientByDegree(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = undirected(edges, srcCol, dstCol)
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val aFirst = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
      .select(when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("w"))
  }

  /** Count triangles of the undirected simple graph spanned by the given
    * edge rows. Output: one row (n_edges, n_triangles).
    *
    * Shuffle budget: one distinct over edges, one map-side-combined
    * degree count, two (broadcastable) degree attachments, then the
    * wedge self-join and the closing-edge join — all on keys whose
    * multiplicity the degree orientation bounds by O(sqrt(m)).
    */
  def countTriangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val oriented = orientByDegree(edges, srcCol, dstCol)
    val wedges = oriented.select(col("u").as("x"), col("w").as("y"))
      .join(oriented.select(col("u").as("y"), col("w").as("z")), "y")
    val tri = wedges
      .join(oriented.select(col("u").as("x"), col("w").as("z")), Seq("x", "z"))
      .agg(count(lit(1)).cast("long").as("n_triangles"))
    undirected(edges, srcCol, dstCol)
      .agg(count(lit(1)).cast("long").as("n_edges")).crossJoin(tri)
  }
}
