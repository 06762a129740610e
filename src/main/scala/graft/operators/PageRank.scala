package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in exact integer arithmetic — link-graph
  * centrality for corpus curation (rank domains/pages before sampling a
  * web crawl, weight citation graphs, score entity graphs).
  *
  * Determinism: ranks are held in integer micro-units (1e6 = rank 1.0)
  * and every update is integer multiply / floor-divide / sum, so the
  * result is independent of partitioning, aggregation order, and engine —
  * a DuckDB oracle reproduces it bit-for-bit, which floating-point
  * PageRank cannot (double sums reorder). The standard damping update,
  *   r'(v) = 0.15 + 0.85 * sum_{u->v} r(u)/deg(u),
  * becomes  r'(v) = 150000 + (85 * sum_{u->v} (r(u) div deg(u))) div 100.
  * Dangling nodes keep the base term only (their mass is not
  * redistributed — the common simplification in distributed
  * implementations; document-curation ranking only needs the ordering).
  *
  * Scale design: each iteration is one hash join (ranks x edges, both
  * pre-partitioned on the same key, so the exchange is reused across
  * iterations) plus one map-side-combined groupBy on dst. Iterations are
  * a fixed small count (ranking stabilizes in ~10); lineage is truncated
  * with localCheckpoint every few rounds, the same discipline as
  * [[Components]].
  *
  * The reference has no iterative/graph surface (its scope list,
  * /root/reference/README.md:127-138); north-star extension.
  */
object PageRank {

  private val Base = 1000000L // rank 1.0 in micro-units

  /** Integer PageRank over `edges` (columns `src`, `dst`) for every node
    * in `nodes` (column `node`). Returns (node, rank) with rank BIGINT in
    * micro-units after `iters` damped iterations from a uniform start.
    */
  def run(spark: SparkSession, edges: DataFrame, nodes: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, "iters must be in [1, 50]")
    val deg = edges.groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("deg"))
    val adj = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .localCheckpoint(eager = false)

    var ranks = nodes.select(col("node"), lit(Base).as("rank"))
    var prevCp: Option[DataFrame] = None
    for (i <- 1 to iters) {
      val contribs = adj.join(ranks, adj("src") === ranks("node"))
        .select(col("dst"), expr("rank div deg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("mass"))
      ranks = nodes.join(contribs, nodes("node") === contribs("dst"), "left")
        .select(col("node"),
          (lit(Base * 15 / 100) +
            expr("85 * coalesce(mass, 0L) div 100")).as("rank"))
      // stats-free: a plain localCheckpoint's carried size estimate
      // compounds across checkpoints, and the previous checkpoint's
      // blocks are released once the new one exists (GraftBridge scaladoc)
      if (i % 5 == 0 && i < iters) {
        ranks = org.apache.spark.sql.GraftBridge
          .statsFreeLocalCheckpointReleasing(ranks, prevCp.toSeq)
        prevCp = Some(ranks)
      }
    }
    ranks
  }
}
