package graft.operators

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the dedup-group
  * former: transitive near-duplicate clusters (A~B, B~C but A!~C)
  * collapse to one canonical component labeled by the minimum member
  * id, which greedy pairwise survivor rules cannot do.
  *
  * Algorithm: tree hooking with FULL pointer compression per round —
  * the hook + shortcut structure of Shiloach & Vishkin (JACM'82) in its
  * dataframe form, same family as FastSV and Kiveris et al.'s
  * large-star/small-star rounds ("Connected Components in MapReduce and
  * Beyond", SoCC'14). Every node starts labeled with its own id; each
  * outer round
  *   1. hooks, at TREE granularity: each node computes the min of its
  *      neighbors' labels (edge join + map-side-combined min), that is
  *      aggregated again per tree root (groupBy comp), and EVERY member
  *      of the tree adopts the tree-wide minimum;
  *   2. compresses: comp <- comp[comp] repeated until idempotent — each
  *      jump is a node-table self-join, chains halve per jump, so the
  *      inner loop runs O(log chain) times (2-4 in practice).
  * Convergence argument: after compression, equal-labeled nodes are
  * trees rooted at self-labeled local-min nodes. Hooking makes every
  * tree with any smaller-labeled neighboring tree merge into one, so
  * the tree count of every not-yet-converged component at least halves
  * per round: O(log n) rounds on ANY graph shape, independent of node
  * id order and of plateau diameter. (Two rejected predecessors, both
  * measured on the --components random-id critical-regime probe: plain
  * per-node hash-min + one self-jump stalls because a plateau interior
  * passes a better label one graph-hop per round — the probe's giant
  * component was still trickling ~30 changed labels/round at round 63;
  * per-node hooking + full compression has the same interior-diameter
  * bound and stalled identically, ~250/round at round 29.)
  *
  * The driver holds only convergence flags; labels stay distributed.
  * Lineage per round is truncated with stats-free local checkpoints
  * ([[org.apache.spark.sql.GraftBridge.statsFreeLocalCheckpointReleasing]])
  * — stats-free because a plain localCheckpoint carries the origin
  * plan's estimated sizeInBytes forward, which re-enters the next
  * round's join estimate and doubles in EXPONENT per round until
  * BigInteger overflow kills round ~26; and releasing, so storage holds
  * O(1) label RDDs at any time instead of one per jump (the unreleased
  * variant OOMed the 10M-node probe around round 20).
  */
object Components {

  /** Components of the graph formed by `edges`: one output row (id,
    * comp) per distinct endpoint, comp = min node id reachable from id.
    * Deterministic for any input partitioning.
    */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 25): DataFrame =
    componentsWithRounds(edges, srcCol, dstCol, maxIters)._1

  /** Incremental component maintenance: resume from a previously
    * computed label table (columns `id`, `comp` — the output of
    * [[connectedComponents]], typically persisted between crawl
    * batches) plus a batch of NEW edges. The prior EDGE SET is never
    * rescanned: converged labels form a star forest (every node points
    * directly at its component min), so replaying them as edges
    * reconstructs exactly the prior connectivity with diameter ≤ 2, and
    * the hook+compress rounds needed are logarithmic in the NEW batch's
    * structure only — the same append-only admission shape as the gram
    * store (Dedup.appendGramStore) and the MinHash signature store.
    * Returns the same (id, comp) surface over the union of old and new
    * nodes; equals a from-scratch run over all edges ever seen
    * (oracle-checked by q112).
    */
  def incrementalComponents(
      prevLabels: DataFrame, newEdges: DataFrame,
      srcCol: String, dstCol: String, maxIters: Int = 25): DataFrame =
    incrementalWithRounds(prevLabels, newEdges, srcCol, dstCol, maxIters)._1

  private[graft] def incrementalWithRounds(
      prevLabels: DataFrame, newEdges: DataFrame,
      srcCol: String, dstCol: String, maxIters: Int = 25): (DataFrame, Int) = {
    val labelEdges = prevLabels.select(
      col("id").cast("long").as("a"), col("comp").cast("long").as("b"))
    val ne = newEdges.select(
      col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
    componentsWithRounds(labelEdges.unionByName(ne), "a", "b", maxIters)
  }

  /** `labels` plus a self-labeled singleton row for every node of
    * `nodes` absent from the label table. [[connectedComponents]] labels
    * only nodes that appear in the edge set, but dedup-group consumers
    * work over a NODE universe (every document/vector, most of which
    * have no qualifying near-dup edge at all in a real corpus) — this
    * restores the "survivors are id === comp rows" contract over that
    * universe. One left-anti hash join on id; in incremental admission
    * it is applied per batch (each batch unions ITS isolated nodes as it
    * is admitted), so history is never rescanned for the purpose.
    */
  def withSingletonComponents(
      labels: DataFrame, nodes: DataFrame, idCol: String): DataFrame =
    labels.unionByName(
      nodes.select(col(idCol).cast("long").as("id")).distinct()
        .join(labels.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("comp")))

  /** [[connectedComponents]] plus the number of hook+compress rounds
    * actually run — the observable the scale probes record (rounds ~
    * log2(plateau count) is the claim; BenchTune --components measures
    * it on a worst-case path graph, a max-skew star, and a random-id
    * critical graph).
    */
  private[graft] def componentsWithRounds(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 25): (DataFrame, Int) = {
    val e = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
    val sym = GraftBridge.statsFreeLocalCheckpoint(
      e.union(e.select(col("b").as("a"), col("a").as("b")))
        .filter(col("a").isNotNull && col("b").isNotNull)
        .distinct())
    // invariant at the top of each round: labels idempotent (comp of a
    // comp is itself) — trivially true of the self-labeled start
    var labels = GraftBridge.statsFreeLocalCheckpoint(
      sym.select(col("a").as("id")).distinct()
        .withColumn("comp", col("id")))
    var prevCp = labels
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // hook, at TREE granularity: each node's best external label
      // (min over neighbors' comps) is aggregated per tree root, and
      // every member of the tree adopts the tree-wide best — so a
      // smaller label crosses a whole plateau in ONE round, instead of
      // invading one graph-hop per round through its interior (the
      // per-node-hook variant this replaces; its convergence was
      // diameter-bound on plateau interiors and the random-graph probe
      // stalled at a few-hundred-node trickle for 60+ rounds). sym is
      // symmetric and labels are exactly sym's endpoints, so every join
      // here is inner-total; carrying the previous label makes the
      // outer convergence check a plain filter on the materialized
      // checkpoint — no extra job
      val nbrMin = sym
        .join(labels.select(col("id").as("b"), col("comp").as("nbr_comp")), "b")
        .groupBy(col("a")).agg(min(col("nbr_comp")).as("nbr_comp"))
        .select(col("a").as("id"), col("nbr_comp"))
      val rootHook = labels.join(nbrMin, "id")
        .groupBy(col("comp")).agg(min(col("nbr_comp")).as("hook"))
      var cur = GraftBridge.statsFreeLocalCheckpointReleasing(
        labels.join(rootHook, "comp")
          .select(col("id"),
            least(col("comp"), col("hook")).as("comp"),
            col("comp").as("prev")),
        release = Seq(prevCp))
      // compress: comp <- comp[comp] until idempotent. Every comp value
      // is a node id (mins over ids), so the lookup join is inner-total;
      // chains halve per jump. The 40-jump fence is unreachable (it
      // implies a pointer chain of length 2^40).
      var stable = false
      var jumps = 0
      while (!stable && jumps < 40) {
        val m = cur.select(col("id").as("jid"), col("comp").as("jcomp"))
        val jumped = GraftBridge.statsFreeLocalCheckpointReleasing(
          cur.join(m, cur("comp") === m("jid"))
            .select(cur("id"), col("jcomp").as("comp"), col("prev"),
              (col("jcomp") =!= cur("comp")).as("moved")),
          release = Seq(cur))
        stable = jumped.filter(col("moved")).limit(1).count() == 0
        cur = jumped.drop("moved")
        jumps += 1
      }
      converged = cur.filter(col("comp") =!= col("prev")).limit(1).count() == 0
      labels = cur.drop("prev")
      prevCp = cur
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIters rounds — " +
        "plateau count at least halves per round, so this indicates a " +
        "bug; raise maxIters only for graphs beyond 2^maxIters nodes")
    // the symmetric edge list is round-internal state: release it so a
    // caller chaining CC runs (incremental admission) holds only label
    // RDDs, not every run's edge copy (10M-edge probe OOMed without this)
    GraftBridge.releaseCheckpoint(sym)
    (labels, iter)
  }
}
