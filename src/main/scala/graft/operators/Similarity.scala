package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate/exact nearest-neighbor search over embedding columns.
  *
  * Two paths, per the standard scale playbook:
  *  - [[bruteForceTopK]]: exact. The (small) query set is broadcast, the
  *    corpus is scanned once (narrow), and per-query top-k is reduced with
  *    a bounded-heap Aggregator — map-side partial aggregation means only
  *    k candidates per partition per query cross the shuffle, never the
  *    full N×Q score matrix.
  *  - [[ivfTopK]]: IVF-style ANN. Corpus vectors are assigned to their
  *    nearest centroid once (broadcast centroid table, narrow map); a
  *    query probes only the `nprobe` nearest cells, cutting scan cost by
  *    ~nlist/nprobe at a small recall cost.
  *
  * The reference has no similarity surface (its own scope list,
  * /root/reference/README.md:127-138); north-star extension.
  */
object Similarity {

  case class TopItem(cos: Double, id: Long)
  case class TopKBuf(items: Seq[TopItem])

  /** Bounded top-k of (cos, id) ordered by cos desc then id asc. The
    * buffer never exceeds k items, so partial (map-side) aggregation caps
    * shuffle volume at k rows per partition per group — the idiomatic
    * distributed top-k (what TakeOrderedAndProject does globally, done
    * per group).
    */
  class TopKAgg(k: Int) extends Aggregator[TopItem, TopKBuf, TopKBuf] {
    // buffer invariant: items sorted by (cos desc, id asc), size <= k.
    // reduce is O(k) insertion into the sorted buffer (no re-sort in the
    // per-row hot path); merge is an O(k) sorted-merge.
    private def beats(a: TopItem, b: TopItem): Boolean =
      a.cos > b.cos || (a.cos == b.cos && a.id < b.id)
    def zero: TopKBuf = TopKBuf(Vector.empty)
    def reduce(b: TopKBuf, a: TopItem): TopKBuf = {
      val items = b.items
      if (items.size >= k && !beats(a, items.last)) b
      else {
        val idx = items.indexWhere(x => beats(a, x)) match {
          case -1 => items.size
          case i => i
        }
        TopKBuf((items.take(idx) :+ a) ++ items.drop(idx).take(k - idx - 1))
      }
    }
    def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
      val out = Vector.newBuilder[TopItem]
      var (i, j, n) = (0, 0, 0)
      val (xs, ys) = (x.items, y.items)
      while (n < k && (i < xs.size || j < ys.size)) {
        val takeX = j >= ys.size || (i < xs.size && beats(xs(i), ys(j)))
        if (takeX) { out += xs(i); i += 1 } else { out += ys(j); j += 1 }
        n += 1
      }
      TopKBuf(out.result())
    }
    def finish(r: TopKBuf): TopKBuf = r
    def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

  /** Per-query bounded top-k reduction of (query_id, neighbor_id, cos)
    * scores: map-side partial aggregation, then rank emission. Shared by
    * the exact and IVF paths.
    */
  private def emitTopK(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k), Encoders.product[TopItem])
    scored.groupBy(col("query_id"))
      .agg(topk(col("cos"), col("neighbor_id")).as("top"))
      .select(col("query_id"), posexplode(col("top.items")).as(Seq("pos", "item")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("item.id").as("neighbor_id"), col("item.cos").as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors. Output: (query_id, rank, neighbor_id, cos), rank 1..k,
    * ordered by cos desc with neighbor_id as the deterministic tie-break.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosine(col("qv"), col("cv")).as("cos"))
    emitTopK(scored, k)
  }

  /** IVF (inverted-file) ANN: nlist centroid cells, queries probe nprobe
    * cells. Centroids are taken deterministically from the corpus (every
    * (N/nlist)-th vector by id) — production would plug k-means centroids
    * into the same plumbing (broadcast centroids, cell-partitioned corpus,
    * cell-pruned search).
    *
    * Output: (query_id, rank, neighbor_id, cos) — approximate top-k.
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    // deterministic pseudo-random centroid sample without a corpus count
    // or global sort: order by a hash of the id (uniform over the corpus,
    // so centroids don't cluster in one ingestion-order corner) + limit,
    // which plans as TakeOrderedAndProject (per-partition nlist-heaps)
    val centroids = c.orderBy(xxhash64(col("cid")), col("cid")).limit(nlist)
      .withColumn("cell", row_number().over(Window.orderBy(col("cid"))))
      .select(col("cell"), col("cv").as("centv"))

    // nearest cell per corpus vector (narrow: centroids broadcast)
    val wc = Window.partitionBy(col("cid")).orderBy(col("d").desc, col("cell"))
    val corpusCells = c.crossJoin(broadcast(centroids))
      .withColumn("d", VectorFunctions.cosine(col("cv"), col("centv")))
      .withColumn("crk", row_number().over(wc))
      .filter(col("crk") === 1)
      .select(col("cell"), col("cid"), col("cv"))

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("d").desc, col("cell"))
    val queryCells = q.crossJoin(broadcast(centroids))
      .withColumn("d", VectorFunctions.cosine(col("qv"), col("centv")))
      .withColumn("crk", row_number().over(wq))
      .filter(col("crk") <= nprobe)
      .select(col("cell"), col("query_id"), col("qv"))

    val scored = queryCells.join(corpusCells, "cell")
      .filter(col("query_id") =!= col("cid"))
      .select(col("query_id"), col("cid").as("neighbor_id"),
        VectorFunctions.cosine(col("qv"), col("cv")).as("cos"))
    emitTopK(scored, k)
  }
}
