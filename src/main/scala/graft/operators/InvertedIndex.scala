package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed inverted index (posting lists) for corpus-scale retrieval.
  *
  * A flat `term -> [doc_id...]` index breaks at web scale: a stop-word-like
  * term can appear in billions of documents, so a single posting row would
  * hold an unbounded array and its reducer becomes the straggler. The
  * standard fix (e.g. the sharded posting layout in Lucene/Anserini-style
  * batch indexers) is to key posting lists by `(term, doc_id div B)`: every
  * posting row then holds at most `B` ids, high-df terms simply span more
  * buckets, and the build is ONE shuffle on the composite key with map-side
  * pre-aggregation. Because buckets partition the doc-id space into
  * disjoint, ordered ranges, a term lookup re-assembles the globally sorted
  * posting list by concatenating its buckets in bucket order — no re-sort
  * of the ids themselves.
  *
  * The reference engine has no retrieval-index surface at all (its scope
  * list, /root/reference/README.md:129-138); north-star extension.
  */
object InvertedIndex {

  /** Builds the bucketed index from `(doc_id: long, tok: string)` posting
    * rows (one row per token occurrence; duplicates collapse here).
    * Output: `(tok, bucket, n_docs, postings)` with `bucket = doc_id div
    * bucketSize` and `postings` the sorted distinct doc ids of that
    * bucket — each array bounded by `bucketSize` regardless of document
    * frequency.
    */
  def build(postings: DataFrame, bucketSize: Long): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    postings
      .groupBy(col("tok"),
        expr(s"doc_id div $bucketSize").cast("long").as("bucket"))
      // n_docs is the SIZE of the deduped set, not count_distinct: pairing
      // a distinct aggregate with collect_set makes Spark plan the
      // distinct-expansion rewrite (an extra shuffle keyed on doc_id);
      // collect_set already dedups, so size() gets the same number free.
      .agg(sort_array(collect_set(col("doc_id"))).as("postings"))
      .select(col("tok"), col("bucket"),
        size(col("postings")).cast("long").as("n_docs"), col("postings"))
  }

  /** Term lookup over a bucketed index: merges each term's buckets back
    * into one globally sorted posting list. Buckets cover disjoint
    * ascending doc-id ranges, so sorting the (bucket, postings) structs by
    * bucket and flattening yields the sorted list directly; `n_docs` sums
    * exactly because buckets are disjoint. The term filter sits below the
    * merge aggregation (and is pushed below the build's group-by when the
    * two compose in one plan), so only the requested terms shuffle.
    */
  def lookup(index: DataFrame, terms: Seq[String]): DataFrame =
    index.filter(col("tok").isin(terms: _*))
      .groupBy(col("tok"))
      .agg(sum(col("n_docs")).cast("long").as("n_docs"),
        flatten(transform(
          array_sort(collect_list(struct(col("bucket"), col("postings")))),
          _.getField("postings"))).as("postings"))

  // -------------------------------------------------------------------------
  // Incremental admission: the persisted retrieval index that grows one
  // crawl batch at a time — the same batch_id=N overwrite discipline as
  // the MinHash/span/sketch/heavy-hitter/vector admission stores. Each
  // batch is tokenized and reduced ONCE (per-(doc,term) tf, per-doc
  // length, one corpus-stats row) into its own subdirectories; history is
  // never rescanned or rewritten, a retried batch overwrites itself (a
  // storage no-op), and every read — term lookup or BM25 search — touches
  // only index-sized rows (bounded posting buckets, 2-long doc-length
  // rows, 1-row-per-batch stats), never the raw corpus. Contract: a
  // doc_id is admitted by exactly ONE batch (the crawl pipeline's
  // upstream exact-dedup guarantees this), so document frequencies and
  // corpus stats sum exactly across batches.
  // -------------------------------------------------------------------------

  /** The BM25 weight (k1=1.2, b=0.75) for one (doc, term), as a SQL
    * string evaluated verbatim on BOTH engines (Spark here, DuckDB in the
    * oracle) so the IEEE evaluation order coincides; only ln() may differ
    * (≤1 ulp), absorbed by the round(..., 6) callers apply to final
    * scores.
    */
  def bm25Weight(n: String, df: String, tf: String, dl: String, avgdl: String): String =
    s"ln(1 + ($n - $df + 0.5) / ($df + 0.5)) * ($tf * 2.2) / ($tf + 1.2 * (0.25 + 0.75 * $dl / $avgdl))"

  /** Admits one batch of tokenized documents `(idCol: long, toksCol:
    * array<string>)` into the index store at `path`: posting buckets
    * (with per-doc term frequencies), doc lengths, and one additive
    * corpus-stats row, each under `batch_id=N`. One tokenize-and-reduce pass over
    * the batch — the only time this batch's text is ever touched.
    */
  def appendBatch(docs: DataFrame, idCol: String, toksCol: String,
      bucketSize: Long, batchId: Long, path: String): Unit = {
    require(bucketSize > 0, "bucketSize must be positive")
    val tf = docs.select(col(idCol).as("doc_id"), explode(col(toksCol)).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).cast("long").as("tf"))
    tf.groupBy(col("tok"),
        expr(s"doc_id div $bucketSize").cast("long").as("bucket"))
      // struct sort key is the leading doc_id field -> postings ascend by id
      .agg(sort_array(collect_list(struct(col("doc_id"), col("tf"))))
        .as("postings"))
      .select(col("tok"), col("bucket"),
        size(col("postings")).cast("long").as("n_docs"), col("postings"))
      .write.mode("overwrite").parquet(s"$path/postings/batch_id=$batchId")
    val dl = docs.select(col(idCol).as("doc_id"),
      size(col(toksCol)).cast("long").as("dl"))
    dl.write.mode("overwrite").parquet(s"$path/doclens/batch_id=$batchId")
    dl.agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("dl")).cast("long").as("sum_dl"))
      .write.mode("overwrite").parquet(s"$path/stats/batch_id=$batchId")
  }

  /** Term lookup across EVERY admitted batch, equal to [[lookup]] over a
    * fresh [[build]] of the union corpus: batches may split a (term,
    * bucket) cell, so cells merge first (flatten + sort — bounded by
    * bucketSize × batches per cell), then buckets concatenate in order
    * exactly as [[lookup]] does.
    */
  def storeLookup(spark: SparkSession, path: String, terms: Seq[String]): DataFrame =
    lookup(
      spark.read.parquet(s"$path/postings")
        .filter(col("tok").isin(terms: _*))
        .select(col("tok"), col("bucket"), col("n_docs"),
          transform(col("postings"), _.getField("doc_id")).as("ids"))
        .groupBy(col("tok"), col("bucket"))
        .agg(sum(col("n_docs")).cast("long").as("n_docs"),
          array_sort(flatten(collect_list(col("ids")))).as("postings")),
      terms)

  /** BM25 top-k over the persisted store — the textbook corpus-wide
    * score (df, N, avgdl across ALL admitted batches) computed from
    * index rows only: corpus stats from the 1-row-per-batch stats table,
    * document frequency as the exact sum of bucket sizes (doc ids are
    * unique across batches), candidate (doc, term, tf) rows from the
    * query terms' posting buckets, and lengths from the doclens table.
    * Per-doc term weights sum in the FIXED written order of `terms`
    * (coalesce(w0)+coalesce(w1)+..., the q68 discipline) — never an
    * order-free SUM over doubles — so the score is reproducible bit for
    * bit against a single-shot engine.
    */
  def bm25SearchStore(spark: SparkSession, path: String, terms: Seq[String],
      k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25SearchStore needs at least one term")
    val st = spark.read.parquet(s"$path/stats")
      .agg(sum(col("n_docs")).cast("long").as("n"),
        (sum(col("sum_dl")).cast("double") / sum(col("n_docs"))).as("avgdl"))
    val post = spark.read.parquet(s"$path/postings")
      .filter(col("tok").isin(terms: _*))
    val dfc = post.groupBy(col("tok"))
      .agg(sum(col("n_docs")).cast("long").as("df"))
    val tf = post.select(col("tok"), explode(col("postings")).as("p"))
      .select(col("tok"), col("p.doc_id").as("doc_id"), col("p.tf").as("tf"))
    val dl = spark.read.parquet(s"$path/doclens").select(col("doc_id"), col("dl"))
    val w = tf.join(broadcast(dfc), "tok").join(dl, "doc_id")
      .crossJoin(broadcast(st))
      .withColumn("w", expr(bm25Weight("n", "df", "tf", "dl", "avgdl")))
    val byTerm = terms.zipWithIndex.map { case (term, i) =>
      max(when(col("tok") === term, col("w"))).as(s"w$i")
    }
    val score = terms.indices
      .map(i => coalesce(col(s"w$i"), lit(0.0)))
      .reduceLeft(_ + _)
    w.groupBy(col("doc_id")).agg(byTerm.head, byTerm.tail: _*)
      .select(col("doc_id"), round(score, 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(k)
  }
}
