package graft.operators

import org.apache.spark.sql.DataFrame
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
}
