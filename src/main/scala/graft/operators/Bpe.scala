package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributed BPE merge learning — the tokenizer-training half of an
  * LLM data pipeline (the counting workload GPT-2's original
  * single-machine trainer does in a Python dict, re-expressed as k
  * aggregations over the cluster).
  *
  * Classic word-level BPE: words split into character symbols; each
  * round counts adjacent symbol pairs weighted by word frequency, merges
  * the most frequent pair corpus-wide (greedy, left-to-right,
  * non-overlapping within a word), repeats.
  *
  * Scale shape: the corpus is touched ONCE (token explode -> word
  * frequency table); every subsequent round runs over the VOCABULARY
  * (unique words), which is orders of magnitude smaller and shrinks none
  * — ~word-count-bounded state per round, map-side-combined pair-count
  * aggregation, and a 1-row argmax `collect()` per round (the same
  * driver-step shape as k-means centroids — the merge decision IS
  * driver state, that collect is the algorithm, not a shortcut).
  * Lineage is cut with localCheckpoint per round so the plan does not
  * grow with the merge count.
  *
  * The reference engine has no text surface at all; this is a north-star
  * operator (SURVEY.md §2 extension inventory).
  */
object Bpe {

  /** Single character symbols of a word (unicode-safe, empties dropped —
    * Spark's split("", -1) semantics keep a trailing empty string).
    */
  private def charSyms(w: Column): Column =
    filter(split(w, ""), c => c =!= lit(""))

  /** One greedy left-to-right, non-overlapping application of the merge
    * (l, r) -> l+r to a symbol array, as a pure fold (codegen'd
    * `aggregate`, no UDF): append each symbol unless the accumulator
    * ends with `l` and the symbol is `r`, in which case replace the tail
    * with the merged symbol. A freshly-merged tail equals l+r, never a
    * bare `l` (r is non-empty), so overlapping occurrences are skipped
    * exactly like the textbook scan.
    */
  def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** BPE-encode a text column with a learned merge list: every word
    * splits to character symbols, then each merge applies in rank order
    * (the standard encoder loop). Pure Column expression — the merge
    * list folds into nested `transform`s at PLAN build time, so encoding
    * is one narrow codegen'd pass over the corpus, no UDF, no join
    * against a merge table.
    */
  def encodeExpr(text: Column, merges: Seq[(String, String)]): Column = {
    val syms = transform(TextFunctions.tokens(text), w => charSyms(w))
    merges.foldLeft(syms) { case (acc, (l, r)) =>
      transform(acc, word => applyMerge(word, l, r))
    }
  }

  /** Encoded token count of a text column under a merge list. */
  def encodedLength(text: Column, merges: Seq[(String, String)]): Column =
    aggregate(encodeExpr(text, merges), lit(0L), (a, w) => a + size(w))

  /** Word-frequency vocabulary of a corpus: (syms: array<string>, freq). */
  def vocabulary(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(charSyms(col("w")).as("syms"), col("freq"))

  /** Learn the first `numMerges` BPE merges over the corpus.
    *
    * Ties broken deterministically by (count desc, left asc, right asc)
    * — a total order, so the learned merge list is a pure function of
    * the corpus regardless of partitioning.
    *
    * Output: (rank, left, right, pair_count), rank 1-based.
    */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame =
    learnMergesBatched(docs, textCol, numMerges)._1

  /** Batched merge learning: per round, take the top of the ranked pair
    * list AND every following pair that provably commutes with it —
    * the output merge list is IDENTICAL to one-at-a-time greedy BPE,
    * but a 50k-merge vocabulary no longer costs 50k Spark jobs.
    *
    * Why the batch rule is safe (each round, over ranked pairs p1 >=
    * p2 >= ... by the total order):
    *  1. take the longest PREFIX p1..p_{k-1} whose pairs are mutually
    *     conflict-free, where accepting (l, r) claims the tokens l, r
    *     AND the created token l+r, and a pair conflicts if its l or r
    *     is any previously claimed string (first conflicting pair p_k
    *     ends the prefix). Claiming the CONCATENATION matters: merging
    *     (l, r) mints new l+r tokens, so a string-disjoint pair like
    *     (x, l+r) — possible when l+r already exists as a symbol via a
    *     different parse, e.g. "abc" from both (ab,c) and (a,bc) — can
    *     GAIN count from the merge; token-only disjointness would admit
    *     it and break the identical-to-sequential guarantee;
    *  2. truncate to pairs with count STRICTLY above c* = count(p_k)
    *     (and above the last fetched row's count, when the fetch
    *     window may have cut the list short).
    * Conflict-free pairs cannot change each other's counts (merging
    * a+b neither creates nor destroys a c-d adjacency when {a,b} and
    * {c,d} are disjoint, and no chosen pair's token equals another's
    * minted concat), so sequential greedy sees p2..p_t at exactly
    * these counts. Every pair a merge CAN change either shares a token
    * with some chosen p_j or involves p_j's minted concat l_j+r_j —
    * both conflicts — hence ranks at or after p_k (the prefix is
    * conflict-free), hence has count <= c*; new pairs created by a
    * merge, e.g. (x, ab), occur only where (x, a) did, so count(x,ab)
    * <= count(x,a) <= c*. With every chosen count > c* strict, no
    * changed or created pair can tie a chosen pair — lexicographic
    * tie-breaks never come into play — so sequential greedy picks
    * exactly p1..p_t in order. If truncation empties the batch (all
    * top counts equal c*), the round falls back to plain top-1, which
    * is trivially the sequential pick.
    *
    * The whole batch applies to the vocabulary in ONE projection
    * (applyMerge folded left-to-right — order irrelevant for disjoint
    * pairs), so each round stays one pair-count job + one narrow map,
    * and rounds shrink ~batch-fold. `maxBatch` bounds the fold depth
    * (nested codegen'd aggregates) and the driver-side fetch
    * (maxBatch+1 tiny rows — the same driver-state shape as the old
    * 1-row argmax).
    *
    * Returns (merge list, rounds executed).
    */
  def learnMergesBatched(
      docs: DataFrame, textCol: String, numMerges: Int,
      maxBatch: Int = 32): (DataFrame, Int) = {
    require(numMerges >= 1, "numMerges must be >= 1")
    require(maxBatch >= 1, "maxBatch must be >= 1")
    val spark = docs.sparkSession
    // stats-free checkpoints: vocab is re-checkpointed once per merge
    // round, and plain localCheckpoint compounds the carried size
    // estimate round over round (see GraftBridge scaladoc)
    var vocab = org.apache.spark.sql.GraftBridge.statsFreeLocalCheckpoint(
      vocabulary(docs, textCol))
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var rank = 1L
    var rounds = 0
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val remaining = (numMerges - rank + 1).toInt
      val fetch = math.min(maxBatch, remaining) + 1
      val rows = vocab.filter(size(col("syms")) >= 2)
        .select(explode(transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(
            element_at(col("syms"), i + 1).as("l"),
            element_at(col("syms"), i + 2).as("r")))).as("p"),
          col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(fetch).collect()
        .map(t => (t.getString(0), t.getString(1), t.getLong(2)))
      rounds += 1
      if (rows.isEmpty) exhausted = true
      else {
        // conflict-free prefix (tokens AND minted concats claimed — see
        // the proof above), then the strict-count truncation
        val used = scala.collection.mutable.Set.empty[String]
        var k = 0
        while (k < rows.length && !used(rows(k)._1) && !used(rows(k)._2)) {
          used += rows(k)._1; used += rows(k)._2
          used += rows(k)._1 + rows(k)._2
          k += 1
        }
        val cstar =
          if (k < rows.length) rows(k)._3 // first conflict bounds changed pairs
          else if (rows.length == fetch) rows.last._3 // window may have cut the list
          else Long.MinValue // complete, conflict-free list: take it all
        var batch = rows.take(k).takeWhile(_._3 > cstar).take(remaining)
        if (batch.isEmpty) batch = rows.take(1) // top-1 is always the greedy pick
        batch.foreach { case (l, r, cnt) =>
          merges += ((rank, l, r, cnt)); rank += 1
        }
        val merged = batch.foldLeft(col("syms")) { case (acc, (l, r, _)) =>
          applyMerge(acc, l, r)
        }
        vocab = org.apache.spark.sql.GraftBridge.statsFreeLocalCheckpointReleasing(
          vocab.select(merged.as("syms"), col("freq")),
          release = Seq(vocab))
      }
    }
    import spark.implicits._
    // the merge list is driver state — the last round's vocab checkpoint
    // has no consumer, so drop its blocks before returning
    org.apache.spark.sql.GraftBridge.releaseCheckpoint(vocab)
    (merges.result().toDF("rank", "left", "right", "pair_count"), rounds)
  }
}
