package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training: assign every document a position
  * in a stream of fixed-size context windows ("concatenate-then-slice", the
  * standard GPT-style packing). Documents are concatenated in a
  * deterministic order inside each shard; the stream is cut every `budget`
  * tokens; each document reports the bin its first token lands in and its
  * offset inside that bin.
  *
  * Scale design: the only wide operation is ONE running-sum window
  * partitioned by the shard column — no global sort, no driver loop. At
  * 100 TB the shard column is a hash-derived file shard (e.g.
  * `pmod(xxhash64(doc_id), 10_000)`), so each window partition is bounded
  * and partitions pack independently and in parallel. True bin-*perfect*
  * first-fit packing is inherently sequential; concatenate-then-slice is
  * what large pipelines actually run because it is one pass, deterministic,
  * and wastes no tokens (documents straddle bin boundaries instead of
  * leaving tail padding).
  *
  * The reference engine has no notion of training-data layout (its scope
  * list, /root/reference/README.md:127-138); north-star extension.
  */
object Packing {

  /** Adds `bin` (which context window the document starts in) and
    * `bin_offset` (token offset of the document inside that bin), both
    * BIGINT, from a running token sum per `shardCol` ordered by
    * `orderCol`. `sizeCol` must be non-negative; `budget` > 0;
    * `orderCol` must be UNIQUE within each shard — the concatenation
    * order (and therefore every start offset) is defined by it. The
    * frame is ROWS, not the default RANGE, so a violated uniqueness
    * precondition degrades to an arbitrary order among the tied rows
    * rather than silently double-counting all peers at the tied key.
    */
  def packByBudget(
      df: DataFrame, shardCol: String, orderCol: String, sizeCol: String,
      budget: Long, binCol: String = "bin",
      offsetCol: String = "bin_offset"): DataFrame = {
    require(budget > 0, "packByBudget needs a positive token budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = (sum(col(sizeCol)).over(w) - col(sizeCol)).cast("long")
    df.withColumn("__pack_start", start)
      .withColumn(binCol, expr(s"__pack_start div $budget"))
      .withColumn(offsetCol, expr(s"__pack_start % $budget"))
      .drop("__pack_start")
  }
}
