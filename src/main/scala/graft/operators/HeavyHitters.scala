package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters: find the keys whose frequency exceeds
  * N/(m+1) in ONE pass with m counters — the vocabulary / hot-key /
  * heavy-URL detector for corpora where an exact group-by's key
  * cardinality (billions) dwarfs the interesting output (dozens).
  *
  * Why Misra-Gries and not Space-Saving: both give the same guarantee,
  * but MG summaries merge by "add counters, subtract the (m+1)-th
  * largest, drop non-positive" — the cleanly mergeable formulation
  * (Agarwal et al., "Mergeable Summaries", PODS'12) — so the partial
  * aggregation / shuffle / final merge pipeline Spark already gives an
  * [[Aggregator]] preserves the error bound with no coordination.
  * Guarantees after any merge tree:
  *  - `est <= true_count` (MG only ever undercounts);
  *  - `true_count - est <= N/(m+1)` where N is the total stream length;
  *  - therefore every key with `true_count > N/(m+1)` is IN the summary.
  *
  * At 100 TB: the only thing that crosses the shuffle is one <= m-entry
  * summary per partition (KBs), whatever the key cardinality. The
  * reference has no sketch surface at all; north-star extension beside
  * the HLL sketch store (SketchStore.scala).
  */
object HeavyHitters {

  final case class Counter(key: String, est: Long)
  final case class MGBuf(entries: Seq[Counter])

  /** The mergeable Misra-Gries summary over string keys. Linear scans of
    * the counter list are O(m) per evicting row — right for the m <= a
    * few hundred this targets; a larger-m deployment would drop to a
    * TypedImperativeAggregate over a hash-indexed array, same algebra.
    */
  final class MisraGries(m: Int) extends Aggregator[String, MGBuf, MGBuf] {
    def zero: MGBuf = MGBuf(Vector.empty)

    def reduce(b: MGBuf, k: String): MGBuf = {
      val i = b.entries.indexWhere(_.key == k)
      if (i >= 0)
        MGBuf(b.entries.updated(i, Counter(k, b.entries(i).est + 1)))
      else if (b.entries.size < m) MGBuf(b.entries :+ Counter(k, 1L))
      else // classic MG step: decrement every counter, drop zeros
        MGBuf(b.entries.collect {
          case Counter(key, c) if c > 1 => Counter(key, c - 1)
        })
    }

    def merge(a: MGBuf, b: MGBuf): MGBuf = {
      val sum = (a.entries ++ b.entries).groupBy(_.key)
        .map { case (k, cs) => Counter(k, cs.map(_.est).sum) }.toVector
      if (sum.size <= m) MGBuf(sum)
      else {
        // subtract the (m+1)-th largest count from all, keep positives:
        // the merge that keeps the N/(m+1) bound additive across parts
        val cut = sum.map(_.est).sorted(Ordering[Long].reverse)(m)
        MGBuf(sum.collect {
          case Counter(k, c) if c > cut => Counter(k, c - cut)
        })
      }
    }

    def finish(r: MGBuf): MGBuf = r
    def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  }

  /** One-pass summary of `keyCol`: up to m `(key, est)` rows. Every key
    * with true frequency > N/(m+1) is present; `est` undercounts by at
    * most N/(m+1). Null keys are excluded (they are absence, not a key).
    */
  def summarize(df: DataFrame, keyCol: String, m: Int): DataFrame = {
    require(m > 0, "heavy-hitter summary needs at least one counter")
    val mg = udaf(new MisraGries(m), Encoders.STRING)
    df.select(col(keyCol).cast("string").as("k"))
      .filter(col("k").isNotNull)
      .agg(mg(col("k")).as("mg"))
      .select(explode(col("mg.entries")).as("e"))
      .select(col("e.key").as("key"), col("e.est").as("est"))
  }
}
