package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity-resolution joins by bounded edit distance — matching noisy
  * surface forms (OCR'd titles, typo'd names, crawl-mangled URLs)
  * against a reference list, a standard step when linking curated
  * metadata onto a scraped corpus.
  *
  * Scale contract, stated rather than implied: edit distance is not
  * equi-joinable, so the probe side MUST be broadcast-small (a
  * reference list, not a second corpus) — the plan is a broadcast
  * nested-loop join over the corpus scan, i.e. narrow per-row work.
  * The operator refuses a non-broadcastable probe side instead of
  * silently planning a cartesian shuffle. Large-large fuzzy matching
  * belongs to the LSH family ([[Dedup.minHashNearDupPairs]] on
  * character shingles), not to this operator.
  *
  * The length-difference prefilter (`abs(len(a) - len(b)) <= maxDist`,
  * a lower bound on edit distance) short-circuits most candidates
  * before the DP kernel runs; Spark's `levenshtein(l, r, threshold)`
  * form also abandons the DP early past the bound.
  */
object FuzzyJoin {

  /** Rows of `corpus` matched to rows of `probe` wherever
    * `levenshtein(corpus[textCol], probe[probeCol]) <= maxDist`.
    * Output: all corpus columns + probe columns + `edit_dist`.
    */
  def byEditDistance(
      corpus: DataFrame, probe: DataFrame,
      textCol: String, probeCol: String,
      maxDist: Int, maxProbeRows: Long = 100000): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val nProbe = probe.count()
    require(nProbe <= maxProbeRows,
      s"fuzzy join probe side has $nProbe rows > maxProbeRows=$maxProbeRows: " +
        "edit distance is not equi-joinable, so the probe side must stay " +
        "broadcast-small. For large-large fuzzy matching use the LSH path " +
        "(Dedup.minHashNearDupPairs over character shingles).")
    val d = levenshtein(col(textCol), col(probeCol), maxDist)
    corpus.join(broadcast(probe),
        abs(length(col(textCol)) - length(col(probeCol))) <= maxDist &&
          d >= 0 && d <= maxDist)
      .withColumn("edit_dist", d.cast("long"))
  }
}
