package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: z-order (Morton-curve) clustering.
  *
  * Parquet min/max skipping (the reference's stats-based page skipping,
  * src/execution.cpp:48-71, generalized) only prunes on columns the data
  * is clustered by. A single-column sort makes ONE column's ranges tight
  * and leaves every other column's [min,max] spanning the whole domain;
  * interleaving the bits of several columns' quantized ranks gives every
  * participating column locally-tight ranges, so a conjunctive range
  * predicate over any subset of them prunes files and row groups. This is
  * the standard lakehouse layout tool for 100 TB fact tables (z-ordering
  * as in public Delta/Iceberg implementations).
  *
  * Everything is expression-level: quantize -> interleave is a narrow
  * codegen'd map; the only wide operation is the range repartition any
  * clustered write needs.
  */
object Layout {

  private val BitsPerCol = 16

  /** Quantized rank of `c` in [lo, hi] -> [0, 2^16): linear bucketing
    * against a KNOWN range (pure expression; callers that don't know the
    * range use [[zorderValue]] which measures it in one stats pass).
    */
  private def quantize(c: Column, lo: Double, hi: Double): Column = {
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    least(lit((1 << BitsPerCol) - 1), greatest(lit(0),
      floor((c.cast("double") - lit(lo)) / lit(span) * lit(1 << BitsPerCol))))
      .cast("long")
  }

  /** Morton interleave of the columns' quantized ranks: bit i of column j
    * lands at position i*ncols + j. Pure codegen'd arithmetic, no UDF.
    */
  def zorderExpr(cols: Seq[(Column, Double, Double)]): Column = {
    require(cols.nonEmpty && cols.size * BitsPerCol <= 63,
      s"z-order supports 1..3 columns at $BitsPerCol bits")
    val qs = cols.map { case (c, lo, hi) => quantize(c, lo, hi) }
    val n = qs.size
    val terms = for {
      (q, j) <- qs.zipWithIndex
      i <- 0 until BitsPerCol
    } yield shiftleft(shiftrightunsigned(q, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ + _)
  }

  /** Z-order value with ranges measured from the data — one aggregate-only
    * pass (answerable from parquet footers via aggregate pushdown), the
    * same cost any clustering write pays for its range sampling.
    */
  def zorderValue(df: DataFrame, colNames: Seq[String]): Column = {
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"lo_$c"), max(col(c).cast("double")).as(s"hi_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    require(!r.anyNull,
      s"zorderValue needs a non-empty input with non-null values in " +
        s"${colNames.mkString(", ")} (min/max came back null)")
    zorderExpr(colNames.zipWithIndex.map { case (c, i) =>
      (col(c), r.getDouble(2 * i), r.getDouble(2 * i + 1))
    })
  }

  /** Write `df` clustered on the z-value of `colNames` into `numFiles`
    * files: range-repartition on the z-value (each file owns a contiguous
    * z-range, so each file's bounding box in every dimension is tight),
    * sort within partitions (tight ROW-GROUP stats inside each file),
    * drop the helper column. At cluster scale this is the layout job run
    * after ingest/compaction; readers need no code change — pruning comes
    * from ordinary PushedFilters against the now-selective stats.
    */
  def writeZOrdered(
      df: DataFrame, colNames: Seq[String], outPath: String, numFiles: Int): Unit =
    df.withColumn("__z", zorderValue(df, colNames))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outPath)
}
