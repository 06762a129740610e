package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Corpus QA profiling: per-column null/distinct/min/max statistics in
  * long format — the "is this snapshot sane" pass a curation pipeline
  * runs after every rebuild (the data-level complement of the
  * file-level `graft.Inspect`).
  *
  * Scale shape: ONE aggregation pass over the scan produces every
  * statistic (a single row), then a narrow `stack` unpivots it to one
  * row per column — no per-column jobs, no second scan. With
  * `exact = true` the distinct counts use COUNT(DISTINCT x), which
  * Spark plans through an Expand that multiplies the scanned rows by
  * the number of distinct aggregates — fine for a handful of columns,
  * wrong for very wide profiles; the default uses HyperLogLog++
  * (`approx_count_distinct`, 2% rsd) and keeps the pass strictly
  * linear at any width.
  */
object Profile {

  /** Long-format stats (column, n_rows, n_nulls, n_distinct, min_value,
    * max_value) for `cols`; min/max are cast to double for numeric
    * columns and null otherwise (cross-type min/max has no portable
    * representation). Ordered by column name.
    */
  def summarize(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty && cols.forall(df.columns.contains),
      s"unknown columns: ${cols.filterNot(df.columns.contains).mkString(", ")}")
    val numeric = df.schema.fields.map(f =>
      f.name -> f.dataType.isInstanceOf[NumericType]).toMap
    def distinctOf(c: String): Column =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c), 0.02)
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        distinctOf(c).as(s"__nd_$c")) ++
        (if (numeric(c))
          Seq(min(col(c)).cast("double").as(s"__min_$c"),
            max(col(c)).cast("double").as(s"__max_$c"))
        else
          Seq(lit(null).cast("double").as(s"__min_$c"),
            lit(null).cast("double").as(s"__max_$c")))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.flatMap(c => Seq(
      s"'$c'", s"`__nulls_$c`", s"`__nd_$c`", s"`__min_$c`", s"`__max_$c`"))
    one.selectExpr("__n",
      s"stack(${cols.size}, ${stackArgs.mkString(", ")}) AS " +
        "(column, n_nulls, n_distinct, min_value, max_value)")
      .select(col("column"), col("__n").as("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
      .orderBy(col("column"))
  }
}
