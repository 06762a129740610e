package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog: name -> Parquet table under a scale-factor directory.
  *
  * The reference's "catalog" is one file = one table
  * (`/root/reference/columnar-analytics-engine/include/format.h:86-90`); ours
  * is a directory of Parquet tables (the driver's TPC-H-ish testdata,
  * /root/repo/TESTDATA.md). Reads are plain `spark.read.parquet`, which gives
  * us the reference's footer/metadata validation (src/format.cpp:444-616) and
  * column-chunk decode (src/format.cpp:618-718) for free, hardened and
  * vectorized.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS): read as nano longs (see GraftSession's
    // nanosAsLong) and truncate to microsecond TimestampType — the same
    // ns->us truncation DuckDB applies, so oracle comparisons line up.
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view so `spark.sql` works against sfDir. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
