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
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts has shipped as two physical layouts across testdata
    // generations; dispatch on the read type so both load identically:
    //  - TIMESTAMP(NANOS): arrives as nano longs (GraftSession's
    //    nanosAsLong) -> truncate to microsecond TimestampType, the same
    //    ns->us truncation DuckDB applies;
    //  - timestamp[us] (isAdjustedToUTC=false): arrives as
    //    TIMESTAMP_NTZ -> cast to TimestampType, an identity on the
    //    micros value because the session timezone is pinned to UTC.
    if (name == "events")
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    else df
  }

  /** Register every table as a temp view so `spark.sql` works against sfDir. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
