package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** O11 — deterministic synthetic data generator, reproducing the
  * reference's two generator schemas (CLI generator src/cli.cpp:29-118 and
  * bench generator benches/benchmark.cpp:42-95).
  *
  * Fully distributed: `spark.range` partitions the id space, every derived
  * column is a pure hash of (id, seed) — identical output for a given
  * (rows, seed) regardless of partitioning or cluster size, and no RNG
  * state to coordinate (the property the reference gets from a single
  * mt19937 stream and we need at 1000 executors). Values are uniform in
  * the same ranges as the reference; the bit streams differ (mt19937 is
  * not a contract, the distributions are).
  */
object DataGen {

  private def u(seed: Long, salt: Int, bound: Long) =
    pmod(xxhash64(col("id"), lit(seed), lit(salt)), lit(bound))

  /** CLI generator schema (src/cli.cpp:29-62): id, value 0..10000,
    * category 1..5, region of 4, status of 3.
    */
  def cliTable(spark: SparkSession, rows: Long, seed: Long): DataFrame = {
    val regions = array(Seq("north", "south", "east", "west").map(lit): _*)
    val statuses = array(Seq("active", "pending", "closed").map(lit): _*)
    spark.range(rows).toDF("id").select(
      col("id"),
      u(seed, 1, 10001L).as("value"),
      (u(seed, 2, 5L) + 1).cast("int").as("category"),
      element_at(regions, (u(seed, 3, 4L) + 1).cast("int")).as("region"),
      element_at(statuses, (u(seed, 4, 3L) + 1).cast("int")).as("status"))
  }

  /** Bench generator schema (benches/benchmark.cpp:55-61): id,
    * value 0..100000, score 1..10, region of 8.
    */
  def benchTable(spark: SparkSession, rows: Long, seed: Long): DataFrame = {
    val regions = array(Seq("north", "south", "east", "west",
      "northeast", "northwest", "southeast", "southwest").map(lit): _*)
    spark.range(rows).toDF("id").select(
      col("id"),
      u(seed, 1, 100001L).as("value"),
      (u(seed, 2, 10L) + 1).cast("int").as("score"),
      element_at(regions, (u(seed, 3, 8L) + 1).cast("int")).as("region"))
  }

  /** Write a generated table with the reference's ENCODING choices made
    * real in the Parquet footer (SURVEY.md §1.4): writer v2 so sequential
    * ids land in DELTA_BINARY_PACKED (the reference's DELTA,
    * src/encoding.cpp:255-361 — dictionary is force-disabled for `id`,
    * where every value is distinct and a dictionary could never win) and
    * low-cardinality strings land in RLE_DICTIONARY (the reference's
    * DICTIONARY + RLE, src/encoding.cpp:364-438). ParquetFormatSpec
    * asserts these encodings from the written footer, which is what makes
    * the §1.4 subsumption claim checkable rather than asserted.
    */
  def write(df: DataFrame, out: String): Unit =
    df.write.mode("overwrite")
      .option("parquet.block.size", (10000 * 64).toString) // ~10k-row groups
      .option("parquet.writer.version", "v2")
      .option("parquet.enable.dictionary#id", "false")
      .parquet(out)

  /** `graft.DataGen <outPath> <rows> [seed] [--bench]` — mirrors the
    * reference CLI's `write <path> <rows> [seed]` (src/cli.cpp:29-118).
    * Row-group sizing via parquet.block.size replaces flushRowGroup
    * (SURVEY.md §1.5).
    */
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val rows = args(1).toLong
    val seed = if (args.length > 2 && !args(2).startsWith("--")) args(2).toLong else 42L
    val bench = args.contains("--bench")
    val spark = GraftSession.local("graft-datagen")
    val df = if (bench) benchTable(spark, rows, seed) else cliTable(spark, rows, seed)
    write(df, out)
    println(s"wrote $rows rows to $out (seed=$seed, schema=${if (bench) "bench" else "cli"})")
    spark.stop()
  }
}
