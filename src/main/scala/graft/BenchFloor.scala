package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-cost decomposition for the bench's filtered-scan shape — the
  * measurement behind README's "filtered scan floor" paragraph. Four
  * probes, interleaved round-robin so machine drift cancels, min per
  * probe (GC/scheduler jitter only adds time):
  *
  *  - job_launch_1task: a 1-task no-op job — Spark's per-query floor;
  *  - scan_skip_all: the filtered scan with a predicate the row-group
  *    stats refute (l_quantity > 100 over 1..50) — footer read +
  *    vectorized-reader setup + stats skip, ZERO data pages decoded;
  *  - unfiltered_rows: 4-column decode + InternalRow iteration;
  *  - filtered_rows: the actual bench shape (50% selective).
  *
  * The deltas between successive lines isolate (a) scan fixed cost,
  * (b) decode+iterate cost, (c) the marginal cost of predicating.
  */
object BenchFloor {
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def consumeRows(df: DataFrame): Long =
    df.queryExecution.toRdd.mapPartitions { it =>
      var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator(n)
    }.collect().sum

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("graft-bench-floor")
    ).config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.parquet.columnarReaderBatchSize", "16384")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li4 = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_linenumber", "l_returnflag")
    val one = spark.sparkContext.parallelize(Seq(1), 1)
    val probes: Seq[(String, () => Unit)] = Seq(
      "job_launch_1task" -> (() => { one.map(_ + 1).collect(); () }),
      "scan_skip_all" -> (() => { consumeRows(li4.filter(col("l_quantity") > 100)); () }),
      "unfiltered_rows" -> (() => { consumeRows(li4); () }),
      "filtered_rows" -> (() => { consumeRows(li4.filter(col("l_quantity") > 25)); () }))
    val best = scala.collection.mutable.Map[String, Double]().withDefaultValue(Double.MaxValue)
    (1 to 3).foreach(_ => probes.foreach(_._2()))
    (1 to 9).foreach { _ =>
      probes.foreach { case (n, f) => best(n) = math.min(best(n), time(f())) }
    }
    probes.foreach { case (n, _) => println(f"$n%-18s ${best(n) * 1000}%8.1f ms") }
    spark.stop()
  }
}
