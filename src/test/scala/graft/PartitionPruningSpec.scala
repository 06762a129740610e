package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned-layout behaviors that only matter at scale: static
  * partition pruning (the directory-level analogue of the reference's
  * row-group skipping) and dynamic partition pruning for star joins.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writePartitioned(): String = {
    val dir = Files.createTempDirectory("graft-part").toString + "/li"
    Tables.load(spark, TestSpark.sf0001, "lineitem")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    dir
  }

  test("static partition pruning: filter on the partition column prunes directories") {
    val dir = writePartitioned()
    val df = spark.read.parquet(dir).filter(col("l_returnflag") === "A")
      .select("l_orderkey")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan.take(2000))
    // partition column never appears in the data-read schema
    assert(!plan.contains("ReadSchema: struct<l_orderkey:bigint,l_returnflag"))
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val dir = writePartitioned()
    import spark.implicits._
    // at test scale the cost model sees no benefit in pruning a 6k-row
    // fact; force the decision the way a real star join would get it
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "1000")
    // The dim predicate is on a non-join column, so it cannot be pushed
    // statically through the join — only DPP can prune fact partitions,
    // at runtime, from the broadcast dim's values. The dim must be
    // file-backed: DPP does not trigger for LocalRelation dims.
    val fact = spark.read.parquet(dir)
    val dimDir = Files.createTempDirectory("graft-dim").toString + "/dim"
    Seq(("A", 1), ("N", 2), ("R", 3)).toDF("flag", "grp").write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("grp") === 1)
    val joined = fact.join(broadcast(dim), fact("l_returnflag") === dim("flag"))
      .agg(count(lit(1)))
    try {
      val planned = joined.queryExecution.executedPlan.toString
      assert(planned.toLowerCase.contains("dynamicpruning")
        || joined.queryExecution.optimizedPlan.toString.toLowerCase.contains("dynamicpruning"),
        planned.take(3000))
      assert(joined.head().getLong(0) > 0)
    } finally {
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    }
  }
}
