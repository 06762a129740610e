package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ColeQuery
import graft.operators.ColeQuery._

/** O6 parity proof: the reference's stats-based row-group skipping
  * (src/execution.cpp:48-71,101-129) is subsumed by Parquet filter
  * pushdown — assert the predicates actually reach the scan, and that
  * projection prunes the read schema (O4, src/execution.cpp:136-157).
  */
class PushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.get

  test("filters are pushed to the parquet scan (PushedFilters non-empty)") {
    val df = ColeQuery.Query(
      projection = Seq("l_orderkey"),
      filters = Seq(Predicate("l_partkey", Gt, 500L), Predicate("l_linenumber", Le, 3L))
    ).compile(Tables.load(spark, TestSpark.sf0001, "lineitem"))
    val meta = scanOf(df).metadata
    val pushed = meta("PushedFilters")
    assert(pushed.contains("GreaterThan(l_partkey,500)"), s"PushedFilters=$pushed")
    assert(pushed.contains("LessThanOrEqual(l_linenumber,3)"), s"PushedFilters=$pushed")
  }

  test("projection prunes the parquet ReadSchema to selected columns") {
    val df = Tables.load(spark, TestSpark.sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    val schema = scanOf(df).requiredSchema.fieldNames.toSet
    assert(schema == Set("l_orderkey", "l_quantity"))
  }

  test("aggregate reads only the aggregated column (O7 pruning, src/execution.cpp:282-289)") {
    val df = Tables.load(spark, TestSpark.sf0001, "lineitem").agg(sum("l_quantity"))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_quantity:double>"), plan.take(2000))
  }

  test("MIN/MAX/COUNT are answered from parquet footers (aggregate pushdown)") {
    // the Spark subsumption of the reference answering aggregates from
    // page stats without decoding data: with aggregatePushdown on (set
    // in GraftSession), an unfiltered MIN/MAX/COUNT plans as
    // PushedAggregation on the scan. The rewrite only exists on the
    // DataSource V2 read path, so scope this read to V2.
    val prev = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try {
      val df = Tables.load(spark, TestSpark.sf0001, "lineitem")
        .agg(min("l_orderkey"), max("l_orderkey"), count(lit(1)))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [MIN(l_orderkey), MAX(l_orderkey), COUNT(*)]"),
        plan.take(2000))
    } finally spark.conf.set("spark.sql.sources.useV1SourceList", prev)
  }

  test("broadcast hint produces a broadcast join for dim tables") {
    val plan = Queries.queries("q07_join_broadcast")(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q121 (TPC-H Q17): decorrelated fence plan — filters pushed, no cartesian") {
    val df = Queries.queries("q121_tpch_q17")(spark, TestSpark.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the correlated avg decorrelates into broadcast hash joins; a
    // cartesian/nested-loop stage would mean the rewrite regressed
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // brand+size reach the part scan (formatted explain shows scan
    // metadata through the AQE wrapper, which hides scans from
    // collectLeaves on the executed plan)
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(fmt.contains("EqualTo(p_brand,Brand#23)")
      && fmt.contains("LessThan(p_size,5)"), fmt.take(3000))
  }

  test("q122 (TPC-H Q22): anti join + 1-row broadcast average, date pushed to orders") {
    val df = Queries.queries("q122_tpch_q22")(spark, TestSpark.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // NOT EXISTS decorrelates to a left-anti hash join (never a
    // per-row subquery); the scalar avg is a 1-row broadcast
    assert(plan.contains("LeftAnti"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(fmt.contains("GreaterThanOrEqual(o_orderdate,"), fmt.take(3000))
  }

  test("q125 (TPC-H Q2): argmin-witness plan — min computed once, no cartesian") {
    val df = Queries.queries("q125_tpch_q2")(spark, TestSpark.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(fmt.contains("EqualTo(p_size,15)"), fmt.take(3000))
  }

  test("q126 (TPC-H Q20): nested-IN plan — semi join, both filters pushed") {
    val df = Queries.queries("q126_tpch_q20")(spark, TestSpark.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(fmt.contains("EqualTo(p_brand,Brand#21)"), fmt.take(3000))
    assert(fmt.contains("GreaterThanOrEqual(l_shipdate,"), fmt.take(3000))
  }

  test("whole-stage codegen covers the parity pipeline") {
    val df = ColeQuery.Query(
      filters = Seq(Predicate("l_partkey", Gt, 50L)),
      groupBy = Seq("l_returnflag"), agg = Some((Sum, "l_quantity"))
    ).compile(Tables.load(spark, TestSpark.sf0001, "lineitem"))
    assert(df.count() > 0, "fixture filter must keep rows for a meaningful codegen check")
    df.collect() // finalize the adaptive plan so codegen stages materialize
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd stages print as "*(n) Operator" in the simple plan string
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan.take(2000))
  }
}
