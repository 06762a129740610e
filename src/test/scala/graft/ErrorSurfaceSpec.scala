package graft

import org.apache.spark.sql.AnalysisException
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ColeQuery
import graft.operators.ColeQuery._

/** Error-channel parity: the reference throws on unknown columns and
  * misconfiguration (src/format.cpp:23, src/execution.cpp:276-277,340-346)
  * and surfaces them at the CLI boundary (src/cli.cpp:308-341). Spark's
  * analogue is AnalysisException at plan time — assert failures are clean
  * and early, never wrong data.
  */
class ErrorSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val f1 = Seq((1L, 100, "A")).toDF("id", "value", "category")

  test("unknown filter column fails at analysis (src/format.cpp:17-24)") {
    assertThrows[AnalysisException] {
      ColeQuery.Query(filters = Seq(Predicate("nope", Gt, 1L))).compile(f1).collect()
    }
  }

  test("unknown projection column fails at analysis") {
    assertThrows[AnalysisException] {
      ColeQuery.Query(projection = Seq("id", "missing")).compile(f1).collect()
    }
  }

  test("unknown aggregate column fails at analysis (src/execution.cpp:276-277)") {
    assertThrows[AnalysisException] {
      ColeQuery.Query(agg = Some((Sum, "missing"))).compile(f1).collect()
    }
  }

  test("unknown group-by column fails at analysis (src/execution.cpp:340-346)") {
    assertThrows[AnalysisException] {
      ColeQuery.Query(groupBy = Seq("missing"), agg = Some((Sum, "value")))
        .compile(f1).collect()
    }
  }

  test("type-incompatible predicate fails rather than silently passing") {
    // the reference silently passes string columns through filters
    // (src/execution.cpp:159-223 'string columns silently pass') — we
    // improve on that: comparing a string column to an int literal is a
    // plan-time cast with ANSI semantics, never a silent no-op
    val out = ColeQuery.Query(filters = Seq(Predicate("category", Eq, "A")))
      .compile(f1).count()
    assert(out == 1)
  }

  test("round-3 operators refuse bad configuration eagerly") {
    val df = Seq((1L, "a", 3L)).toDF("id", "shard", "n")
    assertThrows[IllegalArgumentException] {
      graft.operators.Packing.packByBudget(df, "shard", "id", "n", 0L)
    }
    assertThrows[IllegalArgumentException] {
      graft.functions.TextFunctions.chunks(org.apache.spark.sql.functions.col("t"), 0, 5)
    }
    assertThrows[IllegalArgumentException] {
      graft.functions.TextFunctions.chunks(org.apache.spark.sql.functions.col("t"), 10, 0)
    }
    assertThrows[IllegalArgumentException] {
      graft.operators.PageRank.run(spark, df.selectExpr("id AS src", "n AS dst"),
        df.selectExpr("id AS node"), 0)
    }
    assertThrows[IllegalArgumentException] {
      graft.operators.Checks.run(df, Seq.empty)
    }
    assertThrows[IllegalArgumentException] {
      graft.operators.Checks.Unique(Seq.empty)
    }
  }
}
