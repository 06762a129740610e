package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ColeQuery
import graft.operators.ColeQuery._

/** Port of the reference's execution suite
  * (tests/test_execution.cpp:22-237, fixtures F1/F4 in FIXTURES.md):
  * same 5-row golden fixture, same expected values.
  */
class ColeQuerySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // F1 fixture (tests/test_execution.cpp:22-40)
  private lazy val f1 = Seq(
    (1L, 100, "A"), (2L, 200, "B"), (3L, 150, "A"), (4L, 300, "C"), (5L, 250, "B")
  ).toDF("id", "value", "category")

  test("scan returns all rows/columns (test_execution.cpp:69-91)") {
    val out = ColeQuery.Query().compile(f1)
    assert(out.count() == 5)
    assert(out.columns.toSeq == Seq("id", "value", "category"))
  }

  test("filter value > 150 keeps 3 rows (test_execution.cpp:93-113)") {
    val out = ColeQuery.Query(filters = Seq(Predicate("value", Gt, 150L))).compile(f1)
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 4L, 5L))
  }

  test("all six comparison ops (predicate truth table, test_execution.cpp:42-50)") {
    def ids(p: Predicate): Seq[Long] =
      ColeQuery.Query(filters = Seq(p)).compile(f1).select("id").as[Long].collect().sorted.toSeq
    assert(ids(Predicate("value", Eq, 150L)) == Seq(3L))
    assert(ids(Predicate("value", Ne, 150L)) == Seq(1L, 2L, 4L, 5L))
    assert(ids(Predicate("value", Lt, 150L)) == Seq(1L))
    assert(ids(Predicate("value", Le, 150L)) == Seq(1L, 3L))
    assert(ids(Predicate("value", Gt, 250L)) == Seq(4L))
    assert(ids(Predicate("value", Ge, 250L)) == Seq(4L, 5L))
  }

  test("projection prunes columns (test_execution.cpp:115-133)") {
    val out = ColeQuery.Query(projection = Seq("id", "category")).compile(f1)
    assert(out.columns.toSeq == Seq("id", "category"))
    assert(out.count() == 5)
  }

  test("global aggregate count/sum/min/max (test_execution.cpp:135-166)") {
    val out = ColeQuery.Query(agg = Some((Sum, "value"))).compile(f1).head()
    assert(out.getAs[Long]("count") == 5L)
    assert(out.getAs[Long]("sum") == 1000L)
    assert(out.getAs[Int]("min") == 100)
    assert(out.getAs[Int]("max") == 300)
  }

  test("aggregate with filter (test_execution.cpp:168-183)") {
    val out = ColeQuery.Query(
      filters = Seq(Predicate("value", Gt, 150L)),
      agg = Some((Sum, "value"))).compile(f1).head()
    assert(out.getAs[Long]("count") == 3L)
    assert(out.getAs[Long]("sum") == 750L)
  }

  test("group-by counts and sums, key-sorted output (test_execution.cpp:185-237)") {
    val out = ColeQuery.Query(groupBy = Seq("category"), agg = Some((Sum, "value")))
      .compile(f1).collect()
    assert(out.map(r => (r.getString(0), r.getAs[Long]("count"), r.getAs[Long]("sum"))).toSeq ==
      Seq(("A", 2L, 250L), ("B", 2L, 450L), ("C", 1L, 300L)))
  }

  test("empty input: min/max are null (include/execution.h:73-74 absent-optional parity)") {
    val out = ColeQuery.Query(
      filters = Seq(Predicate("value", Gt, 9999L)),
      agg = Some((Sum, "value"))).compile(f1).head()
    assert(out.getAs[Long]("count") == 0L)
    assert(out.isNullAt(out.fieldIndex("min")))
    assert(out.isNullAt(out.fieldIndex("max")))
  }

  test("Avg extension appends the fifth aggregate (not in the reference enum)") {
    val out = ColeQuery.Query(agg = Some((Avg, "value"))).compile(f1).head()
    assert(out.getAs[Double]("avg") == 200.0)
    assert(out.getAs[Long]("count") == 5L)
    val grouped = ColeQuery.Query(groupBy = Seq("category"), agg = Some((Avg, "value")))
      .compile(f1).collect().map(r => r.getString(0) -> r.getAs[Double]("avg")).toMap
    assert(grouped == Map("A" -> 125.0, "B" -> 225.0, "C" -> 300.0))
  }

  test("F4 example fixture (examples/basic_usage.cpp:14-33)") {
    val people = Seq(
      (1L, 25, "Paris"), (2L, 30, "Lyon"), (3L, 25, "Paris"), (4L, 35, "Nice"), (5L, 30, "Lyon")
    ).toDF("id", "age", "city")
    assert(ColeQuery.Query(filters = Seq(Predicate("age", Gt, 25L))).compile(people).count() == 3)
    val agg = ColeQuery.Query(agg = Some((Sum, "age"))).compile(people).head()
    assert(agg.getAs[Long]("count") == 5L && agg.getAs[Long]("sum") == 145L)
    val byCity = ColeQuery.Query(groupBy = Seq("city"), agg = Some((Sum, "age")))
      .compile(people).collect().map(r => r.getString(0) -> r.getAs[Long]("count")).toSeq
    assert(byCity == Seq("Lyon" -> 2L, "Nice" -> 1L, "Paris" -> 2L))
  }

  test("CLI op spellings parse (src/cli.cpp:172-188)") {
    assert(CmpOp.parse("==") == Eq && CmpOp.parse("!=") == Ne && CmpOp.parse("<") == Lt
      && CmpOp.parse("<=") == Le && CmpOp.parse(">") == Gt && CmpOp.parse(">=") == Ge)
    assertThrows[IllegalArgumentException](CmpOp.parse("~="))
  }
}
