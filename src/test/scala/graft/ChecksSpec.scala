package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Checks
import graft.operators.Checks._

/** Data-quality gate: exact violation counts for planted defects, clean
  * pass on the real tables, violating-row retrieval.
  */
class ChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dirty = Seq(
    // (id, code, qty)
    (Some(1L), "A", 10.0),
    (Some(1L), "A", 20.0),   // duplicate id
    (Some(2L), "X", 30.0),   // bad code
    (None, "N", 60.0),       // null id + out-of-range qty
    (Some(3L), "R", 0.5)     // out-of-range qty
  ).toDF("id", "code", "qty")

  test("planted defects are counted exactly") {
    val dim = Seq(1L, 3L).toDF("k") // id=2 dangles
    val got = Checks.run(dirty, Seq(
      NotNull("id"), Unique(Seq("id")), InRange("qty", 1.0, 50.0),
      Accepted("code", Seq("A", "N", "R")), RefIntegrity("id", dim, "k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "not_null(id)" -> 1L,
      "unique(id)" -> 1L,
      "in_range(qty,1.0,50.0)" -> 2L,
      "accepted(code)" -> 1L,
      "ref_integrity(id)" -> 1L))
  }

  test("passed flag is true exactly for zero-violation checks") {
    val res = Checks.run(dirty, Seq(NotNull("code"), NotNull("id")))
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(res == Map("not_null(code)" -> true, "not_null(id)" -> false))
  }

  test("violations() returns exactly the offending rows") {
    val bad = Checks.violations(dirty, InRange("qty", 1.0, 50.0))
      .select("qty").collect().map(_.getDouble(0)).toSet
    assert(bad == Set(60.0, 0.5))
    val dup = Checks.violations(dirty, Unique(Seq("id")))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(dup == Set(1L))
  }

  test("catalog gate: integrity checks green, uniqueness counts the real dups") {
    val rows = Queries.queries("q74_checks")(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rows.size == 5)
    // nulls, ranges, enum codes and the FK are clean in the testdata...
    Seq("not_null(l_orderkey)", "in_range(l_quantity,1.0,50.0)",
      "accepted(l_returnflag)", "ref_integrity(l_orderkey)").foreach { c =>
      assert(rows(c) == (0L, true), s"$c expected clean")
    }
    // ...but (l_orderkey, l_linenumber) is NOT unique in the synthetic
    // generator — the gate must report the exact duplicate count
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
    val expectDups =
      li.count() - li.select("l_orderkey", "l_linenumber").distinct().count()
    assert(expectDups > 0, "fixture premise: generator emits dup line keys")
    assert(rows("unique(l_orderkey,l_linenumber)") == (expectDups, false))
  }

  test("duplicate check names are rejected eagerly") {
    assertThrows[IllegalArgumentException] {
      Checks.run(dirty, Seq(NotNull("id"), NotNull("id")))
    }
  }

  test("histogram bucket expression: constant column lands in bucket 0") {
    val st = Seq(5.0, 5.0).toDF("x").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val out = Seq(5.0, 5.0).toDF("x").crossJoin(st)
      .selectExpr("CAST(CASE WHEN mx = mn THEN 0 ELSE least(19, floor((x - mn) * 20.0 / (mx - mn))) END AS BIGINT) AS bucket")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(0L))
  }

  test("histogram catalog query covers all rows across 20 buckets max") {
    val rows = Queries.queries("q75_histogram")(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val total = rows.map(_.getAs[Long]("cnt")).sum
    val n = Tables.load(spark, TestSpark.sf0001, "lineitem").count()
    assert(total == n, "every row must fall in exactly one bucket")
    assert(rows.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b <= 19
    })
  }

  test("multisetEq == the exceptAll pair on equal, unequal and multiplicity cases") {
    // r15: the lifecycle gates' one-job equality primitive must agree
    // with the two-job exceptAll form it replaced — including on
    // DUPLICATE multiplicity (where plain set logic would lie) and on
    // null keys (grouping-key semantics on both sides)
    val a = Seq((1L, "x"), (1L, "x"), (2L, null: String)).toDF("k", "v")
    val b1 = Seq((1L, "x"), (2L, null: String), (1L, "x")).toDF("k", "v")
    val b2 = Seq((1L, "x"), (2L, null: String)).toDF("k", "v") // one fewer dup
    val b3 = Seq((1L, "x"), (1L, "x"), (2L, "y")).toDF("k", "v")
    def ref(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty
    for ((x, y) <- Seq((a, b1), (a, b2), (a, b3), (b2, a)))
      assert(Checks.multisetEq(x, y) == ref(x, y),
        s"multisetEq diverges from exceptAll pair")
    assert(Checks.multisetEq(a, b1) && !Checks.multisetEq(a, b2))
  }

  test("multisetEq: a real __w column participates, and mixed types are refused") {
    // r16 hardening: the internal weight column must never shadow an
    // input column named __w — frames differing only in __w are unequal
    val w1 = Seq((1L, 1L), (2L, 2L)).toDF("k", "__w")
    val w2 = Seq((1L, 9L), (2L, 2L)).toDF("k", "__w")
    assert(Checks.multisetEq(w1, w1.select(col("k"), col("__w"))))
    assert(!Checks.multisetEq(w1, w2),
      "frames differing only in a real __w column must be unequal")
    // and int-vs-bigint sides are refused loudly, not silently coerced
    val ints = Seq(1, 2).toDF("k")
    val longs = Seq(1L, 2L).toDF("k")
    val e = intercept[IllegalArgumentException] {
      Checks.multisetEq(ints, longs)
    }
    assert(e.getMessage.contains("types"))
  }
}
