package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guard: entry() smoke, oracle key integrity, and a full
  * execution sweep of the catalog at sf0.001 (catches a broken query long
  * before the driver's sf0.01 verify run).
  */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a query; names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
    assert(qs.forall(_.matches("q\\d+_[a-z0-9_]+")), qs.mkString(","))
  }

  test("all catalog queries execute and return rows at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, TestSpark.sf0001).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows at sf0.001: $empty")
  }
}
