package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ColeQuery
import graft.operators.ColeQuery._

/** ScalaCheck-generator-driven properties for invariants the reference only
  * spot-checks (SURVEY.md §5 point d): declarative filter == collected
  * filter, group-by sums partition the global sum, dedup idempotence.
  * Generators are sampled with fixed seeds (no scalatestplus bridge in the
  * offline dependency set), so failures reproduce exactly.
  */
class PropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowsGen = Gen.listOfN(40,
    Gen.zip(Gen.choose(0L, 50L), Gen.choose(-1000, 1000), Gen.oneOf("A", "B", "C")))

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("filter(p) over DataFrame == scala filter over collected rows") {
    for (s <- 1 to 8) {
      val rows = sample(rowsGen, s)
      val threshold = sample(Gen.choose(-500L, 500L), s * 1000L)
      val df = rows.toDF("id", "value", "category")
      val got = ColeQuery.Query(filters = Seq(Predicate("value", Gt, threshold)))
        .compile(df).count()
      assert(got == rows.count(_._2 > threshold), s"seed=$s")
    }
  }

  test("group-by sums partition the global sum") {
    for (s <- 1 to 8) {
      val rows = sample(rowsGen, s)
      val df = rows.toDF("id", "value", "category")
      val global = df.agg(sum(col("value"))).head().getLong(0)
      val byKey = df.groupBy("category").agg(sum(col("value")).as("s"))
        .agg(sum(col("s"))).head().getLong(0)
      assert(global == byKey, s"seed=$s")
    }
  }

  test("exact dedup is idempotent and keeps one row per key") {
    for (s <- 1 to 4) {
      val rows = sample(rowsGen, s)
      val df = rows.toDF("id", "value", "category")
      val once = graft.operators.Dedup.exact(df, Seq("category"), "id")
      val twice = graft.operators.Dedup.exact(once, Seq("category"), "id")
      assert(once.count() == rows.map(_._3).distinct.size, s"seed=$s")
      assert(once.orderBy("category").collect().toSeq ==
        twice.orderBy("category").collect().toSeq, s"seed=$s")
    }
  }
}
