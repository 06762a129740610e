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

  test("as-of join matches a brute-force reference on random data (both directions)") {
    val leftGen = Gen.listOfN(30, Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 1000L)))
    val rightGen = Gen.listOfN(30, Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 1000L)))
    for (s <- 1 to 5) {
      // unique (key, ts) per side for well-defined semantics
      val lrows = sample(leftGen, s).distinct.zipWithIndex
        .map { case ((k, t), i) => (k, t, 10000L + i) }
      val rrows = sample(rightGen, s * 77L).distinct.zipWithIndex
        .map { case ((k, t), i) => (k, t, 20000L + i) }
      val left = lrows.toDF("k", "t", "lid")
      val right = rrows.toDF("k", "t", "rid")
      def brute(dir: graft.operators.AsOfJoin.Direction): Map[Long, Option[Long]] =
        lrows.map { case (k, t, lid) =>
          val cands = dir match {
            case graft.operators.AsOfJoin.Backward =>
              rrows.filter(r => r._1 == k && r._2 <= t)
            case graft.operators.AsOfJoin.Forward =>
              rrows.filter(r => r._1 == k && r._2 >= t)
          }
          val best = dir match {
            case graft.operators.AsOfJoin.Backward => cands.sortBy(r => (-r._2, -r._3)).headOption
            case graft.operators.AsOfJoin.Forward => cands.sortBy(r => (r._2, r._3)).headOption
          }
          lid -> best.map(_._3)
        }.toMap
      for (dir <- Seq(graft.operators.AsOfJoin.Backward, graft.operators.AsOfJoin.Forward)) {
        val got = graft.operators.AsOfJoin
          .joinAsOf(left, right, "k", "t", "t", "rid", dir, None)
          .select("lid", "asof_rid").collect()
          .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
        assert(got == brute(dir), s"seed=$s dir=$dir")
      }
    }
  }

  test("sessionize matches a brute-force reference on random data") {
    val gen = Gen.listOfN(60, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 100000L)))
    for (s <- 1 to 5) {
      val rows = sample(gen, s).distinct.zipWithIndex
        .map { case ((u, ms), i) => (u, i.toLong, ms) }
      val gap = 5000L
      val df = rows.map { case (u, e, ms) => (u, e, new java.sql.Timestamp(ms)) }
        .toDF("user_id", "event_id", "ts")
      val got = graft.operators.Sessionize.sessions(df, gap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val want = rows.groupBy(_._1).flatMap { case (u, evs) =>
        val sorted = evs.sortBy(e => (e._3, e._2))
        val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Long)]]) {
          case (Nil, e) => List(List(e))
          case (cur :: done, e) =>
            if (e._3 - cur.head._3 > gap) List(e) :: cur :: done
            else (e :: cur) :: done
        }.reverse.map(_.reverse)
        sessions.zipWithIndex.map { case (ss, i) =>
          (u, (i + 1).toLong, ss.size.toLong, ss.map(_._3).min, ss.map(_._3).max)
        }
      }.toSet
      assert(got == want, s"seed=$s")
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

  test("connected components == union-find on random graphs") {
    val edgeGen = Gen.listOfN(25, Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)))
    for (s <- 1 to 5) {
      val edges = sample(edgeGen, s)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(k => k -> find(k)).toMap
      val got = graft.operators.Components.connectedComponents(
        edges.toDF("s", "d"), "s", "d")
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"seed=$s")
    }
  }
}
