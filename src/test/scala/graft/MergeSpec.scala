package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{FuzzyJoin, Merge}

class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("upsert: matched keys replaced, new keys inserted, rest untouched") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq((2L, "B"), (9L, "Z")).toDF("k", "v")
    val out = Merge.upsert(base, updates, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "B", 3L -> "c", 9L -> "Z"))
  }

  test("upsert rejects schema mismatch and missing keys, fail-fast") {
    val base = Seq((1L, "a")).toDF("k", "v")
    assertThrows[IllegalArgumentException] {
      Merge.upsert(base, Seq((1L, "a", 0)).toDF("k", "v", "extra"), Seq("k"))
    }
    assertThrows[IllegalArgumentException] {
      Merge.upsert(base, base, Seq("nope"))
    }
  }

  test("applyChanges: latest seq wins, D deletes, I inserts; deterministic under repartition") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "a1", 1L, "U"), (1L, "a2", 2L, "U"), // latest update wins
      (2L, "b", 3L, "D"), // delete
      (7L, "new", 1L, "I") // insert
    ).toDF("k", "v", "seq", "op")
    val want = Map(1L -> "a2", 3L -> "c", 7L -> "new")
    val out1 = Merge.applyChanges(base, changes, Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toMap
    val out2 = Merge.applyChanges(
      base.repartition(5), changes.repartition(3), Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toMap
    assert(out1 == want && out2 == want)
  }

  test("applyChanges: delete then re-insert at higher seq resurrects the key") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "a", 1L, "D"), (1L, "a9", 2L, "I")).toDF("k", "v", "seq", "op")
    val out = Merge.applyChanges(base, changes, Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a9"))
  }

  test("cdcApply: stale changes dropped; replaying an applied batch is a no-op") {
    // snapshot carries seq; k=1 is at seq 5 already
    val snap = Seq((1L, "a", 5L), (2L, "b", 1L)).toDF("k", "v", "seq")
    val changes = Seq(
      (1L, "aSTALE", 4L, "U"), // below snapshot seq -> guard drops it
      (1L, "aOLD", 5L, "U"),   // at snapshot seq -> dropped too (not >)
      (2L, "b2", 2L, "U"),     // fresh -> applies
      (9L, "new", 1L, "I")     // unknown key -> applies
    ).toDF("k", "v", "seq", "op")
    val once = Merge.cdcApply(snap, changes, Seq("k"), "seq", "op")
    val want = Map(1L -> ("a", 5L), 2L -> ("b2", 2L), 9L -> ("new", 1L))
    assert(once.as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap == want)
    // at-least-once delivery: applying the SAME batch to the updated
    // snapshot must change nothing (idempotent-by-seq)
    val twice = Merge.cdcApply(once, changes, Seq("k"), "seq", "op")
    assert(twice.as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap == want)
  }

  test("profile: one-pass long-format stats, numeric min/max, null counting") {
    val df = Seq(
      (1L, Some(2.0), "x"), (2L, None, "y"), (3L, Some(5.5), "x")
    ).toDF("id", "v", "s")
    val out = graft.operators.Profile.summarize(df, Seq("id", "v", "s"), exact = true)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5))))).toMap
    assert(out("id") == ((3L, 0L, 3L, Some(1.0), Some(3.0))))
    assert(out("v") == ((3L, 1L, 2L, Some(2.0), Some(5.5))))
    assert(out("s") == ((3L, 0L, 2L, None, None)))
    // approx path stays close on small-cardinality data
    val approx = graft.operators.Profile.summarize(df, Seq("id"))
      .select("n_distinct").as[Long].head()
    assert(approx == 3L)
    assertThrows[IllegalArgumentException] {
      graft.operators.Profile.summarize(df, Seq("nope"))
    }
  }

  test("fuzzy join finds bounded-edit matches with exact distances") {
    val corpus = Seq((1L, "cold widget"), (2L, "small widget"), (3L, "blue rod"))
      .toDF("id", "name")
    val probe = Seq(("xold widget", 10L), ("blue rodd", 20L)).toDF("pname", "pid")
    val out = FuzzyJoin.byEditDistance(corpus, probe, "name", "pname", 1)
      .select("id", "pid", "edit_dist").as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 10L, 1L), (3L, 20L, 1L)))
  }

  test("fuzzy join refuses a corpus-sized probe side (broadcast fence)") {
    val corpus = Seq((1L, "a")).toDF("id", "name")
    val probe = spark.range(50).select(col("id").as("pid"), lit("x").as("pname"))
    val ex = intercept[IllegalArgumentException] {
      FuzzyJoin.byEditDistance(corpus, probe, "name", "pname", 1, maxProbeRows = 10)
    }
    assert(ex.getMessage.contains("minHashNearDupPairs"))
  }
}
