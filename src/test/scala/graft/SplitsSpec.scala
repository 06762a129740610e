package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.Splits

/** Deterministic splitting/sampling and the curation scalar functions. */
class SplitsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hashSplit is deterministic and partitioning-independent") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents").select("doc_id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Splits.hashSplit(docs, "doc_id", splits)
      .as[(Long, String)].collect().toMap
    val b = Splits.hashSplit(docs.repartition(13), "doc_id", splits)
      .as[(Long, String)].collect().toMap
    assert(a == b, "assignment must be a pure function of the key")
    // every row labeled; proportions near the weights (binomial tolerance)
    assert(a.size == docs.count())
    val trainFrac = a.values.count(_ == "train").toDouble / a.size
    assert(math.abs(trainFrac - 0.8) < 0.08, s"train fraction $trainFrac")
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("hashSplit with a different salt draws independently") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents").select("doc_id")
    val splits = Seq("a" -> 0.5, "b" -> 0.5)
    val s1 = Splits.hashSplit(docs, "doc_id", splits, salt = "run1")
      .as[(Long, String)].collect().toMap
    val s2 = Splits.hashSplit(docs, "doc_id", splits, salt = "run2")
      .as[(Long, String)].collect().toMap
    val agree = s1.count { case (k, v) => s2(k) == v }.toDouble / s1.size
    assert(agree > 0.35 && agree < 0.65,
      s"independent draws should agree ~50%, got $agree")
  }

  test("stratifiedSample keeps per-stratum shares and is monotone in the fraction") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("lang"))
    val small = Splits.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.3), defaultFraction = 0.1)
      .select("doc_id").as[Long].collect().toSet
    val large = Splits.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.6), defaultFraction = 0.2)
      .select("doc_id").as[Long].collect().toSet
    // same hash, larger threshold: strictly grows, never reshuffles
    assert(small.subsetOf(large), "raising fractions must only ADD rows")
    assert(small.nonEmpty && large.size > small.size)
  }

  test("normalize lowercases, strips punctuation, collapses whitespace") {
    val out = Seq("  Hello, WORLD!!  42  ").toDF("t")
      .select(TextFunctions.normalize(col("t"))).as[String].head()
    assert(out == "hello world 42")
  }

  test("redactPii masks emails and phone patterns, leaves the rest") {
    val out = Seq("write a.b-c@x-mail.co.uk or call 555-123-4567 today")
      .toDF("t").select(TextFunctions.redactPii(col("t"))).as[String].head()
    assert(out == "write <EMAIL> or call <PHONE> today")
  }

  test("duplicateBigramFraction: 0 for clean prose, high for loops, 0 for short docs") {
    val out = Seq(
      "the quick brown fox jumps",   // all bigrams distinct -> 0
      "spam spam spam spam spam",    // one distinct of 4 bigrams -> 0.75
      "one", "")                     // too short -> 0
      .toDF("t").select(TextFunctions.duplicateBigramFraction(col("t")))
      .as[Double].collect().toSeq
    assert(out == Seq(0.0, 0.75, 0.0, 0.0))
  }

  test("bpeishTokenCount splits like a GPT-2-style pre-tokenizer") {
    val counts = Seq(
      "I've got 42 cats, don't I?", // I|'ve| got| 42| cats|,| don|'t| I|?
      "", "hello").toDF("t")
      .select(TextFunctions.bpeishTokenCount(col("t"))).as[Long].collect().toSeq
    assert(counts == Seq(10L, 0L, 1L))
  }

  test("weightedSample matches the brute-force E-S draw and ignores partitioning") {
    val rows = (1L to 300L).map(id => (id, 1L + id % 17)) // weights 1..17
    val df = rows.toDF("id", "w")
    val got = Splits.weightedSample(df, "id", "w", k = 25)
      .as[(Long, Long)].collect().toSet
    // brute-force mirror of the same score: u^(1/w) with the md5 uniform
    def u(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) / 4294967296.0
    }
    val want = rows.map { case (id, w) => (id, w, math.pow(u(id), 1.0 / w)) }
      .sortBy { case (id, _, s) => (-s, id) }.take(25)
      .map { case (id, w, _) => (id, w) }.toSet
    assert(got == want)
    val repart = Splits.weightedSample(df.repartition(7), "id", "w", k = 25)
      .as[(Long, Long)].collect().toSet
    assert(repart == got, "selection must not depend on partitioning")
    // zero/negative weights can never be drawn
    val withZero = (df.union(Seq((9999L, 0L), (9998L, -5L)).toDF("id", "w")))
    val ids = Splits.weightedSample(withZero, "id", "w", k = 300)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(!ids.contains(9999L) && !ids.contains(9998L))
  }

  test("stratumSample keeps exactly min(k, stratum size) rows, stable under partitioning") {
    val rows = (1L to 200L).map(id => (id, s"s${id % 7}")) ++
      Seq((900L, "tiny"), (901L, "tiny")) // a stratum smaller than k
    val df = rows.toDF("id", "stratum")
    val got = Splits.stratumSample(df, "id", "stratum", k = 5)
      .as[(Long, String)].collect()
    val bySize = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert((0 until 7).forall(s => bySize(s"s$s") == 5))
    assert(bySize("tiny") == 2)
    val repart = Splits.stratumSample(df.repartition(11), "id", "stratum", k = 5)
      .as[(Long, String)].collect()
    assert(repart.toSet == got.toSet, "selection must not depend on partitioning")
    // growth stability: adding rows only ever displaces by hash rank —
    // a stratum's sample is a subset of {old sample} ∪ {new keys}
    val grown = df.union(Seq((1000L, "s0"), (1001L, "s0")).toDF("id", "stratum"))
    val after = Splits.stratumSample(grown, "id", "stratum", k = 5)
      .as[(Long, String)].collect().filter(_._2 == "s0").map(_._1).toSet
    val before = got.filter(_._2 == "s0").map(_._1).toSet
    assert(after.subsetOf(before ++ Set(1000L, 1001L)))
  }

  test("tokenBudgetMix fills each budget with at most one doc of overshoot") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("source"),
        TextFunctions.tokenCount(col("text")).as("ntok"))
    val budgets = Map("src0" -> 120L, "src1" -> 1000000L)
    val got = Splits.tokenBudgetMix(docs, "doc_id", "source", "ntok", budgets)
      .as[(Long, String, Long)].collect()
    val repart = Splits.tokenBudgetMix(docs.repartition(13), "doc_id",
      "source", "ntok", budgets).as[(Long, String, Long)].collect()
    assert(got.toSet == repart.toSet, "selection must ignore partitioning")
    // absent strata keep nothing
    assert(got.forall(r => budgets.contains(r._2)))
    val all = docs.as[(Long, String, Long)].collect()
    // src1's budget exceeds its total: kept whole
    assert(got.count(_._2 == "src1") == all.count(_._2 == "src1"))
    // src0: quota met, overshoot bounded by one document — dropping the
    // LAST kept doc (by the hash order = any kept doc with max "before")
    // must leave the sum under budget
    val src0 = got.filter(_._2 == "src0")
    val kept = src0.map(_._3).sum
    val total = all.filter(_._2 == "src0").map(_._3).sum
    assert(total > 120L, "fixture must be bigger than the budget")
    assert(kept >= 120L, s"budget must be met, kept only $kept")
    assert(kept - src0.map(_._3).max < 120L,
      s"overshoot exceeds one doc: kept $kept of 120")
    // monotone: raising a budget only ADDS rows
    val more = Splits.tokenBudgetMix(docs, "doc_id", "source", "ntok",
      budgets + ("src0" -> 300L)).as[(Long, String, Long)].collect()
    assert(src0.map(_._1).toSet.subsetOf(
      more.filter(_._2 == "src0").map(_._1).toSet))
  }

  test("epochOrder: each epoch is a per-shard bijection, epochs differ, partitioning is irrelevant") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("source"))
    val ordered = Splits.epochOrder(
      Splits.epochOrder(docs, "doc_id", "source", epoch = 0L, "p0"),
      "doc_id", "source", epoch = 1L, "p1")
      .as[(Long, String, Long, Long)].collect()
    // bijection 1..n per shard, both epochs
    ordered.groupBy(_._2).foreach { case (_, rows) =>
      val n = rows.length.toLong
      assert(rows.map(_._3).sorted.toSeq == (1L to n),
        "epoch 0 must rank every shard 1..n")
      assert(rows.map(_._4).sorted.toSeq == (1L to n),
        "epoch 1 must rank every shard 1..n")
    }
    // the two epochs are different permutations (some doc moved)
    assert(ordered.exists(r => r._3 != r._4),
      "consecutive epochs must not repeat the order")
    // pure function of the key: repartitioning changes nothing
    val repart = Splits.epochOrder(
      Splits.epochOrder(docs.repartition(13), "doc_id", "source", 0L, "p0"),
      "doc_id", "source", 1L, "p1")
      .as[(Long, String, Long, Long)].collect()
    assert(repart.toSet == ordered.toSet)
  }

  test("weightedSample favors heavy rows: weight-17 rows beat weight-1 rows in aggregate") {
    val rows = (1L to 300L).map(id => (id, if (id % 2 == 0) 17L else 1L))
    val sampled = Splits.weightedSample(rows.toDF("id", "w"), "id", "w", k = 50)
      .as[(Long, Long)].collect()
    val heavy = sampled.count(_._2 == 17L)
    assert(heavy > 35, s"expected the weight-17 class to dominate, got $heavy/50")
  }
}
