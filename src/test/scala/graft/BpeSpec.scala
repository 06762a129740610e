package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Textbook greedy left-to-right non-overlapping merge, the semantics
    * Bpe.applyMerge's fold must reproduce exactly.
    */
  private def refMerge(word: Seq[String], l: String, r: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < word.length) {
      if (i + 1 < word.length && word(i) == l && word(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += word(i); i += 1 }
    }
    out.result()
  }

  test("applyMerge fold == textbook greedy scan, incl. overlapping runs") {
    val rnd = new scala.util.Random(42)
    val alphabet = Seq("a", "b", "ab", "c")
    val words = Seq(Seq.empty[String], Seq("a"), Seq("a", "b"),
      Seq("a", "a", "a"), Seq("a", "a", "a", "a"),
      Seq("a", "b", "a", "b"), Seq("ab", "b", "a", "b")) ++
      (1 to 60).map(_ => Seq.fill(2 + rnd.nextInt(9))(
        alphabet(rnd.nextInt(alphabet.length))))
    for ((l, r) <- Seq(("a", "b"), ("a", "a"), ("ab", "b"), ("b", "a"))) {
      val got = words.toDF("syms")
        .select(Bpe.applyMerge(col("syms"), l, r).as("m"))
        .as[Seq[String]].collect().toSeq
      assert(got == words.map(refMerge(_, l, r)), s"merge ($l,$r)")
    }
  }

  test("learnMerges reproduces the hand-computed merges of a tiny corpus") {
    // wikipedia's standard BPE example vocabulary, as a corpus:
    // 5x "hug", 2x "pug", 3x "pun", 2x "bun", 5x "hugs"
    val corpus = Seq.fill(5)("hug") ++ Seq.fill(2)("pug") ++
      Seq.fill(3)("pun") ++ Seq.fill(2)("bun") ++ Seq.fill(5)("hugs")
    val docs = Seq(corpus.mkString(" ")).toDF("text")
    val merges = Bpe.learnMerges(docs, "text", numMerges = 3)
      .as[(Long, String, String, Long)].collect().toSeq
    // pairs round 1: (u,g)=12 (hug 5, pug 2, hugs 5) beats (h,u)=10 ...
    // round 2: (h,ug)=10; round 3: (hug,s)=5 ties (u,n)=5 and wins the
    // lexicographic left-symbol tie-break ("hug" < "u")
    assert(merges == Seq(
      (1L, "u", "g", 12L), (2L, "h", "ug", 10L), (3L, "hug", "s", 5L)))
  }

  test("learnMerges tie-break is (count desc, left, right) — deterministic") {
    // "xy" and "ab" both appear exactly 4 times; lexicographically
    // smaller left symbol must win round 1
    val docs = Seq(((1 to 4).map(_ => "xy ab").mkString(" "))).toDF("text")
    val first = Bpe.learnMerges(docs, "text", numMerges = 1)
      .as[(Long, String, String, Long)].head()
    assert(first == ((1L, "a", "b", 4L)))
  }

  test("encodeExpr applies merges in rank order; encodedLength counts") {
    // merges (u,g) then (h,ug): "hugs" -> [h,u,g,s] -> [h,ug,s] -> [hug,s]
    val merges = Seq(("u", "g"), ("h", "ug"))
    val enc = Seq("hugs pug").toDF("text")
      .select(Bpe.encodeExpr(col("text"), merges).as("e"),
        Bpe.encodedLength(col("text"), merges).as("n"))
      .as[(Seq[Seq[String]], Long)].head()
    assert(enc._1 == Seq(Seq("hug", "s"), Seq("p", "ug")))
    assert(enc._2 == 4L)
    // rank order matters: (h,ug) before (u,g) must NOT produce "hug"
    val wrongOrder = Seq(("h", "ug"), ("u", "g"))
    assert(Seq("hugs").toDF("text")
      .select(Bpe.encodeExpr(col("text"), wrongOrder).as("e"))
      .as[Seq[Seq[String]]].head() == Seq(Seq("h", "ug", "s")))
  }

  test("learnMerges/encode absorb null and empty texts") {
    val docs = Seq("ab ab", null.asInstanceOf[String], "").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", numMerges = 1)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(merges == Seq((1L, "a", "b", 2L)))
    val lens = docs.select(Bpe.encodedLength(col("text"), Seq(("a", "b"))).as("n"))
      .as[Option[Long]].collect().toSeq
    // null text -> null length (caller decides policy); empty -> 0
    assert(lens.toSet == Set(Some(2L), None, Some(0L)))
  }

  test("batched learning == one-at-a-time greedy on a real corpus, in fewer rounds") {
    // maxBatch=1 degenerates to the classic one-merge-per-round loop;
    // the batch rule (disjoint prefix + strict-count truncation) must
    // reproduce its merge list EXACTLY — same pairs, same ranks, same
    // counts — while executing fewer Spark rounds
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val (seqDf, seqRounds) =
      Bpe.learnMergesBatched(docs, "text", numMerges = 24, maxBatch = 1)
    val (batDf, batRounds) =
      Bpe.learnMergesBatched(docs, "text", numMerges = 24, maxBatch = 32)
    val s = seqDf.as[(Long, String, String, Long)].collect().toSeq
    val b = batDf.as[(Long, String, String, Long)].collect().toSeq
    assert(b == s, s"batched merges diverged\nseq=$s\nbat=$b")
    assert(batRounds < seqRounds,
      s"batching must cut rounds: $batRounds vs $seqRounds")
  }

  test("batched == one-at-a-time on a concat-collision-heavy corpus") {
    // Repeated-character runs of varied length parse the same substring
    // DIFFERENTLY by context under greedy non-overlapping merges, so a
    // chosen pair can mint a token string that already exists as a
    // symbol from another parse (e.g. "aaaa" via (aa,aa) in even runs
    // while odd runs hold (aa,aaa)-shaped adjacencies) — the collision
    // class the token-only disjointness check missed (r8 ADVICE): a
    // merge's CONCAT can raise the count of a string-disjoint pair.
    // With concats claimed in the conflict set, the batch rule must
    // still reproduce the one-at-a-time list exactly, counts included.
    val runs = (2 to 12).map(n => ("a" * n, 520 - 40 * n))
    val mixed = Seq(("ab", 150), ("aab", 120), ("abaa", 100), ("baa", 90),
      ("aabaa", 80), ("bb", 70), ("abab", 60), ("aabb", 50), ("baab", 40))
    val text = (runs ++ mixed)
      .flatMap { case (w, f) => Seq.fill(f)(w) }.mkString(" ")
    val docs = Seq(text).toDF("text")
    val (seqDf, seqRounds) =
      Bpe.learnMergesBatched(docs, "text", numMerges = 20, maxBatch = 1)
    val (batDf, batRounds) =
      Bpe.learnMergesBatched(docs, "text", numMerges = 20, maxBatch = 16)
    val s = seqDf.as[(Long, String, String, Long)].collect().toSeq
    val b = batDf.as[(Long, String, String, Long)].collect().toSeq
    assert(b == s, s"batched merges diverged on collision corpus\nseq=$s\nbat=$b")
    assert(batRounds <= seqRounds)
  }

  test("learnMerges stops early when the vocabulary is fully merged") {
    val docs = Seq("ab ab ab").toDF("text")
    // round 1 merges (a,b); afterwards every word is a single symbol —
    // asking for 5 merges must return just the 1 that exists
    val merges = Bpe.learnMerges(docs, "text", numMerges = 5)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(merges == Seq((1L, "a", "b", 3L)))
  }
}
