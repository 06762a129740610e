package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.{BloomJoin, Packing, PageRank, Splits}

/** Training-data layout & retrieval operators added in round 3: sequence
  * packing, chunking, BM25, bloom-prefiltered joins, integer PageRank,
  * temperature mixing, transition matrices.
  */
class TrainingOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables.load(spark, TestSpark.sf0001, "documents")

  // --- Packing ---------------------------------------------------------------

  test("packing: starts are the per-shard running sum, offsets stay in budget") {
    val sized = docs.select(col("doc_id"), col("source"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"))
    val packed = Packing.packByBudget(sized, "source", "doc_id", "n_tokens", 128L)
      .collect()
    assert(packed.nonEmpty)
    packed.foreach { r =>
      val off = r.getAs[Long]("bin_offset")
      assert(off >= 0 && off < 128, s"offset $off outside budget")
      assert(r.getAs[Long]("bin") >= 0)
    }
    // reconstruct: within each shard, start(bin*128+offset) is cumulative
    packed.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      ordered.foreach { r =>
        val start = r.getAs[Long]("bin") * 128 + r.getAs[Long]("bin_offset")
        assert(start == cum, s"start $start != running sum $cum")
        cum += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("packing with tied order keys never double-counts (ROWS frame)") {
    // three docs share order key 1: RANGE would give all of them the
    // same start (sum of all peers); ROWS yields distinct consecutive
    // prefix sums in some tie order — token mass is conserved
    val df = Seq(("s", 1L, 10L), ("s", 1L, 20L), ("s", 1L, 30L), ("s", 2L, 5L))
      .toDF("shard", "k", "n")
    val rows = graft.operators.Packing.packByBudget(df, "shard", "k", "n", 100L)
      .select(col("bin") * 100 + col("bin_offset"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var cum = 0L
    rows.foreach { case (start, n) =>
      assert(start == cum, s"start $start != prefix sum $cum")
      cum += n
    }
    assert(cum == 65L)
  }

  test("packing is invariant under repartitioning") {
    val sized = docs.select(col("doc_id"), col("source"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"))
    val a = Packing.packByBudget(sized, "source", "doc_id", "n_tokens", 64L)
      .orderBy("doc_id").collect().toSeq
    val b = Packing.packByBudget(sized.repartition(7), "source", "doc_id", "n_tokens", 64L)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  // --- Chunking --------------------------------------------------------------

  test("chunks cover the text exactly with size-step overlap") {
    val size = 50
    val step = 30
    val rows = docs.limit(20)
      .select(col("doc_id"), col("text"),
        TextFunctions.chunks(col("text"), size, step).as("ch"))
      .collect()
    rows.foreach { r =>
      val text = r.getAs[String]("text")
      val ch = r.getSeq[org.apache.spark.sql.Row](2)
      // starts are 1, 1+step, ... and the last chunk reaches the end
      ch.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Long]("chunk_start") == 1L + i.toLong * step)
        val expect = text.substring(
          math.min(i * step, text.length),
          math.min(i * step + size, text.length))
        assert(c.getAs[String]("chunk_text") == expect)
      }
      val lastStart = (ch.size - 1) * step
      assert(lastStart < text.length && lastStart + step >= text.length,
        "chunk count must be ceil((len - size) / step) + 1 equivalent")
    }
  }

  test("chunks of empty text is a single empty chunk (doc not dropped)") {
    val out = Seq("").toDF("text")
      .select(TextFunctions.chunks(col("text"), 10, 5).as("ch"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(out.map(c => (c.getLong(0), c.getString(1))) == Seq((1L, "")))
  }

  // --- BM25 ------------------------------------------------------------------

  test("bm25 catalog query ranks term-bearing docs with positive scores") {
    val top = Queries.queries("q68_bm25")(spark, TestSpark.sf0001).collect()
    assert(top.length == 15)
    assert(top.forall(_.getAs[Double]("bm25") > 0))
    val scores = top.map(_.getAs[Double]("bm25")).toSeq
    assert(scores == scores.sorted.reverse, "descending by score")
  }

  // --- Bloom-prefiltered join ------------------------------------------------

  test("bloom semiJoin == plain semi join (false positives removed)") {
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
    val dim = Tables.load(spark, TestSpark.sf0001, "supplier")
      .filter(col("s_nationkey") < 5)
    val got = BloomJoin.semiJoin(li, "l_suppkey", dim, "s_suppkey", 1000L)
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    val want = li.join(dim.select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("bloom filter has no false negatives over the dim keys") {
    val dim = Tables.load(spark, TestSpark.sf0001, "supplier")
    val bloom = BloomJoin.buildBloom(dim, "s_suppkey", 1000L)
    val misses = dim.filter(!BloomJoin.mightContain(bloom, col("s_suppkey"))).count()
    assert(misses == 0)
  }

  // --- PageRank --------------------------------------------------------------

  test("pagerank: a ring keeps the uniform rank fixed-point exactly") {
    // every node has out-degree 1 and in-degree 1: r' = 150000 + 85% r = r
    val n = 10
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .toDF("src", "dst")
    val nodes = (0 until n).map(_.toLong).toDF("node")
    val ranks = PageRank.run(spark, edges, nodes, 7).collect()
    assert(ranks.length == n)
    ranks.foreach(r => assert(r.getAs[Long]("rank") == 1000000L))
  }

  test("pagerank: edgeless nodes settle at the base mass, sinks above it") {
    val edges = Seq((0L, 1L), (2L, 1L)).toDF("src", "dst")
    val nodes = (0L to 3L).toDF("node")
    val ranks = PageRank.run(spark, edges, nodes, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 0 and 2 are pure sources: after iter 1 they hold exactly the base
    assert(ranks(0L) == 150000L && ranks(2L) == 150000L)
    assert(ranks(3L) == 150000L, "isolated node holds the base")
    assert(ranks(1L) > ranks(0L), "the sink accumulates mass")
  }

  test("pagerank matches an independent in-memory reference on the catalog graph") {
    // recompute q70's integer recurrence driver-side from the same edges
    val edgesDf = {
      val d = TestSpark.sf0001
      val c = Tables.load(spark, d, "customer")
      val o = Tables.load(spark, d, "orders")
      val l = Tables.load(spark, d, "lineitem")
      val su = Tables.load(spark, d, "supplier")
      c.join(o, col("o_custkey") === col("c_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("s_suppkey") === col("l_suppkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("src"), col("dst")).limit(120)
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    }
    val edges = edgesDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nodes = Tables.load(spark, TestSpark.sf0001, "nation")
      .select(col("n_nationkey").cast("long").as("node"))
    val nodeIds = nodes.collect().map(_.getLong(0)).toSeq
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = nodeIds.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val mass = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / deg(s) }.sum).toMap
      rank = nodeIds.map(v => v -> (150000L + 85L * mass.getOrElse(v, 0L) / 100L)).toMap
    }
    val got = PageRank.run(spark, edgesDf, nodes, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == rank)
  }

  // --- Temperature mixing ----------------------------------------------------

  test("temperatureBalance keeps the smallest stratum whole and compresses ratios") {
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = Splits.temperatureBalance(docs, "doc_id", "lang")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLang = before.minBy(_._2)._1
    assert(after(minLang) == before(minLang), "rate 1.0 stratum fully kept")
    // expected kept fraction is sqrt(min/n): check within binomial noise
    val minN = before.values.min.toDouble
    before.foreach { case (lang, n) =>
      val expect = math.sqrt(minN / n) * n
      val got = after.getOrElse(lang, 0L).toDouble
      assert(math.abs(got - expect) <= 4 * math.sqrt(expect) + 1,
        s"$lang kept $got expected ~$expect")
    }
  }

  test("temperatureBalance is deterministic under repartitioning") {
    val a = Splits.temperatureBalance(docs, "doc_id", "lang")
      .select("doc_id").orderBy("doc_id").collect().toSeq
    val b = Splits.temperatureBalance(docs.repartition(5), "doc_id", "lang")
      .select("doc_id").orderBy("doc_id").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  // --- Sketches ---------------------------------------------------------------

  test("hll: union of per-part sketches == one-pass sketch (mergeability)") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val whole = ev.agg(hll_sketch_estimate(
      hll_sketch_agg(col("user_id"), lit(12))).as("est")).head().getLong(0)
    // split by parity, sketch each part, union the sketches
    val parts = ev.withColumn("part", pmod(col("event_id"), lit(2)))
      .groupBy("part").agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val merged = parts.agg(hll_sketch_estimate(
      hll_union_agg(col("sk"))).as("est")).head().getLong(0)
    assert(merged == whole,
      "incremental per-batch sketches must merge to the batch answer")
  }

  test("sketch gates hold at sf0.001 (q77 within 5%, q78 within rank error)") {
    val hll = Queries.queries("q77_hll_sketch")(spark, TestSpark.sf0001).collect()
    assert(hll.nonEmpty && hll.forall(_.getAs[Boolean]("within_5pct")))
    val q = Queries.queries("q78_approx_quantile")(spark, TestSpark.sf0001).head()
    assert(q.getAs[Boolean]("within_rank_error"))
  }

  // --- Transition matrix -----------------------------------------------------

  test("transition counts match a hand-built fixture") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val e = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "a"),
      (2L, 4L, 1L, "b"), (2L, 5L, 2L, "b")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = e.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 1L, ("b", "a") -> 1L, ("b", "b") -> 1L))
  }
}
