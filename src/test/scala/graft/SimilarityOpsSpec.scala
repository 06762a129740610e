package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators.{AsOfJoin, Sessionize, Similarity}

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // id shift for planted-clone fixtures (2^40, the catalog's CloneShift)
  private val CloneShiftSpec = 1L << 40

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f)),
      (Seq(1f, 0f), Seq(0f, 1f))
    ).toDF("a", "b").select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
    val cs = df.as[Double].collect()
    assert(math.abs(cs(0) - 1.0) < 1e-12 && math.abs(cs(1)) < 1e-12)
  }

  // run f with expression codegen fully OFF (wholeStage=false alone still
  // compiles projections — NO_CODEGEN forces the interpreted eval path)
  private def withInterpreted[A](f: => A): A = {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try f finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("native cosine expression == composed HOF cosine, bit-equal, codegen == interpreted") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings").limit(200)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv")).crossJoin(emb)
    def vals(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"),
        VectorFunctions.cosine(col("qv"), col("embedding")).as("native"),
        VectorFunctions.cosineComposed(col("qv"), col("embedding")).as("composed"))
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    val withCodegen = vals(q)
    // strict left-to-right accumulation means the native kernel must be
    // BIT-equal to the declarative formulation, not just close
    withCodegen.foreach { case (id, n, c) => assert(n == c, s"vec $id: $n != $c") }
    assert(withInterpreted(vals(q)) == withCodegen)
    // double arrays go through the same kernel
    val d = q.select(
      VectorFunctions.cosine(col("qv").cast("array<double>"),
        col("embedding").cast("array<double>")).as("c"))
      .as[Double].collect()
    assert(d.length == withCodegen.length)
    d.zip(withCodegen).foreach { case (dd, (_, n, _)) => assert(math.abs(dd - n) < 1e-12) }
  }

  test("vector expressions on degenerate inputs match the composed null-absorbing guards") {
    // mismatched dims and int arrays: composed gives 0.0 / exact double math
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f, 3f)), // length mismatch -> 0.0
      (Seq(0f, 0f), Seq(1f, 1f))      // zero norm -> 0.0
    ).toDF("a", "b")
    val cs = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].collect()
    assert(cs.toSeq == Seq(0.0, 0.0))
    // int arrays accepted (composed cast-to-double semantics)
    val ci = Seq((Seq(1, 2), Seq(1, 2))).toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].head()
    assert(math.abs(ci - 1.0) < 1e-12)
    // empty vector: native LSH buckets == composed (all-zero)
    val empty = Seq(Seq.empty[Float]).toDF("v")
    val nb = empty.select(VectorFunctions.signLshBandBuckets(col("v"), 4, 8))
      .as[Seq[Long]].head()
    val cb = empty.select(VectorFunctions.signLshBandBucketsComposed(col("v"), 4, 8))
      .as[Seq[Long]].head()
    assert(nb == cb && nb == Seq(0L, 0L, 0L, 0L))
    // null embeddings are dropped at the operator boundary, not scored
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
      .select("vec_id", "embedding").limit(50)
    val withNull = emb.unionByName(
      Seq((99999L, Option.empty[Seq[Float]])).toDF("vec_id", "embedding"))
    val out = Similarity.bruteForceTopK(
      withNull.filter(col("vec_id") < 2), withNull, "vec_id", "embedding", 3)
    assert(out.filter(col("neighbor_id") === 99999L).count() == 0)
    assert(out.count() > 0)
  }

  test("native sign-LSH bands == composed HOF formulation, bit-equal, codegen == interpreted") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings").limit(200)
    def vals() = emb.select(col("vec_id"),
      VectorFunctions.signLshBandBuckets(col("embedding"), 4, 8).as("native"),
      VectorFunctions.signLshBandBucketsComposed(col("embedding"), 4, 8).as("composed"))
      .as[(Long, Seq[Long], Seq[Long])].collect().sortBy(_._1).toSeq
    val withCodegen = vals()
    withCodegen.foreach { case (id, n, c) => assert(n == c, s"vec $id: $n != $c") }
    assert(withInterpreted(vals()) == withCodegen)
  }

  test("native nearest-cells == composed sort formulation, codegen == interpreted") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings").limit(200)
    val cents = Similarity.fitCentroids(emb, "vec_id", "embedding", 16, 2)
    def vals() = emb.select(col("vec_id"),
      Similarity.bestCells(col("embedding"), cents, 4).as("native"),
      Similarity.bestCellsComposed(col("embedding"), cents, 4).as("composed"))
      .as[(Long, Seq[Int], Seq[Int])].collect().sortBy(_._1).toSeq
    val withCodegen = vals()
    withCodegen.foreach { case (id, n, c) => assert(n == c, s"vec $id: $n != $c") }
    assert(withInterpreted(vals()) == withCodegen)
  }

  test("native residual == composed zip_with form, bit-equal; degenerate inputs zero") {
    val cents = Array(Array(0.5, -0.25, 1.0), Array(-1.0, 2.0, 0.0))
    val df = Seq(
      (0L, Seq(1.0f, 2.0f, 3.0f), 0),
      (1L, Seq(-0.5f, 0.5f, 0.25f), 1),
      (2L, Seq(0.0f, 0.0f, 0.0f), 0)).toDF("id", "v", "cell")
    val got = df.select(col("id"),
        VectorFunctions.residual(col("v"), col("cell"), cents).as("r"),
        // composed reference: per-element subtract against the indexed
        // literal centroid (the interpreted-HOF form the kernel replaces)
        zip_with(transform(col("v"), x => x.cast("double")),
          element_at(typedLit(cents.map(_.toSeq).toSeq), col("cell") + 1),
          (x, c) => x - c).as("ref"))
      .as[(Long, Seq[Double], Seq[Double])].collect().sortBy(_._1)
    got.foreach { case (id, r, ref) => assert(r == ref, s"id=$id: $r != $ref") }
    // degenerate: dim mismatch and out-of-range cell yield the zero
    // vector (PQ then codes "exactly the centroid")
    val bad = Seq((0L, Seq(1.0f, 2.0f), 0), (1L, Seq(1.0f, 2.0f, 3.0f), 7))
      .toDF("id", "v", "cell")
      .select(VectorFunctions.residual(col("v"), col("cell"), cents).as("r"))
      .as[Seq[Double]].collect()
    bad.foreach(r => assert(r == Seq(0.0, 0.0, 0.0)))
  }

  test("nearest-cell-dots: cells == nearest-cells, dots bit-equal to the scalar loop, codegen == interpreted") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings").limit(200)
    val cents = Similarity.fitCentroids(emb, "vec_id", "embedding", 16, 2)
    def vals() = emb
      .select(col("vec_id"), VectorFunctions.unit(col("embedding")).as("uq"))
      .select(col("vec_id"), col("uq"),
        Similarity.bestCells(col("uq"), cents, 4).as("cells"),
        VectorFunctions.nearestCellDots(col("uq"), cents, 4).as("cd"))
      .select(col("vec_id"), col("uq"), col("cells"),
        transform(col("cd"), x => x.getField("cell")).as("cd_cells"),
        transform(col("cd"), x => x.getField("dot")).as("cd_dots"))
      .as[(Long, Seq[Double], Seq[Int], Seq[Int], Seq[Double])]
      .collect().sortBy(_._1).toSeq
    val withCodegen = vals()
    withCodegen.foreach { case (id, uq, cells, cdCells, cdDots) =>
      assert(cdCells == cells, s"vec $id: probe order diverged")
      cdCells.zip(cdDots).foreach { case (cell, dot) =>
        // same strict left-to-right double accumulation as the kernel
        var acc = 0.0
        for (j <- uq.indices) acc += uq(j) * cents(cell)(j)
        assert(dot == acc, s"vec $id cell $cell: $dot != $acc")
      }
    }
    assert(withInterpreted(vals()) == withCodegen)
    // degenerate: dim mismatch probes cells 0..nprobe-1 with dot 0.0
    val bad = Seq(Seq(1.0f, 2.0f)).toDF("v")
      .select(VectorFunctions.nearestCellDots(col("v"), cents, 3).as("cd"))
      .select(transform(col("cd"), x => x.getField("cell")).as("c"),
        transform(col("cd"), x => x.getField("dot")).as("d"))
      .as[(Seq[Int], Seq[Double])].head()
    assert(bad == ((Seq(0, 1, 2), Seq(0.0, 0.0, 0.0))))
  }

  test("index-artifact memo: hit returns equal values, rewrite invalidates") {
    // r15: loadIndex/loadPqIndex memoize on the artifact's file manifest
    // (names, lengths, mtimes). A repeated load must return the same
    // values WITHOUT aliasing (defensive copies), and a mode-overwrite
    // rewrite (new uuid part names) must be re-read, never served stale.
    val dir = java.nio.file.Files.createTempDirectory("memo-").toString + "/idx"
    val c1 = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    Similarity.saveIndex(spark, c1, dir)
    val a = Similarity.loadIndex(spark, dir)
    assert(a.map(_.toSeq).toSeq == c1.map(_.toSeq).toSeq)
    val b = Similarity.loadIndex(spark, dir)
    assert(b.map(_.toSeq).toSeq == c1.map(_.toSeq).toSeq)
    b(0)(0) = 42.0 // mutating a returned copy must not poison the cache
    assert(Similarity.loadIndex(spark, dir)(0)(0) == 1.0)
    val c2 = Array(Array(0.5, 0.5), Array(0.5, -0.5))
    Similarity.saveIndex(spark, c2, dir) // rewrite: new part names
    assert(Similarity.loadIndex(spark, dir).map(_.toSeq).toSeq ==
      c2.map(_.toSeq).toSeq, "rewritten artifact must invalidate the memo")
  }

  test("one-pass PQ fit == the serial per-subspace reference, bit-for-bit") {
    // the r15 optimization collapses the m-subspace loop into one job
    // per Lloyd iteration; the codebooks must be BIT-identical to the
    // serial form (same hash-ordered seeds, same argmin, same mean
    // accumulation) — this reference IS the r14 implementation
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings").limit(300)
    val (m, k, iters) = (4, 8, 3)
    val onePass = Similarity.fitPqCodebooks(emb, "vec_id", "embedding", m, k, iters)
    val c = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id").as("cid"), VectorFunctions.unit(col("embedding")).as("uv"))
    val dim = c.select(size(col("uv"))).head().getInt(0)
    val sd = dim / m
    val serial = (0 until m).map { j =>
      val sub = c.select(col("cid"), slice(col("uv"), j * sd + 1, sd).as("sv"))
      var book: Array[Array[Double]] = sub
        .orderBy(xxhash64(col("cid"), lit(j)), col("cid")).limit(k)
        .select(col("sv")).collect()
        .map(_.getSeq[Number](0).map(_.doubleValue).toArray)
      for (_ <- 1 to iters) {
        val assigned = sub.withColumn("code",
          Similarity.nearestCodewordRef(col("sv"), book))
        val dimSums = (0 until sd).map(i =>
          sum(element_at(col("sv"), i + 1)).as(s"s$i"))
        val rows = assigned.groupBy(col("code"))
          .agg(count(lit(1)).as("n"), dimSums: _*).collect()
        val next = book.clone()
        rows.foreach { r =>
          val code = r.getInt(0)
          val n = r.getLong(1).toDouble
          next(code) = Array.tabulate(sd)(i => r.getDouble(2 + i) / n)
        }
        book = next
      }
      book
    }.toArray
    assert(onePass.length == serial.length)
    for (j <- 0 until m; code <- 0 until k)
      assert(onePass(j)(code).toSeq == serial(j)(code).toSeq,
        s"subspace $j code $code diverges")
  }

  test("pq_lut == scalar LUT loop bit-for-bit, codegen == interpreted; degenerate zero") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings").limit(200)
    val books = Similarity.fitPqCodebooks(emb, "vec_id", "embedding", 4, 8, 2)
    val (m, kcode, sd) = (books.length, books(0).length, books(0)(0).length)
    def vals() = emb
      .select(col("vec_id"), VectorFunctions.unit(col("embedding")).as("uq"))
      .select(col("vec_id"), col("uq"),
        VectorFunctions.pqLut(col("uq"), books).as("lut"))
      .as[(Long, Seq[Double], Seq[Double])].collect().sortBy(_._1).toSeq
    val withCodegen = vals()
    withCodegen.foreach { case (id, uq, lut) =>
      assert(lut.length == m * kcode)
      for (i <- lut.indices) {
        val (j, code) = (i / kcode, i % kcode)
        var acc = 0.0
        for (x <- 0 until sd) acc += uq(j * sd + x) * books(j)(code)(x)
        assert(lut(i) == acc, s"vec $id lut[$i]: ${lut(i)} != $acc")
      }
    }
    assert(withInterpreted(vals()) == withCodegen)
    val bad = Seq(Seq(1.0f, 2.0f)).toDF("v")
      .select(VectorFunctions.pqLut(col("v"), books)).as[Seq[Double]].head()
    assert(bad == Seq.fill(m * kcode)(0.0))
  }

  test("sq_encode/sq_dot: reconstruction within the 8-bit bound, codegen == interpreted, degenerate zero") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings").limit(200)
    def vals() = emb
      .select(col("vec_id"), VectorFunctions.unit(col("embedding")).as("uq"))
      .select(col("vec_id"), col("uq"),
        VectorFunctions.sqEncode(col("uq")).as("sq"))
      .select(col("vec_id"), col("uq"), col("sq.scale").as("scale"),
        VectorFunctions.sqDot(col("uq"), col("sq")).as("sqd"))
      .as[(Long, Seq[Double], Double, Double)].collect().sortBy(_._1).toSeq
    val withCodegen = vals()
    withCodegen.foreach { case (id, uq, scale, sqd) =>
      // encoding a unit vector against itself: dot(u, decode(u)) must
      // sit within the quantization bound of dot(u, u) = 1. Per-dim
      // error <= scale/2, so |error| <= (scale/2) * sum|u_i| and
      // sum|u_i| <= sqrt(d) for unit u.
      val bound = scale / 2 * math.sqrt(uq.length.toDouble) + 1e-12
      assert(math.abs(sqd - 1.0) <= bound,
        s"vec $id: sq_dot=$sqd deviates from 1.0 beyond $bound")
      assert(scale > 0 && scale <= 1.0 / 127.0 + 1e-12,
        s"vec $id: unit-vector scale $scale out of range")
    }
    assert(withInterpreted(vals()) == withCodegen)
    // degenerate stances: zero vector -> scale 0, sq_dot 0; dim
    // mismatch between query and codes -> 0
    val z = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0, 3.0))).toDF("zero", "three")
    val zr = z.select(
        VectorFunctions.sqDot(col("zero"),
          VectorFunctions.sqEncode(col("zero"))).as("zz"),
        VectorFunctions.sqDot(col("three"),
          VectorFunctions.sqEncode(col("zero"))).as("mismatch"))
      .as[(Double, Double)].head()
    assert(zr == ((0.0, 0.0)))
  }

  test("ivfSqSearch: SQ8 ranking beats the PQ recall ceiling at a 4x shortlist") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val cents = Similarity.fitCentroids(emb, "vec_id", "embedding",
      nlist = 16, iters = 3)
    val got = Similarity.ivfSqSearch(q, emb, "vec_id", "embedding", 5,
        cents, nprobe = 12, nassign = 2, shortlistFactor = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val want = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.count(want.contains).toDouble / want.size
    assert(recall >= 0.9, s"IVF-SQ recall=$recall at shortlist 4x")
  }

  test("ivfSqKnnJoin: full-corpus self-join, no broadcast in the plan, recall >= 0.9") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val n = emb.count()
    val cents = Similarity.fitCentroids(emb, "vec_id", "embedding",
      nlist = 16, iters = 3)
    val knn = Similarity.ivfSqKnnJoin(emb, "vec_id", "embedding", 5,
      cents, nprobe = 12, nassign = 2, shortlistFactor = 4)
    assert(!knn.queryExecution.optimizedPlan.toString.toLowerCase.contains("broadcast"))
    val got = knn.select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(got.map(_._1).distinct.length == n)
    assert(got.groupBy(_._1).values.forall(_.length == 5))
    val want = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.count(want.contains).toDouble / want.size
    assert(recall >= 0.9, s"SQ kNN-join recall=$recall")
  }

  test("mmrTopK == an independent greedy reference; lambda=1 degenerates to plain top-k") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val got = Similarity.mmrTopK(q, emb, "vec_id", "embedding", 5,
        poolFactor = 5, lambda = 0.5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // independent reference: driver-side greedy over the same pool
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    def cosine(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      val nn = math.sqrt(na) * math.sqrt(nb)
      if (nn > 0) d / nn else 0.0
    }
    val want = (0L until 5L).flatMap { qid =>
      val qv = vecs(qid)
      val pool = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cosine(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(25)
      var selected = Vector.empty[Long]
      (1 to 5).map { rank =>
        val pick = pool.filterNot(p => selected.contains(p._1))
          .map { case (id, c) =>
            val ms = if (selected.isEmpty) 0.0
              else selected.map(s => cosine(vecs(id), vecs(s))).max
            (id, 0.5 * c - 0.5 * ms)
          }.minBy { case (id, score) => (-score, id) }._1
        selected :+= pick
        (qid, rank.toLong, pick)
      }
    }.sorted
    assert(got == want)
    // lambda=1: the diversity term vanishes — MMR IS the relevance top-k
    val pure = Similarity.mmrTopK(q, emb, "vec_id", "embedding", 5,
        poolFactor = 5, lambda = 1.0)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    val plain = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(pure == plain)
  }

  test("mmrRerank over an ANN-tier pool == mmrTopK's brute pool when index recall is exhaustive") {
    // the 100 TB composition: the pool comes from the IVF-SQ index, the
    // greedy from mmrRerank — in the exhaustive-probe regime (nprobe ==
    // nlist at this toy scale, recall 1.0) the two pools are identical,
    // so the selections must be too
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val cents = Similarity.fitCentroids(emb, "vec_id", "embedding", 16, 3)
    val pool = Similarity.ivfSqSearch(q, emb, "vec_id", "embedding", 25,
      cents, nprobe = 16, nassign = 2, shortlistFactor = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id")
        .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(rows(Similarity.mmrRerank(pool, emb, "vec_id", "embedding", 5)) ==
      rows(Similarity.mmrTopK(q, emb, "vec_id", "embedding", 5,
        poolFactor = 5, lambda = 0.5)))
  }

  test("hard negatives from the SQ tier == brute baseline in the exhaustive-probe regime") {
    // the q167 composition at scale: candidates from the ANN tier,
    // exclusions from SemDeDup's labels. On the clone-planted corpus
    // (components == clone pairs) the exhaustive-probe SQ tier must
    // mine the exact same negatives as the brute-force baseline, and
    // no mined negative may share a component with its query.
    import graft.operators.Dedup
    val shift = 1L << 40
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val recrawl = emb.unionByName(
      emb.select((col("vec_id") + shift).as("vec_id"), col("embedding")))
    val comps = Dedup.semanticDedupGroupsKnn(recrawl, "vec_id", "embedding")
      .localCheckpoint()
    val q = recrawl.filter(col("vec_id") < 10)
    def negatives(knn: org.apache.spark.sql.DataFrame) = {
      val negRank = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("rank"))
      knn
        .join(comps.select(col("id").as("query_id"), col("comp").as("qc")), Seq("query_id"))
        .join(comps.select(col("id").as("neighbor_id"), col("comp").as("nc")), Seq("neighbor_id"))
        .filter(col("qc") =!= col("nc"))
        .withColumn("neg_rank", row_number().over(negRank).cast("long"))
        .filter(col("neg_rank") <= 5)
        .select("query_id", "neg_rank", "neighbor_id")
        .as[(Long, Long, Long)].collect().toSeq.sorted
    }
    val brute = negatives(
      Similarity.bruteForceTopK(q, recrawl, "vec_id", "embedding", 6))
    val cents = Similarity.fitCentroids(recrawl, "vec_id", "embedding", 16, 3)
    val tiered = negatives(
      Similarity.ivfSqSearch(q, recrawl, "vec_id", "embedding", 6,
        cents, nprobe = 16, nassign = 2, shortlistFactor = 8))
    assert(brute == tiered, "SQ-tier negatives diverged from the brute baseline")
    assert(brute.nonEmpty && brute.groupBy(_._1).forall(_._2.size == 5))
    // the exclusion held: a query's clone (same component) never mined
    assert(brute.forall { case (qid, _, nid) => nid % shift != qid % shift })
  }

  test("mmrTopK diversifies a clone-polluted pool: plain top-k drowns in copies, MMR does not") {
    // corpus = embeddings plus FOUR exact clones of every vector: the
    // plain top-5 for any query is its nearest neighbor and that
    // neighbor's clones; MMR at lambda=0.5 must pick 5 DISTINCT
    // underlying documents (a clone's marginal score collapses to
    // 0.5*cos - 0.5*1.0 < any non-duplicate candidate's)
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val polluted = (0 to 4).map(i => emb.select(
        (col("vec_id") + i * CloneShiftSpec).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    val q = emb.filter(col("vec_id") === 0)
    def originals(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("neighbor_id").as[Long].collect().toSeq
        .map(id => id % CloneShiftSpec)
    val plain = originals(Similarity.bruteForceTopK(q, polluted,
      "vec_id", "embedding", 5))
    assert(plain.distinct.size < 5,
      s"fixture broken: plain top-5 found no clone groups ($plain)")
    val mmr = originals(Similarity.mmrTopK(q, polluted,
      "vec_id", "embedding", 5, poolFactor = 5, lambda = 0.5))
    assert(mmr.distinct.size == 5,
      s"MMR must pick 5 distinct underlying documents, got $mmr")
  }

  test("TopKAgg keeps the MAX replica score per id — buffer is input-order-independent") {
    import Similarity.{TopItem, TopKBuf}
    val agg = new Similarity.TopKAgg(3)
    def run(items: Seq[TopItem]): Seq[TopItem] =
      items.foldLeft(agg.zero)(agg.reduce).items
    // id=7 appears as two replicas (different cells -> different
    // approximate scores); the better one must win regardless of
    // arrival order, including orders where the worse replica lands
    // first and orders where the better replica arrives after the
    // buffer is full
    val dup = Seq(TopItem(0.5, 7L), TopItem(0.9, 7L), TopItem(0.4, 1L),
      TopItem(0.3, 2L), TopItem(0.8, 3L))
    val want = Seq(TopItem(0.9, 7L), TopItem(0.8, 3L), TopItem(0.4, 1L))
    dup.permutations.foreach { perm =>
      assert(run(perm) == want, s"order $perm")
    }
    // merge keeps max too: any split of the stream into two partial
    // buffers merges to the same top-k
    (1 until dup.size).foreach { cut =>
      val (a, b) = dup.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(merged == TopKBuf(want), s"cut=$cut")
    }
  }

  test("ivfPqKnnJoin: every doc gets k neighbors, recall >= 0.8, no broadcast required by the plan") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val n = emb.count()
    val (cents, books) = Similarity.fitIvfPq(emb, "vec_id", "embedding",
      nlist = 16, kmeansIters = 3, m = 16, kcode = 16, pqIters = 2)
    val knn = Similarity.ivfPqKnnJoin(emb, "vec_id", "embedding", 5,
      cents, books, nprobe = 12, nassign = 2, shortlistFactor = 32)
    // the kNN-join contract: NOTHING forces the query side through the
    // driver or a broadcast — no collect by construction, and the
    // optimized plan carries no broadcast hint (AQE may still choose a
    // broadcast join at this toy scale; requiring one is what breaks
    // at corpus scale)
    assert(!knn.queryExecution.optimizedPlan.toString.toLowerCase.contains("broadcast"))
    val got = knn.select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(got.map(_._1).distinct.length == n,
      "every embedding must appear as a query")
    assert(got.groupBy(_._1).values.forall(_.length == 5))
    val want = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.count(want.contains).toDouble / want.size
    assert(recall >= 0.8, s"kNN-join recall=$recall")
  }

  test("broadcast store search prunes to probed cells: In(cell) reaches the store scan") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-cellprune")
      .toString + "/store"
    val (cents, books) = Similarity.fitIvfPq(emb, "vec_id", "embedding",
      nlist = 16, kmeansIters = 2, m = 16, kcode = 16, pqIters = 1)
    Similarity.appendCodedBatch(emb, "vec_id", "embedding", cents, books, 0L, dir)
    val q5 = emb.filter(col("vec_id") < 5)
    val res = Similarity.searchCodedStore(spark, q5, "vec_id", "embedding", 5,
      cents, books, dir, nprobe = 2, shortlistFactor = 16)
    // the probed-cell set must reach the STORE scan as a pushed filter —
    // with the store cell-sorted at admission, that is row-group skipping
    // of every unprobed cell, not just a post-read filter
    assert(res.queryExecution.sparkPlan.toString.contains("In(cell"),
      "probed-cell In() filter did not reach the store scan")
    // and pruning is exact: store search == inline from-scratch search
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "cos")
        .collect().map(_.toString).toSeq
    val inline = Similarity.ivfPqSearch(q5, emb, "vec_id", "embedding", 5,
      cents, books, nprobe = 2, nassign = 2, shortlistFactor = 16)
    assert(rows(res) == rows(inline))
  }

  test("hot-cell salting: salted kNN join == unsalted, row for row, at several salts") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val (cents, books) = Similarity.fitIvfPq(emb, "vec_id", "embedding",
      nlist = 16, kmeansIters = 3, m = 16, kcode = 16, pqIters = 2)
    def run(salt: Int): Seq[String] =
      Similarity.ivfPqKnnJoin(emb, "vec_id", "embedding", 5,
          cents, books, nprobe = 12, nassign = 2, shortlistFactor = 32,
          cellSalt = salt)
        .select("query_id", "rank", "neighbor_id", "cos")
        .collect().map(_.toString).toSeq.sorted
    val unsalted = run(1)
    // every (query, candidate) pair still meets exactly once under the
    // salted join, and TopKAgg's per-id max dedup is partition-order
    // free — so ANY salt must reproduce the exact answer
    for (s <- Seq(2, 5, 32)) assert(run(s) == unsalted, s"salt=$s diverged")
    // AUTO (cellSalt=0, the kNN-join default): derives S from the cell
    // histogram and must also reproduce the exact answer
    assert(run(0) == unsalted, "auto salt diverged")
  }

  test("autoCellSalt: 1 on balanced cells, scales with the hottest cell, capped") {
    import spark.implicits._
    def cells(counts: Seq[(Int, Long)]) = counts.toDF("cell", "n")
      .select(col("cell"), explode(sequence(lit(1L), col("n"))).as("i"))
      .select(col("cell"))
    // balanced: every cell under the target -> no salting
    assert(Similarity.autoCellSalt(
      cells(Seq(0 -> 100L, 1 -> 80L)), targetCellRowsPerTask = 1000L) === 1)
    // one hot cell 5x the target -> S = 5 (ceiling)
    assert(Similarity.autoCellSalt(
      cells(Seq(0 -> 100L, 1 -> 4200L)), targetCellRowsPerTask = 1000L) === 5)
    // cap at 64 no matter how hot
    assert(Similarity.autoCellSalt(
      cells(Seq(0 -> 100000L)), targetCellRowsPerTask = 10L) === 64)
    // empty corpus -> 1
    assert(Similarity.autoCellSalt(
      cells(Seq.empty[(Int, Long)]), targetCellRowsPerTask = 10L) === 1)
  }

  test("autoCellSalt memoizes per store path: repeated searches never re-aggregate the corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-saltcache-")
      .toString + "/coded"
    Seq.tabulate(500)(i => (i.toLong, i % 4)).toDF("cid", "cell")
      .write.parquet(dir)
    Similarity.saltCache.clear()
    // two INDEPENDENT reads of the same store path (what repeated
    // search calls build) must share one cache entry — the histogram
    // driver job runs once, not per call
    val s1 = Similarity.autoCellSalt(spark.read.parquet(dir), 1000L)
    assert(Similarity.saltCache.size === 1)
    val s2 = Similarity.autoCellSalt(spark.read.parquet(dir), 1000L)
    assert(s1 === s2)
    assert(Similarity.saltCache.size === 1,
      "a second read of the same path missed the salt cache")
    // a different target (or a different path) is a different entry
    Similarity.autoCellSalt(spark.read.parquet(dir), 10L)
    assert(Similarity.saltCache.size === 2)
  }

  test("composite IVF-PQ index: one artifact round-trips; loaded search == fresh row for row") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val (cents, books) = Similarity.fitIvfPq(emb, "vec_id", "embedding",
      nlist = 16, kmeansIters = 2, m = 16, kcode = 16, pqIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-idx").toString
    Similarity.saveIvfPqIndex(spark, cents, books, dir)
    val (lc, lb) = Similarity.loadIvfPqIndex(spark, dir)
    assert(lc.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    assert(lb.map(_.map(_.toSeq).toSeq).toSeq == books.map(_.map(_.toSeq).toSeq).toSeq)
    def results(cs: Array[Array[Double]], bs: Array[Array[Array[Double]]]) =
      Similarity.ivfPqSearch(q, emb, "vec_id", "embedding", 5, cs, bs,
        nprobe = 8, nassign = 2, shortlistFactor = 16)
        .select("query_id", "rank", "neighbor_id", "cos")
        .collect().map(_.toString).toSeq
    assert(results(cents, books) == results(lc, lb))
    // a half-missing artifact is rejected eagerly, not searched wrong
    val gappy = java.nio.file.Files.createTempDirectory("graft-ivfpq-bad").toString
    Similarity.saveIndex(spark, cents, gappy + "/centroids")
    assertThrows[Exception] { Similarity.loadIvfPqIndex(spark, gappy) }
  }

  test("coded-store admission: append is idempotent, history untouched, search == inline") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val base = emb.filter(col("vec_id") % 10 < 8)
    val late = emb.filter(col("vec_id") % 10 >= 8)
    val q = emb.filter(col("vec_id") < 5)
    val (cents, books) = Similarity.fitIvfPq(base, "vec_id", "embedding",
      nlist = 16, kmeansIters = 2, m = 16, kcode = 16, pqIters = 1)
    val store = java.nio.file.Files.createTempDirectory("graft-coded-store").toString
    Similarity.appendCodedBatch(base, "vec_id", "embedding", cents, books,
      batchId = 0L, path = store)
    // admitting a later batch must not touch batch 0's files (history
    // is never rescanned OR rewritten)
    def b0State(): Seq[(String, Long)] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(store, "batch_id=0"))
        .iterator().asScala.map(p => (p.getFileName.toString,
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toSeq.sortBy(_._1)
    }
    val before = b0State()
    Similarity.appendCodedBatch(late, "vec_id", "embedding", cents, books,
      batchId = 1L, path = store)
    assert(b0State() == before, "batch 0 files must be untouched by batch 1")
    val rows = spark.read.parquet(store).count()
    // a replayed batch is a storage no-op, not duplicate rows
    Similarity.appendCodedBatch(late, "vec_id", "embedding", cents, books,
      batchId = 1L, path = store)
    assert(spark.read.parquet(store).count() == rows, "retry must be a no-op")
    // store search == from-scratch inline encode, row for row
    val admitted = Similarity.searchCodedStore(spark, q,
        "vec_id", "embedding", 5, cents, books, store,
        nprobe = 8, shortlistFactor = 16)
      .select("query_id", "rank", "neighbor_id", "cos")
      .collect().map(_.toString).toSeq
    val inline = Similarity.ivfPqSearch(q, emb, "vec_id", "embedding", 5,
        cents, books, nprobe = 8, nassign = 2, shortlistFactor = 16)
      .select("query_id", "rank", "neighbor_id", "cos")
      .collect().map(_.toString).toSeq
    assert(admitted == inline)
  }

  test("coded-store drift stats: off-distribution batch shows higher quantization error") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val (cents, books) = Similarity.fitIvfPq(emb, "vec_id", "embedding",
      nlist = 16, kmeansIters = 2, m = 16, kcode = 16, pqIters = 1)
    val store = java.nio.file.Files.createTempDirectory("graft-drift-store").toString
    // batch 0: the distribution the index was fitted on
    Similarity.appendCodedBatch(emb, "vec_id", "embedding", cents, books,
      batchId = 0L, path = store)
    // batch 1: drifted — a large constant on one dimension pushes every
    // unitized vector toward a direction no centroid/codebook describes
    val drifted = emb.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i === 0, x + lit(5.0f)).otherwise(x)).as("embedding"))
    Similarity.appendCodedBatch(drifted, "vec_id", "embedding", cents, books,
      batchId = 1L, path = store)
    val stats = Similarity.codedStoreDriftStats(spark, store)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(stats.map(_._1) == Seq(0L, 1L))
    assert(stats(0)._2 == stats(1)._2, "same vector count per batch")
    assert(stats(1)._3 > stats(0)._3,
      s"drifted batch must show higher mean quantization error: $stats")
  }

  test("ivfPqTopK achieves >= 0.8 recall vs brute force") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    // q116's settings: near-uniform embeddings are the worst
    // quantizable case, so the probe/shortlist sit at the wide end
    // (from the sf0.1 recall sweep: 0.94 there, saturating here)
    val got = Similarity.ivfPqTopK(q, emb, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 12, m = 16, kcode = 16, nassign = 2,
      shortlistFactor = 32)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val want = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.intersect(want).size.toDouble / want.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("bruteForceTopK returns correct neighbors on a tiny fixture") {
    val vecs = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0f, 1f)), (3L, Seq(0.8f, 0.3f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs,
      "vec_id", "embedding", 2)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 3L)))
  }

  test("topk equals window-based reference on real embeddings") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val got = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb,
      "vec_id", "embedding", 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)].collect().toSet
    val q = emb.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.crossJoin(q).filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        VectorFunctions.cosine(col("qv"), col("embedding")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    val ref = scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)].collect().toSet
    assert(got == ref)
  }

  test("ivfTopK achieves >= 0.8 recall vs brute force") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall below 0.8 for nprobe=4/nlist=16")
  }

  test("ivfTopK accepts array<double> vectors too (regression)") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val out = Similarity.ivfTopK(emb.filter(col("vec_id") < 2), emb,
      "vec_id", "embedding", 3)
    assert(out.count() == 6)
  }

  test("persisted IVF index: load returns the saved centroids bit-for-bit") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val cents = Similarity.fitCentroids(emb, "vec_id", "embedding", 8, 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-idx").toString
    Similarity.saveIndex(spark, cents, dir)
    val loaded = Similarity.loadIndex(spark, dir)
    assert(loaded.length == cents.length)
    cents.zip(loaded).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.toSeq == b.toSeq, s"centroid $i drifted through parquet")
    }
  }

  test("search after reload equals fresh-fit search row for row") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val cents = Similarity.fitCentroids(emb, "vec_id", "embedding", 16, 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-idx2").toString
    Similarity.saveIndex(spark, cents, dir)
    def results(cs: Array[Array[Double]]) =
      Similarity.ivfSearch(q, emb, "vec_id", "embedding", 5, cs,
        nprobe = 6, nassign = 3)
        .select("query_id", "rank", "neighbor_id", "cos")
        .collect().map(_.toString).toSeq
    assert(results(cents) == results(Similarity.loadIndex(spark, dir)))
  }

  test("loadIndex rejects a gappy or empty index eagerly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-bad").toString
    Seq((0, Seq(1.0, 0.0)), (2, Seq(0.0, 1.0))).toDF("cell", "centroid")
      .write.mode("overwrite").parquet(dir)
    assertThrows[IllegalArgumentException] { Similarity.loadIndex(spark, dir) }
  }

  test("ivfTopK cell assignment is narrow: no Exchange between corpus scan and cell tag") {
    // the plan from the corpus scan to the cell-tagged side of the join
    // must contain no shuffle: cell assignment is a literal-centroid
    // argmax expression, not the old crossJoin+window (which exchanged
    // N*nlist rows). The only exchanges in the whole query are the
    // cell join and the final top-k aggregation.
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val out = Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 5)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("window"),
      s"no window (row_number over cells) may appear in the IVF plan:\n$plan")
    assert(!plan.toLowerCase.contains("cross"),
      s"no cross join may appear in the IVF plan:\n$plan")
  }

  test("PQ top-k: exact re-rank scores, strong recall vs brute force") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val k = 5
    val pq = Similarity.pqTopK(q, emb, "vec_id", "embedding", k, m = 16, shortlistFactor = 16)
      .select("query_id", "neighbor_id", "cos").collect()
    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id", "cos").collect()
    // k results per query, exact cosine on every emitted row (re-rank)
    assert(pq.length == bf.length)
    val bfSet = bf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = pq.count(r => bfSet.contains((r.getLong(0), r.getLong(1))))
    val recall = hits.toDouble / bf.length
    info(f"PQ recall@$k = $recall%.3f")
    assert(recall >= 0.8, f"recall $recall%.3f")
    // emitted cos values are exact: every (q,n) pair shared with brute
    // force carries the identical cosine
    val bfCos = bf.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    pq.foreach { r =>
      bfCos.get((r.getLong(0), r.getLong(1)))
        .foreach(c => assert(c == r.getDouble(2)))
    }
  }

  test("PQ index round-trips bit-identical; corrupted index rejected") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val books = Similarity.fitPqCodebooks(emb, "vec_id", "embedding", m = 4, k = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    Similarity.savePqIndex(spark, books, s"$dir/idx")
    val loaded = Similarity.loadPqIndex(spark, s"$dir/idx")
    assert(loaded.map(_.map(_.toSeq).toSeq).toSeq ==
      books.map(_.map(_.toSeq).toSeq).toSeq)
    // an index with a missing subspace fails fast, not silently mis-searches
    spark.read.parquet(s"$dir/idx").filter(col("subspace") =!= 1)
      .write.parquet(s"$dir/broken")
    assertThrows[IllegalArgumentException] {
      Similarity.loadPqIndex(spark, s"$dir/broken")
    }
  }

  test("PQ codes: m codes per vector, all in [0, kcode)") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val books = Similarity.fitPqCodebooks(emb, "vec_id", "embedding", m = 4, k = 16, iters = 2)
    assert(books.length == 4 && books.forall(_.length == 16))
    assert(books.forall(_.forall(_.length == 16))) // 64 dim / 4 subspaces
    val codes = emb.select(Similarity.pqEncodeExpr(
        org.apache.spark.sql.functions.transform(col("embedding"), x => x.cast("double")), books)
      .as("codes")).collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 16)))
  }
}

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("as-of picks the latest right row at or before each left ts") {
    val left = Seq((1L, 100L, 10L), (1L, 205L, 11L), (2L, 50L, 12L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 90L, 900L), (1L, 200L, 901L), (1L, 300L, 902L), (3L, 10L, 903L))
      .toDF("k", "t", "rid")
    val out = AsOfJoin.joinAsOf(left, right, "k", "t", "t", "rid")
      .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out(10L).contains(900L)) // t=100 -> right t=90
    assert(out(11L).contains(901L)) // t=205 -> right t=200
    assert(out(12L).isEmpty)        // no right rows for k=2
  }

  test("same-timestamp right row is visible to the left row") {
    val left = Seq((1L, 100L, 1L)).toDF("k", "t", "lid")
    val right = Seq((1L, 100L, 77L)).toDF("k", "t", "rid")
    val out = AsOfJoin.joinAsOf(left, right, "k", "t", "t", "rid")
      .select("asof_rid").as[Option[Long]].head()
    assert(out.contains(77L))
  }

  test("forward as-of picks the earliest right row at or after each left ts") {
    val left = Seq((1L, 100L, 10L), (1L, 260L, 11L)).toDF("k", "t", "lid")
    val right = Seq((1L, 90L, 900L), (1L, 200L, 901L), (1L, 250L, 902L))
      .toDF("k", "t", "rid")
    val out = AsOfJoin.joinAsOf(left, right, "k", "t", "t", "rid",
      AsOfJoin.Forward, toleranceMs = None)
      .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out(10L).contains(901L)) // t=100 -> next right at t=200
    assert(out(11L).isEmpty)        // nothing at or after t=260
  }

  test("tolerance bounds the as-of match distance") {
    val left = Seq((1L, 500L, 10L)).toDF("k", "t", "lid")
    val right = Seq((1L, 100L, 900L)).toDF("k", "t", "rid")
    val near = AsOfJoin.joinAsOf(left, right, "k", "t", "t", "rid",
      AsOfJoin.Backward, toleranceMs = Some(1000L))
      .select("asof_rid", "asof_matched").as[(Option[Long], Boolean)].head()
    assert(near == (Some(900L), true))
    val far = AsOfJoin.joinAsOf(left, right, "k", "t", "t", "rid",
      AsOfJoin.Backward, toleranceMs = Some(100L))
      .select("asof_rid", "asof_matched").as[(Option[Long], Boolean)].head()
    assert(far == (None, false)) // 400 native units away > 100
  }

  test("as-of join refuses to clobber reserved/output column names") {
    val left = Seq((1L, 100L, 10L)).toDF("k", "t", "asof_rid")
    val right = Seq((1L, 90L, 900L)).toDF("k", "t", "rid")
    assertThrows[IllegalArgumentException] {
      AsOfJoin.joinAsOf(left, right, "k", "t", "t", "rid")
    }
  }

  test("right-right ties at equal (key, ts) resolve to the larger payload struct") {
    // value-determined tie-break (window orders by __carry too): whatever
    // the partition layout, the carried row must be the max payload.
    val left = Seq((1L, 100L, 1L)).toDF("k", "t", "lid")
    val right = Seq((1L, 100L, 900L), (1L, 100L, 901L), (1L, 100L, 899L))
      .toDF("k", "t", "rid").repartition(3) // scatter the tied rows
    val out = AsOfJoin.joinAsOf(left, right, "k", "t", "t", "rid")
      .select("asof_rid").as[Option[Long]].head()
    assert(out.contains(901L))
    val fwd = AsOfJoin.joinAsOf(left, right, "k", "t", "t", "rid",
      AsOfJoin.Forward, toleranceMs = None)
      .select("asof_rid").as[Option[Long]].head()
    assert(fwd.contains(901L))
  }

  test("tolerance with mixed timestamp/numeric ts kinds is rejected") {
    val left = Seq((1L, new java.sql.Timestamp(500L), 10L)).toDF("k", "t", "lid")
    val right = Seq((1L, 100L, 900L)).toDF("k", "t", "rid")
    assertThrows[IllegalArgumentException] {
      AsOfJoin.joinAsOf(left, right, "k", "t", "t", "rid",
        AsOfJoin.Backward, toleranceMs = Some(1000L))
    }
  }

  test("unorderable (map) payloads still join, with layout-dependent ties") {
    val left = Seq((1L, 100L, 1L)).toDF("k", "t", "lid")
    val right = Seq((1L, 90L, Map("a" -> 1L))).toDF("k", "t", "m")
    val out = AsOfJoin.joinAsOf(left, right, "k", "t", "t", "m")
      .select("asof_m").collect()
    assert(out.head.getMap[String, Long](0).toMap == Map("a" -> 1L))
  }

  test("null payload on the latest right row is returned, not skipped") {
    val left = Seq((1L, 150L, 1L)).toDF("k", "t", "lid")
    val right = Seq((1L, 50L, Some(900L)), (1L, 100L, Option.empty[Long]))
      .toDF("k", "t", "rid")
    val out = AsOfJoin.joinAsOf(left, right, "k", "t", "t", "rid")
      .select("asof_rid", "asof_matched").as[(Option[Long], Boolean)].head()
    assert(out == (None, true)) // matched ts=100, whose payload is null
    // and a genuinely unmatched left row reports matched=false
    val none = AsOfJoin.joinAsOf(
      Seq((2L, 10L, 9L)).toDF("k", "t", "lid"), right, "k", "t", "t", "rid")
      .select("asof_matched").as[Boolean].head()
    assert(!none)
  }

}

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gap splits sessions; counts and bounds correct") {
    val base = 1700000000000L
    val events = Seq(
      (1L, 1L, base), (1L, 2L, base + 60000L), (1L, 3L, base + 4000000L),
      (2L, 4L, base)
    ).map { case (u, e, ms) => (u, e, new java.sql.Timestamp(ms)) }
      .toDF("user_id", "event_id", "ts")
    val out = Sessionize.sessions(events, 1800000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }
}
