package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, HashExprs}
import graft.operators.SkewJoin

/** Scale-technique operators: salted skew join, bucketed co-located join,
  * SQL registration of the custom expressions.
  */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join result == plain join result (any salt assignment)") {
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(orders, Seq("l_orderkey"))
      .agg(count(lit(1)), sum(col("l_quantity")), sum(col("o_totalprice").cast("decimal(18,2)")))
      .head()
    val salted = SkewJoin.saltedJoin(li, orders, "l_orderkey", 8)
      .agg(count(lit(1)), sum(col("l_quantity")), sum(col("o_totalprice").cast("decimal(18,2)")))
      .head()
    assert(plain == salted)
  }

  test("salted join spreads a hot key over multiple partitions") {
    val hot = spark.range(10000).select(lit(1L).as("k"), col("id"))
    val dim = Seq((1L, "x")).toDF("k", "v")
    val out = SkewJoin.saltedJoin(hot, dim, "k", 8)
    assert(out.count() == 10000)
  }

  test("salted join handles FULLY identical fact rows (the sentinel-record pathology)") {
    // value-derived salting would give all of these one salt; positional
    // salting must still produce the complete join output
    val hot = spark.range(5000).select(lit(1L).as("k"), lit("dup").as("payload"))
    val dim = Seq((1L, "x")).toDF("k", "v")
    assert(SkewJoin.saltedJoin(hot, dim, "k", 8).count() == 5000)
    // and reserved-name collision fails fast instead of corrupting
    assertThrows[IllegalArgumentException] {
      SkewJoin.saltedJoin(hot.withColumn("__salt", lit(1)), dim, "k", 8)
    }
  }

  test("custom expressions callable from SQL after register()") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT simhash64(array('a b c', 'b c d')) AS sh,
        |       size(minhash_signature(array('a b c'), 16)) AS msz,
        |       size(rolling_fingerprints('hello world rolling hash input')) AS fsz
        |""".stripMargin).head()
    assert(r.getAs[Long]("sh") != 0L)
    assert(r.getAs[Int]("msz") == 16)
    assert(r.getAs[Int]("fsz") >= 1)
    val g = spark.sql(
      "SELECT token_gram_hashes(array('a','b','c','d'), 2) AS gh").head()
      .getAs[scala.collection.Seq[Long]]("gh")
    assert(g.length == 3 && g.distinct.length == 3)
  }

  test("tokenGramHashes: positional, slice-faithful, short-input-safe") {
    import spark.implicits._
    // equal windows hash equal, and the hash at each position equals a
    // from-scratch polynomial over per-token hashes (no drift between
    // the rolling update and the direct form)
    val toks = Seq("x", "y", "x", "y", "x", "z")
    val got = Seq(toks).toDF("tk")
      .select(HashExprs.tokenGramHashes(col("tk"), 3).as("g"))
      .as[Seq[Long]].head()
    assert(got.length == 4)
    assert(got(0) == got(2)) // (x y x) at 0 and 2
    assert(got(0) != got(1) && got(1) != got(3))
    val direct = toks.sliding(3).map { w =>
      w.foldLeft(0L)((h, t) => h * 1000003L +
        org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.fromString(t),
          0x9747b28c0a3dL))
    }.toSeq
    assert(got == direct)
    // fewer tokens than n -> empty, not an error
    assert(Seq(Seq("a", "b")).toDF("tk")
      .select(HashExprs.tokenGramHashes(col("tk"), 3).as("g"))
      .as[Seq[Long]].head().isEmpty)
  }

  test("vector kernels callable from SQL: cosine, sign-LSH, nearest-cells") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(array(1.0, 0.0), array(1.0, 0.0)) AS c1,
        |       cosine_similarity(array(1.0, 0.0), array(0.0, 2.0)) AS c0,
        |       size(sign_lsh_bands(array(0.5, -0.5), 4, 8)) AS nb,
        |       nearest_cells(array(1.0, 0.0),
        |         array(array(0.0, 1.0), array(1.0, 0.0)), 2) AS cells
        |""".stripMargin).head()
    assert(r.getAs[Double]("c1") == 1.0 && r.getAs[Double]("c0") == 0.0)
    assert(r.getAs[Int]("nb") == 4)
    val u = spark.sql("SELECT unit_vector(array(3.0, 4.0)) AS u").head()
      .getAs[scala.collection.Seq[Double]]("u")
    assert(u == Seq(0.6, 0.8))
    assert(spark.sql("SELECT unit_vector(array(0.0, 0.0)) AS u").head()
      .getAs[scala.collection.Seq[Double]]("u") == Seq(0.0, 0.0))
    assert(r.getAs[scala.collection.Seq[Int]]("cells") == Seq(1, 0))
    // non-literal centroids are rejected, not silently mis-planned
    assertThrows[Exception] {
      spark.sql("SELECT nearest_cells(array(1.0), array(array(rand())))").head()
    }
    // the SQ8 tier kernels: encode round-trips through sq_dot within
    // the 8-bit bound, and the zero vector scores 0
    val sq = spark.sql(
      """SELECT sq_dot(array(0.6, 0.8), sq_encode(array(0.6, 0.8))) AS d,
        |       sq_dot(array(1.0, 1.0), sq_encode(array(0.0, 0.0))) AS z
        |""".stripMargin).head()
    assert(math.abs(sq.getAs[Double]("d") - 1.0) <= 0.8 / 127.0 / 2 * 2 + 1e-12)
    assert(sq.getAs[Double]("z") == 0.0)
    // mmr_select: three candidates where pure relevance would take the
    // two near-identical vectors; MMR at lambda=0.5 must take the
    // orthogonal one second (struct fields need explicit casts — the
    // nested shape is checked exactly, not coerced)
    val mmr = spark.sql(
      """SELECT transform(mmr_select(array(
        |  named_struct('cos', CAST(0.98 AS DOUBLE), 'id', CAST(1 AS BIGINT),
        |    'vec', CAST(array(1.0, 0.0) AS ARRAY<DOUBLE>)),
        |  named_struct('cos', CAST(0.97 AS DOUBLE), 'id', CAST(2 AS BIGINT),
        |    'vec', CAST(array(1.0, 0.01) AS ARRAY<DOUBLE>)),
        |  named_struct('cos', CAST(0.60 AS DOUBLE), 'id', CAST(3 AS BIGINT),
        |    'vec', CAST(array(0.0, 1.0) AS ARRAY<DOUBLE>))
        |), 2, 0.5), x -> x.id) AS picks""".stripMargin).head()
      .getAs[scala.collection.Seq[Long]]("picks")
    assert(mmr == Seq(1L, 3L), s"got $mmr")
  }

  test("kernel degenerate inputs: null mmr candidates are skipped; an Infinity element absorbs to sq scale 0") {
    // a null element in the candidate array (containsNull=true, e.g.
    // collect_list over an outer join) is no candidate at all — the
    // selection proceeds over the real ones instead of an NPE
    val mmr = spark.sql(
      """SELECT transform(mmr_select(array(
        |  named_struct('cos', CAST(0.9 AS DOUBLE), 'id', CAST(1 AS BIGINT),
        |    'vec', CAST(array(1.0, 0.0) AS ARRAY<DOUBLE>)),
        |  CAST(NULL AS STRUCT<cos: DOUBLE, id: BIGINT, vec: ARRAY<DOUBLE>>),
        |  named_struct('cos', CAST(0.5 AS DOUBLE), 'id', CAST(3 AS BIGINT),
        |    'vec', CAST(array(0.0, 1.0) AS ARRAY<DOUBLE>))
        |), 3, 0.5), x -> x.id) AS picks""".stripMargin).head()
      .getAs[scala.collection.Seq[Long]]("picks")
    assert(mmr == Seq(1L, 3L), s"got $mmr")
    // an all-null candidate array selects nothing
    val empty = spark.sql(
      """SELECT mmr_select(array(
        |  CAST(NULL AS STRUCT<cos: DOUBLE, id: BIGINT, vec: ARRAY<DOUBLE>>)
        |), 2, 0.5) AS picks""".stripMargin).head()
      .getAs[scala.collection.Seq[Any]]("picks")
    assert(empty.isEmpty)
    // an Infinity element would make scale Infinity and every sq_dot
    // NaN (0 * Infinity) — NaN sorts above all reals, silently topping
    // shortlists; it must absorb to the degenerate 0.0 stance instead
    val inf = spark.sql(
      """SELECT sq_dot(array(1.0, 1.0),
        |              sq_encode(array(CAST('Infinity' AS DOUBLE), 1.0))) AS d
        |""".stripMargin).head().getAs[Double]("d")
    assert(inf == 0.0, s"Infinity element must score 0.0, got $inf")
  }

  test("GraftExtensions injects functions at session build time") {
    // a derived session (shared context, fresh state) picks up injections
    // applied through the registry path; builder-time extension classes
    // are exercised via conf on a cloned session
    val s2 = spark.newSession()
    GraftFunctions.register(s2)
    assert(s2.sql("SELECT simhash64(array('x y z')) AS h").head().getAs[Long]("h") != 0L)
    // and the extension object itself is constructible + idempotent
    val ext = new GraftFunctions.GraftExtensions
    val holder = new org.apache.spark.sql.SparkSessionExtensions
    ext.apply(holder)
  }

  test("bucketed tables join without an exchange (co-located join)") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
        .select("l_orderkey", "l_quantity")
      val or = Tables.load(spark, TestSpark.sf0001, "orders")
        .select("o_orderkey", "o_totalprice")
      li.write.mode("overwrite")
        .option("path", s"$wh/li_b").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_b")
      or.write.mode("overwrite")
        .option("path", s"$wh/or_b").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("or_b")
      val joined = spark.table("li_b")
        .join(spark.table("or_b"), col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(3000))
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS or_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10485760L)
    }
  }
}
