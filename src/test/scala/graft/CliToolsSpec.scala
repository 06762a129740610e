package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ColeQuery._

/** O11/O12/O13 parity tools. */
class CliToolsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("CLI flag parsing mirrors the reference surface (src/cli.cpp:172-298)") {
    val q = Cli.parseQueryArgs(List(
      "--select", "id,region", "--where", "value", ">", "100",
      "--where", "region", "==", "north", "--agg", "sum", "value",
      "--groupby", "region"))
    assert(q.projection == Seq("id", "region"))
    assert(q.filters == Seq(
      Predicate("value", Gt, 100L), Predicate("region", Eq, "north")))
    assert(q.agg.contains((Sum, "value")))
    assert(q.groupBy == Seq("region"))
    assertThrows[IllegalArgumentException](Cli.parseQueryArgs(List("--bogus")))
  }

  test("CLI --where types double and timestamp literals (not lexicographic strings)") {
    val q = Cli.parseQueryArgs(List(
      "--where", "score", ">=", "2.5", "--where", "rate", "<", "-1.5e3",
      "--where", "ts", ">=", "1996-03-01",
      "--where", "ts2", "<", "1996-03-01T12:30:00",
      "--where", "name", "==", "1996-13-99x")) // not a date: stays a string
    // expected instants constructed in UTC — the session's fixed zone —
    // NOT via the lenient, JVM-default-zone Timestamp.valueOf
    def utcTs(s: String) = java.sql.Timestamp.from(
      java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        .atZone(java.time.ZoneOffset.UTC).toInstant)
    assert(q.filters(0) == Predicate("score", Ge, 2.5))
    assert(q.filters(1) == Predicate("rate", Lt, -1500.0))
    assert(q.filters(2) == Predicate("ts", Ge, utcTs("1996-03-01 00:00:00")))
    assert(q.filters(3) == Predicate("ts2", Lt, utcTs("1996-03-01 12:30:00")))
    assert(q.filters(4) == Predicate("name", Eq, "1996-13-99x"))
    // regex-matching but IMPOSSIBLE dates must stay string literals, not
    // roll over (Timestamp.valueOf would turn Feb 31 into Mar 2 and
    // silently match the wrong rows)
    val strict = Cli.parseQueryArgs(List(
      "--where", "ts", ">=", "1996-02-31",
      "--where", "ts2", "<", "1996-02-29T00:00:00")) // 1996 IS a leap year
    assert(strict.filters(0) == Predicate("ts", Ge, "1996-02-31"))
    assert(strict.filters(1) == Predicate("ts2", Lt, utcTs("1996-02-29 00:00:00")))

    // end-to-end through compile(): the CLI path returns the same rows
    // as the typed DataFrame predicate on a double column — the bug this
    // guards against was "2.5" comparing lexicographically
    import spark.implicits._
    val df = Seq((1L, 1.75), (2L, 2.5), (3L, 10.25), (4L, 0.5))
      .toDF("id", "score")
    val cli = Cli.parseQueryArgs(List("--where", "score", ">=", "2.5"))
      .compile(df).select("id").as[Long].collect().toSet
    val typed = df.filter(col("score") >= 2.5)
      .select("id").as[Long].collect().toSet
    assert(cli == typed && cli == Set(2L, 3L))
    // timestamp literal filters a timestamp column correctly
    val tdf = Seq((1L, "1996-02-28 10:00:00"), (2L, "1996-03-02 00:00:00"))
      .toDF("id", "s").select(col("id"), col("s").cast("timestamp").as("ts"))
    val tcli = Cli.parseQueryArgs(List("--where", "ts", ">=", "1996-03-01"))
      .compile(tdf).select("id").as[Long].collect().toSet
    assert(tcli == Set(2L))
  }

  test("CLI sql passthrough covers the north-star functions (cosine_similarity over embeddings)") {
    // same code path as `graft.Cli sql <dir> "<query>"` minus the
    // process-lifecycle session spin-up/stop (the shared test session is
    // reused; GraftSession.local applies the identical registration)
    val out = Cli.runSql(spark, TestSpark.sf0001,
      """SELECT vec_id, cosine_similarity(embedding, embedding) AS self_cos,
        |       element_at(nearest_cells(embedding, array(array(1.0), array(0.0))), 1) AS cell
        |FROM embeddings WHERE vec_id < 5 ORDER BY vec_id""".stripMargin)
      .collect()
    assert(out.length == 5)
    out.foreach(r => assert(math.abs(r.getAs[Double]("self_cos") - 1.0) < 1e-12))
  }

  test("DataGen is deterministic, distribution-correct, and partitioning-independent") {
    val a = DataGen.cliTable(spark, 5000, 42).collect().sortBy(_.getLong(0))
    val b = DataGen.cliTable(spark, 5000, 42).repartition(7).collect().sortBy(_.getLong(0))
    assert(a.toSeq == b.toSeq)
    val df = DataGen.cliTable(spark, 5000, 42)
    val stats = df.agg(min("value"), max("value"), countDistinct("category"),
      countDistinct("region"), countDistinct("status")).head()
    assert(stats.getLong(0) >= 0 && stats.getLong(1) <= 10000)
    assert(stats.getLong(2) == 5 && stats.getLong(3) == 4 && stats.getLong(4) == 3)
    // different seed -> different stream
    assert(DataGen.cliTable(spark, 100, 1).collect().toSeq !=
      DataGen.cliTable(spark, 100, 2).collect().toSeq)
  }

  test("bench generator schema (benches/benchmark.cpp:55-61)") {
    val df = DataGen.benchTable(spark, 1000, 42)
    assert(df.columns.toSeq == Seq("id", "value", "score", "region"))
    val s = df.agg(max("value"), countDistinct("region"), max("score")).head()
    assert(s.getLong(0) <= 100000 && s.getLong(1) == 8 && s.getInt(2) <= 10)
  }

  test("Inspect prints schema, row groups, encodings and min/max stats (O12)") {
    val dir = Files.createTempDirectory("graft-inspect").toString + "/t"
    DataGen.cliTable(spark, 1000, 42).coalesce(1).write.parquet(dir)
    val file = Files.list(java.nio.file.Paths.get(dir))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    val out = Inspect.describe(file.toString)
    assert(out.contains("row groups: 1"))
    assert(out.contains("total rows: 1000"))
    assert(out.contains("[id]") && out.contains("[region]"))
    assert(out.contains("min=") && out.contains("max="))
  }

  test("parquet subsumes the reference's per-column encodings (SURVEY §1.4)") {
    // DataGen.write uses parquet writer v2: the sequential id column must
    // land in DELTA_BINARY_PACKED (the reference's DELTA encoder,
    // src/encoding.cpp:255-361) and the low-cardinality region column in
    // RLE_DICTIONARY (the reference's DICTIONARY+RLE,
    // src/encoding.cpp:364-438) — asserted from the written footer, so
    // the §1.4 encoding-subsumption claim is checked, not assumed.
    val dir = Files.createTempDirectory("graft-enc").toString + "/t"
    DataGen.write(DataGen.cliTable(spark, 10000, 42).coalesce(1), dir)
    val file = Files.list(java.nio.file.Paths.get(dir))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    val out = Inspect.describe(file.toString)
    val idLine = out.linesIterator.find(_.contains("[id]")).get
    assert(idLine.contains("DELTA_BINARY_PACKED"), idLine)
    val regionLine = out.linesIterator.find(_.contains("[region]")).get
    assert(regionLine.contains("RLE_DICTIONARY") || regionLine.contains("PLAIN_DICTIONARY"),
      regionLine)
  }

  test("Inspect prints per-page value counts and min/max (src/cli.cpp:151-166 parity)") {
    // small page size -> several pages per column chunk; every page of the
    // value column must report its own count and min/max from the page
    // header, matching the reference's per-page PageStats print.
    val dir = Files.createTempDirectory("graft-pages").toString + "/t"
    DataGen.cliTable(spark, 20000, 42).coalesce(1)
      .write.option("parquet.page.size", "4096")
      .option("parquet.page.row.count.limit", "5000").parquet(dir)
    val file = Files.list(java.nio.file.Paths.get(dir))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    val out = Inspect.describe(file.toString)
    val lines = out.linesIterator.toSeq
    val valueIdx = lines.indexWhere(_.contains("[value]"))
    assert(valueIdx >= 0, out)
    val pageLines = lines.drop(valueIdx + 1).takeWhile(_.trim.startsWith("page"))
    assert(pageLines.size >= 2, s"expected multiple pages, got:\n$out")
    val dataPages = pageLines.filter(_.contains("data"))
    assert(dataPages.nonEmpty)
    dataPages.foreach { l =>
      assert(l.contains("values=") && l.contains("min=") && l.contains("max="), l)
    }
    // per-page counts must sum to the chunk's value count
    val counts = dataPages.map(_.split("values=")(1).split(" ")(0).toLong)
    assert(counts.sum == 20000L, counts)
  }
}
