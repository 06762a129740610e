package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ParquetWrite
import graft.operators.ParquetWrite.WriteSpec

/** Writer-side layout control (reference: per-column EncodingType in the
  * schema, include/format.h:52 + the encoding switch src/format.cpp:271-284,
  * and explicit row-group flushing src/format.cpp:380-420). Asserts the
  * REQUESTED layout is what actually landed in the footers — encodings,
  * dictionary pages, row-group boundaries — not just that a round-trip
  * succeeds.
  */
class ParquetWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(): String =
    Files.createTempDirectory("graft-pw").toString

  private lazy val lineitem =
    Tables.load(spark, TestSpark.sf0001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus")

  test("v2 writer lands DELTA encodings; per-column dictionary override honored") {
    val dir = tmpDir() + "/t"
    ParquetWrite.write(lineitem.coalesce(1), dir,
      WriteSpec(writerVersion = "v2",
        dictionaryOverrides = Map("l_linestatus" -> false),
        sortWithinPartitions = Seq("l_orderkey")))
    val layout = ParquetWrite.describe(dir)
    assert(layout.nonEmpty)
    val byCol = layout.groupBy(_.column)
    // sorted int64 key under v2 -> DELTA_BINARY_PACKED (dictionary may
    // also appear if the writer started dict-encoded before falling back)
    val okey = byCol("l_orderkey")
    assert(okey.forall(c => c.encodings.contains("DELTA_BINARY_PACKED")
      || c.hasDict),
      s"l_orderkey encodings: ${okey.map(_.encodings)}")
    // dictionary disabled for l_linestatus -> no dict page, DELTA_BYTE_ARRAY
    val status = byCol("l_linestatus")
    assert(status.forall(!_.hasDict))
    assert(status.forall(_.encodings.contains("DELTA_BYTE_ARRAY")),
      s"l_linestatus encodings: ${status.map(_.encodings)}")
    // low-cardinality flag stays dictionary-encoded (v2 -> RLE_DICTIONARY)
    val flag = byCol("l_returnflag")
    assert(flag.forall(_.hasDict))
    assert(flag.forall(_.encodings.contains("RLE_DICTIONARY")),
      s"l_returnflag encodings: ${flag.map(_.encodings)}")
    // round-trip is lossless
    val back = spark.read.parquet(dir)
    assert(back.count() == lineitem.count())
    assert(graft.operators.Checks.multisetEq(back, lineitem))
  }

  test("v1 writer defaults: dictionary pages, no DELTA") {
    val dir = tmpDir() + "/t"
    ParquetWrite.write(lineitem.coalesce(1), dir, WriteSpec())
    val layout = ParquetWrite.describe(dir)
    val flag = layout.filter(_.column == "l_returnflag")
    assert(flag.nonEmpty && flag.forall(_.hasDict))
    assert(layout.forall(c => !c.encodings.exists(_.startsWith("DELTA"))),
      s"unexpected DELTA under v1: ${layout.filter(_.encodings.exists(_.startsWith("DELTA")))}")
  }

  test("rowGroupBytes controls row-group flushing (format.cpp:380-420)") {
    val dir = tmpDir() + "/t"
    // 60k rows in one file with 64KB groups -> several row groups (the
    // sf0.001 table buffers under one 64KB flush-check, so use sf0.01)
    val li = Tables.load(spark, TestSpark.sf001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus")
    ParquetWrite.write(li.coalesce(1), dir,
      WriteSpec(rowGroupBytes = 64 << 10, pageBytes = 16 << 10))
    val layout = ParquetWrite.describe(dir)
    val groups = layout.map(rg => (rg.file, rg.rowGroup)).distinct
    assert(groups.size >= 2, s"expected >=2 row groups, got ${groups.size}")
    val total = layout.filter(_.column == "l_orderkey").map(_.rows).sum
    assert(total == li.count())
  }

  test("partitionBy lands hive-style directories; filtered scan prunes at listing time") {
    val dir = tmpDir() + "/t"
    ParquetWrite.write(Tables.load(spark, TestSpark.sf0001, "events"), dir,
      WriteSpec(partitionBy = Seq("event_type")))
    val subdirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(subdirs.exists(_.startsWith("event_type=")), s"got $subdirs")
    val filtered = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(raw"PartitionFilters: \[[^\]]*event_type".r.findFirstIn(plan).isDefined,
      s"no partition filters in plan:\n$plan")
    assert(filtered.count() > 0)
  }

  test("rowGroupStats surfaces the footer min/max a pruned scan consults") {
    val dir = tmpDir() + "/t"
    ParquetWrite.write(lineitem.coalesce(1).sortWithinPartitions("l_orderkey"), dir,
      WriteSpec(rowGroupBytes = 64 << 10))
    val stats = ParquetWrite.rowGroupStats(dir, Set("l_orderkey"))
    assert(stats.nonEmpty)
    val (lo, hi) = (stats.map(_.min).min, stats.map(_.max).max)
    val r = lineitem.agg(
      org.apache.spark.sql.functions.min("l_orderkey"),
      org.apache.spark.sql.functions.max("l_orderkey")).head()
    assert(lo == r.getLong(0).toDouble && hi == r.getLong(1).toDouble)
  }

  test("maxRecordsPerFile splits output files") {
    val dir = tmpDir() + "/t"
    val n = lineitem.count()
    ParquetWrite.write(lineitem.repartition(1), dir,
      WriteSpec(maxRecordsPerFile = n / 3 + 1))
    val files = ParquetWrite.describe(dir).map(_.file).distinct
    assert(files.size >= 3, s"expected >=3 files, got ${files.size}")
  }

  test("concurrent WriteSpec writes keep their own layout options") {
    // regression for the r15 parallel-verify finding: two concurrent
    // writes with DIFFERENT parquet layout options could land with a
    // per-key mix of each other's options (v2/dict-off lost while the
    // block size held). ParquetWrite.write serializes per JVM; this
    // drives the racing shape several rounds and asserts the layout.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val base = tmpDir()
    val li = lineitem.select("l_orderkey", "l_returnflag", "l_linestatus")
    (1 to 4).foreach { i =>
      val other = Future {
        ParquetWrite.write(li.repartition(4), s"$base/other$i",
          WriteSpec(rowGroupBytes = 32 << 10, pageBytes = 8 << 10))
      }
      val spec = Future {
        ParquetWrite.write(li.coalesce(1).sortWithinPartitions("l_orderkey"),
          s"$base/spec$i",
          WriteSpec(rowGroupBytes = 64 << 10, pageBytes = 16 << 10,
            writerVersion = "v2",
            dictionaryOverrides = Map("l_orderkey" -> false)))
      }
      Await.result(Future.sequence(Seq(other, spec)), Duration.Inf)
      val chunks = ParquetWrite.describe(s"$base/spec$i")
        .filter(_.column == "l_orderkey")
      assert(chunks.nonEmpty && chunks.forall(c =>
        !c.hasDict && c.encodings.contains("DELTA_BINARY_PACKED")),
        s"round $i: v2/dict-off lost under a concurrent differently-" +
          s"optioned write: ${chunks.map(_.encodings)}")
    }
  }
}
