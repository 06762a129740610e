package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Z-order layout: pruning evidence from footer stats (deterministic —
  * no timing), measured the way a reader actually prunes: a file is a
  * candidate iff every predicate's [lo, hi] intersects the file's
  * [min, max] for that column.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Files whose footer stats intersect every (col, lo, hi) box. */
  private def candidateFiles(dir: String, box: Seq[(String, Long, Long)]): Int = {
    val files = Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    files.count { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.toString), new Configuration()))
      try {
        val cols = reader.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
        box.forall { case (name, lo, hi) =>
          val chunks = cols.filter(_.getPath.toDotString == name)
          chunks.exists { c =>
            val mn = c.getStatistics.genericGetMin.asInstanceOf[java.lang.Long]
            val mx = c.getStatistics.genericGetMax.asInstanceOf[java.lang.Long]
            mx >= lo && mn <= hi
          }
        }
      } finally reader.close()
    }
  }

  test("z-order makes EVERY clustered dimension prunable; single sort only one") {
    val base = Files.createTempDirectory("graft-zorder").toString
    // id sequential, value uniform 0..10000 — independent dimensions
    val df = DataGen.cliTable(spark, 50000, 42).select("id", "value")

    // layout A: classic single-column sort (id clustered, value scattered)
    df.repartitionByRange(16, col("id")).sortWithinPartitions(col("id"))
      .write.mode("overwrite").parquet(s"$base/bysort")
    // layout B: z-ordered on (id, value)
    Layout.writeZOrdered(df, Seq("id", "value"), s"$base/byz", 16)

    // content preserved bit-for-bit
    val back = spark.read.parquet(s"$base/byz")
    assert(back.count() == 50000)
    assert(back.agg(sum("value"), sum("id")).head() ==
      df.agg(sum("value"), sum("id")).head())

    // ~10% range predicates per dimension
    val idBox = ("id", 20000L, 25000L)
    val valueBox = ("value", 4000L, 5000L)

    // value-only predicate: the id-sorted layout cannot prune (value spans
    // the whole domain in every file); z-order must
    // (range-partition boundaries don't align to quadtree cells, so a
    // file can straddle two cells — 10/16 is the honest bound, still a
    // ~40% scan reduction where the sorted layout reads everything)
    val sortValue = candidateFiles(s"$base/bysort", Seq(valueBox))
    val zValue = candidateFiles(s"$base/byz", Seq(valueBox))
    assert(sortValue >= 15, s"id-sorted layout unexpectedly pruned on value: $sortValue")
    assert(zValue <= 10, s"z-order should prune on value, candidates=$zValue")

    // id-only predicate: both layouts prune (z-order keeps id locality too)
    val zId = candidateFiles(s"$base/byz", Seq(idBox))
    assert(zId <= 10, s"z-order should still prune on id, candidates=$zId")

    // 2-D box: z-order candidates are the intersection
    val zBoth = candidateFiles(s"$base/byz", Seq(idBox, valueBox))
    assert(zBoth <= zId && zBoth <= zValue)
  }

  test("zorderValue fails fast with a clear message on empty input") {
    val empty = DataGen.cliTable(spark, 10, 1).filter(col("id") < 0).select("id", "value")
    val ex = intercept[IllegalArgumentException] {
      Layout.zorderValue(empty, Seq("id", "value"))
    }
    assert(ex.getMessage.contains("non-empty"))
  }

  test("z-order range predicate reaches the scan as PushedFilters on both columns") {
    val base = Files.createTempDirectory("graft-zscan").toString
    Layout.writeZOrdered(
      DataGen.cliTable(spark, 20000, 7).select("id", "value"),
      Seq("id", "value"), s"$base/t", 8)
    val q = spark.read.parquet(s"$base/t")
      .filter(col("id") >= 5000 && col("id") < 7000 &&
        col("value") >= 1000 && col("value") < 2000)
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(id,5000)") &&
      pushed.contains("GreaterThanOrEqual(value,1000)"), pushed)
    // and the filtered result is correct
    assert(q.count() ==
      DataGen.cliTable(spark, 20000, 7)
        .filter(col("id") >= 5000 && col("id") < 7000 &&
          col("value") >= 1000 && col("value") < 2000).count())
  }
}
