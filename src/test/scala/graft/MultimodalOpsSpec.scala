package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Compaction, Multimodal}

class MultimodalOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val payloads = Tables.load(spark, TestSpark.sf0001, "documents")
    .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  test("extractFeatures: deterministic fake features, null rows dropped") {
    val withNull = payloads.unionByName(
      Seq((99999L, Option.empty[Array[Byte]])).toDF("doc_id", "payload"))
    val out = Multimodal.extractFeatures(withNull, "doc_id", "payload")
    val n = payloads.count()
    assert(out.count() == n) // the null-payload row is dropped, not fatal
    val again = Multimodal.extractFeatures(payloads, "doc_id", "payload")
    assert(out.orderBy("id").collect().toSeq == again.orderBy("id").collect().toSeq)
  }

  test("resize bounds dimensions and shrinks payloads, preserving aspect") {
    val out = Multimodal.resize(payloads, "doc_id", "payload", 128, 128).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("width") <= 128 && r.getAs[Int]("height") <= 128)
      assert(r.getAs[Array[Byte]]("payload").nonEmpty)
    }
  }

  test("frame sampling explodes one payload row into stride-sampled frames") {
    val out = Multimodal.sampleFrames(payloads.limit(20), "doc_id", "payload", 4)
    val counts = out.groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(counts.nonEmpty && counts.values.forall(_ >= 1))
    val frames = out.filter(col("id") === counts.keys.head)
      .select("frame_no").as[Int].collect().sorted
    assert(frames.zipWithIndex.forall { case (f, i) => f == i * 4 })
  }

  test("compaction rewrites a many-small-files directory to few right-sized files") {
    val base = Files.createTempDirectory("graft-compact")
    val inDir = base.resolve("in").toString
    val outDir = base.resolve("out").toString
    // 64 tiny files
    Tables.load(spark, TestSpark.sf0001, "lineitem").repartition(64).write.parquet(inDir)
    val nIn = Files.list(java.nio.file.Paths.get(inDir))
      .filter(_.toString.endsWith(".parquet")).count()
    assert(nIn == 64)
    val target = Compaction.inputBytes(spark, inDir) / 2 // force exactly 2-3 files
    val n = Compaction.compact(spark, inDir, outDir, target)
    val nOut = Files.list(java.nio.file.Paths.get(outDir))
      .filter(_.toString.endsWith(".parquet")).count()
    assert(nOut == n && nOut < 8)
    // content preserved
    val a = spark.read.parquet(inDir).agg(count(lit(1)), sum("l_quantity")).head()
    val b = spark.read.parquet(outDir).agg(count(lit(1)), sum("l_quantity")).head()
    assert(a == b)
  }
}
