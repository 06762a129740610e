package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink formats beyond Parquet — absent from the reference
  * (SURVEY.md §2: "No CSV/JSON/JDBC/Kafka") and free in Spark; assert
  * lossless round-trips so the catalog could serve any of them.
  * (JDBC/Kafka need external services — out of scope in the offline
  * harness; the DataFrameReader surface is identical.)
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val sample = Tables.load(spark, TestSpark.sf0001, "orders").limit(500)

  private def roundTrip(fmt: String, writeOpts: Map[String, String] = Map(),
      readOpts: Map[String, String] = Map()): Unit = {
    val dir = Files.createTempDirectory(s"graft-src-$fmt").toString + "/t"
    sample.write.format(fmt).options(writeOpts).save(dir)
    val back = spark.read.format(fmt).options(readOpts)
      .schema(sample.schema).load(dir)
    val a = sample.orderBy("o_orderkey").collect().toSeq
    val b = back.orderBy("o_orderkey").collect().toSeq
    assert(a == b, s"$fmt round-trip mismatch")
  }

  test("csv round-trip (schema-ful, header)") {
    roundTrip("csv",
      writeOpts = Map("header" -> "true", "timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS"),
      readOpts = Map("header" -> "true", "timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS"))
  }

  test("json round-trip") {
    roundTrip("json")
  }

  test("orc round-trip") {
    roundTrip("orc")
  }

  test("binary format sniffing recognizes jpeg/png/riff magic numbers") {
    import graft.operators.Multimodal
    val rows = Seq(
      (1L, Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)),
      (2L, Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt).map(_.toByte)),
      (3L, "RIFFxxxx".getBytes("US-ASCII")),
      (4L, "hello".getBytes("US-ASCII")))
    val df = spark.createDataFrame(rows).toDF("id", "payload")
    val got = Multimodal.binaryMeta(df, "id", "payload")
      .select("id", "format_guess").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "jpeg", 2L -> "png", 3L -> "riff", 4L -> "unknown"))
  }

  test("csv/json scans still push filters down to the source") {
    val dir = Files.createTempDirectory("graft-src-push").toString + "/t"
    sample.write.format("csv").option("header", "true").save(dir)
    val df = spark.read.format("csv").option("header", "true")
      .schema(sample.schema).load(dir)
      .filter(col("o_orderkey") > 100).select("o_orderkey")
    assert(df.count() > 0)
  }
}
