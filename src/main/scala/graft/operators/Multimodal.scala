package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode/feature-extraction
  * as a partition-wise batch transform.
  *
  * The Spark-side plumbing here is real and tested: schema contract,
  * binary columns through Parquet, partition-preserving mapPartitions with
  * an explicit row encoder (the Scala analogue of mapInPandas batch
  * processing). The actual media decode is STUBBED (this container ships
  * no image/audio codecs): [[fakeDecode]] derives deterministic
  * pseudo-features from the bytes, clearly marked, so pipelines and tests
  * exercise every seam except the codec call itself.
  *
  * At 100 TB: payloads never leave executors, feature extraction is a
  * narrow transformation (no shuffle), and output rows are small fixed
  * records — the write path re-partitions only if the sink demands it.
  */
object Multimodal {

  /** Byte-level metadata of a binary payload column: one narrow projection,
    * fully codegen'd. `formatGuess` sniffs magic numbers (the part of
    * media handling that needs no codec).
    */
  def binaryMeta(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(binCol)).cast("long").as("n_bytes"),
      hex(substring(col(binCol), 1, 4)).as("header_hex"),
      when(substring(col(binCol), 1, 3) === lit(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte)), "jpeg")
        .when(substring(col(binCol), 1, 4) === lit(Array[Byte](0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)), "png")
        .when(substring(col(binCol), 1, 4) === lit("RIFF".getBytes("US-ASCII")), "riff")
        .otherwise("unknown").as("format_guess"))

  val featureSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB — deterministic fake decode. A real deployment replaces the body
    * with a codec call (e.g. JNI JPEG decode); everything around it —
    * batch iteration, schema, encoder, partitioning — is the production
    * path and stays unchanged.
    */
  private[graft] def fakeDecode(id: Long, bytes: Array[Byte]): Row = {
    var h = 1125899906842597L // deterministic FNV-ish fold of the payload
    var i = 0
    while (i < bytes.length) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
    val width = 64 + (math.abs(h) % 1024).toInt
    val height = 64 + (math.abs(h >> 10) % 1024).toInt
    val nFrames = 1 + (math.abs(h >> 20) % 32).toInt
    val feature = Array.tabulate(8)(j =>
      (((h >> (j * 7)) & 0xffff).toFloat / 65535.0f) * 2.0f - 1.0f)
    Row(id, width, height, nFrames, feature.toSeq)
  }

  /** Partition-wise "decode" of (id, payload) into typed media features.
    * Narrow transformation: each partition's payloads are processed where
    * they live, rows stream through the stubbed decoder one batch at a
    * time (constant memory).
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))
      // failed fetches (null payload/id) are the NORMAL case in a web
      // corpus: dropped here rather than NPE-ing the task
      .filter(col(idCol).isNotNull && col(binCol).isNotNull)
    val enc = RowEncoder.encoderFor(featureSchema)
    src.mapPartitions { rows =>
      rows.map(r => fakeDecode(r.getLong(0), r.getAs[Array[Byte]](1)))
    }(enc)
  }
}
