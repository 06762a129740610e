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

  // hand-built minimal format headers (spec-conformant prefixes)
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = Array[Byte](0, 0, 0, 13) ++ "IHDR".getBytes("US-ASCII") ++
      java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array() ++
      Array[Byte](8, 2, 0, 0, 0)
    sig ++ ihdr
  }
  private def bmpBytes(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(30).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).position(18)
    b.putInt(w).putInt(h)
    b.array()
  }
  private def gifBytes(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("GIF89a".getBytes("US-ASCII")).putShort(w.toShort).putShort(h.toShort)
    b.array()
  }
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(2 + 6 + 11)
    b.putShort(0xffd8.toShort)                   // SOI
    b.putShort(0xffe0.toShort).putShort(4).putShort(0) // APP0, len 4
    b.putShort(0xffc0.toShort).putShort(9).put(8.toByte) // SOF0, len 9
      .putShort(h.toShort).putShort(w.toShort)
    b.array()
  }

  test("image dimensions come from REAL header parsing (png/bmp/gif/jpeg)") {
    assert(Multimodal.parseImageDims(pngBytes(640, 480)).contains(("png", 640, 480)))
    assert(Multimodal.parseImageDims(bmpBytes(123, 77)).contains(("bmp", 123, 77)))
    assert(Multimodal.parseImageDims(bmpBytes(123, -77)).contains(("bmp", 123, 77))) // top-down BMP
    assert(Multimodal.parseImageDims(gifBytes(320, 200)).contains(("gif", 320, 200)))
    assert(Multimodal.parseImageDims(jpegBytes(1920, 1080)).contains(("jpeg", 1920, 1080)))
    assert(Multimodal.parseImageDims("not an image".getBytes).isEmpty)
    assert(Multimodal.parseImageDims(pngBytes(1, 1).take(10)).isEmpty) // truncated
    // spec-legal 0xFF fill bytes before a marker must not desync the walk
    val withFill = jpegBytes(64, 32).patch(2, Array(0xff.toByte, 0xff.toByte), 0)
    assert(Multimodal.parseImageDims(withFill).contains(("jpeg", 64, 32)))
  }

  test("extractFeatures reports real dims for recognized formats, stub otherwise") {
    val rows = Seq(
      (1L, pngBytes(640, 480)), (2L, jpegBytes(32, 16)), (3L, "plain text".getBytes))
      .toDF("doc_id", "payload")
    val out = Multimodal.extractFeatures(rows, "doc_id", "payload")
      .select("id", "width", "height").as[(Long, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((640, 480)))
    assert(out(2L) == ((32, 16)))
    assert(out(3L)._1 >= 64) // unrecognized payload takes the stub path
    // formatGuess agrees with the parser on the new magics
    val guesses = Multimodal.binaryMeta(rows, "doc_id", "payload")
      .select("doc_id", "format_guess").as[(Long, String)].collect().toMap
    assert(guesses == Map(1L -> "png", 2L -> "jpeg", 3L -> "unknown"))
  }

  test("REAL pixel decode: solid-color BMP yields exact mean RGB and a 1.0 histogram bin") {
    // (r,g,b) = (200, 100, 50): luma = 0.299*200 + 0.587*100 + 0.114*50 =
    // 124.2 -> bin 3; solid color means decode exactly
    val bmp = Multimodal.syntheticBmp(5, 3)((_, _) => (200, 100, 50))
    val out = Multimodal.extractFeatures(
      Seq((7L, bmp)).toDF("doc_id", "payload"), "doc_id", "payload").head()
    assert(out.getAs[Int]("width") == 5 && out.getAs[Int]("height") == 3)
    val f = out.getAs[scala.collection.Seq[Float]]("feature")
    assert(f.length == 3 + Multimodal.LumaBins)
    assert(f(0) == 200.0f && f(1) == 100.0f && f(2) == 50.0f)
    assert(f(3 + 3) == 1.0f && f.drop(3).sum == 1.0f)
  }

  test("REAL pixel decode: two-color image averages exactly; padding rows don't leak") {
    // 2x1: red (255,0,0) luma 76.245 -> bin 2; blue (0,0,255) luma 29.07
    // -> bin 0. Width 2 forces 2 pad bytes per BMP row, which must not
    // contribute pixels.
    val bmp = Multimodal.syntheticBmp(2, 1)((x, _) => if (x == 0) (255, 0, 0) else (0, 0, 255))
    val out = Multimodal.extractFeatures(
      Seq((1L, bmp)).toDF("doc_id", "payload"), "doc_id", "payload").head()
    val f = out.getAs[scala.collection.Seq[Float]]("feature")
    assert(f(0) == 127.5f && f(1) == 0.0f && f(2) == 127.5f)
    assert(f(3 + 0) == 0.5f && f(3 + 2) == 0.5f)
  }

  test("REAL pixel decode: PNG written by ImageIO decodes to the same features as the BMP") {
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach(x => (0 until 2).foreach(y =>
      img.setRGB(x, y, (30 << 16) | (60 << 8) | 90)))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val out = Multimodal.extractFeatures(
      Seq((1L, baos.toByteArray), (2L, Multimodal.syntheticBmp(4, 2)((_, _) => (30, 60, 90))))
        .toDF("doc_id", "payload"), "doc_id", "payload")
      .orderBy("id").collect()
    assert(out(0).getAs[scala.collection.Seq[Float]]("feature")
      == out(1).getAs[scala.collection.Seq[Float]]("feature"))
    assert(out(0).getAs[Int]("width") == 4 && out(0).getAs[Int]("height") == 2)
  }

  test("extractFeatures routes audio/video payloads to the REAL decoders, kind-tagged") {
    val wav = Multimodal.syntheticWav(16000, 64)(j => if (j % 2 == 0) 2048 else -2048)
    val frames = (0 until 3).map(_ => Multimodal.syntheticBmp(4, 4)((_, _) => (10, 20, 30)))
    val avi = graft.operators.AviContainer.syntheticAvi(4, 4, 33333, frames)
    val bmp = Multimodal.syntheticBmp(2, 2)((_, _) => (1, 2, 3))
    val rows = Seq((1L, wav), (2L, avi), (3L, bmp), (4L, "noise".getBytes))
      .toDF("doc_id", "payload")
    val out = Multimodal.extractFeatures(rows, "doc_id", "payload")
      .orderBy("id").collect()
    assert(out.map(_.getAs[String]("kind")).toSeq ==
      Seq("audio", "video", "image", "stub"))
    // audio mapping: width=rate, height=channels, n_frames=samples,
    // feature=[rms, zcr] with the closed forms
    assert(out(0).getAs[Int]("width") == 16000 && out(0).getAs[Int]("height") == 1)
    assert(out(0).getAs[Int]("n_frames") == 64)
    val af = out(0).getAs[scala.collection.Seq[Float]]("feature")
    assert(af == Seq(2048.0f / 32768.0f, 1.0f))
    // video mapping: container dims + frame count, solid-color mean RGB
    assert(out(1).getAs[Int]("width") == 4 && out(1).getAs[Int]("n_frames") == 3)
    assert(out(1).getAs[scala.collection.Seq[Float]]("feature") == Seq(10f, 20f, 30f))
    // a WAV magic with a truncated body must fall to the stub, not fail
    val broken = Seq((9L, wav.take(20))).toDF("doc_id", "payload")
    val b = Multimodal.extractFeatures(broken, "doc_id", "payload").head()
    assert(b.getAs[String]("kind") == "stub")
  }

  test("corrupt image bytes fall back to the stub path, never fail the task") {
    // valid BMP magic + garbage body: ImageIO rejects it, header parse
    // still supplies dims, and the row survives
    val broken = Multimodal.syntheticBmp(3, 3)((_, _) => (1, 2, 3)).take(40)
    val out = Multimodal.extractFeatures(
      Seq((5L, broken)).toDF("doc_id", "payload"), "doc_id", "payload").collect()
    assert(out.length == 1)
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

  test("REAL audio decode: square-wave WAV yields exact closed-form features") {
    import spark.implicits._
    // amplitude 8192, half-period 4, 1000 samples at 16 kHz
    val wav = Multimodal.syntheticWav(16000, 1000)(
      i => (if ((i / 4) % 2 == 0) 8192 else -8192).toShort)
    val r = Multimodal.extractAudioFeatures(
      Seq((7L, wav)).toDF("doc_id", "payload"), "doc_id", "payload").head()
    assert(r.getLong(0) == 7L)
    assert(r.getInt(1) == 16000 && r.getInt(2) == 1 && r.getLong(3) == 1000L)
    assert(r.getDouble(4) == 8192.0 / 32768.0, "rms must be exactly A/32768")
    assert(r.getDouble(5) == (999 / 4).toDouble / 999, "zcr must be exact")
  }

  test("audio decode: silence has zero rms and zero crossings") {
    import spark.implicits._
    val wav = Multimodal.syntheticWav(8000, 100)(_ => 0.toShort)
    val r = Multimodal.extractAudioFeatures(
      Seq((1L, wav)).toDF("doc_id", "payload"), "doc_id", "payload").head()
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
  }

  test("non-audio and truncated payloads are dropped, not task failures") {
    import spark.implicits._
    val wav = Multimodal.syntheticWav(8000, 50)(_ => 100.toShort)
    val rows = Multimodal.extractAudioFeatures(Seq(
      (1L, wav),
      (2L, "not audio at all".getBytes("UTF-8")),
      (3L, wav.take(30)), // truncated inside the header
      (4L, Multimodal.syntheticBmp(4, 4)((_, _) => (1, 2, 3)))
    ).toDF("doc_id", "payload"), "doc_id", "payload")
      .collect().map(_.getLong(0)).toSet
    assert(rows == Set(1L))
  }

  test("binaryMeta sniffs WAV payloads as wav") {
    import spark.implicits._
    val wav = Multimodal.syntheticWav(8000, 10)(_ => 5.toShort)
    val fmt = Multimodal.binaryMeta(
      Seq((1L, wav)).toDF("doc_id", "payload"), "doc_id", "payload")
      .select("format_guess").head().getString(0)
    assert(fmt == "wav")
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

  test("REAL motion features: grayscale planted frames give exact closed-form diff energies") {
    // levels 10 -> 10 -> 40 -> 40 -> 15: energies (0, 900, 0, 625);
    // grayscale makes each pair's energy the exact integer delta^2
    val levels = Seq(10, 10, 40, 40, 15)
    val frames = levels.map(c => Multimodal.syntheticBmp(6, 4)((_, _) => (c, c, c)))
    val avi = graft.operators.AviContainer.syntheticAvi(6, 4, 33333, frames)
    val rows = Seq((1L, avi), (2L, "not a video".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.extractMotionFeatures(rows, "doc_id", "payload").collect()
    // non-AVI payloads are dropped, never task failures
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    val r = out.head
    assert(r.getAs[Long]("n_frames") == 5L && r.getAs[Long]("n_pairs") == 4L)
    assert(r.getAs[Double]("mean_diff_energy") == (0.0 + 900.0 + 0.0 + 625.0) / 4)
    assert(r.getAs[Double]("max_diff_energy") == 900.0)
    assert(r.getAs[Double]("still_fraction") == 0.5)
  }

  test("motion features: color frames average the three channels; stride subsamples pairs") {
    // (r,g,b) (0,0,0) -> (3,6,9): energy (9+36+81)/3 = 42 exactly
    val frames = Seq((0, 0, 0), (3, 6, 9), (3, 6, 9)).map { case (r, g, b) =>
      Multimodal.syntheticBmp(4, 4)((_, _) => (r, g, b))
    }
    val avi = graft.operators.AviContainer.syntheticAvi(4, 4, 33333, frames)
    val full = Multimodal.extractMotionFeatures(
      Seq((1L, avi)).toDF("doc_id", "payload"), "doc_id", "payload").head()
    assert(full.getAs[Long]("n_pairs") == 2L)
    assert(full.getAs[Double]("max_diff_energy") == 42.0)
    assert(full.getAs[Double]("mean_diff_energy") == 21.0)
    // stride=2 samples frames 0 and 2: one pair, same 42 energy
    val strided = Multimodal.extractMotionFeatures(
      Seq((1L, avi)).toDF("doc_id", "payload"), "doc_id", "payload",
      stride = 2).head()
    assert(strided.getAs[Long]("n_pairs") == 1L)
    assert(strided.getAs[Double]("mean_diff_energy") == 42.0)
    // fewer than two decodable frames -> dropped
    val single = graft.operators.AviContainer.syntheticAvi(4, 4, 33333,
      frames.take(1))
    assert(Multimodal.extractMotionFeatures(
      Seq((1L, single)).toDF("doc_id", "payload"), "doc_id", "payload")
      .count() == 0L)
  }
}
