package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AviContainer, Multimodal}

/** Corruption property tests for the media parsers, in the spirit of the
  * reference's corruption suite (tests/test_corruption.cpp:48-219 — which
  * fuzzes footer/metadata/page bytes of ITS container format; ours is the
  * media-container analogue). Valid AVI/WAV/BMP payloads are corrupted a
  * thousand ways — truncation, byte flips, overflowing RIFF/chunk length
  * fields, pure garbage — and every parser must return (None or a
  * bounds-sane Some) rather than throw: in a web corpus, corrupt bytes
  * are the normal case, never a task failure.
  *
  * Generators are sampled with fixed seeds (same convention as
  * PropertiesSpec — no scalatestplus bridge offline), so any failure
  * reproduces exactly.
  */
class MediaCorruptionSpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ---- pristine payloads ------------------------------------------------

  private def bmp(w: Int = 8, h: Int = 6): Array[Byte] =
    Multimodal.syntheticBmp(w, h)((x, y) => (x * 30 % 256, y * 40 % 256, 7))

  private def wav(n: Int = 64): Array[Byte] =
    Multimodal.syntheticWav(8000, n)(i => (i * 997 % 4096).toShort)

  private def avi(frames: Int = 3): Array[Byte] =
    AviContainer.syntheticAvi(8, 6, 40000, Seq.fill(frames)(bmp()))

  private val pristine: Seq[(String, () => Array[Byte])] = Seq(
    "bmp" -> (() => bmp()),
    "wav" -> (() => wav()),
    "avi" -> (() => avi()))

  // ---- corruption strategies -------------------------------------------

  /** Truncate to a random prefix (including empty). */
  private def truncated(b: Array[Byte]): Gen[Array[Byte]] =
    Gen.choose(0, b.length - 1).map(b.take)

  /** Flip 1-8 random bytes anywhere in the payload. */
  private def flipped(b: Array[Byte]): Gen[Array[Byte]] =
    Gen.listOfN(8, Gen.zip(Gen.choose(0, b.length - 1), Gen.choose(1, 255)))
      .map { flips =>
        val out = b.clone()
        flips.foreach { case (i, x) => out(i) = (out(i) ^ x).toByte }
        out
      }

  /** Overwrite a random 4-byte window with an overflowing little-endian
    * length (0x7fffffff or -1) — the classic corrupt-length-field attack
    * on any chunked container.
    */
  private def lenBombed(b: Array[Byte]): Gen[Array[Byte]] =
    Gen.zip(Gen.choose(0, math.max(0, b.length - 4)),
        Gen.oneOf(0x7fffffff, -1, b.length * 16))
      .map { case (i, len) =>
        val out = b.clone()
        out(i) = (len & 0xff).toByte
        out(i + 1) = ((len >> 8) & 0xff).toByte
        out(i + 2) = ((len >> 16) & 0xff).toByte
        out(i + 3) = ((len >> 24) & 0xff).toByte
        out
      }

  /** Pure garbage of arbitrary length (0-512 bytes). */
  private val garbage: Gen[Array[Byte]] =
    Gen.choose(0, 512).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-128, 127)).map(_.map(_.toByte).toArray))

  private def corruptions(b: Array[Byte]): Gen[Array[Byte]] =
    Gen.oneOf(truncated(b), flipped(b), lenBombed(b), garbage)

  /** All parsers must survive any byte soup; a Some must be bounds-sane. */
  private def assertSurvives(tag: String, seed: Long, bytes: Array[Byte]): Unit = {
    val ctx = s"$tag seed=$seed len=${bytes.length}"
    AviContainer.parseAvi(bytes).foreach { a =>
      assert(a.frames.forall(_.length <= bytes.length), ctx)
      assert(a.width > 0 && a.height > 0 && a.usPerFrame > 0, ctx)
    }
    Multimodal.parseImageDims(bytes) // Option; throwing fails the test
    Multimodal.decodeImageFeatures(bytes)
    Multimodal.decodeAudioFeatures(bytes).foreach { case (rate, ch, n, rms, zcr) =>
      assert(rate > 0 && ch > 0 && n > 0, ctx)
      assert(!rms.isNaN && !zcr.isNaN, ctx)
    }
    Multimodal.resizeImage(bytes, 4, 4)
    ()
  }

  test("parsers survive 1200 corruptions of valid BMP/WAV/AVI payloads") {
    var n = 0
    for {
      (tag, mk) <- pristine
      seed <- 1L to 400L
    } {
      val corrupted = sample(corruptions(mk()), seed * 31 + tag.hashCode)
      assertSurvives(tag, seed, corrupted)
      n += 1
    }
    assert(n == 1200)
  }

  test("corrupt length fields never make parseAvi read past the payload") {
    // Target the AVI's own length fields precisely: every 4-byte window
    // that follows a fourcc gets bombed once.
    val base = avi()
    for (i <- 0 until base.length - 4) {
      val out = base.clone()
      out(i) = 0xff.toByte; out(i + 1) = 0xff.toByte
      out(i + 2) = 0xff.toByte; out(i + 3) = 0x7f.toByte
      AviContainer.parseAvi(out).foreach { a =>
        assert(a.frames.forall(_.length <= out.length), s"offset=$i")
      }
    }
  }

  test("a corrupted-payload corpus flows through the Spark extractors without task failure") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = (1L to 200L).map { seed =>
      val (tag, mk) = pristine((seed % 3).toInt)
      (seed, sample(corruptions(mk()), seed * 7 + tag.hashCode))
    } ++ Seq((9001L, bmp()), (9002L, wav()), (9003L, avi())) // plus survivors
    val df = rows.toDF("doc_id", "payload").repartition(4)

    assert(Multimodal.binaryMeta(df, "doc_id", "payload").count() == 203)
    // feature extractors: corrupt rows fall back or drop, never throw
    Multimodal.extractFeatures(df, "doc_id", "payload").count()
    Multimodal.extractAudioFeatures(df, "doc_id", "payload").count()
    Multimodal.extractVideoFeatures(df, "doc_id", "payload").count()
    Multimodal.resize(df, "doc_id", "payload", 4, 4).count()
    // the planted pristine rows still decode after living alongside soup
    assert(Multimodal.extractAudioFeatures(
      df.filter($"doc_id" === 9002L), "doc_id", "payload").count() == 1)
    assert(Multimodal.extractVideoFeatures(
      df.filter($"doc_id" === 9003L), "doc_id", "payload").count() == 1)
  }
}
