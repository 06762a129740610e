package graft.operators

import scala.collection.immutable.ArraySeq

/** Minimal RIFF-AVI container support in pure JDK byte arithmetic — the
  * piece that makes VIDEO handling real without an external codec. An
  * MJPEG-style AVI is just a RIFF tree: a `hdrl` LIST carrying the main
  * `avih` header (frame period, dimensions) and one video stream, and a
  * `movi` LIST whose `##db`/`##dc` chunks each hold ONE self-contained
  * compressed frame. Frame EXTRACTION is therefore container parsing
  * (this file), and frame DECODE is image decode — which the engine
  * already does for real through JDK ImageIO
  * ([[Multimodal.decodeImageFeatures]]). Only exotic inter-frame codecs
  * (H.264 etc.) remain out of scope, and those payloads fall back to the
  * disclosed stub path.
  *
  * Writer + parser round-trip bit-exactly (MultimodalOpsSpec), so
  * oracle-checked queries (q85) can plant videos whose per-frame features
  * are known in closed form without shipping binary fixtures.
  *
  * Format reference: public Microsoft AVI RIFF documentation (the layout
  * is also re-stated in ffmpeg's riff.c and countless public parsers).
  * The reference engine has no media surface at all
  * (/root/reference/README.md:127-138); north-star extension.
  */
object AviContainer {

  /** One parsed video: frame period in microseconds, declared dims, and
    * the raw bytes of every frame chunk in stream order.
    */
  final case class Avi(usPerFrame: Int, width: Int, height: Int,
      frames: ArraySeq[Array[Byte]])

  private val ascii = java.nio.charset.StandardCharsets.US_ASCII

  /** Deterministic canonical AVI writer: single 'vids' stream, one
    * `##dc` chunk per frame, no optional idx1 index (the index is a seek
    * accelerator, not part of the sample data). Frame payloads are
    * caller-supplied self-contained images (BMP/PNG/JPEG — anything
    * ImageIO reads back).
    */
  private[graft] def syntheticAvi(width: Int, height: Int, usPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && usPerFrame > 0 && frames.nonEmpty)
    def pad(n: Int) = n + (n & 1) // RIFF chunks are word-aligned
    val moviBody = 4 + frames.map(f => 8 + pad(f.length)).sum
    val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
    val b = java.nio.ByteBuffer.allocate(8 + riffBody)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String) = b.put(s.getBytes(ascii))
    fourcc("RIFF"); b.putInt(riffBody); fourcc("AVI ")
    // hdrl LIST: avih + one strl LIST (strh 'vids' + strf BITMAPINFOHEADER)
    fourcc("LIST"); b.putInt(hdrlBody); fourcc("hdrl")
    fourcc("avih"); b.putInt(56)
    b.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
    b.putInt(frames.length).putInt(0).putInt(1).putInt(0)
    b.putInt(width).putInt(height)
    (0 until 4).foreach(_ => b.putInt(0))
    fourcc("LIST"); b.putInt(4 + (8 + 56) + (8 + 40)); fourcc("strl")
    fourcc("strh"); b.putInt(56)
    fourcc("vids"); fourcc("MJPG")
    b.putInt(0).putShort(0).putShort(0).putInt(0)
    b.putInt(usPerFrame).putInt(1000000) // dwScale/dwRate = frame period
    b.putInt(0).putInt(frames.length).putInt(0).putInt(0).putInt(0)
    b.putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    fourcc("strf"); b.putInt(40)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
    fourcc("MJPG"); b.putInt(width * height * 3)
    b.putInt(0).putInt(0).putInt(0).putInt(0)
    // movi LIST: one ##dc chunk per frame
    fourcc("LIST"); b.putInt(moviBody); fourcc("movi")
    frames.foreach { f =>
      fourcc("00dc"); b.putInt(f.length); b.put(f)
      if ((f.length & 1) == 1) b.put(0.toByte)
    }
    require(b.position() == b.capacity(), "AVI writer layout drift")
    b.array()
  }

  /** Parse an AVI payload: None for anything that is not a well-formed
    * RIFF-AVI (the caller's fallback path — in a web corpus, non-video
    * bytes under a video column are the normal case, not a task
    * failure). Tolerant of unknown chunks and of a missing idx1, exactly
    * like real-world players; hard-bounded so corrupt length fields
    * cannot allocate past the payload.
    */
  private[graft] def parseAvi(bytes: Array[Byte]): Option[Avi] = {
    def le32(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
      ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
    def tag(i: Int) = new String(bytes, i, 4, ascii)
    if (bytes.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
    val end = math.min(bytes.length.toLong, 8L + le32(4)).toInt
    var usPerFrame = 0
    var width = 0
    var height = 0
    val frames = ArraySeq.newBuilder[Array[Byte]]
    var nFrames = 0

    // walk one chunk list; recurse into hdrl/movi LISTs
    def walk(from: Int, to: Int): Boolean = {
      var i = from
      while (i + 8 <= to) {
        val id = tag(i)
        val len = le32(i + 4)
        val body = i + 8
        // long arithmetic: a near-MaxInt corrupt length must not wrap
        // body+len negative and sneak past the bound
        if (len < 0 || body.toLong + len > to) return false // corrupt length field
        id match {
          case "LIST" if len >= 4 =>
            val listType = tag(body)
            if (listType == "hdrl" || listType == "movi" || listType == "rec ")
              if (!walk(body + 4, body + len)) return false
          case "avih" if len >= 40 =>
            usPerFrame = le32(body)
            width = le32(body + 32)
            height = le32(body + 36)
          case _ if (id.endsWith("db") || id.endsWith("dc")) &&
              id.take(2).forall(_.isDigit) =>
            // ##db/##dc: one uncompressed/compressed video frame
            frames += java.util.Arrays.copyOfRange(bytes, body, body + len)
            nFrames += 1
          case _ => () // junk/idx1/audio chunks: skipped, like any player
        }
        i = body + len + (len & 1)
      }
      true
    }
    if (!walk(12, end)) return None
    val out = frames.result()
    if (out.isEmpty || usPerFrame <= 0 || width <= 0 || height <= 0) None
    else Some(Avi(usPerFrame, width, height, out))
  }
}
