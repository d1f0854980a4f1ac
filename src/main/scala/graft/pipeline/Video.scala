package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Video columns as first-class pipeline data: MJPEG-in-AVI container
  * parse, every-k-th frame sampling, and per-frame decode through the
  * repo's baseline JPEG codec ([[Jpeg]]).
  *
  * AVI is the RIFF container (public spec: Microsoft "AVI RIFF File
  * Reference"; the same chunk grammar as WAV, which
  * [[Multimodal.parseWav]] already walks): a `hdrl` LIST carrying the
  * `avih` main header and per-stream `strl` LISTs (`strh`/`strf`), then
  * a `movi` LIST whose `00dc`/`00db` chunks each hold one complete JPEG
  * for the MJPEG codec. Frame extraction is container-level work — no
  * inter-frame state — so it maps onto a narrow per-partition map over
  * blob rows, exactly like the image and audio decoders: at 100 TB the
  * work distributes per document with zero shuffle.
  *
  * Everything is bounds-checked against the actual blob length: a
  * declared chunk size running past the buffer (truncated upload) yields
  * the readable prefix of frames, never an executor throw.
  */
object Video {

  /** Parsed AVI container metadata (from `avih` + the video `strh`). */
  final case class AviMeta(width: Int, height: Int, usPerFrame: Int,
                           totalFrames: Int, handler: String)

  private def fcc(b: Array[Byte], off: Int): String =
    if (off + 4 <= b.length)
      new String(b, off, 4, "US-ASCII")
    else ""

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Walk the container: metadata plus (offset, length) of each video
    * frame chunk in stream order. Frames are returned as extents into the
    * original blob — sampling then copies only the sampled frames. */
  def parseAvi(b: Array[Byte]): Option[(AviMeta, IndexedSeq[(Int, Int)])] = {
    if (b.length < 12 || fcc(b, 0) != "RIFF" || fcc(b, 8) != "AVI ") return None
    var width = 0; var height = 0; var usPerFrame = 0
    var totalFrames = 0; var handler = ""
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]

    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var off = from
      while (off + 8 <= to && off + 8 <= b.length) {
        val id = fcc(b, off)
        val sz = le32(b, off + 4)
        if (sz < 0) return // corrupt size: stop at the readable prefix
        val body = off + 8
        val end = math.min(math.min(body + sz, to), b.length)
        id match {
          case "LIST" if end >= body + 4 =>
            val kind = fcc(b, body)
            walk(body + 4, end, inMovi || kind == "movi")
          case "avih" if end >= body + 40 =>
            usPerFrame = le32(b, body)
            totalFrames = le32(b, body + 16)
            width = le32(b, body + 32)
            height = le32(b, body + 36)
          case "strh" if end >= body + 8 && fcc(b, body) == "vids" =>
            handler = fcc(b, body + 4)
          case dc if inMovi && dc.length == 4 &&
              (dc.endsWith("dc") || dc.endsWith("db")) =>
            if (end > body) frames += ((body, end - body))
          case _ => ()
        }
        off = body + sz + (sz & 1) // chunks are word-aligned
      }
    }
    walk(12, b.length, inMovi = false)
    if (width <= 0 || height <= 0) None
    else Some((AviMeta(width, height, usPerFrame, totalFrames, handler), frames.toIndexedSeq))
  }

  /** Synthesize a spec-shaped MJPEG AVI from pre-encoded JPEG frames. */
  def synthAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
               usPerFrame: Int): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length + (payload.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      bb.array() // odd payloads get the spec's zero pad byte
    }
    def list(kind: String, parts: Seq[Array[Byte]]): Array[Byte] = {
      val n = parts.map(_.length).sum
      val bb = ByteBuffer.allocate(12 + n).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("LIST".getBytes("US-ASCII")).putInt(4 + n)
        .put(kind.getBytes("US-ASCII"))
      parts.foreach(bb.put)
      bb.array()
    }
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
      .putInt(frames.length).putInt(0).putInt(1).putInt(0)
      .putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      .putInt(0).putInt(0).putInt(0)
      .putInt(usPerFrame).putInt(1000000) // scale/rate: fps = rate/scale
      .putInt(0).putInt(frames.length).putInt(0).putInt(-1).putInt(0)
      .putShort(0.toShort).putShort(0.toShort)
      .putShort(width.toShort).putShort(height.toShort)
      .array()
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(width).putInt(height).putShort(1.toShort).putShort(24.toShort)
      .put("MJPG".getBytes("US-ASCII")).putInt(width * height * 3)
      .putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val hdrl = list("hdrl", Seq(chunk("avih", avih),
      list("strl", Seq(chunk("strh", strh), chunk("strf", strf)))))
    val movi = list("movi", frames.map(chunk("00dc", _)))
    val bb = ByteBuffer.allocate(12 + hdrl.length + movi.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + hdrl.length + movi.length)
      .put("AVI ".getBytes("US-ASCII")).put(hdrl).put(movi)
    bb.array()
  }

  /** Sample every k-th frame of an MJPEG AVI and decode each through the
    * baseline JPEG codec: (frameIdx, width, height, channels, pixSum).
    * Frames the codec rejects (non-baseline) are skipped, not fatal. */
  def decodeSampledFrames(avi: Array[Byte], everyK: Int)
      : Seq[(Int, Int, Int, Int, Long)] =
    parseAvi(avi).toSeq.flatMap { case (_, frames) =>
      frames.indices.by(math.max(1, everyK)).flatMap { fi =>
        val (off, len) = frames(fi)
        Jpeg.decodePixels(java.util.Arrays.copyOfRange(avi, off, off + len))
          .map { case (w, h, ch, px) =>
            var s = 0L
            var i = 0
            while (i < px.length) { s += px(i) & 0xff; i += 1 }
            (fi, w, h, ch, s)
          }
      }
    }

  /** Gate fixture: a doc_id-derived MJPEG AVI of 2..8 gray DC-only
    * frames (quant 16 → every 8x8 block decodes to a flat,
    * exactly-predictable value; the color paths are certified separately
    * by the q_mm_jpeg_pixels gate). Frame f shifts the DC ramp by 3*f so
    * every sampled frame has a distinct, arithmetically-reproducible
    * pixel sum. */
  def synthGateAvi(id: Long): Array[Byte] = {
    val w = 8 * ((id % 2).toInt + 1)
    val h = 8 * (((id / 2) % 2).toInt + 1)
    val nf = (id % 7).toInt + 2
    val q16 = Array.fill(64)(16)
    val frames = (0 until nf).map { f =>
      Jpeg.synthJpeg(w, h, gray = true, sub420 = false, q16, q16,
        (_, b, k) => if (k == 0) (((b * 5 + id + 3 * f) % 32) - 16).toInt else 0)
    }
    synthAvi(frames, w, h, 33333 + (id % 5).toInt * 1000)
  }

  /** Oracle-gated entry: per document, synthesize the fixture AVI, parse
    * the REAL container, sample every 2nd frame, decode each through the
    * REAL JPEG codec, and emit per-frame stats plus the avih metadata —
    * an external oracle reproduces every field arithmetically, so a match
    * certifies container walk, frame indexing, and per-frame decode
    * together. */
  def videoFrameStats(spark: SparkSession, docs: DataFrame,
                      everyK: Int = 2): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].flatMap { id =>
      val avi = synthGateAvi(id)
      val meta = parseAvi(avi).get._1
      decodeSampledFrames(avi, everyK).map { case (fi, w, h, ch, pixSum) =>
        (id, fi, w, h, ch, pixSum, meta.totalFrames, meta.usPerFrame)
      }
    }.toDF("doc_id", "frame_idx", "width", "height", "channels", "pix_sum",
      "n_frames", "us_per_frame")
  }
}
