package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * Two real pure-JVM container parsers are implemented — RIFF/WAVE (chunk
  * walk: fmt + data) and BMP (BITMAPINFOHEADER) — no external codecs
  * needed. Formats beyond those fall back to a clearly-marked STUB that
  * derives deterministic fake dimensions from the byte stream (this
  * container ships no image/audio codec libraries). The schema, Dataset
  * batch shape, per-partition iteration, and metadata struct are the real
  * plumbing any further codec drops into. At scale the binary column
  * stays columnar in parquet, the decode map is narrow (no shuffle), and
  * feature outputs are small typed columns.
  */
object Multimodal {

  final case class MediaBlob(doc_id: Long, bytes: Array[Byte])

  /** Decoded metadata. Field mapping per format:
    * wav: width = frames per channel, height = sample rate, channels;
    * bmp: pixel width/height, channels = bit depth / 8;
    * raw (stub fallback): deterministic byte-length-derived fake dims. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, format: String,
                             width: Int, height: Int, channels: Int)

  /** Attach a binary payload column (here: the UTF-8 text bytes stand in
    * for a real media blob). */
  def withBlob(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))

  // ---- real header parsers (pure JVM) ---------------------------------

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** RIFF/WAVE: walk the chunk list for "fmt " (channels, sample rate,
    * bits/sample) and "data" (payload size); frames = data / frameSize.
    * Returns None unless the RIFF+WAVE magic and both chunks are present. */
  def parseWav(id: Long, b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var off = 12
    var channels = 0; var rate = 0; var bits = 0; var dataLen = -1
    while (off + 8 <= b.length) {
      val id4 = tag(b, off)
      val sz = le32(b, off + 4)
      // malformed chunk size (negative, or larger than the blob — which
      // would also overflow the Int offset): bail to the stub, don't loop
      if (sz < 0 || sz > b.length) return None
      if (id4 == "fmt " && off + 8 + 16 <= b.length) {
        channels = le16(b, off + 10)
        rate = le32(b, off + 12)
        bits = le16(b, off + 22)
      } else if (id4 == "data") {
        dataLen = sz
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    val frameSize = channels * (bits / 8)
    if (channels <= 0 || bits <= 0 || dataLen < 0 || frameSize <= 0) None
    else Some(MediaMeta(id, b.length.toLong, "wav",
      dataLen / frameSize, rate, channels))
  }

  /** BMP with BITMAPINFOHEADER: "BM" magic, width/height (LE32, height may
    * be negative for top-down rows), channels from the bit-count field. */
  def parseBmp(id: Long, b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return None
    val w = le32(b, 18)
    val h = math.abs(le32(b, 22))
    val bitCount = le16(b, 28)
    if (w <= 0 || h <= 0 || bitCount % 8 != 0) None
    else Some(MediaMeta(id, b.length.toLong, "bmp", w, h, bitCount / 8))
  }

  /** STUB fallback for formats without a parser here (JPEG/PNG/...): a
    * pure function of the payload so every engine agrees on the output. */
  private def decodeStub(b: MediaBlob): MediaMeta = {
    val n = b.bytes.length.toLong
    MediaMeta(b.doc_id, n, "raw", (n % 256).toInt + 1, ((n * 7) % 256).toInt + 1, 3)
  }

  /** Sniff + decode: real WAV/BMP header parse, stub for anything else. */
  def decodeOne(b: MediaBlob): MediaMeta =
    parseWav(b.doc_id, b.bytes)
      .orElse(parseBmp(b.doc_id, b.bytes))
      .getOrElse(decodeStub(b))

  /** Batch decode over partitions: the Dataset[MediaBlob] → Dataset
    * [MediaMeta] shape (and its per-partition iterator) is exactly what a
    * codec UDF would plug into. */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withBlob(docs).as[MediaBlob].mapPartitions(_.map(decodeOne))
  }

  // ---- deterministic fixture writers (round-trip the real parsers) ----

  /** Canonical 44-byte-header PCM WAV with a deterministic payload. */
  def synthWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
               nFrames: Int): Array[Byte] = {
    val dataLen = nFrames * channels * (bitsPerSample / 8)
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * (bitsPerSample / 8))
      .putShort((channels * (bitsPerSample / 8)).toShort)
      .putShort(bitsPerSample.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < dataLen) { bb.put((i % 251).toByte); i += 1 }
    bb.array()
  }

  /** 24bpp bottom-up BMP (BITMAPFILEHEADER + BITMAPINFOHEADER) with
    * 4-byte-aligned rows and a deterministic pixel fill. */
  def synthBmp(width: Int, height: Int): Array[Byte] = {
    val rowSize = ((3 * width + 3) / 4) * 4
    val dataLen = rowSize * height
    val bb = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putShort(0.toShort).putShort(0.toShort).putInt(54)
    bb.putInt(40).putInt(width).putInt(height)
      .putShort(1.toShort).putShort(24.toShort)
      .putInt(0).putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var i = 0
    while (i < dataLen) { bb.put((i % 253).toByte); i += 1 }
    bb.array()
  }

  /** Real-decode gate input: deterministic WAV (even doc_id) / BMP (odd)
    * fixtures derived from doc_id, decoded through the REAL parsers — an
    * external oracle reproduces the expected fields from the same
    * arithmetic while the engine must actually parse the bytes. */
  def decodeSynthetic(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val blob =
        if (id % 2 == 0)
          MediaBlob(id, synthWav(
            channels = if (id % 3 == 0) 2 else 1,
            sampleRate = 8000 * (1 + (id % 3).toInt),
            bitsPerSample = 16,
            nFrames = (id % 50).toInt + 1))
        else MediaBlob(id, synthBmp(
          width = (id % 64).toInt + 1, height = ((id * 3) % 48).toInt + 1))
      decodeOne(blob)
    })
  }

  /** Deterministic frame sampling stub: pick every k-th "frame" offset of
    * the payload (a video decoder would emit real frames). */
  def sampleFrames(spark: SparkSession, docs: DataFrame, everyK: Int = 64): DataFrame = {
    import spark.implicits._
    withBlob(docs).as[MediaBlob].flatMap { b =>
      b.bytes.indices.by(everyK).map(off =>
        (b.doc_id, off.toLong, (b.bytes(off) & 0xff).toLong))
    }.toDF("doc_id", "frame_off", "frame_val")
  }
}
