package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * Three real pure-JVM parsers are implemented — RIFF/WAVE (chunk walk:
  * fmt + data), BMP (BITMAPINFOHEADER), and PNG (header parse PLUS a full
  * pixel decode: IDAT inflate via java.util.zip and per-scanline
  * None/Sub/Up/Average/Paeth unfiltering) — no external codecs
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

  // ---- PNG: real header parse AND full pixel decode (pure JDK) ---------

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def pngChannels(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // truecolor
    case 3 => 1 // palette (indexed)
    case 4 => 2 // gray + alpha
    case 6 => 4 // truecolor + alpha
    case _ => 0
  }

  /** PNG header: signature + IHDR (width, height, bit depth, color type).
    * channels derives from the color type. */
  def parsePng(id: Long, b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 33 || !java.util.Arrays.equals(
      java.util.Arrays.copyOf(b, 8), PngSig)) return None
    if (be32(b, 8) != 13 || tag(b, 12) != "IHDR") return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    val ch = pngChannels(b(25) & 0xff)
    if (w <= 0 || h <= 0 || ch == 0) None
    else Some(MediaMeta(id, b.length.toLong, "png", w, h, ch))
  }

  /** FULL PNG pixel decode for the 8-bit-depth, non-interlaced,
    * non-palette cases (gray / gray+alpha / RGB / RGBA): concatenate the
    * IDAT chunks, inflate (java.util.zip — no external codec), and undo
    * the per-scanline filter (None/Sub/Up/Average/Paeth per the PNG
    * spec). Returns (width, height, channels, rowMajorPixels). */
  def decodePngPixels(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    val meta = parsePng(0L, b).getOrElse(return None)
    val depth = b(24) & 0xff
    val colorType = b(25) & 0xff
    val interlace = b(28) & 0xff
    if (depth != 8 || colorType == 3 || interlace != 0) return None
    val w = meta.width; val h = meta.height; val ch = meta.channels
    // walk chunks, concatenating IDAT payloads
    val idat = new java.io.ByteArrayOutputStream()
    var off = 8
    var done = false
    while (!done && off + 8 <= b.length) {
      val len = be32(b, off)
      val typ = tag(b, off + 4)
      if (len < 0 || off + 12 + len > b.length) return None
      if (typ == "IDAT") idat.write(b, off + 8, len)
      if (typ == "IEND") done = true
      off += 12 + len // len + type + data + crc
    }
    val stride = w * ch
    val raw = new Array[Byte](h * (stride + 1))
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      if (n == 0 && inf.needsInput()) return None // truncated stream
      got += n
    }
    inf.end()
    if (got < raw.length) return None
    // unfilter in place into the output array
    val out = new Array[Byte](h * stride)
    var r = 0
    while (r < h) {
      val filter = raw(r * (stride + 1)) & 0xff
      val rowIn = r * (stride + 1) + 1
      val rowOut = r * stride
      var i = 0
      while (i < stride) {
        val x = raw(rowIn + i) & 0xff
        val a = if (i >= ch) out(rowOut + i - ch) & 0xff else 0 // left
        val up = if (r > 0) out(rowOut - stride + i) & 0xff else 0 // above
        val c = if (r > 0 && i >= ch) out(rowOut - stride + i - ch) & 0xff else 0
        val recon = filter match {
          case 0 => x
          case 1 => x + a
          case 2 => x + up
          case 3 => x + (a + up) / 2
          case 4 => // Paeth predictor
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
          case _ => return None
        }
        out(rowOut + i) = (recon & 0xff).toByte
        i += 1
      }
      r += 1
    }
    Some((w, h, ch, out))
  }

  /** Deterministic PNG fixture writer: 8-bit gray/gray+alpha/RGB/RGBA,
    * pixel i = `fill(i)`, scanline r filtered with filter r % 5 — every
    * unfilter path is exercised. Chunks carry real CRCs; the stream is a
    * spec-conformant PNG any decoder accepts. */
  def synthPng(width: Int, height: Int, channels: Int,
               fill: Int => Int): Array[Byte] = {
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case other => throw new IllegalArgumentException(s"channels $other")
    }
    val stride = width * channels
    val px = Array.tabulate(height * stride)(i => (fill(i) & 0xff).toByte)
    // apply the row filters (the encoder side of the decoder's unfilter)
    val filtered = new Array[Byte](height * (stride + 1))
    var r = 0
    while (r < height) {
      val f = r % 5
      filtered(r * (stride + 1)) = f.toByte
      var i = 0
      while (i < stride) {
        val x = px(r * stride + i) & 0xff
        val a = if (i >= channels) px(r * stride + i - channels) & 0xff else 0
        val up = if (r > 0) px((r - 1) * stride + i) & 0xff else 0
        val c = if (r > 0 && i >= channels) px((r - 1) * stride + i - channels) & 0xff else 0
        val enc = f match {
          case 0 => x
          case 1 => x - a
          case 2 => x - up
          case 3 => x - (a + up) / 2
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
            x - (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
        }
        filtered(r * (stride + 1) + 1 + i) = (enc & 0xff).toByte
        i += 1
      }
      r += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered); deflater.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zBuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", zBuf.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** PNG real-decode gate: synthesize a deterministic PNG per doc_id
    * (dims/channels/pixels all doc_id-derived), run the FULL decode
    * (inflate + unfilter), and emit pixel statistics an external oracle
    * reproduces arithmetically — the engine only matches if the codec
    * actually reconstructs every pixel. */
  def pngPixelStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions(_.map { id =>
      val w = (id % 31).toInt + 1
      val h = ((id * 5) % 23).toInt + 1
      val ch = (id % 3) match { case 0 => 1; case 1 => 3; case _ => 4 }
      val png = synthPng(w, h, ch, i => ((i * 7 + id) % 256).toInt)
      val (dw, dh, dch, px) = decodePngPixels(png).get
      (id, dw, dh, dch, px.map(p => (p & 0xff).toLong).sum)
    }).toDF("doc_id", "width", "height", "channels", "pix_sum")
  }

  /** JPEG header: walk the marker segments for the first SOF0/1/2 frame
    * header (baseline/extended/progressive) and read precision, height,
    * width, component count. Real parse of the entropy-coded container;
    * full JPEG entropy decode is out of scope (no codec libs here). */
  def parseJpeg(id: Long, b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var off = 2
    while (off + 4 <= b.length) {
      if ((b(off) & 0xff) != 0xff) return None
      val marker = b(off + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
        off += 2 // standalone marker, no length
      } else if (marker == 0xd9 || marker == 0xda) {
        return None // EOI / start-of-scan before any SOF
      } else {
        val len = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
        if (len < 2 || off + 2 + len > b.length) return None
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          if (len < 8) return None
          val h = ((b(off + 5) & 0xff) << 8) | (b(off + 6) & 0xff)
          val w = ((b(off + 7) & 0xff) << 8) | (b(off + 8) & 0xff)
          val ncomp = b(off + 9) & 0xff
          return if (w <= 0 || h <= 0 || ncomp == 0) None
          else Some(MediaMeta(id, b.length.toLong, "jpeg", w, h, ncomp))
        }
        off += 2 + len
      }
    }
    None
  }

  // ---- image resize + audio feature extraction (over REAL decodes) -----

  /** Nearest-neighbor resize of a row-major interleaved pixel buffer —
    * the standard thumbnail/normalize step of an image training
    * pipeline. Source pixel for output (x, y) is
    * (x*srcW/dstW, y*srcH/dstH), floor semantics. */
  def resizeNearest(px: Array[Byte], w: Int, h: Int, ch: Int,
                    dstW: Int, dstH: Int): Array[Byte] = {
    val out = new Array[Byte](dstW * dstH * ch)
    var y = 0
    while (y < dstH) {
      val sy = (y.toLong * h / dstH).toInt
      var x = 0
      while (x < dstW) {
        val sx = (x.toLong * w / dstW).toInt
        var c = 0
        while (c < ch) {
          out((y * dstW + x) * ch + c) = px((sy * w + sx) * ch + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Image-resize gate: synthesize the q_mm_png_pixels PNG per doc, FULL
    * decode, nearest-neighbor resize to 8x8, emit pixel stats the oracle
    * reproduces from the source-index arithmetic — matches only if
    * decode AND resize indexing are both exact. */
  def pngResizeStats(spark: SparkSession, docs: DataFrame,
                     dstW: Int = 8, dstH: Int = 8): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions(_.map { id =>
      val w = (id % 31).toInt + 1
      val h = ((id * 5) % 23).toInt + 1
      val ch = (id % 3) match { case 0 => 1; case 1 => 3; case _ => 4 }
      val png = synthPng(w, h, ch, i => ((i * 7 + id) % 256).toInt)
      val (dw, dh, dch, px) = decodePngPixels(png).get
      val small = resizeNearest(px, dw, dh, dch, dstW, dstH)
      (id, dstW, dstH, dch, small.map(p => (p & 0xff).toLong).sum)
    }).toDF("doc_id", "width", "height", "channels", "pix_sum")
  }

  /** Audio feature extraction over REAL decoded PCM: walk the WAV data
    * chunk as little-endian 16-bit samples and compute frame count, mean
    * absolute amplitude, and RMS — the normalize/filter features an
    * audio pipeline gates on. Returns None for non-WAV / non-16-bit. */
  def wavAudioStats(id: Long, b: Array[Byte]): Option[(Long, Long, Double, Double)] = {
    val meta = parseWav(id, b).getOrElse(return None)
    // locate the data chunk again (parseWav validated structure)
    var off = 12
    var dataOff = -1; var dataLen = 0; var bits = 0
    while (off + 8 <= b.length) {
      val id4 = tag(b, off)
      val sz = le32(b, off + 4)
      if (id4 == "fmt " && off + 24 <= b.length) bits = le16(b, off + 22)
      if (id4 == "data") { dataOff = off + 8; dataLen = sz }
      off += 8 + sz + (sz & 1)
    }
    if (bits != 16 || dataOff < 0) return None
    // clamp to the blob: a data chunk whose declared size runs past the
    // buffer (truncated upload) must yield the readable prefix, not an
    // executor ArrayIndexOutOfBoundsException
    val n = math.max(0, math.min(dataLen, b.length - dataOff)) / 2
    var sumAbs = 0.0; var sumSq = 0.0
    var k = 0
    while (k < n) {
      val s = (le16(b, dataOff + 2 * k) << 16) >> 16 // sign-extend
      sumAbs += math.abs(s.toDouble); sumSq += s.toDouble * s
      k += 1
    }
    Some((meta.width.toLong, n.toLong,
      if (n == 0) 0.0 else sumAbs / n,
      if (n == 0) 0.0 else math.sqrt(sumSq / n)))
  }

  /** Audio-feature gate over the deterministic WAV fixtures (same
    * doc_id-derived shapes as [[decodeSynthetic]]): the oracle recomputes
    * mean-abs/RMS from the fixture's byte arithmetic, so matching
    * requires actually decoding the PCM. */
  def wavFeatureStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .filter(_ % 2 == 0)
      .mapPartitions(_.map { id =>
        val wav = synthWav(
          channels = if (id % 3 == 0) 2 else 1,
          sampleRate = 8000 * (1 + (id % 3).toInt),
          bitsPerSample = 16,
          nFrames = (id % 50).toInt + 1)
        // meanAbs/rms are bit-stable across engines: the sums are
        // integer-valued doubles below 2^53 (exact in any accumulation
        // order), and /n + sqrt are correctly-rounded IEEE ops
        val (frames, samples, meanAbs, rms) = wavAudioStats(id, wav).get
        (id, frames, samples, meanAbs, rms)
      }).toDF("doc_id", "n_frames", "n_samples", "mean_abs", "rms")
  }

  /** STUB fallback for formats without a parser here (JPEG/...): a
    * pure function of the payload so every engine agrees on the output. */
  private def decodeStub(b: MediaBlob): MediaMeta = {
    val n = b.bytes.length.toLong
    MediaMeta(b.doc_id, n, "raw", (n % 256).toInt + 1, ((n * 7) % 256).toInt + 1, 3)
  }

  /** Sniff + decode: real WAV/BMP/PNG/JPEG header parse, stub for
    * anything else. */
  def decodeOne(b: MediaBlob): MediaMeta =
    parseWav(b.doc_id, b.bytes)
      .orElse(parseBmp(b.doc_id, b.bytes))
      .orElse(parsePng(b.doc_id, b.bytes))
      .orElse(parseJpeg(b.doc_id, b.bytes))
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
