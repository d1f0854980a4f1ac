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

  /** Adam7 pass origins/steps: (xStart, yStart, xStep, yStep) per the
    * PNG spec's interlace pattern; a non-interlaced image is the single
    * trivial pass (0,0,1,1). */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** FULL PNG pixel decode, all five color types and BOTH interlace
    * methods: gray / gray+alpha / RGB / RGBA at depth 8 and 16 (16-bit
    * samples reduce to their high byte — the standard 8-bit view),
    * grayscale at depth 1/2/4 (scaled to full 8-bit range per the spec's
    * sample scaling), and PALETTE (color type 3) at depth 1/2/4/8,
    * expanded through PLTE to RGB. Concatenates the IDAT chunks, inflates
    * (java.util.zip — no external codec), undoes the per-scanline filter
    * (None/Sub/Up/Average/Paeth; `a`/`c` neighbors are `bpp` BYTES back,
    * which for sub-byte and 16-bit layouts is not one pixel's channels).
    * Adam7 streams carry each of the 7 reduced images as an independent
    * run of filtered scanlines (empty passes contribute nothing); their
    * samples scatter to (xs + px*xstep, ys + py*ystep). Returns (width,
    * height, channels, rowMajorPixels) with 8-bit channels. */
  def decodePngPixels(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    val meta = parsePng(0L, b).getOrElse(return None)
    val depth = b(24) & 0xff
    val colorType = b(25) & 0xff
    val interlace = b(28) & 0xff
    if (interlace > 1) return None
    val paletted = colorType == 3
    val valid = colorType match {
      case 0 => Seq(1, 2, 4, 8, 16).contains(depth)
      case 3 => Seq(1, 2, 4, 8).contains(depth)
      case 2 | 4 | 6 => depth == 8 || depth == 16
      case _ => false
    }
    if (!valid) return None
    val w = meta.width; val h = meta.height
    // samples per pixel in the CODED stream (palette codes 1 index/pixel)
    val spp = if (paletted) 1 else meta.channels
    val ch = if (paletted) 3 else meta.channels // output channels
    // walk chunks, concatenating IDAT payloads and capturing PLTE
    val idat = new java.io.ByteArrayOutputStream()
    var plte: Array[Byte] = null
    var off = 8
    var done = false
    while (!done && off + 8 <= b.length) {
      val len = be32(b, off)
      val typ = tag(b, off + 4)
      if (len < 0 || off + 12 + len > b.length) return None
      if (typ == "PLTE") plte = java.util.Arrays.copyOfRange(b, off + 8, off + 8 + len)
      if (typ == "IDAT") idat.write(b, off + 8, len)
      if (typ == "IEND") done = true
      off += 12 + len // len + type + data + crc
    }
    if (paletted && (plte == null || plte.length % 3 != 0)) return None
    val passes = (if (interlace == 0) Array((0, 0, 1, 1)) else Adam7)
      .map { case (xs, ys, xstep, ystep) =>
        (xs, ys, xstep, ystep,
          if (w > xs) (w - xs + xstep - 1) / xstep else 0, // pass width
          if (h > ys) (h - ys + ystep - 1) / ystep else 0) // pass height
      }
      .filter { case (_, _, _, _, pw, ph) => pw > 0 && ph > 0 }
    val bpp = math.max(1, spp * depth / 8) // filter neighbor distance
    def strideOf(pw: Int) = (pw * spp * depth + 7) / 8 // coded bytes/scanline
    val rawLen = passes.map { case (_, _, _, _, pw, ph) => ph * (strideOf(pw) + 1) }.sum
    val raw = new Array[Byte](rawLen)
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
    val out = new Array[Byte](h * w * ch)
    val maxVal = (1 << math.min(depth, 8)) - 1
    var rawOff = 0
    passes.foreach { case (xs, ys, xstep, ystep, pw, ph) =>
      val stride = strideOf(pw)
      // unfilter this pass's scanlines (in the CODED byte domain)
      val un = new Array[Byte](ph * stride)
      var r = 0
      while (r < ph) {
        val filter = raw(rawOff + r * (stride + 1)) & 0xff
        val rowIn = rawOff + r * (stride + 1) + 1
        val rowOut = r * stride
        var i = 0
        while (i < stride) {
          val x = raw(rowIn + i) & 0xff
          val a = if (i >= bpp) un(rowOut + i - bpp) & 0xff else 0 // left
          val up = if (r > 0) un(rowOut - stride + i) & 0xff else 0 // above
          val c = if (r > 0 && i >= bpp) un(rowOut - stride + i - bpp) & 0xff else 0
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
          un(rowOut + i) = (recon & 0xff).toByte
          i += 1
        }
        r += 1
      }
      rawOff += ph * (stride + 1)
      // one coded sample value (0..2^depth-1) at pass pixel x, sample s
      def sampleAt(rowOut: Int, x: Int, s: Int): Int = depth match {
        case 16 => un(rowOut + (x * spp + s) * 2) & 0xff // high byte
        case 8 => un(rowOut + x * spp + s) & 0xff
        case d => // 1/2/4-bit, MSB-first packing (spp == 1 for these)
          val bitPos = x * d
          (un(rowOut + (bitPos >> 3)) >> (8 - d - (bitPos & 7))) & ((1 << d) - 1)
      }
      // scatter pass pixels to their interlace positions
      r = 0
      while (r < ph) {
        val rowOut = r * stride
        val oy = ys + r * ystep
        var x = 0
        while (x < pw) {
          val o = (oy * w + (xs + x * xstep)) * ch
          if (paletted) {
            val idx = sampleAt(rowOut, x, 0)
            if (idx * 3 + 2 >= plte.length) return None
            out(o) = plte(idx * 3); out(o + 1) = plte(idx * 3 + 1); out(o + 2) = plte(idx * 3 + 2)
          } else if (depth < 8) { // sub-byte grayscale: scale to 0..255
            out(o) = (sampleAt(rowOut, x, 0) * 255 / maxVal).toByte
          } else {
            var s = 0
            while (s < ch) { out(o + s) = sampleAt(rowOut, x, s).toByte; s += 1 }
          }
          x += 1
        }
        r += 1
      }
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
    assemblePng(width, height, 8, colorType, filtered, None)
  }

  /** Adam7-INTERLACED PNG fixture, 8-bit gray/gray+alpha/RGB/RGBA:
    * pixel i of the FULL image = `fill(i)` (same layout as [[synthPng]],
    * so the two encodings of one image decode identically). Each of the
    * 7 reduced images is extracted, its scanlines filtered with filter
    * r % 5 (per-pass neighbor state, exactly what the decoder must
    * undo), and the passes are concatenated into one deflate stream. */
  def synthPngAdam7(width: Int, height: Int, channels: Int,
                    fill: Int => Int): Array[Byte] = {
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case other => throw new IllegalArgumentException(s"channels $other")
    }
    val stride = width * channels
    val px = Array.tabulate(height * stride)(i => (fill(i) & 0xff).toByte)
    val all = new java.io.ByteArrayOutputStream()
    Adam7.foreach { case (xs, ys, xstep, ystep) =>
      val pw = if (width > xs) (width - xs + xstep - 1) / xstep else 0
      val ph = if (height > ys) (height - ys + ystep - 1) / ystep else 0
      if (pw > 0 && ph > 0) {
        val pStride = pw * channels
        val coded = new Array[Byte](ph * pStride)
        var r = 0
        while (r < ph) {
          var x = 0
          while (x < pw) {
            var c = 0
            while (c < channels) {
              coded(r * pStride + x * channels + c) =
                px((ys + r * ystep) * stride + (xs + x * xstep) * channels + c)
              c += 1
            }
            x += 1
          }
          r += 1
        }
        all.write(filterScanlines(coded, ph, pStride, bpp = channels, nFilters = 5))
      }
    }
    assemblePng(width, height, 8, colorType, all.toByteArray, None, interlace = 1)
  }

  /** Interlace gate: the SAME doc_id-derived image as [[pngPixelStats]]
    * but encoded Adam7 — the decoder must reassemble all 7 reduced
    * images (per-pass unfilter + scatter) to reproduce the identical
    * arithmetic pixel sum. */
  def pngInterlacedStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions(_.map { id =>
      val w = (id % 31).toInt + 1
      val h = ((id * 5) % 23).toInt + 1
      val ch = (id % 3) match { case 0 => 1; case 1 => 3; case _ => 4 }
      val png = synthPngAdam7(w, h, ch, i => ((i * 7 + id) % 256).toInt)
      val (dw, dh, dch, px) = decodePngPixels(png).get
      (id, dw, dh, dch, px.map(p => (p & 0xff).toLong).sum)
    }).toDF("doc_id", "width", "height", "channels", "pix_sum")
  }

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(typ.getBytes("US-ASCII")); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** Deflate the filtered scanlines and wrap the chunk sequence
    * (IHDR [PLTE] IDAT IEND) with real CRCs. */
  private def assemblePng(width: Int, height: Int, depth: Int, colorType: Int,
                          filtered: Array[Byte],
                          plte: Option[Array[Byte]],
                          interlace: Int = 0): Array[Byte] = {
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered); deflater.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zBuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(depth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte).array()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    out.write(pngChunk("IHDR", ihdr))
    plte.foreach(p => out.write(pngChunk("PLTE", p)))
    out.write(pngChunk("IDAT", zBuf.toByteArray))
    out.write(pngChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Paletted PNG fixture (color type 3, depth 1/2/4/8): palette entry
    * byte j = (j*11+3)%256, pixel i's index = `idxOf(i)` (must fit the
    * depth), indices packed MSB-first. Scanlines alternate filter
    * None/Sub/Up — filtering operates in the CODED byte domain with
    * bpp = 1, exactly what the decoder must undo for packed indices. */
  def synthPngPalette(width: Int, height: Int, depth: Int,
                      idxOf: Int => Int): Array[Byte] = {
    require(Seq(1, 2, 4, 8).contains(depth), s"palette depth $depth")
    val n = 1 << depth
    val plte = Array.tabulate(n * 3)(j => ((j * 11 + 3) % 256).toByte)
    val stride = (width * depth + 7) / 8
    val coded = new Array[Byte](height * stride)
    var r = 0
    while (r < height) {
      var x = 0
      while (x < width) {
        val idx = idxOf(r * width + x) & (n - 1)
        val bitPos = x * depth
        val byteAt = r * stride + (bitPos >> 3)
        coded(byteAt) = (coded(byteAt) | (idx << (8 - depth - (bitPos & 7)))).toByte
        x += 1
      }
      r += 1
    }
    val filtered = filterScanlines(coded, height, stride, bpp = 1, nFilters = 3)
    assemblePng(width, height, depth, 3, filtered, Some(plte))
  }

  /** 16-bit PNG fixture: big-endian sample s (linear over the image) =
    * `sampleOf(s)` & 0xffff; scanline r filtered with filter r % 5 in the
    * coded byte domain (bpp = channels*2 — the filter neighbors are one
    * PIXEL back, two bytes per sample). */
  def synthPng16(width: Int, height: Int, channels: Int,
                 sampleOf: Int => Int): Array[Byte] = {
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case other => throw new IllegalArgumentException(s"channels $other")
    }
    val stride = width * channels * 2
    val coded = new Array[Byte](height * stride)
    var s = 0
    while (s < height * width * channels) {
      val v = sampleOf(s) & 0xffff
      coded(s * 2) = (v >> 8).toByte
      coded(s * 2 + 1) = (v & 0xff).toByte
      s += 1
    }
    val filtered = filterScanlines(coded, height, stride, bpp = channels * 2, nFilters = 5)
    assemblePng(width, height, 16, colorType, filtered, None)
  }

  /** Encoder-side scanline filtering (row r uses filter r % nFilters)
    * over the coded byte domain with the given filter distance `bpp`. */
  private def filterScanlines(coded: Array[Byte], height: Int, stride: Int,
                              bpp: Int, nFilters: Int): Array[Byte] = {
    val filtered = new Array[Byte](height * (stride + 1))
    var r = 0
    while (r < height) {
      val f = r % nFilters
      filtered(r * (stride + 1)) = f.toByte
      var i = 0
      while (i < stride) {
        val x = coded(r * stride + i) & 0xff
        val a = if (i >= bpp) coded(r * stride + i - bpp) & 0xff else 0
        val up = if (r > 0) coded((r - 1) * stride + i) & 0xff else 0
        val c = if (r > 0 && i >= bpp) coded((r - 1) * stride + i - bpp) & 0xff else 0
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
    filtered
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

  /** Palette + 16-bit PNG decode gate: even doc_ids become PALETTED
    * fixtures (depth cycles 1/2/4/8, palette entry j = (j*11+3)%256,
    * index i = (i+id)%2^depth) expanded to RGB; odd doc_ids become
    * 16-BIT fixtures (gray or RGB, big-endian sample s =
    * (s*257+id)%65536) reduced to the high byte. The oracle reproduces
    * both sums arithmetically, so a hash match certifies bit-exact
    * palette expansion, sub-byte unpacking, and 16-bit reduction through
    * the full inflate + unfilter pipeline. */
  def pngDepthStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions(_.map { id =>
      if (id % 2 == 0) {
        val w = (id % 13).toInt + 1
        val h = (id % 7).toInt + 1
        val depth = Seq(1, 2, 4, 8)(((id / 2) % 4).toInt)
        val png = synthPngPalette(w, h, depth, i => ((i + id) % (1L << depth)).toInt)
        val (dw, dh, dch, px) = decodePngPixels(png).get
        (id, "palette", depth, dw, dh, dch, px.map(p => (p & 0xff).toLong).sum)
      } else {
        val w = (id % 11).toInt + 1
        val h = (id % 5).toInt + 1
        val ch = if (id % 4 == 1) 1 else 3
        val png = synthPng16(w, h, ch, s => ((s * 257L + id) % 65536L).toInt)
        val (dw, dh, dch, px) = decodePngPixels(png).get
        (id, "depth16", 16, dw, dh, dch, px.map(p => (p & 0xff).toLong).sum)
      }
    }).toDF("doc_id", "kind", "depth", "width", "height", "channels", "pix_sum")
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
    val (dataOff, clamped) = pcm16DataChunk(b).getOrElse(return None)
    val n = clamped / 2
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

  /** Locate a WAV blob's 16-bit PCM data chunk: (dataOff, byte length
    * CLAMPED to the blob — a declared size past the buffer, e.g. a
    * truncated upload, yields the readable prefix). None for non-RIFF,
    * non-16-bit, or malformed blobs: a negative or blob-exceeding chunk
    * size would otherwise loop forever / walk backwards / overflow the
    * offset on an executor. Shared by [[wavAudioStats]] and
    * [[Audio.wavSamples]]. */
  private[pipeline] def pcm16DataChunk(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 12 ||
      !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')) return None
    var off = 12
    var dataOff = -1; var dataLen = 0; var bits = 0
    var ok = true
    while (ok && off + 8 <= b.length) {
      val id4 = tag(b, off)
      val sz = le32(b, off + 4)
      if (sz < 0) return None // malformed: would loop or walk backwards
      if (id4 == "fmt " && off + 24 <= b.length) bits = le16(b, off + 22)
      if (id4 == "data") { dataOff = off + 8; dataLen = sz }
      // advance in long space: a huge declared size must end the walk
      // (truncation, clamped below), never wrap the int offset
      val next = off.toLong + 8L + sz + (sz & 1)
      if (next > b.length) ok = false else off = next.toInt
    }
    if (bits != 16 || dataOff < 0) None
    else Some((dataOff, math.max(0, math.min(dataLen, b.length - dataOff))))
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
