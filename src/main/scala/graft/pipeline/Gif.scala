package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GIF87a/89a codec, pure JDK — the third real image codec next to the
  * PNG and baseline-JPEG decoders: logical-screen / image-descriptor
  * parse, global & local color tables, full LZW decompression (variable
  * code width 3..12 bits, clear/EOI codes, KwKwK case, dictionary
  * reset), and the 4-pass interlace scatter. The encoder side emits
  * spec-conformant streams (real LZW with the deferred code-width
  * increase, dictionary reset at 4096) used by the oracle gate and the
  * ImageIO cross-checks.
  *
  * Decodes the FIRST image of the stream (animation frames beyond the
  * first, GCE transparency, and disposal methods are out of scope — the
  * training-pipeline use is thumbnail/feature extraction of stills). */
object Gif {

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Interlace pass layout: (first row, row step) per pass. */
  private val Passes = Seq((0, 8), (4, 8), (2, 4), (1, 2))

  // ---- LZW ---------------------------------------------------------------

  /** LZW-decompress `data` (the concatenated image sub-blocks) into at
    * most `expected` palette indices. Returns None on a malformed
    * stream (out-of-range code, truncated bitstream). */
  private def lzwDecode(minCodeSize: Int, data: Array[Byte],
                        expected: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 8) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    // dictionary as (prefix code, suffix byte) arrays — O(1) adds, the
    // string for a code is materialized by walking prefixes onto a stack
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = eoi + 1
    var codeSize = minCodeSize + 1
    val out = new java.io.ByteArrayOutputStream(expected)
    val stack = new Array[Byte](4096)
    var bitPos = 0
    val nBits = data.length * 8
    def readCode(): Int = {
      if (bitPos + codeSize > nBits) return -1
      var v = 0; var i = 0
      while (i < codeSize) {
        val p = bitPos + i
        if ((data(p >> 3) & (1 << (p & 7))) != 0) v |= 1 << i
        i += 1
      }
      bitPos += codeSize
      v
    }
    def emit(code: Int): Int = { // returns the FIRST byte of the string
      var depth = 0; var c = code
      while (c >= clear) { stack(depth) = suffix(c); depth += 1; c = prefix(c) }
      val first = c.toByte
      out.write(first & 0xff)
      while (depth > 0) { depth -= 1; out.write(stack(depth) & 0xff) }
      first
    }
    var prev = -1
    var done = false
    while (!done && out.size() < expected) {
      val code = readCode()
      if (code < 0) return None // truncated before EOI / expected output
      else if (code == clear) {
        next = eoi + 1; codeSize = minCodeSize + 1; prev = -1
      } else if (code == eoi) done = true
      else if (prev == -1) {
        if (code >= clear) return None
        emit(code); prev = code
      } else if (code <= next) {
        val first =
          if (code < next) emit(code)
          else { // KwKwK: code == next — string(prev) + first(string(prev))
            var c = prev; while (c >= clear) c = prefix(c)
            val f = c.toByte
            emit(prev)
            out.write(f & 0xff)
            f
          }
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first.toByte; next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      } else return None // code beyond the dictionary
    }
    Some(java.util.Arrays.copyOf(out.toByteArray, expected min out.size()))
  }

  /** LZW-compress palette indices. Mirrors the decoder's deferred
    * code-width rule (width grows when the entry count the DECODER has
    * seen reaches the width's capacity) and resets the dictionary with a
    * CLEAR code at 4096 entries. */
  def lzwEncode(minCodeSize: Int, indices: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0; var curBits = 0
    var codeSize = minCodeSize + 1
    def write(code: Int): Unit = {
      cur |= code << curBits
      curBits += codeSize
      while (curBits >= 8) { out.write(cur & 0xff); cur >>= 8; curBits -= 8 }
    }
    var next = eoi + 1
    val dict = new java.util.HashMap[Integer, Integer]()
    def reset(): Unit = { dict.clear(); next = eoi + 1; codeSize = minCodeSize + 1 }
    write(clear)
    if (indices.nonEmpty) {
      var w: Int = indices(0) & 0xff
      var i = 1
      while (i < indices.length) {
        val k = indices(i) & 0xff
        val key: Integer = (w << 8) | k
        val hit = dict.get(key)
        if (hit != null) w = hit
        else {
          write(w)
          if (next == 4096) { write(clear); reset() }
          else {
            dict.put(key, next); next += 1
            // deferred width increase: the decoder's entry count at this
            // point is next-1; grow when IT fills the current width
            if (next - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          w = k
        }
        i += 1
      }
      write(w)
    }
    write(eoi)
    if (curBits > 0) out.write(cur & 0xff)
    out.toByteArray
  }

  // ---- decode ------------------------------------------------------------

  /** Decode the first image: (width, height, interleaved RGB). Color
    * table lookups honor a local table when present, else the global
    * one. Interlaced images are de-scattered. None on malformed input. */
  def decode(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = try {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    var off = 6
    off += 4 // logical screen w/h (image descriptor carries the frame's)
    val packed = b(off) & 0xff; off += 3 // packed, bg index, aspect
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      gct = java.util.Arrays.copyOfRange(b, off, off + 3 * n)
      off += 3 * n
    }
    while (off < b.length) {
      (b(off) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks, all skipped
          off += 2
          while (off < b.length && (b(off) & 0xff) != 0) off += 1 + (b(off) & 0xff)
          off += 1
        case 0x2c => // image descriptor
          if (off + 10 > b.length) return None
          val iw = le16(b, off + 5); val ih = le16(b, off + 7)
          val ip = b(off + 9) & 0xff
          off += 10
          var table = gct
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            if (off + 3 * n > b.length) return None
            table = java.util.Arrays.copyOfRange(b, off, off + 3 * n)
            off += 3 * n
          }
          if (table == null || iw <= 0 || ih <= 0 || off >= b.length) return None
          val minCode = b(off) & 0xff; off += 1
          val lzw = new java.io.ByteArrayOutputStream()
          while (off < b.length && (b(off) & 0xff) != 0) {
            val n = b(off) & 0xff
            if (off + 1 + n > b.length) return None
            lzw.write(b, off + 1, n); off += 1 + n
          }
          val idx0 = lzwDecode(minCode, lzw.toByteArray, iw * ih).getOrElse(return None)
          if (idx0.length < iw * ih) return None
          val idx =
            if ((ip & 0x40) == 0) idx0
            else { // interlaced: stream rows scatter over 4 passes
              val d = new Array[Byte](iw * ih)
              var src = 0
              Passes.foreach { case (start, step) =>
                var r = start
                while (r < ih) {
                  System.arraycopy(idx0, src * iw, d, r * iw, iw)
                  src += 1; r += step
                }
              }
              d
            }
          val maxIdx = table.length / 3
          val px = new Array[Byte](iw * ih * 3)
          var i = 0
          while (i < iw * ih) {
            val j = idx(i) & 0xff
            if (j < maxIdx) {
              px(3 * i) = table(3 * j)
              px(3 * i + 1) = table(3 * j + 1)
              px(3 * i + 2) = table(3 * j + 2)
            }
            i += 1
          }
          return Some((iw, ih, px))
        case 0x3b => return None // trailer before any image
        case _ => return None
      }
    }
    None
  } catch { case scala.util.control.NonFatal(_) => None }

  // ---- deterministic fixture encoder ------------------------------------

  /** The fixture palette: entry j = ((j*7+1)%256, (j*13+5)%256,
    * (j*29+11)%256) — shared with the SQL oracle. */
  def paletteByte(j: Int, c: Int): Int = c match {
    case 0 => (j * 7 + 1) % 256
    case 1 => (j * 13 + 5) % 256
    case _ => (j * 29 + 11) % 256
  }

  /** Spec-conformant GIF89a fixture: 256-entry global color table from
    * [[paletteByte]], one full-frame image whose pixel i has palette
    * index `idxOf(i)`, real LZW, optional interlace. */
  def synth(width: Int, height: Int, idxOf: Int => Int,
            interlaced: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(width); w16(height)
    out.write(0x80 | (7 << 4) | 7) // GCT present, 8-bit color res, 256 entries
    out.write(0); out.write(0)     // bg index, aspect
    var j = 0
    while (j < 256) {
      out.write(paletteByte(j, 0)); out.write(paletteByte(j, 1))
      out.write(paletteByte(j, 2))
      j += 1
    }
    out.write(0x2c) // image descriptor: full frame, no LCT
    w16(0); w16(0); w16(width); w16(height)
    out.write(if (interlaced) 0x40 else 0x00)
    val rowMajor = Array.tabulate(width * height)(i => (idxOf(i) & 0xff).toByte)
    val indices =
      if (!interlaced) rowMajor
      else { // stream order = pass order
        val d = new Array[Byte](width * height)
        var dst = 0
        Passes.foreach { case (start, step) =>
          var r = start
          while (r < height) {
            System.arraycopy(rowMajor, r * width, d, dst * width, width)
            dst += 1; r += step
          }
        }
        d
      }
    out.write(8) // LZW min code size
    val lzw = lzwEncode(8, indices)
    var p = 0
    while (p < lzw.length) {
      val n = math.min(255, lzw.length - p)
      out.write(n); out.write(lzw, p, n)
      p += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF real-decode gate: synthesize a deterministic GIF per doc_id
    * (odd ids interlaced — decode must still reproduce the row-major
    * image), decode through the REAL LZW path, and report dimensions
    * plus the arithmetic RGB pixel sum the oracle recomputes in closed
    * form. Narrow per-partition map — no shuffle. */
  def gifPixelStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions(_.map { id =>
      val w = (id % 29).toInt + 1
      val h = ((id * 3) % 19).toInt + 1
      val gif = synth(w, h, i => ((i * 11 + id) % 256).toInt, interlaced = id % 2 == 1)
      val (dw, dh, px) = decode(gif).get
      (id, dw, dh, px.map(p => (p & 0xff).toLong).sum)
    }).toDF("doc_id", "width", "height", "pix_sum")
  }
}
