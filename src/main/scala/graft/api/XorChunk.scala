package graft.api

import scala.collection.mutable.ArrayBuffer

/** Gorilla XOR chunk codec — the Prometheus TSDB chunk encoding
  * (public format: prometheus/tsdb/chunkenc/xor.go, itself the
  * compression scheme of the Gorilla paper, VLDB 2015) that the
  * remote-read STREAMED_XOR_CHUNKS response type carries. The reference
  * serves remote read through the vendored Prometheus web API
  * (vendored web/api/v1/api.go:392), which negotiates this mode with
  * any modern Prometheus client; [[RemoteRead]] uses this codec for the
  * streamed server path and the consuming client.
  *
  * Wire layout (bit-exact with the TSDB chunk, MSB-first bit order):
  *   - 2-byte big-endian sample count
  *   - sample 0: zigzag-varint timestamp (ms), raw 64-bit float value
  *   - sample 1: uvarint timestamp delta, XOR-encoded value
  *   - sample k: delta-of-delta timestamp with the 0 / 10+14 / 110+17 /
  *     1110+20 / 1111+64 selector ladder, XOR-encoded value (control bit
  *     0 = repeat; 10 = reuse previous leading/trailing window;
  *     11 = 5-bit leading count + 6-bit significant count + bits)
  *
  * Timestamps must be non-decreasing (the store scan emits time-ordered
  * series); values round-trip bit-exactly, including NaN payloads.
  */
object XorChunk {

  /** TSDB's target samples per chunk (tsdb/head_append.go). */
  val SamplesPerChunk: Int = 120

  // ---- bit stream (MSB-first, matching tsdb/chunkenc/bstream.go) -------

  private final class BitWriter {
    private var buf = new Array[Byte](128)
    private var nBits = 0
    private def ensure(extra: Int): Unit = {
      val need = (nBits + extra + 7) >> 3
      if (need > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
    }
    def writeBit(b: Boolean): Unit = {
      ensure(1)
      if (b) buf(nBits >> 3) = (buf(nBits >> 3) | (0x80 >>> (nBits & 7))).toByte
      nBits += 1
    }
    /** Write the low `n` bits of `v`, most significant first. */
    def writeBits(v: Long, n: Int): Unit = {
      ensure(n)
      var i = n - 1
      while (i >= 0) {
        if (((v >>> i) & 1L) != 0)
          buf(nBits >> 3) = (buf(nBits >> 3) | (0x80 >>> (nBits & 7))).toByte
        nBits += 1
        i -= 1
      }
    }
    def writeByte(b: Int): Unit = writeBits(b & 0xffL, 8)
    def writeUvarint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { writeByte(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      writeByte(x.toInt)
    }
    /** Go binary.PutVarint: zigzag then uvarint. */
    def writeVarint(v: Long): Unit = writeUvarint((v << 1) ^ (v >> 63))
    def result: Array[Byte] = java.util.Arrays.copyOf(buf, (nBits + 7) >> 3)
  }

  private final class BitReader(buf: Array[Byte], startByte: Int) {
    private var pos = startByte << 3
    def readBit(): Boolean = {
      if ((pos >> 3) >= buf.length)
        throw new IllegalArgumentException("xor chunk truncated")
      val b = (buf(pos >> 3) & (0x80 >>> (pos & 7))) != 0
      pos += 1
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | (if (readBit()) 1L else 0L); i += 1 }
      v
    }
    def readByte(): Int = readBits(8).toInt
    def readUvarint(): Long = {
      var shift = 0
      var res = 0L
      var b = 0
      do {
        if (shift > 63) throw new IllegalArgumentException("uvarint overflow")
        b = readByte()
        res |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      res
    }
    def readVarint(): Long = {
      val u = readUvarint()
      (u >>> 1) ^ -(u & 1L)
    }
  }

  // ---- chunk encode ----------------------------------------------------

  /** Encode one chunk. At most 65535 samples (2-byte count); callers
    * should chunk at [[SamplesPerChunk]] via [[encodeChunks]]. */
  def encode(samples: Seq[(Long, Double)]): Array[Byte] = {
    require(samples.length <= 0xffff, s"${samples.length} samples exceed chunk cap")
    val w = new BitWriter
    w.writeByte(samples.length >> 8)
    w.writeByte(samples.length & 0xff)
    var prevT = 0L
    var prevV = 0L // raw bits
    var prevTDelta = 0L
    var leading = -1 // sentinel: no window yet (tsdb's 0xff)
    var trailing = 0

    def writeValue(raw: Long): Unit = {
      val xor = raw ^ prevV
      if (xor == 0L) w.writeBit(false)
      else {
        w.writeBit(true)
        var lead = java.lang.Long.numberOfLeadingZeros(xor)
        val trail = java.lang.Long.numberOfTrailingZeros(xor)
        if (lead >= 32) lead = 31 // 5-bit field
        if (leading != -1 && lead >= leading && trail >= trailing) {
          w.writeBit(false)
          w.writeBits(xor >>> trailing, 64 - leading - trailing)
        } else {
          leading = lead; trailing = trail
          w.writeBit(true)
          w.writeBits(lead.toLong, 5)
          val sig = 64 - lead - trail
          w.writeBits(sig & 0x3fL, 6) // 64 encodes as 0
          w.writeBits(xor >>> trail, sig)
        }
      }
      prevV = raw
    }

    samples.zipWithIndex.foreach { case ((t, v), i) =>
      val raw = java.lang.Double.doubleToRawLongBits(v)
      if (i == 0) {
        w.writeVarint(t)
        w.writeBits(raw, 64)
        prevV = raw
      } else {
        val tDelta = t - prevT
        require(tDelta >= 0, s"timestamps out of order at $t")
        if (i == 1) w.writeUvarint(tDelta)
        else {
          val dod = tDelta - prevTDelta
          if (dod == 0L) w.writeBit(false)
          else if (inBitRange(dod, 14)) { w.writeBits(0x2L, 2); w.writeBits(dod & 0x3fffL, 14) }
          else if (inBitRange(dod, 17)) { w.writeBits(0x6L, 3); w.writeBits(dod & 0x1ffffL, 17) }
          else if (inBitRange(dod, 20)) { w.writeBits(0xeL, 4); w.writeBits(dod & 0xfffffL, 20) }
          else { w.writeBits(0xfL, 4); w.writeBits(dod, 64) }
        }
        prevTDelta = tDelta
        writeValue(raw)
      }
      prevT = t
    }
    w.result
  }

  /** tsdb's bitRange: representable in `n` bits two's complement with the
    * asymmetric bound (-(2^(n-1)-1) .. 2^(n-1)). */
  private def inBitRange(x: Long, n: Int): Boolean =
    -((1L << (n - 1)) - 1) <= x && x <= (1L << (n - 1))

  /** Decode a chunk back to (timestampMs, value) samples. */
  def decode(data: Array[Byte]): Seq[(Long, Double)] = {
    if (data.length < 2) throw new IllegalArgumentException("xor chunk too short")
    val n = ((data(0) & 0xff) << 8) | (data(1) & 0xff)
    val r = new BitReader(data, 2)
    val out = new ArrayBuffer[(Long, Double)](n)
    var t = 0L
    var v = 0L
    var tDelta = 0L
    var leading = 0
    var trailing = 0
    var i = 0
    while (i < n) {
      if (i == 0) {
        t = r.readVarint()
        v = r.readBits(64)
      } else {
        if (i == 1) tDelta = r.readUvarint()
        else {
          // selector ladder: count leading ones (max 4)
          var d = 0
          var bits = 0
          while (d < 4 && r.readBit()) d += 1
          d match {
            case 0 => // dod == 0
            case 1 => bits = 14
            case 2 => bits = 17
            case 3 => bits = 20
            case 4 =>
              tDelta += r.readBits(64)
          }
          if (bits > 0) {
            var dod = r.readBits(bits)
            if (dod > (1L << (bits - 1))) dod -= (1L << bits)
            tDelta += dod
          }
        }
        t += tDelta
        if (r.readBit()) {
          if (r.readBit()) {
            leading = r.readBits(5).toInt
            var sig = r.readBits(6).toInt
            if (sig == 0) sig = 64
            // leading + sig > 64 makes trailing negative and the shift
            // below wrap (Java shifts are mod 64) — malformed input must
            // raise like every other truncation, not decode to garbage
            if (leading + sig > 64)
              throw new IllegalArgumentException(
                s"xor chunk: leading=$leading + significant=$sig exceeds 64")
            trailing = 64 - leading - sig
          }
          val mbits = 64 - leading - trailing
          v ^= r.readBits(mbits) << trailing
        }
      }
      out += ((t, java.lang.Double.longBitsToDouble(v)))
      i += 1
    }
    out.toSeq
  }

  /** Split a time-ordered series into XOR chunks of at most
    * `samplesPerChunk`, returning (minTimeMs, maxTimeMs, chunkBytes). */
  def encodeChunks(samples: Seq[(Long, Double)],
                   samplesPerChunk: Int = SamplesPerChunk): Seq[(Long, Long, Array[Byte])] =
    samples.grouped(samplesPerChunk).map { g =>
      (g.head._1, g.last._1, encode(g))
    }.toSeq

  // ---- streamed-response framing (storage/remote/chunked.go) -----------

  /** One frame: uvarint payload length, 4-byte big-endian CRC32-Castagnoli
    * of the payload, payload bytes. */
  def writeFrame(out: java.io.OutputStream, payload: Array[Byte]): Unit = {
    var x = payload.length.toLong
    while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
    out.write(x.toInt)
    val crc = new java.util.zip.CRC32C
    crc.update(payload, 0, payload.length)
    val c = crc.getValue
    out.write(((c >>> 24) & 0xff).toInt); out.write(((c >>> 16) & 0xff).toInt)
    out.write(((c >>> 8) & 0xff).toInt); out.write((c & 0xff).toInt)
    out.write(payload)
  }

  /** Read all frames from a stream until EOF, CRC-checked. */
  def readFrames(in: java.io.InputStream): Seq[Array[Byte]] = {
    val frames = new ArrayBuffer[Array[Byte]]
    var done = false
    while (!done) {
      val first = in.read()
      if (first < 0) done = true
      else {
        var len = (first & 0x7fL)
        var shift = 7
        var b = first
        while ((b & 0x80) != 0) {
          b = in.read()
          if (b < 0) throw new java.io.EOFException("truncated frame length")
          len |= (b & 0x7fL) << shift
          shift += 7
        }
        if (len > Int.MaxValue - 8) throw new IllegalArgumentException("frame too large")
        val crcBytes = in.readNBytes(4)
        if (crcBytes.length != 4) throw new java.io.EOFException("truncated frame crc")
        val payload = in.readNBytes(len.toInt)
        if (payload.length != len) throw new java.io.EOFException("truncated frame payload")
        val want = ((crcBytes(0) & 0xffL) << 24) | ((crcBytes(1) & 0xffL) << 16) |
          ((crcBytes(2) & 0xffL) << 8) | (crcBytes(3) & 0xffL)
        val crc = new java.util.zip.CRC32C
        crc.update(payload, 0, payload.length)
        if (crc.getValue != want)
          throw new java.io.IOException("frame CRC mismatch")
        frames += payload
      }
    }
    frames.toSeq
  }
}
