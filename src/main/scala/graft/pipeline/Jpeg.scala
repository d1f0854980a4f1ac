package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JPEG codec, pure JDK (ITU-T T.81): a REAL decoder for BOTH
  * baseline-sequential (SOF0/1) and progressive (SOF2) DCT streams —
  * marker walk (SOI/APPn/DQT/SOF/DHT/DRI/SOS/EOI), canonical Huffman
  * tables built from the in-stream DHT segments, byte-stuffed entropy
  * decode with restart markers, DC prediction, and for progressive the
  * full multi-scan path: spectral selection (Ss..Se bands), successive
  * approximation (Ah/Al first + refinement scans, T.81 G.1.2), EOB-run
  * coding, and non-interleaved per-component scan geometry. Shared
  * back half: zigzag dequantization, double-precision IDCT, generic
  * (h,v) box upsampling, fixed-point YCbCr→RGB — plus spec-conformant
  * ENCODERS (baseline + progressive) used to synthesize deterministic
  * fixtures (any conformant decoder, e.g. the JDK's ImageIO, accepts
  * their output; JpegSpec cross-checks both directions).
  *
  * Arithmetic-coded streams return None — T.81's arithmetic option is
  * patent-historied and vanishingly rare in web corpora; the header
  * parser ([[Multimodal.parseJpeg]]) still yields dimensions for them.
  *
  * Determinism contract (what the oracle gates certify):
  *  - entropy coding is lossless, so decoded quantized coefficients are
  *    bit-exact — [[jpegCoefStats]] round-trips doc_id-derived
  *    coefficients through a real compressed stream;
  *  - the IDCT of a DC-only block is an exact integer whenever
  *    dc*q is a multiple of 8, and the YCbCr→RGB step is defined as
  *    integer floor arithmetic (floorDiv by 2^16), so [[jpegPixelStats]]
  *    fixtures decode to arithmetically-predictable pixels THROUGH the
  *    full pipeline (Huffman → dequant → IDCT → upsample → color).
  */
object Jpeg {

  // zigzag index -> natural (row-major) index, ITU T.81 figure A.6
  private[pipeline] val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // IDCT basis: c(u)(x) = C(u) * cos((2x+1) u pi / 16), C(0) = 1/sqrt(2)
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    math.cos((2 * x + 1) * u * math.Pi / 16) * (if (u == 0) 1 / math.sqrt(2) else 1.0)
  }

  private final class DecodeError extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new DecodeError

  // ---- entropy-coded segment bit reader (byte stuffing + restarts) ----

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    def nextBit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) fail()
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= b.length) fail()
          val nxt = b(pos) & 0xff
          if (nxt == 0x00) pos += 1 // stuffed data byte
          else fail() // marker inside entropy data (restarts consumed by expectRestart)
        }
        cur = v; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTm marker. */
    def expectRestart(m: Int): Unit = {
      nbits = 0
      if (pos + 2 > b.length || (b(pos) & 0xff) != 0xff ||
        (b(pos + 1) & 0xff) != 0xd0 + m) fail()
      pos += 2
    }
    /** Offset just past the consumed entropy bytes (partial-bit padding
      * discarded) — where the next marker begins. */
    def alignedPos: Int = pos
  }

  /** amplitude decode: T.81 F.12 EXTEND */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0 else if (v < (1 << (size - 1))) v - (1 << size) + 1 else v

  // ---- canonical Huffman (decode side: built from DHT) ----------------

  private final class HuffTable(counts: Array[Int], symbols: Array[Int]) {
    // per code length l (1..16): first code, last code (-1 if none), symbol base
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        maxCode(l) = if (counts(l - 1) == 0) -1 else code + counts(l - 1) - 1
        code = (code + counts(l - 1)) << 1
        k += counts(l - 1)
        l += 1
      }
    }
    def decode(r: BitReader): Int = {
      var l = 1
      var code = r.nextBit()
      while (maxCode(l) < 0 || code > maxCode(l)) {
        l += 1
        if (l > 16) fail()
        code = (code << 1) | r.nextBit()
      }
      symbols(valPtr(l) + code - minCode(l))
    }
  }

  // ---- decoded frame shape --------------------------------------------

  /** One component's dequantized coefficient plane: `bw*bh` blocks in
    * raster order over the MCU-padded grid, each 64 NATURAL-order ints. */
  final case class Plane(h: Int, v: Int, bw: Int, bh: Int,
                         blocks: Array[Array[Int]])
  final case class Frame(width: Int, height: Int, planes: Array[Plane]) {
    /** Sum of all dequantized coefficients — the lossless round-trip
      * check (entropy coding preserves every coefficient exactly). */
    def coefSum: Long = {
      var s = 0L
      planes.foreach(_.blocks.foreach { blk =>
        var i = 0; while (i < 64) { s += blk(i); i += 1 }
      })
      s
    }
  }

  // ---- decoder ---------------------------------------------------------

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Full baseline decode to dequantized DCT coefficients (the lossless
    * layer). Returns None for non-JPEG / progressive / malformed input. */
  def decodeFrame(b: Array[Byte]): Option[Frame] =
    try Some(decodeFrameOrThrow(b)) catch { case _: DecodeError | _: ArrayIndexOutOfBoundsException => None }

  private def decodeFrameOrThrow(b: Array[Byte]): Frame = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) fail()
    val qt = new Array[Array[Int]](4) // quant tables, zigzag order
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var restartInterval = 0
    // frame header state
    var w = 0; var h = 0
    var compIds: Array[Int] = null
    var compH: Array[Int] = null; var compV: Array[Int] = null
    var compTq: Array[Int] = null
    // progressive state: QUANTIZED zigzag-order coefficients per
    // component per MCU-padded block, accumulated across scans and
    // dequantized at EOI
    var progressive = false
    var coefStore: Array[Array[Array[Int]]] = null
    var off = 2
    while (off + 2 <= b.length) { // EOI is the final 2 bytes
      if ((b(off) & 0xff) != 0xff) fail()
      val marker = b(off + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) { off += 2 }
      else if (marker == 0xd9) { // EOI
        if (progressive && coefStore != null)
          return finishProgressive(w, h, compH, compV, compTq, qt, coefStore)
        fail() // EOI before any SOS
      }
      else {
        if (off + 4 > b.length) fail()
        val len = be16(b, off + 2)
        if (len < 2 || off + 2 + len > b.length) fail()
        val seg = off + 4 // first payload byte
        val segEnd = off + 2 + len
        marker match {
          case 0xdb => // DQT: one or more (Pq/Tq, 64|128 bytes) entries
            var p = seg
            while (p < segEnd) {
              val pq = (b(p) & 0xf0) >> 4; val tq = b(p) & 0x0f
              if (tq > 3 || pq > 1) fail()
              // entry must fit INSIDE the declared segment (like DHT's
              // guard): a short DQT length would otherwise read the next
              // segment's bytes as quant values — garbage pixels, no error
              if (p + (if (pq == 0) 65 else 129) > segEnd) fail()
              val t = new Array[Int](64)
              var k = 0
              if (pq == 0) { while (k < 64) { t(k) = b(p + 1 + k) & 0xff; k += 1 }; p += 65 }
              else { while (k < 64) { t(k) = be16(b, p + 1 + 2 * k); k += 1 }; p += 129 }
              qt(tq) = t
            }
          case 0xc4 => // DHT: one or more (Tc/Th, 16 counts, symbols)
            var p = seg
            while (p < segEnd) {
              val tc = (b(p) & 0xf0) >> 4; val th = b(p) & 0x0f
              if (tc > 1 || th > 3) fail()
              val counts = Array.tabulate(16)(i => b(p + 1 + i) & 0xff)
              val n = counts.sum
              if (n == 0 || n > 256 || p + 17 + n > segEnd) fail()
              val symbols = Array.tabulate(n)(i => b(p + 17 + i) & 0xff)
              val tab = new HuffTable(counts, symbols)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              p += 17 + n
            }
          case 0xdd => // DRI
            restartInterval = be16(b, seg)
          case 0xc0 | 0xc1 | 0xc2 => // SOF0/1 baseline-shaped, SOF2 progressive
            if ((b(seg) & 0xff) != 8) fail() // precision
            progressive = marker == 0xc2
            h = be16(b, seg + 1); w = be16(b, seg + 3)
            val nc = b(seg + 5) & 0xff
            if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) fail()
            compIds = new Array[Int](nc); compH = new Array[Int](nc)
            compV = new Array[Int](nc); compTq = new Array[Int](nc)
            var c = 0
            while (c < nc) {
              compIds(c) = b(seg + 6 + 3 * c) & 0xff
              val hv = b(seg + 7 + 3 * c) & 0xff
              compH(c) = (hv >> 4) & 0xf; compV(c) = hv & 0xf
              compTq(c) = b(seg + 8 + 3 * c) & 0xff
              if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 || compV(c) > 4) fail()
              c += 1
            }
          case 0xda if progressive => // SOS: one of several progressive scans
            if (compIds == null) fail()
            val ns = b(seg) & 0xff
            if (ns < 1 || ns > compIds.length) fail()
            val scanDc = new Array[Int](ns); val scanAc = new Array[Int](ns)
            val order = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val cid = b(seg + 1 + 2 * i) & 0xff
              val tt = b(seg + 2 + 2 * i) & 0xff
              val ci = compIds.indexOf(cid)
              if (ci < 0) fail()
              order(i) = ci
              scanDc(i) = (tt >> 4) & 0xf; scanAc(i) = tt & 0xf
              i += 1
            }
            val ss = b(seg + 1 + 2 * ns) & 0xff
            val se = b(seg + 2 + 2 * ns) & 0xff
            val ahal = b(seg + 3 + 2 * ns) & 0xff
            val ah = (ahal >> 4) & 0xf; val al = ahal & 0xf
            if (coefStore == null) {
              val hmax = compH.max; val vmax = compV.max
              val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
              val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
              coefStore = Array.tabulate(compIds.length)(c =>
                Array.fill(mcusX * compH(c) * mcusY * compV(c))(new Array[Int](64)))
            }
            off = decodeProgressiveScan(b, segEnd, w, h, order, compH, compV,
              scanDc, scanAc, ss, se, ah, al, coefStore, dcTabs, acTabs,
              restartInterval)
          case 0xda => // baseline SOS: the single scan, entropy data to EOI
            if (compIds == null) fail()
            val ns = b(seg) & 0xff
            if (ns != compIds.length) fail() // baseline: single interleaved scan
            // T.81 A.2.3: a single-component scan is non-interleaved — the
            // MCU is ONE data unit regardless of declared sampling factors
            if (ns == 1) { compH(0) = 1; compV(0) = 1 }
            val scanDc = new Array[Int](ns); val scanAc = new Array[Int](ns)
            val order = new Array[Int](ns) // scan position -> frame comp index
            var i = 0
            while (i < ns) {
              val cid = b(seg + 1 + 2 * i) & 0xff
              val tt = b(seg + 2 + 2 * i) & 0xff
              val ci = compIds.indexOf(cid)
              if (ci < 0) fail()
              order(i) = ci
              scanDc(i) = (tt >> 4) & 0xf; scanAc(i) = tt & 0xf
              i += 1
            }
            return decodeScan(b, segEnd, w, h, order, compH, compV, compTq,
              scanDc, scanAc, qt, dcTabs, acTabs, restartInterval)
          case _ => () // APPn / COM / others: skip
        }
        if (marker != 0xda || !progressive) off = segEnd
      }
    }
    fail()
  }

  /** Dequantize + reorder the accumulated progressive coefficients into
    * the same Frame shape the baseline scan produces. */
  private def finishProgressive(w: Int, h: Int, compH: Array[Int],
                                compV: Array[Int], compTq: Array[Int],
                                qt: Array[Array[Int]],
                                coefs: Array[Array[Array[Int]]]): Frame = {
    val hmax = compH.max; val vmax = compV.max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val planes = Array.tabulate(coefs.length) { c =>
      val q = qt(compTq(c))
      if (q == null) fail()
      val blocks = coefs(c).map { z =>
        val nat = new Array[Int](64)
        var k = 0
        while (k < 64) { nat(ZigZag(k)) = z(k) * q(k); k += 1 }
        nat
      }
      Plane(compH(c), compV(c), mcusX * compH(c), mcusY * compV(c), blocks)
    }
    Frame(w, h, planes)
  }

  /** Decode ONE progressive scan (T.81 G.1.2): DC first/refinement scans
    * (interleaved or single-component), AC first/refinement scans (always
    * single-component, spectral band Ss..Se, EOB-run coded), updating the
    * quantized zigzag coefficient store in place. Returns the byte offset
    * just past this scan's entropy data (the next marker). */
  private def decodeProgressiveScan(b: Array[Byte], start: Int, w: Int, h: Int,
                                    order: Array[Int], compH: Array[Int],
                                    compV: Array[Int], scanDc: Array[Int],
                                    scanAc: Array[Int], ss: Int, se: Int,
                                    ah: Int, al: Int,
                                    coefs: Array[Array[Array[Int]]],
                                    dcTabs: Array[HuffTable],
                                    acTabs: Array[HuffTable],
                                    restartInterval: Int): Int = {
    if (ss < 0 || se > 63 || ss > se || al > 13) fail()
    val isDc = ss == 0
    if (isDc && se != 0) fail() // DC scans carry only the DC band
    if (!isDc && order.length != 1) fail() // AC scans are non-interleaved
    val hmax = compH.max; val vmax = compV.max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val r = new BitReader(b, start)
    val pred = new Array[Int](order.length)
    var eobrun = 0
    var restartCount = 0
    var unit = 0 // MCU index (interleaved) or block index (non-interleaved)

    def maybeRestart(): Unit =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        r.expectRestart(restartCount % 8)
        restartCount += 1
        java.util.Arrays.fill(pred, 0)
        eobrun = 0
      }

    def decodeDcBlock(s: Int, z: Array[Int]): Unit =
      if (ah == 0) { // first scan: Huffman diff, scaled by the point transform
        val dcTab = dcTabs(scanDc(s))
        if (dcTab == null) fail()
        val t = dcTab.decode(r)
        if (t > 15) fail()
        pred(s) += extend(r.receive(t), t)
        z(0) = pred(s) << al
      } else { // refinement: one raw bit per block
        if (r.nextBit() == 1) z(0) |= 1 << al
      }

    def decodeAcFirst(z: Array[Int]): Unit =
      if (eobrun > 0) eobrun -= 1
      else {
        val acTab = acTabs(scanAc(0))
        if (acTab == null) fail()
        var k = ss
        while (k <= se) {
          val rs = acTab.decode(r)
          val run = (rs >> 4) & 0xf; val size = rs & 0xf
          if (size == 0) {
            if (run < 15) { // EOBn: this block done, run covers 2^run-1 more
              eobrun = (1 << run) - 1
              if (run > 0) eobrun += r.receive(run)
              k = se + 1
            } else k += 16 // ZRL
          } else {
            k += run
            if (k > se) fail()
            z(k) = extend(r.receive(size), size) << al
            k += 1
          }
        }
      }

    /** AC refinement (G.1.2.3, the libjpeg formulation): correction bits
      * for already-nonzero coefficients ride inline as the band is swept;
      * zero-history runs count only zero coefficients. */
    def decodeAcRefine(z: Array[Int]): Unit = {
      val p1 = 1 << al
      val acTab = acTabs(scanAc(0))
      if (acTab == null) fail()
      var k = ss
      def refineAt(k0: Int): Unit =
        if (r.nextBit() == 1 && (z(k0) & p1) == 0)
          z(k0) += (if (z(k0) >= 0) p1 else -p1)
      if (eobrun == 0) {
        var done = false
        while (!done && k <= se) {
          val rs = acTab.decode(r)
          var run = (rs >> 4) & 0xf
          val size = rs & 0xf
          var newVal = 0
          if (size == 0) {
            if (run < 15) { // EOBn: sweep the rest with correction bits only
              eobrun = 1 << run
              if (run > 0) eobrun += r.receive(run)
              done = true
            } // run == 15: ZRL — skip 16 zero-history coefs in the sweep
          } else {
            if (size != 1) fail() // refinement sends magnitude-1 births only
            newVal = if (r.nextBit() == 1) p1 else -p1
          }
          if (!done) {
            var placed = false
            while (!placed && k <= se) {
              if (z(k) != 0) refineAt(k)
              else {
                if (run == 0) { if (newVal != 0) z(k) = newVal; placed = true }
                else run -= 1
              }
              k += 1
            }
            if (!placed && newVal != 0) fail() // band ended before the birth
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) { if (z(k) != 0) refineAt(k); k += 1 }
        eobrun -= 1
      }
    }

    if (isDc && order.length > 1) { // interleaved DC scan over the MCU grid
      val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
      val total = mcusX * mcusY
      while (unit < total) {
        maybeRestart()
        val my = unit / mcusX; val mx = unit % mcusX
        var s = 0
        while (s < order.length) {
          val c = order(s)
          val bw = mcusX * compH(c)
          var bv = 0
          while (bv < compV(c)) {
            var bh = 0
            while (bh < compH(c)) {
              decodeDcBlock(s,
                coefs(c)((my * compV(c) + bv) * bw + (mx * compH(c) + bh)))
              bh += 1
            }
            bv += 1
          }
          s += 1
        }
        unit += 1
      }
    } else { // non-interleaved: the component's REAL block grid (A.2.2)
      val c = order(0)
      val compPixW = (w * compH(c) + hmax - 1) / hmax
      val compPixH = (h * compV(c) + vmax - 1) / vmax
      val blocksW = (compPixW + 7) / 8
      val blocksH = (compPixH + 7) / 8
      val bw = mcusX * compH(c) // padded plane stride
      val total = blocksW * blocksH
      while (unit < total) {
        maybeRestart()
        val z = coefs(c)((unit / blocksW) * bw + unit % blocksW)
        if (isDc) decodeDcBlock(0, z)
        else if (ah == 0) decodeAcFirst(z)
        else decodeAcRefine(z)
        unit += 1
      }
    }
    r.alignedPos
  }

  /** Entropy-decode the single interleaved baseline scan into dequantized
    * natural-order coefficient blocks per component. */
  private def decodeScan(b: Array[Byte], start: Int, w: Int, h: Int,
                         order: Array[Int], compH: Array[Int], compV: Array[Int],
                         compTq: Array[Int], scanDc: Array[Int], scanAc: Array[Int],
                         qt: Array[Array[Int]], dcTabs: Array[HuffTable],
                         acTabs: Array[HuffTable], restartInterval: Int): Frame = {
    val nc = order.length
    val hmax = compH.max; val vmax = compV.max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val planes = Array.tabulate(nc) { c =>
      Plane(compH(c), compV(c), mcusX * compH(c), mcusY * compV(c),
        Array.fill(mcusX * compH(c) * mcusY * compV(c))(new Array[Int](64)))
    }
    order.foreach { c => if (qt(compTq(c)) == null) fail() }
    val r = new BitReader(b, start)
    val pred = new Array[Int](nc)
    var mcu = 0
    var restartCount = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        r.expectRestart(restartCount % 8)
        restartCount += 1
        java.util.Arrays.fill(pred, 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var s = 0
      while (s < nc) {
        val c = order(s)
        val dcTab = dcTabs(scanDc(s)); val acTab = acTabs(scanAc(s))
        if (dcTab == null || acTab == null) fail()
        val q = qt(compTq(c))
        val p = planes(c)
        var bv = 0
        while (bv < compV(c)) {
          var bh = 0
          while (bh < compH(c)) {
            val blk = p.blocks((my * compV(c) + bv) * p.bw + (mx * compH(c) + bh))
            // DC
            val t = dcTab.decode(r)
            if (t > 15) fail()
            pred(c) += extend(r.receive(t), t)
            blk(0) = pred(c) * q(0)
            // AC
            var k = 1
            while (k < 64) {
              val rs = acTab.decode(r)
              val run = (rs >> 4) & 0xf; val size = rs & 0xf
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += run
                if (k > 63) fail()
                blk(ZigZag(k)) = extend(r.receive(size), size) * q(k)
                k += 1
              }
            }
            bh += 1
          }
          bv += 1
        }
        s += 1
      }
      mcu += 1
    }
    Frame(w, h, planes)
  }

  // ---- IDCT + upsample + color ----------------------------------------

  /** Double-precision IDCT of one dequantized natural-order block, level
    * shifted (+128) and clamped; exact for DC-only blocks whose dc*q is a
    * multiple of 8 (the value is an integer, float error ~1e-13). */
  private[pipeline] def idctBlock(f: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    // separable: rows (over u) then columns (over v)
    val tmp = new Array[Double](64)
    var row = 0
    while (row < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += Basis(u)(x) * f(row * 8 + u); u += 1 }
        tmp(row * 8 + x) = acc
        x += 1
      }
      row += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) { acc += Basis(v)(y) * tmp(v * 8 + x); v += 1 }
        val px = Math.round(acc / 4.0 + 128.0).toInt
        out(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        x += 1
      }
      y += 1
    }
    out
  }

  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** JFIF YCbCr→RGB as pure integer arithmetic: round-half-up fixed
    * point via floorDiv by 2^16 (constants are the usual 16-bit scalings
    * of 1.402 / 0.344136 / 0.714136 / 1.772) — exactly reproducible
    * arithmetic on any engine, within ±1 of the real-valued formulas. */
  private[pipeline] def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    val cbd = cb - 128; val crd = cr - 128
    (clamp8(y + Math.floorDiv(91881 * crd + 32768, 65536)),
      clamp8(y - Math.floorDiv(22554 * cbd + 46802 * crd + 32768, 65536)),
      clamp8(y + Math.floorDiv(116130 * cbd + 32768, 65536)))
  }

  /** Full pixel decode: coefficients → per-component sample planes
    * (IDCT) → box upsample to full resolution → gray or YCbCr→RGB.
    * Returns (width, height, channels, row-major interleaved pixels). */
  def decodePixels(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    decodeFrame(b).map { fr =>
      val hmax = fr.planes.map(_.h).max; val vmax = fr.planes.map(_.v).max
      // render each component's padded sample plane
      val samples = fr.planes.map { p =>
        val pw = p.bw * 8
        val arr = new Array[Byte](p.bw * 8 * p.bh * 8)
        var bi = 0
        while (bi < p.blocks.length) {
          val px = idctBlock(p.blocks(bi))
          val by = bi / p.bw; val bx = bi % p.bw
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              arr((by * 8 + yy) * pw + bx * 8 + xx) = px(yy * 8 + xx).toByte
              xx += 1
            }
            yy += 1
          }
          bi += 1
        }
        arr
      }
      val nc = fr.planes.length
      val out = new Array[Byte](fr.width * fr.height * nc)
      var y = 0
      while (y < fr.height) {
        var x = 0
        while (x < fr.width) {
          if (nc == 1) {
            out(y * fr.width + x) = samples(0)(y * (fr.planes(0).bw * 8) + x)
          } else {
            // box upsample: component sample at (x*h/hmax, y*v/vmax)
            def samp(c: Int): Int = {
              val p = fr.planes(c)
              samples(c)((y * p.v / vmax) * (p.bw * 8) + (x * p.h / hmax)) & 0xff
            }
            val (r, g, bb) = yccToRgb(samp(0), samp(1), samp(2))
            val o = (y * fr.width + x) * 3
            out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = bb.toByte
          }
          x += 1
        }
        y += 1
      }
      (fr.width, fr.height, nc, out)
    }

  // ---- encoder (fixture synthesis; spec-conformant baseline JFIF) ------

  // encoder Huffman tables, declared in-stream via DHT (any conformant
  // decoder reads them): DC = 12 category symbols at 4 bits, AC = EOB +
  // ZRL + all (run 0-15, size 1-10) at 8 bits — canonical, no all-ones code
  private val EncDcCounts: Array[Int] = { val a = new Array[Int](16); a(3) = 12; a }
  private val EncDcSymbols: Array[Int] = (0 to 11).toArray
  private val EncAcSymbols: Array[Int] =
    (0x00 +: 0xf0 +: (for { r <- 0 to 15; s <- 1 to 10 } yield (r << 4) | s)).distinct.toArray
  private val EncAcCounts: Array[Int] = { val a = new Array[Int](16); a(7) = EncAcSymbols.length; a }

  /** canonical (code,len) per symbol from a DHT-shaped (counts, symbols) */
  private def canonicalCodes(counts: Array[Int], symbols: Array[Int]): Map[Int, (Int, Int)] = {
    val m = Map.newBuilder[Int, (Int, Int)]
    var code = 0; var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < counts(l - 1)) { m += symbols(k) -> (code, l); code += 1; k += 1; i += 1 }
      code <<= 1
      l += 1
    }
    m.result()
  }
  private val EncDcCodes = canonicalCodes(EncDcCounts, EncDcSymbols)
  private val EncAcCodes = canonicalCodes(EncAcCounts, EncAcSymbols)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flushAlign(): Unit = if (n > 0) { put((1 << (8 - n)) - 1, 8 - n) }
  }

  private def bitSize(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  private def seg(out: java.io.ByteArrayOutputStream, marker: Int, payload: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = payload.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(payload, 0, payload.length)
  }

  /** Synthesize a baseline JFIF stream. `gray` → one component; else
    * Y Cb Cr with 4:2:0 when `sub420` (Y sampling 2x2) or 4:4:4.
    * `qLum`/`qChr` are zigzag-order quant tables; `coef(comp, blockIdx,
    * zigzagK)` supplies the QUANTIZED coefficients, blockIdx counting
    * sequentially per component in MCU encode order. `restartInterval`
    * (MCUs) > 0 emits DRI + RSTm markers. */
  def synthJpeg(w: Int, h: Int, gray: Boolean, sub420: Boolean,
                qLum: Array[Int], qChr: Array[Int],
                coef: (Int, Int, Int) => Int,
                restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && qLum.length == 64 && (gray || qChr.length == 64))
    val nc = if (gray) 1 else 3
    val hs = if (gray) Array(1) else if (sub420) Array(2, 1, 1) else Array(1, 1, 1)
    val vs = hs
    val hmax = hs.max; val vmax = vs.max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    // DQT
    seg(out, 0xdb, (0.toByte +: qLum.map(_.toByte)).toArray)
    if (!gray) seg(out, 0xdb, (1.toByte +: qChr.map(_.toByte)).toArray)
    // SOF0
    val sof = java.nio.ByteBuffer.allocate(6 + 3 * nc)
    sof.put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(nc.toByte)
    var c = 0
    while (c < nc) {
      sof.put((c + 1).toByte).put(((hs(c) << 4) | vs(c)).toByte)
        .put((if (c == 0) 0 else 1).toByte)
      c += 1
    }
    seg(out, 0xc0, sof.array())
    // DHT: one DC + one AC table, used by every component
    seg(out, 0xc4, (0x00.toByte +: (EncDcCounts.map(_.toByte) ++ EncDcSymbols.map(_.toByte))).toArray)
    seg(out, 0xc4, (0x10.toByte +: (EncAcCounts.map(_.toByte) ++ EncAcSymbols.map(_.toByte))).toArray)
    if (restartInterval > 0)
      seg(out, 0xdd, Array(((restartInterval >> 8) & 0xff).toByte, (restartInterval & 0xff).toByte))
    // SOS
    val sos = java.nio.ByteBuffer.allocate(4 + 2 * nc)
    sos.put(nc.toByte)
    c = 0
    while (c < nc) { sos.put((c + 1).toByte).put(0x00.toByte); c += 1 }
    sos.put(0.toByte).put(63.toByte).put(0.toByte)
    seg(out, 0xda, sos.array())
    // entropy data
    val bw = new BitWriter(out)
    val pred = new Array[Int](nc)
    val blockCount = new Array[Int](nc)
    var restartCounter = 0
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flushAlign()
        out.write(0xff); out.write(0xd0 + (restartCounter % 8))
        restartCounter += 1
        java.util.Arrays.fill(pred, 0)
      }
      c = 0
      while (c < nc) {
        var bv = 0
        while (bv < vs(c)) {
          var bh = 0
          while (bh < hs(c)) {
            val bi = blockCount(c); blockCount(c) += 1
            // DC diff
            val dc = coef(c, bi, 0)
            val diff = dc - pred(c); pred(c) = dc
            val s = bitSize(diff)
            val (dcCode, dcLen) = EncDcCodes(s)
            bw.put(dcCode, dcLen)
            if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
            // AC run-length
            var run = 0
            var k = 1
            var lastNz = 0
            while (k < 64) { if (coef(c, bi, k) != 0) lastNz = k; k += 1 }
            k = 1
            while (k <= lastNz) {
              val v = coef(c, bi, k)
              if (v == 0) run += 1
              else {
                while (run > 15) {
                  val (z, zl) = EncAcCodes(0xf0); bw.put(z, zl); run -= 16
                }
                val sz = bitSize(v)
                require(sz <= 10, s"AC amplitude $v out of the encoder's size range")
                val (code, len) = EncAcCodes((run << 4) | sz)
                bw.put(code, len)
                bw.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
                run = 0
              }
              k += 1
            }
            if (lastNz < 63) { val (e, el) = EncAcCodes(0x00); bw.put(e, el) } // EOB
            bh += 1
          }
          bv += 1
        }
        c += 1
      }
      mcu += 1
    }
    bw.flushAlign()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Synthesize a PROGRESSIVE (SOF2) JFIF stream carrying the given
    * quantized coefficients, via the classic successive-approximation
    * scan script:
    *
    *   1. DC first        (all components interleaved, Ah=0 Al=1)
    *   2. DC refinement   (Ah=1 Al=0 — one raw bit per block)
    *   3. per component:  AC first, band 1..5,  Al=1 (spectral selection)
    *   4. per component:  AC first, band 6..63, Al=1
    *   5. per component:  AC refinement, band 1..63, Ah=1→Al=0
    *
    * Unlike [[synthJpeg]], `coef(comp, blockIdx, zigzagK)` addresses
    * blocks by PLANE-RASTER index over the MCU-padded grid (the same
    * layout [[Frame]] exposes), since different scans traverse blocks in
    * different orders. `restartInterval` > 0 emits DRI once; per T.81 it
    * then applies to EVERY scan (MCUs for the interleaved DC scan, blocks
    * for the non-interleaved ones). */
  def synthProgressiveJpeg(w: Int, h: Int, gray: Boolean, sub420: Boolean,
                           qLum: Array[Int], qChr: Array[Int],
                           coef: (Int, Int, Int) => Int,
                           restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && qLum.length == 64 && (gray || qChr.length == 64))
    val nc = if (gray) 1 else 3
    val hs = if (gray) Array(1) else if (sub420) Array(2, 1, 1) else Array(1, 1, 1)
    val vs = hs
    val hmax = hs.max; val vmax = vs.max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // per-component padded plane geometry (the coef addressing space) and
    // the REAL block grid AC scans traverse (T.81 A.2.2)
    val bwPad = Array.tabulate(nc)(c => mcusX * hs(c))
    val blocksW = Array.tabulate(nc)(c => ((w * hs(c) + hmax - 1) / hmax + 7) / 8)
    val blocksH = Array.tabulate(nc)(c => ((h * vs(c) + vmax - 1) / vmax + 7) / 8)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    seg(out, 0xdb, (0.toByte +: qLum.map(_.toByte)).toArray)
    if (!gray) seg(out, 0xdb, (1.toByte +: qChr.map(_.toByte)).toArray)
    val sof = java.nio.ByteBuffer.allocate(6 + 3 * nc)
    sof.put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(nc.toByte)
    var c = 0
    while (c < nc) {
      sof.put((c + 1).toByte).put(((hs(c) << 4) | vs(c)).toByte)
        .put((if (c == 0) 0 else 1).toByte)
      c += 1
    }
    seg(out, 0xc2, sof.array()) // SOF2: progressive
    seg(out, 0xc4, (0x00.toByte +: (EncDcCounts.map(_.toByte) ++ EncDcSymbols.map(_.toByte))).toArray)
    seg(out, 0xc4, (0x10.toByte +: (EncAcCounts.map(_.toByte) ++ EncAcSymbols.map(_.toByte))).toArray)
    if (restartInterval > 0)
      seg(out, 0xdd, Array(((restartInterval >> 8) & 0xff).toByte, (restartInterval & 0xff).toByte))

    def sos(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      val p = java.nio.ByteBuffer.allocate(4 + 2 * comps.length)
      p.put(comps.length.toByte)
      comps.foreach(ci => p.put((ci + 1).toByte).put(0x00.toByte))
      p.put(ss.toByte).put(se.toByte).put(((ah << 4) | al).toByte)
      seg(out, 0xda, p.array())
    }
    def restartIfDue(bw: BitWriter, unit: Int, counter: Array[Int]): Unit =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        bw.flushAlign()
        out.write(0xff); out.write(0xd0 + (counter(0) % 8))
        counter(0) += 1
        counter(1) = 1 // signal: DC preds reset
      }

    // ---- scan 1: DC first (interleaved), point transform Al=1 ----------
    sos(0 until nc, 0, 0, 0, 1)
    locally {
      val bw = new BitWriter(out)
      val pred = new Array[Int](nc)
      val counter = Array(0, 0)
      var mcu = 0
      while (mcu < mcusX * mcusY) {
        restartIfDue(bw, mcu, counter)
        if (counter(1) == 1) { java.util.Arrays.fill(pred, 0); counter(1) = 0 }
        val my = mcu / mcusX; val mx = mcu % mcusX
        c = 0
        while (c < nc) {
          var bv = 0
          while (bv < vs(c)) {
            var bh = 0
            while (bh < hs(c)) {
              val idx = (my * vs(c) + bv) * bwPad(c) + (mx * hs(c) + bh)
              val v = coef(c, idx, 0) >> 1 // arithmetic: floor toward -inf
              val diff = v - pred(c); pred(c) = v
              val s = bitSize(diff)
              val (dcCode, dcLen) = EncDcCodes(s)
              bw.put(dcCode, dcLen)
              if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
              bh += 1
            }
            bv += 1
          }
          c += 1
        }
        mcu += 1
      }
      bw.flushAlign()
    }

    // ---- scan 2: DC refinement — raw bit 0 of each DC, same order ------
    sos(0 until nc, 0, 0, 1, 0)
    locally {
      val bw = new BitWriter(out)
      val counter = Array(0, 0)
      var mcu = 0
      while (mcu < mcusX * mcusY) {
        restartIfDue(bw, mcu, counter)
        val my = mcu / mcusX; val mx = mcu % mcusX
        c = 0
        while (c < nc) {
          var bv = 0
          while (bv < vs(c)) {
            var bh = 0
            while (bh < hs(c)) {
              val idx = (my * vs(c) + bv) * bwPad(c) + (mx * hs(c) + bh)
              bw.put(coef(c, idx, 0) & 1, 1)
              bh += 1
            }
            bv += 1
          }
          c += 1
        }
        mcu += 1
      }
      bw.flushAlign()
    }

    // ---- scans 3-4: AC first per component, two spectral bands, Al=1 ---
    def acFirstScan(comp: Int, bandLo: Int, bandHi: Int): Unit = {
      sos(Seq(comp), bandLo, bandHi, 0, 1)
      val bw = new BitWriter(out)
      val counter = Array(0, 0)
      var blk = 0
      val total = blocksW(comp) * blocksH(comp)
      while (blk < total) {
        restartIfDue(bw, blk, counter)
        val idx = (blk / blocksW(comp)) * bwPad(comp) + blk % blocksW(comp)
        def v(k: Int): Int = {
          val x = coef(comp, idx, k)
          if (x >= 0) x >> 1 else -((-x) >> 1) // magnitude shift (G.1.2.2)
        }
        var lastNz = bandLo - 1
        var k = bandLo
        while (k <= bandHi) { if (v(k) != 0) lastNz = k; k += 1 }
        if (lastNz < bandLo) { val (e, el) = EncAcCodes(0x00); bw.put(e, el) }
        else {
          var run = 0
          k = bandLo
          while (k <= lastNz) {
            val x = v(k)
            if (x == 0) run += 1
            else {
              while (run > 15) { val (z, zl) = EncAcCodes(0xf0); bw.put(z, zl); run -= 16 }
              val sz = bitSize(x)
              require(sz <= 10, s"AC amplitude $x out of the encoder's size range")
              val (code, len) = EncAcCodes((run << 4) | sz)
              bw.put(code, len)
              bw.put(if (x >= 0) x else x + (1 << sz) - 1, sz)
              run = 0
            }
            k += 1
          }
          if (lastNz < bandHi) { val (e, el) = EncAcCodes(0x00); bw.put(e, el) }
        }
        blk += 1
      }
      bw.flushAlign()
    }
    c = 0
    while (c < nc) { acFirstScan(c, 1, 5); c += 1 }
    c = 0
    while (c < nc) { acFirstScan(c, 6, 63); c += 1 }

    // ---- scan 5: AC refinement per component, Ah=1 → Al=0 ---------------
    // emission mirrors the decoder's sweep exactly: history-coefficient
    // correction bits ride inline in k order; ZRL spans flush only the
    // bits their 16 skipped zeros cover
    def acRefineScan(comp: Int): Unit = {
      sos(Seq(comp), 1, 63, 1, 0)
      val bw = new BitWriter(out)
      val counter = Array(0, 0)
      var blk = 0
      val total = blocksW(comp) * blocksH(comp)
      while (blk < total) {
        restartIfDue(bw, blk, counter)
        val idx = (blk / blocksW(comp)) * bwPad(comp) + blk % blocksW(comp)
        def x(k: Int): Int = coef(comp, idx, k)
        def hist(k: Int): Boolean = math.abs(x(k)) >= 2
        val births = (1 to 63).filter(k => math.abs(x(k)) == 1)
        var k = 1
        births.foreach { p =>
          var zeros = 0
          var j = k
          while (j < p) { if (x(j) == 0) zeros += 1; j += 1 }
          while (zeros >= 16) { // ZRL: decoder consumes exactly 16 zeros,
            // reading history bits encountered on the way
            val (z, zl) = EncAcCodes(0xf0); bw.put(z, zl)
            var cnt = 0
            while (cnt < 16) {
              if (x(k) == 0) cnt += 1
              else if (hist(k)) bw.put(math.abs(x(k)) & 1, 1)
              k += 1
            }
            zeros -= 16
          }
          val (code, len) = EncAcCodes((zeros << 4) | 1)
          bw.put(code, len)
          bw.put(if (x(p) > 0) 1 else 0, 1) // sign of the birth
          while (k < p) { if (hist(k)) bw.put(math.abs(x(k)) & 1, 1); k += 1 }
          k = p + 1
        }
        if (k <= 63) { // trailing zeros / histories: EOB0 then their bits
          val (e, el) = EncAcCodes(0x00); bw.put(e, el)
          while (k <= 63) { if (hist(k)) bw.put(math.abs(x(k)) & 1, 1); k += 1 }
        }
        blk += 1
      }
      bw.flushAlign()
    }
    c = 0
    while (c < nc) { acRefineScan(c); c += 1 }

    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ---- oracle gates ----------------------------------------------------

  /** zigzag positions carrying nonzero ACs in the coef gate (the 20→40
    * and 40→63 gaps force ZRL runs through the Huffman layer) */
  private[graft] val CoefKs: Array[Int] = Array(1, 7, 20, 40, 63)
  private[graft] def gateQLum(k: Int): Int = 1 + ((7 * k + 3) % 16)
  private[graft] def gateQChr(k: Int): Int = 1 + ((5 * k + 1) % 12)
  private[graft] def gateDc(c: Int, b: Int, id: Long): Int =
    (((b * 5 + c * 11 + id) % 21) - 10).toInt
  private[graft] def gateAc(c: Int, b: Int, k: Int, id: Long): Int =
    (((b + 3 * k + 7 * c + id) % 11) - 5).toInt

  /** Lossless-layer gate: synthesize a doc_id-derived baseline JPEG
    * (gray for even ids; color 4:2:0 for odd; every 5th id adds restart
    * markers), decode it, and emit the dequantized coefficient sum — the
    * oracle reproduces the sum arithmetically, so a match certifies the
    * whole marker + Huffman + DC-prediction + ZRL + dequant pipeline. */
  def jpegCoefStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val qL = Array.tabulate(64)(gateQLum)
    val qC = Array.tabulate(64)(gateQChr)
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions(_.map { id =>
      val gray = id % 2 == 0
      val (w, h) =
        if (gray) (8 * ((id % 3).toInt + 1), 8 * (((id / 2) % 2).toInt + 1))
        else (16 * (((id / 2) % 2).toInt + 1), 16 * (((id / 3) % 2).toInt + 1))
      val ri = if (id % 5 == 0) 2 else 0
      def cf(c: Int, b: Int, k: Int): Int =
        if (k == 0) gateDc(c, b, id)
        else if (CoefKs.contains(k)) gateAc(c, b, k, id)
        else 0
      val bytes = synthJpeg(w, h, gray, sub420 = !gray, qL, qC, cf, ri)
      val fr = decodeFrame(bytes).get
      (id, fr.width, fr.height, fr.planes.length, fr.coefSum)
    }).toDF("doc_id", "width", "height", "ncomp", "coef_sum")
  }

  /** Progressive lossless-layer gate: the SAME doc_id-derived coefficient
    * family and dims as [[jpegCoefStats]], carried over a multi-scan SOF2
    * stream (DC first + refinement, two AC spectral bands, AC refinement
    * with correction bits, restarts every 5th id). The decoded
    * dequantized coefficient sum is the same arithmetic (block indexing
    * differs — plane raster vs encode order — but a sum is
    * index-invariant), so the one oracle certifies the entire progressive
    * entropy path: successive approximation, EOB runs, spectral bands,
    * refinement births, ZRL-in-refinement. */
  def jpegProgressiveStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val qL = Array.tabulate(64)(gateQLum)
    val qC = Array.tabulate(64)(gateQChr)
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions(_.map { id =>
      val gray = id % 2 == 0
      val (w, h) =
        if (gray) (8 * ((id % 3).toInt + 1), 8 * (((id / 2) % 2).toInt + 1))
        else (16 * (((id / 2) % 2).toInt + 1), 16 * (((id / 3) % 2).toInt + 1))
      val ri = if (id % 5 == 0) 2 else 0
      def cf(c: Int, b: Int, k: Int): Int =
        if (k == 0) gateDc(c, b, id)
        else if (CoefKs.contains(k)) gateAc(c, b, k, id)
        else 0
      val bytes = synthProgressiveJpeg(w, h, gray, sub420 = !gray, qL, qC, cf, ri)
      val fr = decodeFrame(bytes).get
      (id, fr.width, fr.height, fr.planes.length, fr.coefSum)
    }).toDF("doc_id", "width", "height", "ncomp", "coef_sum")
  }

  /** Pixel-layer gate: DC-only fixtures (quant 16, dc*16 a multiple of 8
    * → every 8x8 block decodes to a flat, exactly-predictable value)
    * through the FULL decode: gray (id%3=0), color 4:4:4 (id%3=1), color
    * 4:2:0 with box upsample (id%3=2); the YCbCr→RGB floor arithmetic is
    * reproduced by the oracle, so matching pix_sum certifies IDCT level
    * shift, upsampling geometry, and color conversion together. */
  def jpegPixelStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val q16 = Array.fill(64)(16)
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions(_.map { id =>
      val mode = (id % 3).toInt
      val (w, h, gray, sub) = mode match {
        case 0 => (8 * (((id / 3) % 3).toInt + 1), 8 * (((id / 3) % 2).toInt + 1), true, false)
        case 1 => (8 * ((id % 2).toInt + 1), 8 * (((id / 2) % 2).toInt + 1), false, false)
        case _ => (16 * ((id % 2).toInt + 1), 16 * (((id / 2) % 2).toInt + 1), false, true)
      }
      def cf(c: Int, b: Int, k: Int): Int =
        if (k != 0) 0
        else c match {
          case 0 => (((b * 5 + id) % 32) - 16).toInt
          case 1 => (((b * 7 + id) % 24) - 12).toInt
          case _ => (((b * 11 + id) % 24) - 12).toInt
        }
      val bytes = synthJpeg(w, h, gray, sub, q16, q16, cf)
      val (dw, dh, dch, px) = decodePixels(bytes).get
      var s = 0L
      var i = 0
      while (i < px.length) { s += px(i) & 0xff; i += 1 }
      (id, dw, dh, dch, s)
    }).toDF("doc_id", "width", "height", "channels", "pix_sum")
  }
}
