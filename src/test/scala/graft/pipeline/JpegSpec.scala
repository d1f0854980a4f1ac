package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec: exact coefficient round-trips through real
  * compressed streams, DC-only pixel exactness through the full decode,
  * and cross-validation in BOTH directions against the JDK's independent
  * ImageIO JPEG codec. */
class JpegSpec extends AnyFunSuite {

  private val qLum = Array.tabulate(64)(Jpeg.gateQLum)
  private val qChr = Array.tabulate(64)(Jpeg.gateQChr)

  /** deterministic quantized coefficients exercising DC swings, short and
    * long zero runs (ZRL), and end-of-block at several positions */
  private def coefOf(seed: Int)(c: Int, b: Int, k: Int): Int =
    if (k == 0) ((b * 5 + c * 11 + seed) % 21) - 10
    else if (Jpeg.CoefKs.contains(k)) ((b + 3 * k + 7 * c + seed) % 11) - 5
    else 0

  test("coefficients round-trip exactly: gray, 4:4:4, 4:2:0, with restarts") {
    for {
      (gray, sub, w, h) <- Seq((true, false, 24, 16), (false, false, 16, 8),
        (false, true, 32, 16))
      ri <- Seq(0, 2)
    } {
      val cf = coefOf(w + h + ri) _
      val bytes = Jpeg.synthJpeg(w, h, gray, sub, qLum, qChr, cf, ri)
      val fr = Jpeg.decodeFrame(bytes)
        .getOrElse(fail(s"decode failed gray=$gray sub=$sub ri=$ri"))
      assert(fr.width == w && fr.height == h)
      assert(fr.planes.length == (if (gray) 1 else 3))
      // every dequantized coefficient must equal quantized * quant exactly
      var c = 0
      while (c < fr.planes.length) {
        val q = if (c == 0) qLum else qChr
        val p = fr.planes(c)
        // recover encode order: encoder counts blocks per comp in MCU
        // order, which for these MCU-aligned dims visits plane positions
        // (mcuY, bv, mcuX, bh) — rebuild that mapping here
        val mcusX = p.bw / p.h
        var bi = 0
        for (my <- 0 until p.bh / p.v; mx <- 0 until mcusX;
             bv <- 0 until p.v; bh <- 0 until p.h) {
          val blk = p.blocks((my * p.v + bv) * p.bw + (mx * p.h + bh))
          for (k <- 0 until 64)
            assert(blk(Jpeg.ZigZag(k)) == cf(c, bi, k) * q(k),
              s"comp $c block $bi zigzag $k (gray=$gray sub=$sub ri=$ri)")
          bi += 1
        }
        c += 1
      }
    }
  }

  test("progressive: multi-scan coefficients round-trip exactly (gray, 4:4:4, 4:2:0, restarts)") {
    for {
      (gray, sub, w, h) <- Seq((true, false, 24, 16), (false, false, 16, 8),
        (false, true, 32, 16))
      ri <- Seq(0, 3)
    } {
      // richer coefficient mix than the baseline fixture: odd magnitudes
      // (refinement bits), magnitude-1 births (refinement placements),
      // long runs (ZRL in first AND refinement scans), both AC bands
      def cf(c: Int, b: Int, k: Int): Int =
        if (k == 0) ((b * 5 + c * 11 + w + ri) % 21) - 10
        else if (k == 1) ((b + c) % 5) - 2        // low band, incl. ±1 births
        else if (k == 4) ((b * 3 + c + ri) % 7) - 3
        else if (k == 20) ((b + 3 * k + 7 * c) % 11) - 5 // hi band after run
        else if (k == 40) (b % 3) - 1              // births deep in the band
        else if (k == 63) ((b + c + 1) % 2)        // band-edge birth
        else 0
      val bytes = Jpeg.synthProgressiveJpeg(w, h, gray, sub, qLum, qChr, cf, ri)
      val fr = Jpeg.decodeFrame(bytes)
        .getOrElse(fail(s"progressive decode failed gray=$gray sub=$sub ri=$ri"))
      assert(fr.width == w && fr.height == h)
      assert(fr.planes.length == (if (gray) 1 else 3))
      var c = 0
      while (c < fr.planes.length) {
        val q = if (c == 0) qLum else qChr
        val p = fr.planes(c)
        // synthProgressiveJpeg addresses blocks by plane-raster index
        for (idx <- p.blocks.indices; k <- 0 until 64)
          assert(p.blocks(idx)(Jpeg.ZigZag(k)) == cf(c, idx, k) * q(k),
            s"comp $c block $idx zigzag $k (gray=$gray sub=$sub ri=$ri)")
        c += 1
      }
    }
  }

  test("progressive: ImageIO accepts our streams; we accept ImageIO's progressive output") {
    // direction 1: a DC-only progressive gray fixture decodes identically
    // (within IDCT tolerance) in the JDK's independent codec — proves the
    // multi-scan STREAM we write is spec-conformant, not just self-read
    val q16 = Array.fill(64)(16)
    // AC only on luma: chroma stays flat per block, so our box upsample
    // and ImageIO's fancy (bilinear) upsample agree within the baseline
    // tolerance; luma still exercises the multi-scan AC path
    def dcCf(c: Int, b: Int, k: Int): Int =
      if (k == 0) ((b * 5) % 32) - 16
      else if (k == 1 && c == 0) (b % 3) - 1 else 0
    val bytes = Jpeg.synthProgressiveJpeg(24, 16, gray = true, sub420 = false,
      q16, q16, dcCf)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected our progressive stream")
    val (dw, dh, dch, ours) = Jpeg.decodePixels(bytes).get
    assert((dw, dh, dch) == (24, 16, 1))
    val ras = img.getRaster
    for (y <- 0 until 16; x <- 0 until 24)
      assert(math.abs(ras.getSample(x, y, 0) - (ours(y * 24 + x) & 0xff)) <= 2,
        s"gray ($x,$y)")
    // color 4:4:4 (no upsampling): tight IDCT+color tolerance like the
    // baseline cross-check
    val cb444 = Jpeg.synthProgressiveJpeg(16, 8, gray = false, sub420 = false,
      q16, q16, dcCf)
    val img444 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cb444))
    assert(img444 != null, "ImageIO rejected our progressive 4:4:4 stream")
    val (fw, fh, fch, ours444) = Jpeg.decodePixels(cb444).get
    assert((fw, fh, fch) == (16, 8, 3))
    for (y <- 0 until 8; x <- 0 until 16) {
      val rgb = img444.getRGB(x, y)
      val o = (y * 16 + x) * 3
      assert(math.abs(((rgb >> 16) & 0xff) - (ours444(o) & 0xff)) <= 3 &&
        math.abs(((rgb >> 8) & 0xff) - (ours444(o + 1) & 0xff)) <= 3 &&
        math.abs((rgb & 0xff) - (ours444(o + 2) & 0xff)) <= 3, s"444 ($x,$y)")
    }
    // color 4:2:0 with restarts: our box upsample vs ImageIO's fancy
    // (bilinear) upsample differ at chroma block boundaries — same looser
    // bound the baseline foreign-stream test uses
    val cb = Jpeg.synthProgressiveJpeg(32, 16, gray = false, sub420 = true,
      q16, q16, dcCf, restartInterval = 2)
    val imgC = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cb))
    assert(imgC != null, "ImageIO rejected our progressive 4:2:0 stream")
    val (cw, ch2, cch, oursC) = Jpeg.decodePixels(cb).get
    assert((cw, ch2, cch) == (32, 16, 3))
    for (y <- 0 until 16; x <- 0 until 32) {
      val rgb = imgC.getRGB(x, y)
      val o = (y * 32 + x) * 3
      assert(math.abs(((rgb >> 16) & 0xff) - (oursC(o) & 0xff)) <= 16 &&
        math.abs(((rgb >> 8) & 0xff) - (oursC(o + 1) & 0xff)) <= 16 &&
        math.abs((rgb & 0xff) - (oursC(o + 2) & 0xff)) <= 16, s"color ($x,$y)")
    }

    // direction 2: ImageIO WRITES a progressive JPEG (its own scan
    // script, EOB runs and all); our decoder must agree with its reader
    def imageioProgressive(src: java.awt.image.BufferedImage): Array[Byte] = {
      val wtr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val buf = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
      wtr.setOutput(ios)
      val param = wtr.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      wtr.write(null, new javax.imageio.IIOImage(src, null, null), param)
      ios.close(); wtr.dispose()
      buf.toByteArray
    }
    val w = 40; val h = 28
    val gsrc = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gsrc.getRaster.setSample(x, y, 0, (x * 7 + y * 13) % 256)
    val gb = imageioProgressive(gsrc)
    // sanity: the writer actually produced a progressive (SOF2) stream
    assert(gb.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
      "ImageIO did not write SOF2 — progressive mode not engaged")
    val (gw, gh, gch, gours) = Jpeg.decodePixels(gb)
      .getOrElse(fail("our decoder rejected ImageIO's progressive gray stream"))
    assert((gw, gh, gch) == (w, h, 1))
    val gref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gb))
    for (y <- 0 until h; x <- 0 until w)
      assert(math.abs(gref.getRaster.getSample(x, y, 0) - (gours(y * w + x) & 0xff)) <= 2,
        s"foreign gray ($x,$y)")
    // smooth gradient (the baseline foreign test's image): keeps the
    // box-vs-fancy chroma upsampling mismatch small, so the assertion
    // measures DECODE correctness, not upsampler choice (a flat-chroma
    // probe of the same script decodes with mean delta ~0.01)
    val csrc = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      csrc.setRGB(x, y, ((x * 3 + 40) << 16) | ((y * 4 + 60) << 8) | (x + y + 80))
    val cbz = imageioProgressive(csrc)
    assert(cbz.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2))
    val (cw2, ch3, cch2, cours) = Jpeg.decodePixels(cbz)
      .getOrElse(fail("our decoder rejected ImageIO's progressive color stream"))
    assert((cw2, ch3, cch2) == (w, h, 3))
    val cref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cbz))
    var maxD = 0; var sumD = 0L
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rv = (cref.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs(rv - (cours((y * w + x) * 3 + c) & 0xff))
      maxD = math.max(maxD, d); sumD += d
    }
    assert(maxD <= 16, s"foreign progressive color max delta $maxD")
    assert(sumD.toDouble / (w * h * 3) <= 2.0,
      s"foreign progressive color mean delta ${sumD.toDouble / (w * h * 3)}")
  }

  test("DC-only fixtures decode to exactly-predictable flat pixels") {
    val q16 = Array.fill(64)(16)
    // gray: block b is uniformly 128 + 2*dc(b)
    val dcs = Array(-16, -3, 0, 7, 15, -10)
    val g = Jpeg.synthJpeg(24, 16, gray = true, sub420 = false, q16, q16,
      (_, b, k) => if (k == 0) dcs(b) else 0)
    val Some((gw, gh, gch, gpx)) = Jpeg.decodePixels(g)
    assert((gw, gh, gch) == (24, 16, 1))
    for (y <- 0 until 16; x <- 0 until 24) {
      val b = (y / 8) * 3 + (x / 8)
      assert((gpx(y * 24 + x) & 0xff) == 128 + 2 * dcs(b), s"($x,$y)")
    }
    // color 4:4:4: per-block (y, cb, cr) through the exact fixed-point
    val c = Jpeg.synthJpeg(8, 8, gray = false, sub420 = false, q16, q16,
      (comp, _, k) => if (k != 0) 0 else Array(5, -9, 11)(comp))
    val Some((cw, ch2, cch, cpx)) = Jpeg.decodePixels(c)
    assert((cw, ch2, cch) == (8, 8, 3))
    val (er, eg, eb) = Jpeg.yccToRgb(128 + 10, 128 - 18, 128 + 22)
    for (i <- 0 until 64) {
      assert((cpx(i * 3) & 0xff) == er && (cpx(i * 3 + 1) & 0xff) == eg &&
        (cpx(i * 3 + 2) & 0xff) == eb)
    }
    // 4:2:0: chroma block covers its whole 16x16 MCU via box upsample
    val s = Jpeg.synthJpeg(32, 16, gray = false, sub420 = true, q16, q16,
      (comp, b, k) => if (k != 0) 0 else comp match {
        case 0 => 2 * b - 6 // Y varies per 8x8 block
        case 1 => if (b == 0) -8 else 6 // Cb/Cr flat per MCU
        case _ => if (b == 0) 10 else -4
      })
    val Some((sw, sh, sch, spx)) = Jpeg.decodePixels(s)
    assert((sw, sh, sch) == (32, 16, 3))
    for (y <- 0 until 16; x <- 0 until 32) {
      val m = x / 16 // MCU column (one MCU row)
      val yBlk = m * 4 + (y / 8) * 2 + ((x % 16) / 8)
      val exp = Jpeg.yccToRgb(128 + 2 * (2 * yBlk - 6),
        128 + 2 * (if (m == 0) -8 else 6), 128 + 2 * (if (m == 0) 10 else -4))
      val o = (y * 32 + x) * 3
      assert(((spx(o) & 0xff, spx(o + 1) & 0xff, spx(o + 2) & 0xff)) == exp,
        s"($x,$y)")
    }
  }

  test("ImageIO (JDK's independent codec) decodes our streams within IDCT tolerance") {
    // gray with ACs: the two decoders differ only in IDCT rounding
    val bytes = Jpeg.synthJpeg(24, 16, gray = true, sub420 = false,
      qLum, qChr, coefOf(3) _)
    val ours = Jpeg.decodePixels(bytes).get._4
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == 24 && img.getHeight == 16)
    val ras = img.getRaster
    for (y <- 0 until 16; x <- 0 until 24) {
      val d = math.abs(ras.getSample(x, y, 0) - (ours(y * 24 + x) & 0xff))
      assert(d <= 2, s"gray ($x,$y) delta $d")
    }
    // color 4:4:4 with ACs: IDCT + color-convert rounding stack to <= 3
    val cb = Jpeg.synthJpeg(16, 8, gray = false, sub420 = false,
      qLum, qChr, coefOf(7) _)
    val oursC = Jpeg.decodePixels(cb).get._4
    val imgC = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cb))
    assert(imgC != null && imgC.getWidth == 16 && imgC.getHeight == 8)
    for (y <- 0 until 8; x <- 0 until 16) {
      val rgb = imgC.getRGB(x, y)
      val o = (y * 16 + x) * 3
      assert(math.abs(((rgb >> 16) & 0xff) - (oursC(o) & 0xff)) <= 3 &&
        math.abs(((rgb >> 8) & 0xff) - (oursC(o + 1) & 0xff)) <= 3 &&
        math.abs((rgb & 0xff) - (oursC(o + 2) & 0xff)) <= 3, s"color ($x,$y)")
    }
  }

  test("our decoder handles foreign streams: ImageIO-encoded JPEGs") {
    // grayscale: no chroma path, so only IDCT rounding separates decoders
    val w = 40; val h = 24
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, (x * 5 + y * 3) % 256)
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "jpg", buf))
    val jb = buf.toByteArray
    val Some((dw, dh, dch, ours)) = Jpeg.decodePixels(jb)
    assert(dw == w && dh == h && dch == 1)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jb))
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs(ref.getRaster.getSample(x, y, 0) - (ours(y * w + x) & 0xff))
      assert(d <= 2, s"foreign gray ($x,$y) delta $d")
    }
    // color (ImageIO writes subsampled chroma): our box upsample vs its
    // fancy upsample differ near chroma-block edges — smooth gradient
    // keeps that small; assert close agreement, not bit equality
    val csrc = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      csrc.setRGB(x, y, ((x * 3 + 40) << 16) | ((y * 4 + 60) << 8) | (x + y + 80))
    val cbuf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(csrc, "jpg", cbuf))
    val cb = cbuf.toByteArray
    val Some((cdw, cdh, cdch, oursC)) = Jpeg.decodePixels(cb)
    assert(cdw == w && cdh == h && cdch == 3)
    val refC = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cb))
    var maxD = 0; var sumD = 0L
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rv = (refC.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs(rv - (oursC((y * w + x) * 3 + c) & 0xff))
      maxD = math.max(maxD, d); sumD += d
    }
    assert(maxD <= 16, s"foreign color max delta $maxD")
    assert(sumD.toDouble / (w * h * 3) <= 2.0, s"foreign color mean delta ${sumD.toDouble / (w * h * 3)}")
  }

  test("progressive: seeded-random coefficient patterns round-trip exactly (30 geometries)") {
    // breadth beyond the fixed fixture: dense random mixes of ±1 births,
    // odd magnitudes (refinement bits) and random zero runs, across
    // gray / 4:4:4 / 4:2:0 and restart intervals — every dequantized
    // coefficient must survive the multi-scan wire bit-exactly
    val rnd = new scala.util.Random(7)
    var checked = 0L
    (0 until 30).foreach { trial =>
      val gray = rnd.nextBoolean()
      val sub = !gray && rnd.nextBoolean()
      val unit = if (sub) 16 else 8
      val w = unit * (1 + rnd.nextInt(3))
      val h = unit * (1 + rnd.nextInt(3))
      val ri = if (rnd.nextBoolean()) 1 + rnd.nextInt(3) else 0
      val seed = rnd.nextInt(1 << 20)
      def cf(c: Int, b: Int, k: Int): Int = {
        val x = c * 131 + b * 31 + k * 7 + seed
        if (x % 10 < 5) 0 else ((x / 10) % 21) - 10
      }
      val bytes = Jpeg.synthProgressiveJpeg(w, h, gray, sub, qLum, qChr, cf, ri)
      val fr = Jpeg.decodeFrame(bytes)
        .getOrElse(fail(s"trial $trial failed to decode (g=$gray s=$sub $w x $h ri=$ri)"))
      for (c <- fr.planes.indices; idx <- fr.planes(c).blocks.indices; k <- 0 until 64) {
        val q = if (c == 0) qLum else qChr
        assert(fr.planes(c).blocks(idx)(Jpeg.ZigZag(k)) == cf(c, idx, k) * q(k),
          s"trial $trial comp $c block $idx zigzag $k")
        checked += 1
      }
    }
    assert(checked > 10000L) // the sweep actually covered real volume
  }

  test("malformed and unsupported streams return None, never throw") {
    val good = Jpeg.synthJpeg(16, 16, gray = true, sub420 = false,
      qLum, qChr, coefOf(1) _)
    assert(Jpeg.decodeFrame(good).isDefined)
    // truncation never crashes and never yields a WRONG result: either the
    // cut hits needed data (None) or only the dispensable tail (EOI /
    // final pad bits) was dropped and the decode is identical
    val full = Jpeg.decodeFrame(good).get
    for (n <- 2 until good.length by 8)
      Jpeg.decodeFrame(java.util.Arrays.copyOf(good, n)) match {
        case None => ()
        case Some(fr) =>
          assert(n >= good.length - 16, s"len $n decoded from a deep cut")
          assert(fr.width == full.width && fr.height == full.height &&
            fr.planes.zip(full.planes).forall { case (a, b) =>
              a.blocks.zip(b.blocks).forall { case (x, y) => x.sameElements(y) }
            }, s"len $n decoded differently")
      }
    // a BASELINE stream whose SOF marker is flipped to SOF2 is invalid
    // AS progressive (its single scan spans Ss=0..Se=63 — a progressive
    // DC scan must carry only the DC band): rejected, not misdecoded
    val prog = good.clone()
    val sofAt = prog.indices.find(i => (prog(i) & 0xff) == 0xff &&
      (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decodeFrame(prog).isEmpty)
    // not a JPEG at all
    assert(Jpeg.decodeFrame(Array[Byte](1, 2, 3)).isEmpty)
    assert(Jpeg.decodeFrame("PNG not jpeg".getBytes).isEmpty)
  }
}
