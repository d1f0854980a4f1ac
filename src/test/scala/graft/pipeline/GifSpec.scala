package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class GifSpec extends AnyFunSuite {

  private def expected(w: Int, h: Int, idxOf: Int => Int): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val j = idxOf(i)
      px(3 * i) = Gif.paletteByte(j, 0).toByte
      px(3 * i + 1) = Gif.paletteByte(j, 1).toByte
      px(3 * i + 2) = Gif.paletteByte(j, 2).toByte
      i += 1
    }
    px
  }

  test("round-trip: sequential, constant and KwKwK-heavy patterns") {
    val cases = Seq[(Int, Int, Int => Int)](
      (7, 5, i => i % 256),
      (16, 4, _ => 42),            // long runs: exercises the KwKwK case
      (13, 11, i => (i * i) % 256),
      (1, 1, _ => 7),
      (255, 1, i => i % 2))        // aba ab ab...: dictionary chains
    cases.foreach { case (w, h, f) =>
      val Some((dw, dh, px)) = Gif.decode(Gif.synth(w, h, f))
      assert((dw, dh) == ((w, h)))
      assert(px.sameElements(expected(w, h, f)), s"pixels mismatch at ${w}x$h")
    }
  }

  test("interlaced encode decodes to the identical row-major image") {
    val f = (i: Int) => (i * 11 + 3) % 256
    val Some((_, _, plain)) = Gif.decode(Gif.synth(23, 17, f))
    val Some((_, _, inter)) = Gif.decode(Gif.synth(23, 17, f, interlaced = true))
    assert(plain.sameElements(inter))
    assert(plain.sameElements(expected(23, 17, f)))
  }

  test("cross-check: our encoder is readable by ImageIO, pixel-exact") {
    val f = (i: Int) => (i * 31 + 5) % 256
    val (w, h) = (19, 13)
    Seq(false, true).foreach { il =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Gif.synth(w, h, f, interlaced = il)))
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val j = f(y * w + x)
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == Gif.paletteByte(j, 0))
        assert(((rgb >> 8) & 0xff) == Gif.paletteByte(j, 1))
        assert((rgb & 0xff) == Gif.paletteByte(j, 2))
      }
    }
  }

  test("cross-check: ImageIO-encoded GIFs decode pixel-exact through ours") {
    val (w, h) = (31, 21)
    val r = new Array[Byte](256); val g = new Array[Byte](256); val b = new Array[Byte](256)
    (0 until 256).foreach { j =>
      r(j) = Gif.paletteByte(j, 0).toByte
      g(j) = Gif.paletteByte(j, 1).toByte
      b(j) = Gif.paletteByte(j, 2).toByte
    }
    val cm = new java.awt.image.IndexColorModel(8, 256, r, g, b)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 7 + y * 13) % 256)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", baos))
    val Some((dw, dh, px)) = Gif.decode(baos.toByteArray)
    assert((dw, dh) == ((w, h)))
    // compare RGB values (the writer may permute palette indices)
    for (y <- 0 until h; x <- 0 until w) {
      val i = y * w + x
      val rgb = img.getRGB(x, y)
      assert((px(3 * i) & 0xff) == ((rgb >> 16) & 0xff))
      assert((px(3 * i + 1) & 0xff) == ((rgb >> 8) & 0xff))
      assert((px(3 * i + 2) & 0xff) == (rgb & 0xff))
    }
  }

  test("dictionary reset: a >4096-entry stream round-trips and matches ImageIO") {
    // noisy 160x120 image: the LZW dictionary fills and resets mid-stream
    val (w, h) = (160, 120)
    val f = (i: Int) => ((i * 2654435761L >>> 7) % 256).toInt
    val gif = Gif.synth(w, h, f)
    val Some((_, _, px)) = Gif.decode(gif)
    assert(px.sameElements(expected(w, h, f)))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    for (y <- 0 until h by 7; x <- 0 until w by 5) {
      val i = y * w + x
      assert(((img.getRGB(x, y) >> 16) & 0xff) == (px(3 * i) & 0xff))
    }
  }

  test("malformed inputs decode to None, never throw") {
    val good = Gif.synth(9, 7, i => i % 256)
    assert(Gif.decode(Array.emptyByteArray).isEmpty)
    assert(Gif.decode("GIF89a".getBytes("US-ASCII")).isEmpty)
    assert(Gif.decode("NOTGIF!!".getBytes("US-ASCII") ++ good.drop(8)).isEmpty)
    (1 until good.length by 13).foreach { n =>
      Gif.decode(good.take(n)) // truncation: None or a valid prefix, no throw
    }
    // corrupt the LZW body: flip bytes mid-stream
    val bad = good.clone()
    bad(bad.length - 10) = 0xff.toByte; bad(bad.length - 9) = 0xff.toByte
    Gif.decode(bad) // must not throw
  }
}
