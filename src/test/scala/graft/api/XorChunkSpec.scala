package graft.api

import org.scalatest.funsuite.AnyFunSuite

/** Bit-exact round-trips of the Gorilla XOR chunk codec and the streamed
  * remote-read framing (prometheus tsdb/chunkenc/xor.go and
  * storage/remote/chunked.go wire formats). */
class XorChunkSpec extends AnyFunSuite {

  private def roundtrip(samples: Seq[(Long, Double)]): Unit = {
    val dec = XorChunk.decode(XorChunk.encode(samples))
    assert(dec.length == samples.length)
    dec.zip(samples).foreach { case ((dt, dv), (t, v)) =>
      assert(dt == t, s"timestamp $dt != $t")
      assert(java.lang.Double.doubleToRawLongBits(dv) ==
        java.lang.Double.doubleToRawLongBits(v), s"value $dv != $v at t=$t")
    }
  }

  test("empty, single and pair chunks round-trip") {
    roundtrip(Nil)
    roundtrip(Seq((1500000000000L, 42.5)))
    roundtrip(Seq((0L, 0.0), (15000L, -0.0)))
  }

  test("constant series compresses to repeat bits and round-trips") {
    val s = (0 until 120).map(i => (1000L * 15 * i, 7.25))
    val enc = XorChunk.encode(s)
    // 120 constant samples at a constant interval: ~2 bits each after the
    // 13-byte first/second-sample preamble, nowhere near 8 bytes a sample
    assert(enc.length < 50, s"constant chunk took ${enc.length} bytes")
    roundtrip(s)
  }

  test("random walks with irregular timestamps round-trip bit-exactly") {
    val rnd = new scala.util.Random(42)
    (0 until 20).foreach { _ =>
      var t = 1600000000000L + rnd.nextInt(100000)
      var v = rnd.nextDouble() * 1000
      val s = (0 until (1 + rnd.nextInt(300))).map { _ =>
        t += rnd.nextInt(60000).toLong // includes 0: duplicate timestamps
        v += rnd.nextGaussian()
        (t, v)
      }
      roundtrip(s)
    }
  }

  test("counter-style and special values (NaN payloads, infinities)") {
    roundtrip(Seq((0L, 1.0), (10L, 2.0), (20L, Double.NaN),
      (30L, Double.PositiveInfinity), (40L, Double.NegativeInfinity),
      (50L, java.lang.Double.longBitsToDouble(0x7ff8000000000042L)), // NaN payload
      (60L, 0.0), (70L, Double.MinPositiveValue), (80L, Double.MaxValue)))
  }

  test("delta-of-delta selector ladder: every branch exercised") {
    // dods: 0, ±small (14-bit), ±mid (17-bit), ±large (20-bit), huge (64-bit)
    val ts = Seq(0L, 1000L, 2000L, 2000L + 1000 + 8000, 2000L + 1000 + 8000 + 1000 + 60000,
      2000L + 1000 + 8000 + 1000 + 60000 + 1000 + 500000,
      2000L + 1000 + 8000 + 1000 + 60000 + 1000 + 500000 + 1000 + 10000000000L)
    val mono = ts.scanLeft(0L)(_ + _).tail.zipWithIndex.map { case (t, i) => (t, i.toDouble) }
    roundtrip(mono)
  }

  test("two-byte sample count: 65535-sample chunk round-trips") {
    val s = (0 until 65535).map(i => (i.toLong * 250, (i % 97).toDouble))
    roundtrip(s)
    assertThrows[IllegalArgumentException](XorChunk.encode(
      (0 to 65535).map(i => (i.toLong, 1.0))))
  }

  test("encodeChunks splits at the chunk cap and preserves order") {
    val s = (0 until 301).map(i => (i.toLong * 1000, math.sin(i / 10.0)))
    val chunks = XorChunk.encodeChunks(s, samplesPerChunk = 120)
    assert(chunks.map(_._3).map(XorChunk.decode(_).length) == Seq(120, 120, 61))
    assert(chunks.flatMap(c => XorChunk.decode(c._3)) == s)
    chunks.foreach { case (minT, maxT, data) =>
      val dec = XorChunk.decode(data)
      assert(dec.head._1 == minT && dec.last._1 == maxT)
    }
  }

  test("frame writer/reader round-trips and detects corruption") {
    val payloads = Seq(Array[Byte](), Array[Byte](1, 2, 3),
      Array.tabulate(100000)(i => (i * 31).toByte))
    val out = new java.io.ByteArrayOutputStream()
    payloads.foreach(XorChunk.writeFrame(out, _))
    val back = XorChunk.readFrames(new java.io.ByteArrayInputStream(out.toByteArray))
    assert(back.map(_.toSeq) == payloads.map(_.toSeq))

    val bytes = out.toByteArray
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x01).toByte
    assertThrows[java.io.IOException](
      XorChunk.readFrames(new java.io.ByteArrayInputStream(bytes)))
  }

  test("timestamps must be non-decreasing") {
    assertThrows[IllegalArgumentException](
      XorChunk.encode(Seq((1000L, 1.0), (999L, 2.0))))
  }
}
