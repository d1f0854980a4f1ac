package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class AudioSpec extends AnyFunSuite {

  /** Direct O(n²) DFT, the independent reference implementation. */
  private def dft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    for (b <- 0 until n; k <- 0 until n) {
      val ang = -2.0 * math.Pi * b * k / n
      re(b) += x(k) * math.cos(ang)
      im(b) += x(k) * math.sin(ang)
    }
    (re, im)
  }

  test("fft matches the direct DFT on deterministic data") {
    val n = 128
    // full-period deterministic pseudo-signal (no RNG: reproducible)
    val x = Array.tabulate(n)(k => math.sin(0.7 * k) + 0.3 * math.cos(2.1 * k))
    val re = x.clone(); val im = new Array[Double](n)
    Audio.fft(re, im)
    val (dr, di) = dft(x)
    val scale = x.map(math.abs).sum
    for (b <- 0 until n) {
      assert(math.abs(re(b) - dr(b)) < 1e-9 * scale, s"re bin $b")
      assert(math.abs(im(b) - di(b)) < 1e-9 * scale, s"im bin $b")
    }
  }

  test("pure tone at bin f peaks at f with amplitude n/2") {
    val n = 64
    for (f <- Seq(1, 5, 17, 31)) {
      val x = Array.tabulate(n)(k => math.cos(2.0 * math.Pi * f * k / n))
      assert(Audio.peakBin(x) == f)
      val p = Audio.powerSpectrum(x)
      // |X[f]| = n/2 for a unit cosine exactly on a bin
      assert(math.abs(math.sqrt(p(f)) - n / 2.0) < 1e-9)
    }
  }

  test("wav pcm round-trip and framing") {
    val samples = Array.tabulate[Short](130)(k => (k * 17 % 251 - 125).toShort)
    val wav = Audio.synthWavPcm(samples, 8000)
    val got = Audio.wavSamples(wav).get
    assert(got.length == 130)
    assert(got.zip(samples).forall { case (g, s) => g == s.toDouble })
    // 130 samples at frame 64 -> 2 full frames, partial tail dropped
    assert(Audio.spectrogramPeaks(got, 64).map(_._1) == Seq(0, 1))
    // truncated blob: readable prefix, no throw
    assert(Audio.wavSamples(wav.take(50)).get.length == 3)
    assert(Audio.wavSamples(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("square-wave fixture peaks at its fundamental for every gate freq") {
    for (id <- 0L until 30L; frame <- 0 until 2) {
      val x = Array.tabulate(Audio.GateFrameLen)(k =>
        Audio.gateSample(id, frame, k).toDouble)
      val expected = ((id + frame) % 15).toInt + 1
      assert(Audio.peakBin(x) == expected, s"id=$id frame=$frame")
    }
  }

  test("resampleLinear: identity at ratio 1, exact midpoints at 2x") {
    val x = Array(0.0, 100.0, -50.0)
    assert(Audio.resampleLinear(x, 3).toSeq == x.toSeq)
    // 2x: out = s0, .75*s0+.25*s1, .25*s0+.75*s1, ... edge-clamped
    val up = Audio.resampleLinear(Array(0.0, 100.0), 4)
    assert(up.toSeq == Seq(0.0, 25.0, 75.0, 100.0))
  }

  test("G.711: known anchor values and full-table parity with the JDK codec") {
    // published anchors: µ-law 0x00 is the negative extreme −32124,
    // 0xFF decodes to 0; A-law 0x55 is −8 and 0xD5 +8 (opposite sign bit)
    assert(Audio.muLawToPcm(0x00) == -32124)
    assert(Audio.muLawToPcm(0x80) == 32124)
    assert(Audio.muLawToPcm(0xff) == 0)
    assert(Audio.aLawToPcm(0x55) == -8)
    assert(Audio.aLawToPcm(0xd5) == 8)
    // full 256-value cross-check against javax.sound's independent G.711
    // implementation (convert each companded byte to 16-bit linear)
    import javax.sound.sampled._
    def jdkDecode(enc: AudioFormat.Encoding, byte: Int): Int = {
      val src = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
      val dst = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(Array(byte.toByte)), src, 1)
      val out = AudioSystem.getAudioInputStream(dst, in)
      val bb = out.readAllBytes()
      ((bb(0) & 0xff) | (bb(1) << 8)).toShort.toInt
    }
    (0 until 256).foreach { v =>
      assert(jdkDecode(AudioFormat.Encoding.ULAW, v) == Audio.muLawToPcm(v), s"ulaw $v")
      assert(jdkDecode(AudioFormat.Encoding.ALAW, v) == Audio.aLawToPcm(v), s"alaw $v")
    }
  }

  test("G.711 WAVs decode through the RIFF walk; PCM16 still reads") {
    val mu = Audio.synthWavG711(7, Array.tabulate(10)(k => (k * 31).toByte), 8000)
    val muPcm = Audio.wavSamplesAny(mu).get
    assert(muPcm.length == 10)
    assert(muPcm(0) == Audio.muLawToPcm(0).toDouble)
    val al = Audio.synthWavG711(6, Array.tabulate(7)(k => (k * 13 + 5).toByte), 8000)
    assert(Audio.wavSamplesAny(al).get.length == 7)
    assert(Audio.wavSamplesAny(al).get.head == Audio.aLawToPcm(5).toDouble)
    // 16-bit PCM takes the format-1 path, identical to wavSamples
    val pcm = Audio.synthWavPcm(Array[Short](100, -200, 300), 8000)
    assert(Audio.wavSamplesAny(pcm).get.toSeq == Audio.wavSamples(pcm).get.toSeq)
  }

  test("IMA ADPCM: hand-checked steps, clamping, and WAV round-trip") {
    // step table entry 0 is 7: nibble 7 (all magnitude bits) gives
    // diff = 0 + 1 + 3 + 7 = 11, index moves +8
    assert(Audio.imaStep(0, 0, 7) == ((11, 8)))
    // sign bit subtracts; index clamps at 0
    assert(Audio.imaStep(0, 0, 15) == ((-11, 8)))
    assert(Audio.imaStep(0, 0, 0) == ((0, 0)))
    // predictor clamps at the 16-bit rails, index at 88
    assert(Audio.imaStep(32760, 88, 7)._1 == 32767)
    assert(Audio.imaStep(-32760, 88, 15)._1 == -32768)
    assert(Audio.imaStep(0, 88, 4)._2 == 88)
    // WAV round-trip equals a direct fold of the state machine
    val nibbles = Array.tabulate(20)(k => (k * 5 + 3) % 16)
    val wav = Audio.synthWavImaAdpcm(pred0 = -1234, idx0 = 30, nibbles, 8000)
    val pcm = Audio.wavSamplesAny(wav).get
    var pred = -1234; var idx = 30
    val expect = -1234.0 +: nibbles.map { nb =>
      val (p, i) = Audio.imaStep(pred, idx, nb); pred = p; idx = i; p.toDouble
    }
    assert(pcm.toSeq == expect.toSeq)
  }

  test("mel filterbank: triangles cover the band, peak at 1, edges at 0") {
    val fb = Audio.melFilterbank(33, 10, 8000)
    assert(fb.length == 10 && fb.forall(_.length == 33))
    // each filter is nonnegative with a unit-height interior peak
    fb.foreach { f =>
      assert(f.forall(v => v >= 0.0 && v <= 1.0 + 1e-12))
      assert(f.max > 0.5) // triangle peaks near 1 at some bin
    }
    // every interior bin is inside at least one filter's support
    for (b <- 1 until 32) {
      assert(fb.exists(f => f(b) > 0.0), s"bin $b uncovered")
    }
  }

  test("dct2 is orthonormal: constant maps to c0 only, energy preserved") {
    val const = Array.fill(10)(2.5)
    val c = Audio.dct2(const)
    assert(math.abs(c(0) - 2.5 * math.sqrt(10.0)) < 1e-12)
    assert(c.drop(1).forall(v => math.abs(v) < 1e-12))
    // Parseval: ||DCT(x)|| = ||x|| for the orthonormal scaling
    val x = Array.tabulate(10)(i => math.sin(1.3 * i))
    val y = Audio.dct2(x)
    assert(math.abs(x.map(v => v * v).sum - y.map(v => v * v).sum) < 1e-9)
  }

  test("mfcc: deterministic, tone-dependent, c0 tracks energy") {
    val tone = Array.tabulate(64)(k => 1000.0 * math.cos(2 * math.Pi * 5 * k / 64))
    val loud = tone.map(_ * 4)
    val a = Audio.mfccFrame(tone, 10, 5, 8000)
    val b = Audio.mfccFrame(tone, 10, 5, 8000)
    assert(a.toSeq == b.toSeq)
    // scaling the signal raises c0 (mean log energy), shape stays close
    val l = Audio.mfccFrame(loud, 10, 5, 8000)
    assert(l(0) > a(0))
    val other = Audio.mfccFrame(
      Array.tabulate(64)(k => 1000.0 * math.cos(2 * math.Pi * 13 * k / 64)), 10, 5, 8000)
    assert(a.zip(other).exists { case (x, y) => math.abs(x - y) > 1.0 })
  }
}
