package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class VideoSpec extends AnyFunSuite {

  private val q16 = Array.fill(64)(16)
  private def flatFrame(w: Int, h: Int, dc: Int): Array[Byte] =
    Jpeg.synthJpeg(w, h, gray = true, sub420 = false, q16, q16,
      (_, _, k) => if (k == 0) dc else 0)

  test("synthAvi/parseAvi round-trips metadata and frame extents") {
    val frames = Seq(flatFrame(16, 8, 3), flatFrame(16, 8, -5), flatFrame(16, 8, 0))
    val avi = Video.synthAvi(frames, 16, 8, 40000)
    val (meta, extents) = Video.parseAvi(avi).get
    assert(meta == Video.AviMeta(16, 8, 40000, 3, "MJPG"))
    assert(extents.length == 3)
    extents.zip(frames).foreach { case ((off, len), orig) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(avi, off, off + len), orig))
    }
  }

  test("sampled frames decode through the JPEG codec with exact pixel sums") {
    val dcs = Seq(4, -2, 9, 0, -16)
    val avi = Video.synthAvi(dcs.map(flatFrame(8, 8, _)), 8, 8, 33333)
    val out = Video.decodeSampledFrames(avi, everyK = 2)
    // every 2nd frame: indices 0, 2, 4; DC-only 8x8 gray: 64 * (128 + 2*dc)
    assert(out.map(_._1) == Seq(0, 2, 4))
    assert(out.map(f => (f._2, f._3, f._4)) == Seq.fill(3)((8, 8, 1)))
    assert(out.map(_._5) == Seq(0, 2, 4).map(i => 64L * (128 + 2 * dcs(i))))
  }

  test("truncated and malformed containers degrade, never throw") {
    val avi = Video.synthAvi(Seq(flatFrame(8, 8, 1), flatFrame(8, 8, 2)), 8, 8, 33333)
    // cut inside the second movi chunk: the first frame survives
    val (_, extents) = Video.parseAvi(avi).get
    val cut = java.util.Arrays.copyOf(avi, extents(1)._1 + 4)
    val (metaCut, framesCut) = Video.parseAvi(cut).get
    assert(metaCut.totalFrames == 2 && framesCut.length >= 1)
    Video.decodeSampledFrames(cut, 1) // partial second frame: skipped, no throw
    assert(Video.parseAvi(Array[Byte](1, 2, 3)).isEmpty)
    assert(Video.parseAvi("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(Video.parseAvi(Array.fill[Byte](64)(0x41)).isEmpty)
  }

  test("gate fixture matches the oracle arithmetic") {
    (0L to 40L).foreach { id =>
      val avi = Video.synthGateAvi(id)
      val (meta, _) = Video.parseAvi(avi).get
      val nf = (id % 7).toInt + 2
      val w = 8 * ((id % 2).toInt + 1)
      val h = 8 * (((id / 2) % 2).toInt + 1)
      assert(meta == Video.AviMeta(w, h, 33333 + (id % 5).toInt * 1000, nf, "MJPG"))
      val out = Video.decodeSampledFrames(avi, 2)
      assert(out.map(_._1) == (0 until nf by 2).toSeq)
      out.foreach { case (fi, dw, dh, ch, pixSum) =>
        assert((dw, dh, ch) == (w, h, 1))
        val blocks = (w / 8) * (h / 8)
        val want = (0 until blocks).map(b =>
          64L * (128 + 2 * (((b * 5 + id + 3 * fi) % 32) - 16))).sum
        assert(pixSum == want, s"id=$id frame=$fi")
      }
    }
  }
}
