package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Image-level pipeline operators over decoded pixel arrays: perceptual
  * hashing (average hash) for near-duplicate image detection and
  * bilinear resampling for model-input preprocessing.
  *
  * Both are narrow per-document maps after decode — no shuffle — and the
  * near-dup pairing rides [[Dedup.hammingPairs]]' pigeonhole banding, so
  * the image-dedup path has exactly the same scale shape as text
  * simhash: linear hash pass, banded candidate join, never all-pairs.
  *
  * Exactness: aHash is pure integer arithmetic (channel sums compared as
  * `64·g_j > Σg` — no division), and the bilinear kernel at the gate's
  * 8×8 target over ≤31×23 sources uses only dyadic rationals (halves /
  * sixteenths), every intermediate exactly representable in a double —
  * so the DuckDB oracles reproduce both BIT-FOR-BIT, certifying the
  * whole decode → resample → hash chain.
  */
object Images {

  /** Average hash (aHash) of a decoded image: nearest-neighbor reduce to
    * 8×8, per-cell channel-sum "gray", bit j set iff cell j is strictly
    * brighter than the mean (`64·g_j > Σg`, integer-exact). */
  def aHashOf(px: Array[Byte], w: Int, h: Int, ch: Int): Long = {
    val small = Multimodal.resizeNearest(px, w, h, ch, 8, 8)
    val gray = Array.tabulate(64) { j =>
      var s = 0L
      var c = 0
      while (c < ch) { s += small(j * ch + c) & 0xff; c += 1 }
      s
    }
    val total = gray.sum
    var hash = 0L
    var j = 0
    while (j < 64) {
      if (64L * gray(j) > total) hash |= 1L << j
      j += 1
    }
    hash
  }

  /** Bilinear resample with half-pixel-center source mapping (the
    * standard align_corners=false convention), edge-clamped; output
    * bytes are round-half-up of the blended value. */
  def bilinearResize(px: Array[Byte], w: Int, h: Int, ch: Int,
                     dstW: Int, dstH: Int): Array[Byte] = {
    val out = new Array[Byte](dstW * dstH * ch)
    var y = 0
    while (y < dstH) {
      val syRaw = (y + 0.5) * h / dstH - 0.5
      val sy = math.min(math.max(syRaw, 0.0), (h - 1).toDouble)
      val y0 = sy.toInt
      val y1 = math.min(y0 + 1, h - 1)
      val fy = sy - y0
      var x = 0
      while (x < dstW) {
        val sxRaw = (x + 0.5) * w / dstW - 0.5
        val sx = math.min(math.max(sxRaw, 0.0), (w - 1).toDouble)
        val x0 = sx.toInt
        val x1 = math.min(x0 + 1, w - 1)
        val fx = sx - x0
        var c = 0
        while (c < ch) {
          def p(yy: Int, xx: Int) = (px((yy * w + xx) * ch + c) & 0xff).toDouble
          val v = (1 - fy) * ((1 - fx) * p(y0, x0) + fx * p(y0, x1)) +
            fy * ((1 - fx) * p(y1, x0) + fx * p(y1, x1))
          out((y * dstW + x) * ch + c) = math.floor(v + 0.5).toInt.toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** aHash gate: decode the deterministic PNG fixture (same shapes as
    * [[Multimodal.pngPixelStats]]) and emit each image's 64-bit average
    * hash — the oracle rebuilds it arithmetically from the nearest-resize
    * index mapping. */
  def aHashStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions(_.map { id =>
      val w = (id % 31).toInt + 1
      val h = ((id * 5) % 23).toInt + 1
      val ch = (id % 3) match { case 0 => 1; case 1 => 3; case _ => 4 }
      val png = Multimodal.synthPng(w, h, ch, i => ((i * 7 + id) % 256).toInt)
      val (dw, dh, dch, px) = Multimodal.decodePngPixels(png).get
      (id, aHashOf(px, dw, dh, dch))
    }).toDF("doc_id", "ahash")
  }

  /** Perceptual near-dup image pairs: aHash + Hamming banding. */
  def aHashPairs(spark: SparkSession, docs: DataFrame,
                 maxHamming: Int = 2): DataFrame =
    Dedup.hammingPairs(aHashStats(spark, docs), "ahash", maxHamming)

  /** Horizontal mirror: out(y, x, c) = in(y, w−1−x, c). */
  def flipH(px: Array[Byte], w: Int, h: Int, ch: Int): Array[Byte] = {
    val out = new Array[Byte](px.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          out((y * w + x) * ch + c) = px((y * w + (w - 1 - x)) * ch + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** 90° clockwise rotation: output is h×w; out(x', y') = in(y', h−1−x'). */
  def rotate90cw(px: Array[Byte], w: Int, h: Int, ch: Int): Array[Byte] = {
    val out = new Array[Byte](px.length)
    var y2 = 0
    while (y2 < w) { // output rows
      var x2 = 0
      while (x2 < h) { // output cols
        var c = 0
        while (c < ch) {
          out((y2 * h + x2) * ch + c) = px(((h - 1 - x2) * w + y2) * ch + c)
          c += 1
        }
        x2 += 1
      }
      y2 += 1
    }
    out
  }

  /** Flip/rotate gate: POSITION-WEIGHTED sums (Σ (i+1)·byteᵢ) of the
    * mirrored and rotated decodes — a plain pixel sum is permutation-
    * invariant and would certify nothing about the geometry; the
    * weighted sum pins every byte to its destination index. */
  def flipRotateStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions(_.map { id =>
      val w = (id % 31).toInt + 1
      val h = ((id * 5) % 23).toInt + 1
      val ch = (id % 3) match { case 0 => 1; case 1 => 3; case _ => 4 }
      val png = Multimodal.synthPng(w, h, ch, i => ((i * 7 + id) % 256).toInt)
      val (dw, dh, dch, px) = Multimodal.decodePngPixels(png).get
      def wsum(a: Array[Byte]) = {
        var s = 0L
        var i = 0
        while (i < a.length) { s += (i + 1).toLong * (a(i) & 0xff); i += 1 }
        s
      }
      (id, dw, dh, dch,
        wsum(flipH(px, dw, dh, dch)), wsum(rotate90cw(px, dw, dh, dch)))
    }).toDF("doc_id", "width", "height", "channels", "flip_wsum", "rot_wsum")
  }

  /** Bilinear-resize gate: the same PNG fixture family reduced to 8×8
    * with the bilinear kernel; the oracle reproduces the blend exactly
    * (all dyadic arithmetic — see the object scaladoc). */
  def pngBilinearStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions(_.map { id =>
      val w = (id % 31).toInt + 1
      val h = ((id * 5) % 23).toInt + 1
      val ch = (id % 3) match { case 0 => 1; case 1 => 3; case _ => 4 }
      val png = Multimodal.synthPng(w, h, ch, i => ((i * 7 + id) % 256).toInt)
      val (dw, dh, dch, px) = Multimodal.decodePngPixels(png).get
      val small = bilinearResize(px, dw, dh, dch, 8, 8)
      (id, 8, 8, dch, small.map(p => (p & 0xff).toLong).sum)
    }).toDF("doc_id", "width", "height", "channels", "pix_sum")
  }
}
