package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Optimized Product Quantization — the LEARNED orthogonal rotation
  * applied before the PQ subspace split (Ge/He/Ke/Sun, "Optimized
  * Product Quantization for Approximate Nearest Neighbor Search",
  * CVPR 2013, the non-parametric OPQ_NP alternation):
  *
  * repeat:
  *   1. rotate the training sample: y_i = R·x_i
  *   2. train the M per-subspace codebooks on the rotated sample (Lloyd)
  *   3. reconstruct ŷ_i from each y_i's nearest codewords
  *   4. re-solve the rotation as the orthogonal Procrustes problem
  *      min_R ‖X − Rᵀ·Ŷ‖_F  →  R = (U·Vᵀ)ᵀ from the SVD U·S·Vᵀ of
  *      the d×d cross-covariance Σ_i x_i·ŷ_iᵀ
  *
  * Rotation is an isometry, so euclidean (and cosine) geometry is
  * untouched — what changes is how the quantization ERROR distributes
  * across the M subquantizers: the learned R re-balances per-subspace
  * energy, which is exactly what lifts ADC recall when the embedding's
  * variance is unevenly spread (the common case for real encoder
  * embeddings; an isotropic cloud gains nothing, by symmetry).
  *
  * SCALE SHAPE: learning is DRIVER-SIDE over a bounded sample — one
  * `limit(trainLimit)` collect (the same discipline as
  * [[Similarity.trainCentroids]]'s bounded Lloyd), then O(iters · n ·
  * (M·Ks·subDims + dims²)) driver flops and one dims×dims SVD per
  * iteration (64×64 — microseconds). Applying the rotation at corpus
  * scale is the [[RotateVec]] codegen kernel, one matrix–vector product
  * per row. The returned matrix is ALREADY in apply orientation:
  * `RotateVec.column(e, rotation)` yields the rotated embedding the
  * returned codebooks quantize.
  */
object Opq {

  /** Learn (rotation, codebooks) on a bounded sample. Deterministic: the
    * sample is the `trainLimit` smallest vec_ids, codebook seeding is
    * first-rows-in-order, and the alternation has no RNG state — two runs
    * over the same data return identical arrays. */
  def train(corpus: DataFrame, m: Int, ks: Int, iters: Int = 10,
            trainLimit: Int = 10000)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val x = corpus
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .orderBy(col("vec_id")).limit(trainLimit)
      .collect().map(_.getSeq[Double](1).toArray)
    require(x.nonEmpty, "Opq.train: empty training sample")
    val dims = x(0).length
    require(dims % m == 0, s"Opq.train: $dims dims not divisible into $m subspaces")
    val subDims = dims / m
    // R starts at identity, in apply orientation (y = R·x)
    var r = Array.tabulate(dims, dims)((a, b) => if (a == b) 1.0 else 0.0)
    var codebooks: Array[Array[Array[Double]]] = null
    for (_ <- 0 until math.max(1, iters)) {
      val y = x.map(apply(r, _))
      codebooks = Array.tabulate(m)(mm =>
        lloyd(y.map(_.slice(mm * subDims, (mm + 1) * subDims)), ks))
      val yHat = y.map(reconstruct(_, codebooks, subDims))
      // cross-covariance C[a][b] = Σ_i x_i[a]·ŷ_i[b]; Procrustes via SVD
      val c = breeze.linalg.DenseMatrix.zeros[Double](dims, dims)
      x.indices.foreach { i =>
        var a = 0
        while (a < dims) {
          var b = 0
          while (b < dims) { c(a, b) += x(i)(a) * yHat(i)(b); b += 1 }
          a += 1
        }
      }
      val s = breeze.linalg.svd(c)
      val uv = s.U * s.Vt // the paper's R (columns-of-X orientation)
      // apply orientation: y = Rᵀ_paper·x ⇒ store the transpose
      r = Array.tabulate(dims, dims)((a, b) => uv(b, a))
    }
    // final codebooks consistent with the FINAL rotation
    val yFinal = x.map(apply(r, _))
    val cbFinal = Array.tabulate(m)(mm =>
      lloyd(yFinal.map(_.slice(mm * subDims, (mm + 1) * subDims)), ks))
    (r, cbFinal)
  }

  /** Driver-side y = R·x with the [[RotateVec]] kernel's fold order. */
  private[pipeline] def apply(r: Array[Array[Double]], x: Array[Double]): Array[Double] = {
    val dims = r.length
    val out = new Array[Double](dims)
    var d = 0
    while (d < dims) {
      var s = 0.0
      var j = 0
      while (j < dims) { s += r(d)(j) * x(j); j += 1 }
      out(d) = s
      d += 1
    }
    out
  }

  /** Plain driver-side Lloyd over a subspace slice: first-`ks`-rows
    * seeding, empty cells keep their centroid — the in-memory twin of
    * [[Similarity.trainCentroids]]'s relational form. */
  private def lloyd(rows: Array[Array[Double]], ks: Int,
                    iters: Int = 5): Array[Array[Double]] = {
    val sub = rows(0).length
    var cents = Array.tabulate(math.min(ks, rows.length))(rows(_).clone())
    if (cents.length < ks)
      cents = cents ++ Array.fill(ks - cents.length)(cents(0).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(ks, sub)(0.0)
      val counts = new Array[Long](ks)
      rows.foreach { v =>
        val c = nearestIdx(v, cents)
        counts(c) += 1
        var d = 0
        while (d < sub) { sums(c)(d) += v(d); d += 1 }
      }
      cents = Array.tabulate(ks)(c =>
        if (counts(c) == 0) cents(c)
        else Array.tabulate(sub)(d => sums(c)(d) / counts(c)))
    }
    cents
  }

  private def nearestIdx(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bd = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var j = 0
      while (j < v.length) { val t = v(j) - cents(c)(j); d += t * t; j += 1 }
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    best
  }

  private def reconstruct(y: Array[Double], cbs: Array[Array[Array[Double]]],
                          subDims: Int): Array[Double] = {
    val out = new Array[Double](y.length)
    var mm = 0
    while (mm < cbs.length) {
      val slice = y.slice(mm * subDims, (mm + 1) * subDims)
      val c = cbs(mm)(nearestIdx(slice, cbs(mm)))
      System.arraycopy(c, 0, out, mm * subDims, subDims)
      mm += 1
    }
    out
  }

  /** Mean squared PQ reconstruction error of `corpus` under (rotation,
    * codebooks) — the objective OPQ minimizes; the spec pins that the
    * learned pair beats the un-rotated one on anisotropic data. Driver
    * math over a bounded sample. */
  def distortion(corpus: DataFrame, rotation: Array[Array[Double]],
                 codebooks: Array[Array[Array[Double]]],
                 trainLimit: Int = 10000): Double = {
    val x = corpus
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .orderBy(col("vec_id")).limit(trainLimit)
      .collect().map(_.getSeq[Double](1).toArray)
    require(x.nonEmpty, "Opq.distortion: empty sample") // loud, never NaN
    val subDims = rotation.length / codebooks.length
    val errs = x.map { v =>
      val y = apply(rotation, v)
      val yh = reconstruct(y, codebooks, subDims)
      y.indices.map(d => { val t = y(d) - yh(d); t * t }).sum
    }
    errs.sum / errs.length
  }
}
