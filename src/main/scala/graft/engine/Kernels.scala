package graft.engine

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._

/** Sequential per-(series, step) numeric kernels that genuinely need an
  * ordered fold over the window's samples — the cases Spark's built-in
  * aggregates can't express (SURVEY §2.10). Each is a Scala UDF over
  * `collect_list(struct(t, value))`; per-group sample counts are window-sized
  * (bounded), so the fold is O(window) per output row and fully distributed.
  *
  * Algorithms re-implemented from the reference semantics:
  *  - extrapolated rate/increase/delta: vendor/.../promql/functions.go:63-169
  *  - irate/idelta instant value: functions.go:246-300
  *  - resets/changes: functions.go:1162-1213
  *  - deriv/predict_linear least-squares: functions.go:897-964
  *  - holt_winters double exponential smoothing: functions.go:302-347
  *  - histogram_quantile bucket interpolation: quantile.go:74-123,368-385
  */
object Kernels {

  /** Sorted (t, v) pairs from the collected struct list. */
  private def sorted(samples: Seq[Row]): Array[(Long, Double)] = {
    val arr = samples.iterator.map(r => (r.getLong(0), r.getDouble(1))).toArray
    java.util.Arrays.sort(arr, Ordering.by((p: (Long, Double)) => p._1))
    arr
  }

  /** Counter-reset-corrected, boundary-extrapolated rate/increase/delta.
    * `step` is the window end; window is (step-rangeMs, step]. Returns null
    * (no sample) when fewer than two points exist. */
  def extrapolated(rangeMs: Long, isCounter: Boolean, isRate: Boolean)(
      samples: Seq[Row], step: Long): java.lang.Double = {
    if (samples == null || samples.size < 2) return null
    val s = sorted(samples)
    val rangeStart = step - rangeMs
    val rangeEnd = step
    // corrections accumulated separately, then added once: same float
    // association as an external (last-first)+sum(corrections) oracle
    var corr = 0.0
    if (isCounter) {
      var last = s.head._2
      var i = 1
      while (i < s.length) {
        val v = s(i)._2
        if (v < last) corr += last
        last = v
        i += 1
      }
    }
    val result = s.last._2 - s.head._2 + corr
    var durationToStart = (s.head._1 - rangeStart).toDouble / 1000.0
    val durationToEnd = (rangeEnd - s.last._1).toDouble / 1000.0
    val sampledInterval = (s.last._1 - s.head._1).toDouble / 1000.0
    val avgBetween = sampledInterval / (s.length - 1)
    if (isCounter && result > 0 && s.head._2 >= 0) {
      // counters cannot be negative: don't extrapolate below the zero point
      val durationToZero = sampledInterval * (s.head._2 / result)
      if (durationToZero < durationToStart) durationToStart = durationToZero
    }
    val extrapolationThreshold = avgBetween * 1.1
    var extrapolateTo = sampledInterval
    extrapolateTo += (if (durationToStart < extrapolationThreshold) durationToStart else avgBetween / 2)
    extrapolateTo += (if (durationToEnd < extrapolationThreshold) durationToEnd else avgBetween / 2)
    var factor = extrapolateTo / sampledInterval
    if (isRate) factor /= rangeMs.toDouble / 1000.0
    result * factor
  }

  /** irate / idelta: last two samples of the window. */
  def instantValue(isRate: Boolean)(samples: Seq[Row], step: Long): java.lang.Double = {
    if (samples == null || samples.size < 2) return null
    val s = sorted(samples)
    val (prevT, prevV) = s(s.length - 2)
    val (lastT, lastV) = s(s.length - 1)
    if (lastT == prevT) return null
    var result =
      if (isRate && lastV < prevV) lastV // counter reset
      else lastV - prevV
    if (isRate) result /= (lastT - prevT).toDouble / 1000.0
    result
  }

  /** Count of counter resets (value drops) in the window. */
  def resets(samples: Seq[Row], step: Long): java.lang.Double = {
    if (samples == null || samples.isEmpty) return null
    val s = sorted(samples)
    var n = 0
    var i = 1
    while (i < s.length) { if (s(i)._2 < s(i - 1)._2) n += 1; i += 1 }
    n.toDouble
  }

  /** Count of value changes in the window (NaN→NaN is not a change). */
  def changes(samples: Seq[Row], step: Long): java.lang.Double = {
    if (samples == null || samples.isEmpty) return null
    val s = sorted(samples)
    var n = 0
    var i = 1
    while (i < s.length) {
      val a = s(i - 1)._2
      val b = s(i)._2
      if (a != b && !(a.isNaN && b.isNaN)) n += 1
      i += 1
    }
    n.toDouble
  }

  /** Least-squares slope+intercept over (t, v), x shifted to the last
    * sample's timestamp for numeric stability. Returns (slope, intercept). */
  private def linearRegression(s: Array[(Long, Double)], interceptTimeMs: Long): (Double, Double) = {
    var n = 0.0
    var sumX = 0.0; var sumY = 0.0; var sumXY = 0.0; var sumX2 = 0.0
    var constY = true
    val initY = s.head._2
    var i = 0
    while (i < s.length) {
      val x = (s(i)._1 - interceptTimeMs).toDouble / 1000.0
      val y = s(i)._2
      if (y != initY) constY = false
      n += 1; sumX += x; sumY += y; sumXY += x * y; sumX2 += x * x
      i += 1
    }
    if (constY) {
      if (initY.isInfinite) return (Double.NaN, Double.NaN)
      return (0.0, initY)
    }
    val covXY = sumXY - sumX * sumY / n
    val varX = sumX2 - sumX * sumX / n
    val slope = covXY / varX
    val intercept = sumY / n - slope * sumX / n
    (slope, intercept)
  }

  /** deriv(): per-second slope. */
  def deriv(samples: Seq[Row], step: Long): java.lang.Double = {
    if (samples == null || samples.size < 2) return null
    val s = sorted(samples)
    val (slope, _) = linearRegression(s, s.head._1)
    slope
  }

  /** predict_linear(v, tSeconds): value extrapolated tSeconds past step. */
  def predictLinear(tSeconds: Double)(samples: Seq[Row], step: Long): java.lang.Double = {
    if (samples == null || samples.size < 2) return null
    val s = sorted(samples)
    val (slope, intercept) = linearRegression(s, step)
    slope * tSeconds + intercept
  }

  /** Holt-Winters double exponential smoothing; returns the final smoothed
    * value. sf = smoothing factor, tf = trend factor, both in (0, 1). */
  def holtWinters(sf: Double, tf: Double)(samples: Seq[Row], step: Long): java.lang.Double = {
    if (samples == null || samples.size < 2) return null
    val s = sorted(samples)
    var s0 = 0.0
    var s1 = s(0)._2
    var b = s(1)._2 - s(0)._2
    var i = 1
    while (i < s.length) {
      val x = sf * s(i)._2
      // trend update skipped on the very first iteration (initial b holds)
      if (i > 1) b = tf * (s1 - s0) + (1 - tf) * b
      val y = (1 - sf) * (s1 + b)
      s0 = s1
      s1 = x + y
      i += 1
    }
    s1
  }

  /** Exact interpolated φ-quantile over raw values — Go's quantile()
    * (reference: vendor/.../promql/quantile.go:387-409): rank = φ·(n−1),
    * linear interpolation between the two straddling order statistics. This
    * replaces Spark's `percentile` so that NaN φ and out-of-range φ match
    * (±Inf), and so φ may vary per step. */
  def goQuantile(values: Seq[Double], q: Double): java.lang.Double = {
    if (values == null || values.isEmpty) return null
    if (q.isNaN) return Double.NaN
    if (q < 0) return Double.NegativeInfinity
    if (q > 1) return Double.PositiveInfinity
    val arr = values.toArray
    java.util.Arrays.sort(arr)
    val rank = q * (arr.length - 1)
    val lower = math.floor(rank).toInt
    val upper = math.ceil(rank).toInt
    val weight = rank - lower
    arr(lower) * (1 - weight) + arr(upper) * weight
  }

  /** histogram_quantile bucket kernel over (le, cumulativeCount) pairs:
    * sort by upper bound, enforce monotonicity, linearly interpolate inside
    * the target bucket; highest bucket must be +Inf. */
  def bucketQuantile(q: Double, buckets: Seq[Row]): java.lang.Double = {
    if (buckets == null || buckets.isEmpty) return null
    if (q < 0) return Double.NegativeInfinity
    if (q > 1) return Double.PositiveInfinity
    if (q.isNaN) return Double.NaN
    // (upperBound, cumulative count)
    var bs = buckets.iterator
      .map(r => (r.getDouble(0), r.getDouble(1)))
      .filter(!_._1.isNaN)
      .toArray
    java.util.Arrays.sort(bs, Ordering.by((p: (Double, Double)) => p._1))
    if (bs.length < 2) return Double.NaN
    if (!bs.last._1.isPosInfinity) return Double.NaN
    // fix float/scrape-skew induced non-monotonicity
    var max = 0.0
    bs = bs.map { case (le, c) => if (c < max) (le, max) else { max = c; (le, c) } }
    val observations = bs.last._2
    if (observations == 0) return Double.NaN
    var rank = q * observations
    var b = bs.indexWhere(_._2 >= rank)
    if (b == bs.length - 1) return bs(bs.length - 2)._1
    if (b == 0 && bs.head._1 <= 0) return bs.head._1
    var (bucketStart, bucketEnd, count) = (0.0, bs(b)._1, bs(b)._2)
    if (b > 0) {
      bucketStart = bs(b - 1)._1
      count -= bs(b - 1)._2
      rank -= bs(b - 1)._2
    }
    bucketStart + (bucketEnd - bucketStart) * (rank / count)
  }

  // ---- Column-level wrappers -------------------------------------------

  private val sampleCol: Column = struct(col("t"), col("value"))

  /** `collect_list(struct(t, value))` — input to every kernel above. */
  def collectedSamples: Column = collect_list(sampleCol)

  def extrapolatedUdf(rangeMs: Long, isCounter: Boolean, isRate: Boolean) =
    udf(extrapolated(rangeMs, isCounter, isRate) _)
  def instantValueUdf(isRate: Boolean) = udf(instantValue(isRate) _)
  val resetsUdf = udf(resets _)
  val changesUdf = udf(changes _)
  val derivUdf = udf(deriv _)
  def predictLinearUdf(tSeconds: Double) = udf(predictLinear(tSeconds) _)
  def holtWintersUdf(sf: Double, tf: Double) = udf(holtWinters(sf, tf) _)
  val bucketQuantileUdf = udf(bucketQuantile _)
  val goQuantileUdf = udf(goQuantile _)
}
