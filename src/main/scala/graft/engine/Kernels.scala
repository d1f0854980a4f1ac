package graft.engine

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Scalar kernels that stay UDF-shaped (their inputs are genuinely
  * list-valued per row): exact quantiles and histogram-bucket
  * interpolation. The sequential RANGE kernels (rate family, holt_winters,
  * deriv...) live in [[SeriesAgg]] as a native TypedImperativeAggregate.
  *
  * Algorithms re-implemented from the reference semantics:
  *  - quantile: vendor/.../promql/quantile.go:387-409
  *  - histogram_quantile buckets: quantile.go:74-123,368-385
  */
object Kernels {

  /** Exact interpolated φ-quantile over raw values — Go's quantile():
    * rank = φ·(n−1), linear interpolation between the two straddling order
    * statistics; NaN φ → NaN, φ outside [0,1] → ±Inf; φ may vary per step. */
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
    val b = bs.indexWhere(_._2 >= rank)
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

  val bucketQuantileUdf = udf(bucketQuantile _)
  val goQuantileUdf = udf(goQuantile _)
}
