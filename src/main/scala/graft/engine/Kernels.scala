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
    // Go's sort.Float64s orders NaN FIRST (Less: x < y || (isNaN(x) &&
    // !isNaN(y))); Arrays.sort puts NaN last — rotate the NaN tail to the
    // front so windows containing NaN pick the same order statistics
    var firstNaN = arr.length
    while (firstNaN > 0 && arr(firstNaN - 1).isNaN) firstNaN -= 1
    if (firstNaN < arr.length) {
      val nNaN = arr.length - firstNaN
      val rotated = new Array[Double](arr.length)
      java.util.Arrays.fill(rotated, 0, nNaN, Double.NaN)
      System.arraycopy(arr, 0, rotated, nNaN, firstNaN)
      System.arraycopy(rotated, 0, arr, 0, arr.length)
    }
    val rank = q * (arr.length - 1)
    val lower = math.floor(rank).toInt
    val upper = math.ceil(rank).toInt
    val weight = rank - lower
    arr(lower) * (1 - weight) + arr(upper) * weight
  }

  /** histogram_quantile bucket kernel over pre-sorted parallel (le,
    * cumulativeCount) arrays: coalesce equal upper bounds (summing counts,
    * like the reference's coalesceBuckets), enforce monotonicity, linearly
    * interpolate inside the target bucket; highest bucket must be +Inf. */
  def bucketQuantile(q: Double, les: Seq[java.lang.Double],
                     counts: Seq[java.lang.Double]): java.lang.Double = {
    if (les == null || les.isEmpty) return null
    if (q < 0) return Double.NegativeInfinity
    if (q > 1) return Double.PositiveInfinity
    if (q.isNaN) return Double.NaN
    // arrives sorted by le (sort_array upstream); coalesce duplicates
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    var i = 0
    while (i < les.length) {
      if (les(i) != null && counts(i) != null && !les(i).isNaN) {
        val le = les(i).doubleValue()
        val c = counts(i).doubleValue()
        if (merged.nonEmpty && merged.last._1 == le)
          merged(merged.length - 1) = (le, merged.last._2 + c)
        else merged += ((le, c))
      }
      i += 1
    }
    var bs = merged.toArray
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

}
