package graft.engine

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{AbstractDataType, AnyDataType, DataType, DoubleType}

/** The sequential range kernels as a native Catalyst
  * `TypedImperativeAggregate`: per (series, step) group it accumulates the
  * window's (t, value) pairs in growable PRIMITIVE arrays (no Row boxing, no
  * intermediate collect_list array value), merges buffers by concatenation,
  * sorts once at eval, and folds the kernel.
  *
  * Compared with the v0 `collect_list + UDF` shape this keeps the whole
  * computation inside one ObjectHashAggregate node with compact buffer
  * serialization between partial and final aggregation — the shuffle carries
  * 16 bytes/sample and the kernel math runs on primitive arrays.
  *
  * Kernel semantics are shared with [[Kernels]] (reference:
  * vendor/.../promql/functions.go — extrapolatedRate 63-169, instantValue
  * 246-300, resets/changes 1162-1213, linearRegression 897-964,
  * holt_winters 302-347).
  */
object SeriesAgg {

  /** A kernel folds the t-sorted window samples; `end` = window end ms;
    * `p1`/`p2` = group-constant scalar parameters (predict_linear horizon,
    * holt_winters sf/tf) — evaluated per STEP like the reference, which
    * re-evaluates function arguments at every grid step. */
  sealed trait Kernel extends Serializable {
    def apply(ts: Array[Long], vs: Array[Double], n: Int, end: Long,
              p1: Double, p2: Double): java.lang.Double
    /** Whether the kernel reads p1/p2 — parameterless kernels skip the
      * parameter-expression evaluation in the per-row update path. */
    def needsParams: Boolean = false
  }

  final case class Extrapolated(rangeMs: Long, isCounter: Boolean, isRate: Boolean) extends Kernel {
    def apply(ts: Array[Long], vs: Array[Double], n: Int, end: Long,
              p1: Double, p2: Double): java.lang.Double = {
      if (n < 2) return null
      var corr = 0.0
      if (isCounter) {
        var last = vs(0)
        var i = 1
        while (i < n) { if (vs(i) < last) corr += last; last = vs(i); i += 1 }
      }
      val result = vs(n - 1) - vs(0) + corr
      var durationToStart = (ts(0) - (end - rangeMs)).toDouble / 1000.0
      val durationToEnd = (end - ts(n - 1)).toDouble / 1000.0
      val sampledInterval = (ts(n - 1) - ts(0)).toDouble / 1000.0
      val avgBetween = sampledInterval / (n - 1)
      if (isCounter && result > 0 && vs(0) >= 0) {
        val durationToZero = sampledInterval * (vs(0) / result)
        if (durationToZero < durationToStart) durationToStart = durationToZero
      }
      val threshold = avgBetween * 1.1
      var extrapolateTo = sampledInterval
      extrapolateTo += (if (durationToStart < threshold) durationToStart else avgBetween / 2)
      extrapolateTo += (if (durationToEnd < threshold) durationToEnd else avgBetween / 2)
      var factor = extrapolateTo / sampledInterval
      if (isRate) factor /= rangeMs.toDouble / 1000.0
      result * factor
    }
  }

  final case class InstantValue(isRate: Boolean) extends Kernel {
    def apply(ts: Array[Long], vs: Array[Double], n: Int, end: Long,
              p1: Double, p2: Double): java.lang.Double = {
      if (n < 2) return null
      val (pt, pv) = (ts(n - 2), vs(n - 2))
      val (lt, lv) = (ts(n - 1), vs(n - 1))
      if (lt == pt) return null
      var result = if (isRate && lv < pv) lv else lv - pv
      if (isRate) result /= (lt - pt).toDouble / 1000.0
      result
    }
  }

  case object Resets extends Kernel {
    def apply(ts: Array[Long], vs: Array[Double], n: Int, end: Long,
              p1: Double, p2: Double): java.lang.Double = {
      if (n == 0) return null
      var c = 0; var i = 1
      while (i < n) { if (vs(i) < vs(i - 1)) c += 1; i += 1 }
      c.toDouble
    }
  }

  case object Changes extends Kernel {
    def apply(ts: Array[Long], vs: Array[Double], n: Int, end: Long,
              p1: Double, p2: Double): java.lang.Double = {
      if (n == 0) return null
      var c = 0; var i = 1
      while (i < n) {
        val a = vs(i - 1); val b = vs(i)
        if (a != b && !(a.isNaN && b.isNaN)) c += 1
        i += 1
      }
      c.toDouble
    }
  }

  private def regression(ts: Array[Long], vs: Array[Double], n: Int,
                         interceptTime: Long): (Double, Double) = {
    var cnt = 0.0; var sumX = 0.0; var sumY = 0.0; var sumXY = 0.0; var sumX2 = 0.0
    var constY = true
    val initY = vs(0)
    var i = 0
    while (i < n) {
      val x = (ts(i) - interceptTime).toDouble / 1000.0
      val y = vs(i)
      if (y != initY) constY = false
      cnt += 1; sumX += x; sumY += y; sumXY += x * y; sumX2 += x * x
      i += 1
    }
    if (constY) {
      if (initY.isInfinite) return (Double.NaN, Double.NaN)
      return (0.0, initY)
    }
    val covXY = sumXY - sumX * sumY / cnt
    val varX = sumX2 - sumX * sumX / cnt
    val slope = covXY / varX
    (slope, sumY / cnt - slope * sumX / cnt)
  }

  case object Deriv extends Kernel {
    def apply(ts: Array[Long], vs: Array[Double], n: Int, end: Long,
              p1: Double, p2: Double): java.lang.Double = {
      if (n < 2) return null
      regression(ts, vs, n, ts(0))._1
    }
  }

  /** p1 = the prediction horizon in seconds (functions.go:952-964). */
  case object PredictLinear extends Kernel {
    override def needsParams: Boolean = true
    def apply(ts: Array[Long], vs: Array[Double], n: Int, end: Long,
              p1: Double, p2: Double): java.lang.Double = {
      if (n < 2) return null
      val (slope, intercept) = regression(ts, vs, n, end)
      slope * p1 + intercept
    }
  }

  /** p1 = smoothing factor, p2 = trend factor (functions.go:302-347;
    * out-of-range factors error exactly like the reference :309-315). */
  case object HoltWinters extends Kernel {
    override def needsParams: Boolean = true
    def apply(ts: Array[Long], vs: Array[Double], n: Int, end: Long,
              p1: Double, p2: Double): java.lang.Double = {
      val sf = p1; val tf = p2
      if (sf <= 0 || sf >= 1)
        throw new IllegalArgumentException(
          s"invalid smoothing factor. Expected: 0 < sf < 1, got: $sf")
      if (tf <= 0 || tf >= 1)
        throw new IllegalArgumentException(
          s"invalid trend factor. Expected: 0 < tf < 1, got: $tf")
      if (n < 2) return null
      var s0 = 0.0
      var s1 = vs(0)
      var b = vs(1) - vs(0)
      var i = 1
      while (i < n) {
        val x = sf * vs(i)
        if (i > 1) b = tf * (s1 - s0) + (1 - tf) * b
        val y = (1 - sf) * (s1 + b)
        s0 = s1
        s1 = x + y
        i += 1
      }
      s1
    }
  }

  /** Column factory: fold `kernel` over (t, value) per group; `end` is the
    * (group-constant) window-end column, `p1`/`p2` optional group-constant
    * scalar parameter columns. */
  def fold(kernel: Kernel, t: Column, value: Column, end: Column,
           p1: Column = org.apache.spark.sql.functions.lit(0.0),
           p2: Column = org.apache.spark.sql.functions.lit(0.0)): Column =
    ColumnBridge.column(
      SeriesFoldAgg(ColumnBridge.expression(t), ColumnBridge.expression(value),
        ColumnBridge.expression(end), ColumnBridge.expression(p1),
        ColumnBridge.expression(p2), kernel).toAggregateExpression())
}

/** Growable paired primitive buffer; sorted lazily at eval. `p1`/`p2`
  * capture the group-constant parameter columns on first update. */
final class SamplesBuf(var ts: Array[Long], var vs: Array[Double],
                       var n: Int, var end: Long,
                       var p1: Double, var p2: Double, var hasP: Boolean) {
  def this() = this(new Array[Long](8), new Array[Double](8), 0, Long.MinValue,
    0.0, 0.0, false)

  def add(t: Long, v: Double): Unit = {
    if (n == ts.length) {
      ts = java.util.Arrays.copyOf(ts, n * 2)
      vs = java.util.Arrays.copyOf(vs, n * 2)
    }
    ts(n) = t; vs(n) = v; n += 1
  }

  def addAll(o: SamplesBuf): Unit = {
    var i = 0
    while (i < o.n) { add(o.ts(i), o.vs(i)); i += 1 }
    if (o.end > end) end = o.end
    if (!hasP && o.hasP) { p1 = o.p1; p2 = o.p2; hasP = true }
  }

  /** In-place pair sort by timestamp (insertion sort is fine for window-
    * sized n; merge partials arrive mostly sorted). */
  def sortByTime(): Unit = {
    var i = 1
    while (i < n) {
      val t = ts(i); val v = vs(i)
      var j = i - 1
      while (j >= 0 && ts(j) > t) { ts(j + 1) = ts(j); vs(j + 1) = vs(j); j -= 1 }
      ts(j + 1) = t; vs(j + 1) = v
      i += 1
    }
  }
}

final case class SeriesFoldAgg(
    tExpr: Expression,
    vExpr: Expression,
    endExpr: Expression,
    p1Expr: Expression,
    p2Expr: Expression,
    kernel: SeriesAgg.Kernel,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SamplesBuf] {

  override def children: Seq[Expression] = Seq(tExpr, vExpr, endExpr, p1Expr, p2Expr)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = s"series_fold_${kernel.getClass.getSimpleName.toLowerCase}"

  override def createAggregationBuffer(): SamplesBuf = new SamplesBuf()

  override def update(buf: SamplesBuf, input: InternalRow): SamplesBuf = {
    val t = tExpr.eval(input)
    val v = vExpr.eval(input)
    if (t != null && v != null) {
      buf.add(t.asInstanceOf[Long], v.asInstanceOf[Double])
      // end and p1/p2 are group-constant by construction (derived from the
      // grouping step), so they evaluate once per buffer, not per row;
      // parameterless kernels never touch the parameter expressions
      if (buf.end == Long.MinValue) {
        val e = endExpr.eval(input)
        if (e != null) buf.end = e.asInstanceOf[Long]
      }
      if (kernel.needsParams && !buf.hasP) {
        val a = p1Expr.eval(input)
        val b = p2Expr.eval(input)
        if (a != null && b != null) {
          buf.p1 = a.asInstanceOf[Double]
          buf.p2 = b.asInstanceOf[Double]
          buf.hasP = true
        }
      }
    }
    buf
  }

  override def merge(b1: SamplesBuf, b2: SamplesBuf): SamplesBuf = { b1.addAll(b2); b1 }

  override def eval(buf: SamplesBuf): Any = {
    if (buf.n == 0) return null
    buf.sortByTime()
    kernel(buf.ts, buf.vs, buf.n, buf.end, buf.p1, buf.p2)
  }

  override def serialize(buf: SamplesBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + 17 + buf.n * 16)
    bb.putInt(buf.n).putLong(buf.end)
    bb.putDouble(buf.p1).putDouble(buf.p2).put(if (buf.hasP) 1.toByte else 0.toByte)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ts(i)); bb.putDouble(buf.vs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SamplesBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val end = bb.getLong
    val p1 = bb.getDouble
    val p2 = bb.getDouble
    val hasP = bb.get() == 1
    val ts = new Array[Long](math.max(n, 8))
    val vs = new Array[Double](math.max(n, 8))
    var i = 0
    while (i < n) { ts(i) = bb.getLong; vs(i) = bb.getDouble; i += 1 }
    new SamplesBuf(ts, vs, n, end, p1, p2, hasP)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SeriesFoldAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SeriesFoldAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SeriesFoldAgg =
    copy(tExpr = newChildren(0), vExpr = newChildren(1), endExpr = newChildren(2),
      p1Expr = newChildren(3), p2Expr = newChildren(4))
}
