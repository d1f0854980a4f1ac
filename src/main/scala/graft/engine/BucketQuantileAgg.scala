package graft.engine

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** histogram_quantile bucket kernel as a native TypedImperativeAggregate:
  * per (labels-minus-le, step) group it accumulates (le, cumulativeCount)
  * pairs plus the exact `le` label STRINGS (for the duplicate-labelset
  * error), then at eval sorts by bound, coalesces equal bounds, repairs
  * monotonicity and interpolates — one ObjectHashAggregate, no
  * collect_list array value and no distinct-aggregate Expand.
  *
  * Reference semantics: vendor/.../promql/quantile.go:74-123 (bucketQuantile),
  * 368-385 (ensureMonotonic); duplicate detection mirrors the engine's
  * "vector cannot contain metrics with the same labelset" error for two
  * histograms collapsing onto one labelset.
  */
object BucketQuantileAgg {
  /** φ may be a per-step scalar column (group-constant). */
  def column(q: Column, leStr: Column, le: Column, count: Column): Column =
    ColumnBridge.column(
      BucketQuantileAggExpr(ColumnBridge.expression(q), ColumnBridge.expression(leStr),
        ColumnBridge.expression(le), ColumnBridge.expression(count)).toAggregateExpression())
}

/** Growable buffer of histogram buckets for one group. `les`/`vs` hold the
  * parseable (bound, count) pairs; `leStrs` holds every raw le string seen
  * (dup detection is on the exact string — distinct representations of the
  * same bound are legitimately distinct series). */
final class BucketsBuf(var les: Array[Double], var vs: Array[Double], var n: Int,
                       var leStrs: java.util.ArrayList[String],
                       var q: Double, var hasQ: Boolean) {
  def this() = this(new Array[Double](8), new Array[Double](8), 0,
    new java.util.ArrayList[String](8), 0.0, false)

  def add(leStr: String, le: java.lang.Double, v: java.lang.Double): Unit = {
    if (leStr != null) leStrs.add(leStr)
    if (le != null && v != null && !le.isNaN) {
      if (n == les.length) {
        les = java.util.Arrays.copyOf(les, n * 2)
        vs = java.util.Arrays.copyOf(vs, n * 2)
      }
      les(n) = le.doubleValue(); vs(n) = v.doubleValue(); n += 1
    }
  }

  def addAll(o: BucketsBuf): Unit = {
    var i = 0
    while (i < o.n) {
      if (n == les.length) {
        les = java.util.Arrays.copyOf(les, n * 2)
        vs = java.util.Arrays.copyOf(vs, n * 2)
      }
      les(n) = o.les(i); vs(n) = o.vs(i); n += 1
      i += 1
    }
    leStrs.addAll(o.leStrs)
    if (!hasQ && o.hasQ) { q = o.q; hasQ = true }
  }

  /** In-place pair sort by bound (insertion sort; bucket counts are tiny). */
  def sortByLe(): Unit = {
    var i = 1
    while (i < n) {
      val le = les(i); val v = vs(i)
      var j = i - 1
      while (j >= 0 && les(j) > le) { les(j + 1) = les(j); vs(j + 1) = vs(j); j -= 1 }
      les(j + 1) = le; vs(j + 1) = v
      i += 1
    }
  }
}

final case class BucketQuantileAggExpr(
    qExpr: Expression,
    leStrExpr: Expression,
    leExpr: Expression,
    countExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BucketsBuf] {

  override def children: Seq[Expression] = Seq(qExpr, leStrExpr, leExpr, countExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "bucket_quantile"

  override def createAggregationBuffer(): BucketsBuf = new BucketsBuf()

  override def update(buf: BucketsBuf, input: InternalRow): BucketsBuf = {
    val leStr = leStrExpr.eval(input)
    buf.add(
      if (leStr == null) null else leStr.asInstanceOf[UTF8String].toString,
      leExpr.eval(input).asInstanceOf[java.lang.Double],
      countExpr.eval(input).asInstanceOf[java.lang.Double])
    if (!buf.hasQ) {
      val q = qExpr.eval(input)
      if (q != null) { buf.q = q.asInstanceOf[Double]; buf.hasQ = true }
    }
    buf
  }

  override def merge(b1: BucketsBuf, b2: BucketsBuf): BucketsBuf = { b1.addAll(b2); b1 }

  override def eval(buf: BucketsBuf): Any = {
    // duplicate exact-le-string => two histograms share one labelset
    if (buf.leStrs.size > 1) {
      val seen = new java.util.HashSet[String](buf.leStrs.size * 2)
      val it = buf.leStrs.iterator()
      while (it.hasNext)
        if (!seen.add(it.next()))
          throw new IllegalArgumentException(
            "vector cannot contain metrics with the same labelset")
    }
    if (buf.n == 0 && buf.leStrs.isEmpty) return null
    val q = if (buf.hasQ) buf.q else Double.NaN
    if (q.isNaN) return Double.NaN
    if (q < 0) return Double.NegativeInfinity
    if (q > 1) return Double.PositiveInfinity
    buf.sortByLe()
    // coalesce equal upper bounds (quantile.go coalesceBuckets)
    var m = 0
    var i = 0
    while (i < buf.n) {
      if (m > 0 && buf.les(m - 1) == buf.les(i)) buf.vs(m - 1) += buf.vs(i)
      else { buf.les(m) = buf.les(i); buf.vs(m) = buf.vs(i); m += 1 }
      i += 1
    }
    if (m < 2) return Double.NaN
    if (!buf.les(m - 1).isPosInfinity) return Double.NaN
    // repair float/scrape-skew non-monotonicity (quantile.go:368-385)
    var max = 0.0
    i = 0
    while (i < m) {
      if (buf.vs(i) < max) buf.vs(i) = max else max = buf.vs(i)
      i += 1
    }
    val observations = buf.vs(m - 1)
    if (observations == 0) return Double.NaN
    var rank = q * observations
    var b = 0
    while (b < m && buf.vs(b) < rank) b += 1
    if (b == m - 1) return buf.les(m - 2)
    if (b == 0 && buf.les(0) <= 0) return buf.les(0)
    var bucketStart = 0.0
    val bucketEnd = buf.les(b)
    var count = buf.vs(b)
    if (b > 0) {
      bucketStart = buf.les(b - 1)
      count -= buf.vs(b - 1)
      rank -= buf.vs(b - 1)
    }
    bucketStart + (bucketEnd - bucketStart) * (rank / count)
  }

  override def serialize(buf: BucketsBuf): Array[Byte] = {
    val strBytes = new Array[Array[Byte]](buf.leStrs.size)
    var strLen = 0
    var i = 0
    while (i < buf.leStrs.size) {
      strBytes(i) = buf.leStrs.get(i).getBytes(StandardCharsets.UTF_8)
      strLen += 4 + strBytes(i).length
      i += 1
    }
    val bb = ByteBuffer.allocate(4 + 8 + 1 + buf.n * 16 + 4 + strLen)
    bb.putInt(buf.n).putDouble(buf.q).put(if (buf.hasQ) 1.toByte else 0.toByte)
    i = 0
    while (i < buf.n) { bb.putDouble(buf.les(i)); bb.putDouble(buf.vs(i)); i += 1 }
    bb.putInt(strBytes.length)
    i = 0
    while (i < strBytes.length) {
      bb.putInt(strBytes(i).length); bb.put(strBytes(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BucketsBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = bb.getDouble
    val hasQ = bb.get() == 1
    val les = new Array[Double](math.max(n, 8))
    val vs = new Array[Double](math.max(n, 8))
    var i = 0
    while (i < n) { les(i) = bb.getDouble; vs(i) = bb.getDouble; i += 1 }
    val nStr = bb.getInt
    val strs = new java.util.ArrayList[String](math.max(nStr, 8))
    i = 0
    while (i < nStr) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      strs.add(new String(arr, StandardCharsets.UTF_8))
      i += 1
    }
    new BucketsBuf(les, vs, n, strs, q, hasQ)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BucketQuantileAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BucketQuantileAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BucketQuantileAggExpr =
    copy(qExpr = newChildren(0), leStrExpr = newChildren(1),
      leExpr = newChildren(2), countExpr = newChildren(3))
}
