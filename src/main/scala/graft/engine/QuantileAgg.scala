package graft.engine

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exact Go-semantics φ-quantile as a native `TypedImperativeAggregate`
  * (the last UDF in the engine's aggregate surface, now closed): values
  * accumulate in a growable PRIMITIVE double array (no Row boxing, no
  * intermediate collect_list array value), partials merge by
  * concatenation, and eval applies the reference's quantile() — NaN-first
  * sort order, rank = φ·(n−1), linear interpolation
  * (vendor/.../promql/quantile.go:387-409). φ is group-constant by
  * construction (a per-step scalar column) and captured once per buffer.
  *
  * Plan shape: ObjectHashAggregate with 8 B/sample partials — same as the
  * SeriesFold family; the collect_list+UDF formulation carried boxed
  * arrays through the shuffle and evaluated scala-side per group. */
object QuantileAgg {

  def column(value: Column, phi: Column): Column =
    ColumnBridge.column(GoQuantileAgg(
      ColumnBridge.expression(value), ColumnBridge.expression(phi))
      .toAggregateExpression())

  final class Buf(var xs: Array[Double], var n: Int,
                  var phi: Double, var hasPhi: Boolean) {
    def add(v: Double): Unit = {
      if (n == xs.length) xs = java.util.Arrays.copyOf(xs, n * 2)
      xs(n) = v; n += 1
    }
  }

  /** Go quantile over the first `n` entries of `xs` (mutates xs by
    * sorting). Mirrors Kernels.goQuantile exactly. */
  def eval(xs: Array[Double], n: Int, q: Double): java.lang.Double = {
    if (n == 0) return null
    if (q.isNaN) return Double.NaN
    if (q < 0) return Double.NegativeInfinity
    if (q > 1) return Double.PositiveInfinity
    java.util.Arrays.sort(xs, 0, n)
    // Go's sort.Float64s orders NaN FIRST; Arrays.sort puts NaN last —
    // rotate the NaN tail to the front (see Kernels.goQuantile)
    var firstNaN = n
    while (firstNaN > 0 && xs(firstNaN - 1).isNaN) firstNaN -= 1
    if (firstNaN < n) {
      val nNaN = n - firstNaN
      val rotated = new Array[Double](n)
      java.util.Arrays.fill(rotated, 0, nNaN, Double.NaN)
      System.arraycopy(xs, 0, rotated, nNaN, firstNaN)
      System.arraycopy(rotated, 0, xs, 0, n)
    }
    val rank = q * (n - 1)
    val lower = math.floor(rank).toInt
    val upper = math.ceil(rank).toInt
    val weight = rank - lower
    xs(lower) * (1 - weight) + xs(upper) * weight
  }

  final case class GoQuantileAgg(
      valueExpr: Expression,
      phiExpr: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Buf] {

    override def children: Seq[Expression] = Seq(valueExpr, phiExpr)
    override def nullable: Boolean = true
    override def dataType: DataType = DoubleType
    override def prettyName: String = "go_quantile"

    override def createAggregationBuffer(): Buf =
      new Buf(new Array[Double](8), 0, 0.0, false)

    override def update(buf: Buf, input: InternalRow): Buf = {
      val v = valueExpr.eval(input)
      if (v != null) {
        buf.add(v.asInstanceOf[Double])
        if (!buf.hasPhi) {
          val p = phiExpr.eval(input)
          if (p != null) { buf.phi = p.asInstanceOf[Double]; buf.hasPhi = true }
        }
      }
      buf
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      var i = 0
      while (i < b2.n) { b1.add(b2.xs(i)); i += 1 }
      if (!b1.hasPhi && b2.hasPhi) { b1.phi = b2.phi; b1.hasPhi = true }
      b1
    }

    override def eval(buf: Buf): Any = QuantileAgg.eval(buf.xs, buf.n, buf.phi)

    override def serialize(buf: Buf): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 9 + buf.n * 8)
      bb.putInt(buf.n).putDouble(buf.phi).put(if (buf.hasPhi) 1.toByte else 0.toByte)
      var i = 0
      while (i < buf.n) { bb.putDouble(buf.xs(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val phi = bb.getDouble
      val hasPhi = bb.get() == 1
      val xs = new Array[Double](math.max(n, 8))
      var i = 0
      while (i < n) { xs(i) = bb.getDouble; i += 1 }
      new Buf(xs, n, phi, hasPhi)
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): GoQuantileAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): GoQuantileAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): GoQuantileAgg =
      copy(valueExpr = newChildren(0), phiExpr = newChildren(1))
  }
}
