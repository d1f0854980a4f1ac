package graft.pipeline

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** `collect_list` with a hard cap: gathers at most `limit + 1` longs per
  * group and then stops accumulating. A group whose true size exceeds
  * `limit` evaluates to an array of exactly `limit + 1` elements — an
  * overflow marker the caller filters on (`size(ids) <= limit`) — while the
  * aggregation buffer, partial serialization, and shuffle payload stay
  * bounded at `limit + 1` entries no matter how degenerate the group is.
  *
  * This is what makes LSH bucket collection safe at fleet scale: a
  * pathological bucket holding half the corpus costs 8·(limit+1) bytes per
  * partial instead of an unbounded `collect_list` buffer.
  */
object BoundedCollect {

  def column(value: Column, limit: Int): Column =
    ColumnBridge.column(BoundedCollectLongs(
      ColumnBridge.expression(value), limit).toAggregateExpression())

  /** Variant gathering (id, sig) long pairs — for LSH buckets whose pair
    * expansion needs the signature for exact verification without a join
    * back to the signature table. */
  def pairs(id: Column, sig: Column, limit: Int): Column =
    ColumnBridge.column(BoundedCollectIdSig(
      ColumnBridge.expression(id), ColumnBridge.expression(sig),
      limit).toAggregateExpression())

  final class Buf(var xs: Array[Long], var n: Int) {
    def add(v: Long, cap: Int): Unit = {
      if (n >= cap) return
      if (n == xs.length) xs = java.util.Arrays.copyOf(xs, math.min(cap, n * 2))
      xs(n) = v; n += 1
    }
  }

  final case class BoundedCollectLongs(
      child: Expression,
      limit: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Buf] {

    private val cap = limit + 1

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "bounded_collect"

    override def createAggregationBuffer(): Buf = new Buf(new Array[Long](8), 0)

    override def update(buf: Buf, input: InternalRow): Buf = {
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[Long], cap)
      buf
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      var i = 0
      while (i < b2.n && b1.n < cap) { b1.add(b2.xs(i), cap); i += 1 }
      b1
    }

    override def eval(buf: Buf): Any =
      new GenericArrayData(java.util.Arrays.copyOf(buf.xs, buf.n))

    override def serialize(buf: Buf): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.n * 8)
      bb.putInt(buf.n)
      var i = 0
      while (i < buf.n) { bb.putLong(buf.xs(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val xs = new Array[Long](math.max(n, 8))
      var i = 0
      while (i < n) { xs(i) = bb.getLong; i += 1 }
      new Buf(xs, n)
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectLongs =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectLongs =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): BoundedCollectLongs =
      copy(child = newChildren(0))
  }

  /** (id, sig) pairs interleaved in one primitive buffer, capped at
    * limit + 1 entries; evaluates to array<struct<id, sig>>. */
  final case class BoundedCollectIdSig(
      idExpr: Expression,
      sigExpr: Expression,
      limit: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Buf] {

    private val cap = limit + 1

    override def children: Seq[Expression] = Seq(idExpr, sigExpr)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("sig", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "bounded_collect_pairs"

    override def createAggregationBuffer(): Buf = new Buf(new Array[Long](16), 0)

    private def addPair(buf: Buf, id: Long, sig: Long): Unit = {
      if (buf.n >= cap * 2) return
      if (buf.n + 2 > buf.xs.length)
        buf.xs = java.util.Arrays.copyOf(buf.xs, math.min(cap * 2, buf.n * 2 + 2))
      buf.xs(buf.n) = id; buf.xs(buf.n + 1) = sig; buf.n += 2
    }

    override def update(buf: Buf, input: InternalRow): Buf = {
      val id = idExpr.eval(input)
      val sig = sigExpr.eval(input)
      if (id != null && sig != null)
        addPair(buf, id.asInstanceOf[Long], sig.asInstanceOf[Long])
      buf
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      var i = 0
      while (i < b2.n && b1.n < cap * 2) { addPair(b1, b2.xs(i), b2.xs(i + 1)); i += 2 }
      b1
    }

    override def eval(buf: Buf): Any = {
      val rows = new Array[Any](buf.n / 2)
      var i = 0
      while (i < buf.n) {
        rows(i / 2) = InternalRow(buf.xs(i), buf.xs(i + 1))
        i += 2
      }
      new GenericArrayData(rows)
    }

    override def serialize(buf: Buf): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.n * 8)
      bb.putInt(buf.n)
      var i = 0
      while (i < buf.n) { bb.putLong(buf.xs(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val xs = new Array[Long](math.max(n, 16))
      var i = 0
      while (i < n) { xs(i) = bb.getLong; i += 1 }
      new Buf(xs, n)
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectIdSig =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectIdSig =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): BoundedCollectIdSig =
      copy(idExpr = newChildren(0), sigExpr = newChildren(1))
  }
}
