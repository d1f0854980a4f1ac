package graft.pipeline

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Bottom-k-by-priority sample: per group, the k (priority, value) pairs
  * with the LEXICOGRAPHICALLY smallest (priority, value) — a uniform
  * without-replacement sample of the group when the priority is a hash of
  * a unique item key. The buffer is a bounded max-heap: map-side partials
  * carry at most k pairs regardless of group size, so the shuffle payload
  * of a corpus-wide sample is k·partitions rows, never the corpus. Merge
  * is heap-insertion of the other side's ≤ k entries — associative and
  * commutative, which is what makes the bottom-k sample a mergeable
  * sketch (Cohen & Kaplan 2007's bottom-k sketches; Agarwal et al. 2013,
  * "Mergeable Summaries" §5: a k-sized uniform sample answers quantile
  * queries with rank error O(1/√k)).
  *
  * The value tie-break on equal priorities keeps the kept SET a pure
  * function of the input multiset — independent of partitioning and
  * arrival order — so an external engine (the DuckDB oracle) re-deriving
  * "k smallest by (priority, value)" reproduces the sample bit-for-bit.
  */
object BottomKSample {

  def column(priority: Column, value: Column, k: Int): Column =
    ColumnBridge.column(BottomKPairs(
      ColumnBridge.expression(priority), ColumnBridge.expression(value),
      k).toAggregateExpression())

  /** Max-heap on (pri, v): root = largest kept pair, evicted first. */
  final class Heap(val k: Int) {
    val pri = new Array[Long](k)
    val v = new Array[Double](k)
    var n = 0

    private def gt(p1: Long, v1: Double, p2: Long, v2: Double): Boolean =
      p1 > p2 || (p1 == p2 && v1 > v2)

    private def swap(i: Int, j: Int): Unit = {
      val tp = pri(i); pri(i) = pri(j); pri(j) = tp
      val tv = v(i); v(i) = v(j); v(j) = tv
    }

    def add(p: Long, x: Double): Unit = {
      if (n < k) {
        pri(n) = p; v(n) = x; n += 1
        var i = n - 1
        while (i > 0 && gt(pri(i), v(i), pri((i - 1) / 2), v((i - 1) / 2))) {
          swap(i, (i - 1) / 2); i = (i - 1) / 2
        }
      } else if (k > 0 && gt(pri(0), v(0), p, x)) {
        pri(0) = p; v(0) = x
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = 2 * i + 2
          var m = i
          if (l < n && gt(pri(l), v(l), pri(m), v(m))) m = l
          if (r < n && gt(pri(r), v(r), pri(m), v(m))) m = r
          if (m == i) done = true else { swap(i, m); i = m }
        }
      }
    }
  }

  def weightedColumn(draw: Column, id: Column, k: Int): Column =
    ColumnBridge.column(BottomKByDraw(
      ColumnBridge.expression(draw), ColumnBridge.expression(id),
      k).toAggregateExpression())

  /** Max-heap on (draw, id) — double key, long payload — for the A-Res
    * weighted reservoir: keep the k items with the smallest exponential
    * draws. Same bounded-partial properties as [[Heap]]. */
  final class DrawHeap(val k: Int) {
    val draw = new Array[Double](k)
    val id = new Array[Long](k)
    var n = 0

    private def gt(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
      d1 > d2 || (d1 == d2 && i1 > i2)

    private def swap(i: Int, j: Int): Unit = {
      val td = draw(i); draw(i) = draw(j); draw(j) = td
      val ti = id(i); id(i) = id(j); id(j) = ti
    }

    def add(d: Double, x: Long): Unit = {
      if (n < k) {
        draw(n) = d; id(n) = x; n += 1
        var i = n - 1
        while (i > 0 && gt(draw(i), id(i), draw((i - 1) / 2), id((i - 1) / 2))) {
          swap(i, (i - 1) / 2); i = (i - 1) / 2
        }
      } else if (k > 0 && gt(draw(0), id(0), d, x)) {
        draw(0) = d; id(0) = x
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = 2 * i + 2
          var m = i
          if (l < n && gt(draw(l), id(l), draw(m), id(m))) m = l
          if (r < n && gt(draw(r), id(r), draw(m), id(m))) m = r
          if (m == i) done = true else { swap(i, m); i = m }
        }
      }
    }
  }

  final case class BottomKByDraw(
      drawExpr: Expression,
      idExpr: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DrawHeap] {

    override def children: Seq[Expression] = Seq(drawExpr, idExpr)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("draw", DoubleType, nullable = false),
        StructField("id", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "weighted_bottom_k"

    override def createAggregationBuffer(): DrawHeap = new DrawHeap(k)

    override def update(buf: DrawHeap, input: InternalRow): DrawHeap = {
      val d = drawExpr.eval(input)
      val x = idExpr.eval(input)
      if (d != null && x != null)
        buf.add(d.asInstanceOf[Double], x.asInstanceOf[Long])
      buf
    }

    override def merge(b1: DrawHeap, b2: DrawHeap): DrawHeap = {
      var i = 0
      while (i < b2.n) { b1.add(b2.draw(i), b2.id(i)); i += 1 }
      b1
    }

    override def eval(buf: DrawHeap): Any = {
      val rows = new Array[Any](buf.n)
      var i = 0
      while (i < buf.n) { rows(i) = InternalRow(buf.draw(i), buf.id(i)); i += 1 }
      new GenericArrayData(rows)
    }

    override def serialize(buf: DrawHeap): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.n * 16)
      bb.putInt(buf.n)
      var i = 0
      while (i < buf.n) { bb.putDouble(buf.draw(i)); bb.putLong(buf.id(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): DrawHeap = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val h = new DrawHeap(k)
      var i = 0
      while (i < n) { h.add(bb.getDouble, bb.getLong); i += 1 }
      h
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByDraw =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BottomKByDraw =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): BottomKByDraw =
      copy(drawExpr = newChildren(0), idExpr = newChildren(1))
  }

  final case class BottomKPairs(
      priExpr: Expression,
      valueExpr: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Heap] {

    override def children: Seq[Expression] = Seq(priExpr, valueExpr)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("pri", LongType, nullable = false),
        StructField("v", DoubleType, nullable = false))), containsNull = false)
    override def prettyName: String = "bottom_k_sample"

    override def createAggregationBuffer(): Heap = new Heap(k)

    override def update(buf: Heap, input: InternalRow): Heap = {
      val p = priExpr.eval(input)
      val x = valueExpr.eval(input)
      if (p != null && x != null)
        buf.add(p.asInstanceOf[Long], x.asInstanceOf[Double])
      buf
    }

    override def merge(b1: Heap, b2: Heap): Heap = {
      var i = 0
      while (i < b2.n) { b1.add(b2.pri(i), b2.v(i)); i += 1 }
      b1
    }

    override def eval(buf: Heap): Any = {
      val rows = new Array[Any](buf.n)
      var i = 0
      while (i < buf.n) { rows(i) = InternalRow(buf.pri(i), buf.v(i)); i += 1 }
      new GenericArrayData(rows)
    }

    override def serialize(buf: Heap): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.n * 16)
      bb.putInt(buf.n)
      var i = 0
      while (i < buf.n) { bb.putLong(buf.pri(i)); bb.putDouble(buf.v(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Heap = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val h = new Heap(k)
      var i = 0
      while (i < n) { h.add(bb.getLong, bb.getDouble); i += 1 }
      h
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): BottomKPairs =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BottomKPairs =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): BottomKPairs =
      copy(priExpr = newChildren(0), valueExpr = newChildren(1))
  }
}
