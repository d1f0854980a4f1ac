package graft.engine

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Two-phase topk/bottomk: a bounded "heap" TypedImperativeAggregate that
  * retains only the k best (value, tiebreak, sig) entries per group. The
  * partial/final split means each map task ships at most k entries per
  * (group, step) — shuffle volume is output-sized, not input-sized, unlike
  * a rank-window which sorts every row through the exchange (the reference
  * uses the same bounded-heap idea single-threaded, engine.go:2740-2777).
  *
  * eval() returns the winners' series sigs in rank order; the caller joins
  * them back to the input vector to recover the full rows.
  */
object TopKAgg {

  /** Ordering entry: NaN sorts away from the extremes on BOTH variants;
    * ties break on the caller-provided string (name + canonical labels —
    * deterministic and oracle-reproducible). */
  final class Entry(val value: Double, val tie: String, val sig: Long)

  final class Buf(var entries: java.util.ArrayList[Entry], var k: Int)

  /** rank-comparator: true if a ranks strictly better than b. */
  private def better(top: Boolean, a: Entry, b: Entry): Boolean = {
    val an = a.value.isNaN
    val bn = b.value.isNaN
    if (an != bn) return bn // non-NaN beats NaN
    if (!an && a.value != b.value)
      return if (top) a.value > b.value else a.value < b.value
    a.tie < b.tie
  }

  def column(top: Boolean, value: Column, tie: Column, sig: Column, k: Column): Column =
    ColumnBridge.column(TopKSigs(
      ColumnBridge.expression(value), ColumnBridge.expression(tie),
      ColumnBridge.expression(sig), ColumnBridge.expression(k),
      top).toAggregateExpression())

  final case class TopKSigs(
      valueExpr: Expression,
      tieExpr: Expression,
      sigExpr: Expression,
      kExpr: Expression,
      top: Boolean,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Buf] {

    override def children: Seq[Expression] = Seq(valueExpr, tieExpr, sigExpr, kExpr)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = if (top) "topk_sigs" else "bottomk_sigs"

    override def createAggregationBuffer(): Buf = new Buf(new java.util.ArrayList[Entry](), 0)

    private def insert(buf: Buf, e: Entry): Unit = {
      if (buf.k <= 0) return
      // insertion into a small sorted list (k is small); worst rank last
      var i = 0
      val n = buf.entries.size()
      while (i < n && !better(top, e, buf.entries.get(i))) i += 1
      if (i < buf.k) {
        buf.entries.add(i, e)
        if (buf.entries.size() > buf.k) buf.entries.remove(buf.entries.size() - 1)
      }
    }

    override def update(buf: Buf, input: InternalRow): Buf = {
      val kv = kExpr.eval(input)
      if (kv != null) {
        val kd = kv.asInstanceOf[Double]
        buf.k = if (kd.isNaN) 0 else math.max(kd.toLong, 0L).min(Int.MaxValue).toInt
      }
      val v = valueExpr.eval(input)
      val s = sigExpr.eval(input)
      if (v != null && s != null) {
        val tie = tieExpr.eval(input).toString
        insert(buf, new Entry(v.asInstanceOf[Double], tie, s.asInstanceOf[Long]))
      }
      buf
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      if (b2.k > b1.k) b1.k = b2.k
      val it = b2.entries.iterator()
      while (it.hasNext) insert(b1, it.next())
      b1
    }

    override def eval(buf: Buf): Any = {
      val out = new Array[Any](buf.entries.size())
      var i = 0
      while (i < out.length) { out(i) = buf.entries.get(i).sig; i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(buf: Buf): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(buf.k)
      out.writeInt(buf.entries.size())
      val it = buf.entries.iterator()
      while (it.hasNext) {
        val e = it.next()
        out.writeDouble(e.value)
        out.writeLong(e.sig)
        val tb = e.tie.getBytes(StandardCharsets.UTF_8)
        out.writeInt(tb.length)
        out.write(tb)
      }
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val k = in.readInt()
      val n = in.readInt()
      val buf = new Buf(new java.util.ArrayList[Entry](n), k)
      var i = 0
      while (i < n) {
        val v = in.readDouble()
        val s = in.readLong()
        val len = in.readInt()
        val tb = new Array[Byte](len)
        in.readFully(tb)
        buf.entries.add(new Entry(v, new String(tb, StandardCharsets.UTF_8), s))
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): TopKSigs =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): TopKSigs =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): TopKSigs =
      copy(valueExpr = newChildren(0), tieExpr = newChildren(1),
        sigExpr = newChildren(2), kExpr = newChildren(3))
  }
}
