package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_grams(text, n)`: the DISTINCT character n-grams of one document
  * with their in-document counts, as a native codegen kernel —
  * array<struct<k, cnt>> where `k` packs the n code points 21 bits each
  * (a code point is < 0x110000, so a trigram key fits 63 bits; the
  * packing is a bijection on code-point n-tuples, so grouping by `k`
  * downstream is exactly grouping by the gram string).
  *
  * Why a kernel: a character n-gram stream via
  * `transform(sequence(1, len-n+1), i -> substring(text, i, n))` walks
  * an INTERPRETED lambda per position (higher-order functions don't
  * codegen) and explodes one row per position — 1.4 B rows and 879 s
  * for [[CharLm]] at 1M docs. This kernel is one per-doc hash-count
  * pass emitting distinct grams (≤ |charset|ⁿ, typically a few hundred),
  * so the exploded stream shrinks by the per-doc repetition factor and
  * carries 16-byte longs instead of strings. Code-POINT semantics, same
  * as Spark's `substring`/DuckDB's `substr`, so oracles line up on
  * non-BMP text too. n ≤ 3 (the 63-bit key bound). */
final case class CharGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 3, s"char_grams: n must be 1..3, got $n")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "char_grams"

  protected override def nullSafeEval(input: Any): Any =
    CharGrams.counts(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.CharGrams.counts($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

object CharGrams {

  /** Static runtime kernel shared by interpreted and generated code. */
  def counts(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    val len = s.length
    val cpCount = s.codePointCount(0, len)
    val total = cpCount - (n - 1)
    if (total <= 0) return new GenericArrayData(Array.empty[Any])
    val cps = new Array[Int](cpCount)
    var i = 0
    var ci = 0
    while (ci < len) {
      val cp = s.codePointAt(ci)
      cps(i) = cp
      i += 1
      ci += Character.charCount(cp)
    }
    // capacity bounded by the charset (distinct grams ≤ |charset|ⁿ, a few
    // hundred in practice) — sizing by document length would allocate a
    // GB-scale table for one pathological 50 MB crawl page
    val counts = new java.util.HashMap[java.lang.Long, Array[Long]](
      math.min(total * 2L, 1L << 12).toInt)
    i = 0
    while (i < total) {
      var key = 0L
      var j = 0
      while (j < n) { key = (key << 21) | cps(i + j); j += 1 }
      val boxed = java.lang.Long.valueOf(key)
      val slot = counts.get(boxed)
      if (slot == null) counts.put(boxed, Array(1L)) else slot(0) += 1
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      out(o) = new GenericInternalRow(
        Array[Any](e.getKey.longValue(), e.getValue()(0)))
      o += 1
    }
    new GenericArrayData(out)
  }

  def column(text: Column, n: Int): Column =
    ColumnBridge.column(CharGrams(ColumnBridge.expression(text), n))
}
