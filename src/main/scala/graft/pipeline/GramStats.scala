package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `gram_stats(tokens, n)`: word n-gram repetition statistics of one
  * document as a native codegen kernel — [total gram positions, count of
  * the most frequent gram, positions inside grams occurring > once].
  *
  * The statistic is per-document, so it is computed per document in one
  * hash-count pass over the token array: no gram-string columns are
  * materialized into the plan, nothing is exploded, sorted, or shuffled.
  * (The previous `aggregate`-HOF fold over a sorted gram array walked
  * interpreted lambdas per position: 687 s for 1M × 200-token docs ×
  * two gram widths; this kernel is a per-doc HashMap count — integer
  * results, bit-identical by definition.) Grams are the space-joined
  * token windows, exactly `concat_ws(" ", slice(toks, i, n))`. */
final case class GramStats(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_stats"

  protected override def nullSafeEval(input: Any): Any =
    GramStats.stats(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.GramStats.stats($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)
}

object GramStats {

  /** Static runtime kernel shared by interpreted and generated code. */
  def stats(tokens: ArrayData, n: Int): GenericArrayData = {
    val m = tokens.numElements()
    val total = math.max(0, m - (n - 1))
    if (total == 0) return new GenericArrayData(Array(0L, 0L, 0L))
    val toks = new Array[String](m)
    var i = 0
    while (i < m) { toks(i) = tokens.getUTF8String(i).toString; i += 1 }
    val counts = new java.util.HashMap[String, Array[Int]](total * 2)
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val key = sb.toString
      val slot = counts.get(key)
      if (slot == null) counts.put(key, Array(1)) else slot(0) += 1
      i += 1
    }
    var maxCount = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > maxCount) maxCount = c
      if (c > 1) dup += c
    }
    new GenericArrayData(Array(total.toLong, maxCount, dup))
  }

  /** Ratio kernel behind [[GramFrac]]: stats once, one division; null
    * (boxed) when the doc has no n-grams. */
  def frac(tokens: ArrayData, n: Int, dup: Boolean): java.lang.Double = {
    val s = stats(tokens, n)
    val total = s.getLong(0)
    if (total == 0L) null
    else java.lang.Double.valueOf(
      (if (dup) s.getLong(2) else s.getLong(1)).toDouble / total)
  }

  def column(tokens: Column, n: Int): Column =
    ColumnBridge.column(GramStats(ColumnBridge.expression(tokens), n))
}

/** `gram_frac(tokens, n, dup)`: a repetition fraction directly —
  * top-gram share (`dup = false`) or duplicated-position share
  * (`dup = true`) — so ONE reference in a filter costs one gram pass.
  * The array-returning [[GramStats]] form needs 3 `element_at`
  * references per fraction, and alias inlining into a pushed-down
  * filter turns each reference into its own kernel evaluation (6 gram
  * passes per row in the composed curation filter). Null when the doc
  * has no n-grams. */
final case class GramFrac(child: Expression, n: Int, dup: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "gram_frac"

  protected override def nullSafeEval(input: Any): Any =
    GramStats.frac(input.asInstanceOf[ArrayData], n, dup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("frac")
      s"""
        java.lang.Double $tmp = graft.pipeline.GramStats.frac($c, $n, $dup);
        ${ev.isNull} = $tmp == null;
        ${ev.value} = ${ev.isNull} ? -1.0 : $tmp.doubleValue();
      """
    })

  override protected def withNewChildInternal(newChild: Expression): GramFrac =
    copy(child = newChild)
}

object GramFrac {
  def column(tokens: Column, n: Int, dup: Boolean): Column =
    ColumnBridge.column(GramFrac(ColumnBridge.expression(tokens), n, dup))
}
