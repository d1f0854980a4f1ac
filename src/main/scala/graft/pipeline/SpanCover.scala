package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `span_cover(tokens, dup_positions, n)`: given a document's tokens and
  * the SORTED 1-based positions of its duplicated n-grams, return
  * struct<n_covered: long, clean: string> — the count of tokens covered
  * by some duplicated window and the space-joined uncovered remainder.
  *
  * One two-pointer sweep: position list ascending, a rolling
  * max-covered-end marks each token in O(len + |dups|). The HOF
  * formulation (`exists` per token over the position array) walks
  * interpreted lambdas in O(len × |dups|) per document — quadratic for
  * fully-duplicated docs, the dominant cost of [[Dedup.dupSpans]] at
  * corpus scale.
  */
final case class SpanCover(left: Expression, right: Expression, n: Int)
  extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_covered", LongType, nullable = false),
    StructField("clean", StringType, nullable = false)))

  override def prettyName: String = "span_cover"

  protected override def nullSafeEval(toks: Any, dps: Any): Any =
    SpanCover.cover(toks.asInstanceOf[ArrayData], dps.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, d) => s"graft.pipeline.SpanCover.cover($t, $d, $n)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SpanCover =
    copy(left = newLeft, right = newRight)
}

object SpanCover {

  /** Static runtime kernel shared by interpreted and generated code.
    * `dps` must be ascending (the aggregation sorts it). */
  def cover(toks: ArrayData, dps: ArrayData, n: Int): GenericInternalRow = {
    val m = toks.numElements()
    val k = dps.numElements()
    var covered = 0L
    val sb = new java.lang.StringBuilder(m * 8)
    var di = 0
    var maxEnd = 0 // last covered position so far (1-based, inclusive)
    var j = 1
    while (j <= m) {
      while (di < k && dps.getInt(di) <= j) {
        val end = dps.getInt(di) + n - 1
        if (end > maxEnd) maxEnd = end
        di += 1
      }
      if (j <= maxEnd) covered += 1
      else {
        if (sb.length > 0) sb.append(' ')
        sb.append(toks.getUTF8String(j - 1).toString)
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](covered, UTF8String.fromString(sb.toString)))
  }

  def column(tokens: Column, dupPositions: Column, n: Int): Column =
    ColumnBridge.column(SpanCover(
      ColumnBridge.expression(tokens), ColumnBridge.expression(dupPositions), n))
}
