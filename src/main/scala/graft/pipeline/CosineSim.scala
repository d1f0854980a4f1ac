package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ArrayDoubleBinaryInputs
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `cosine_sim(a, b)`: cosine similarity of two ARRAY<DOUBLE> columns as
  * a NATIVE codegen expression — one static call on the unconverted
  * ArrayData per row, replacing the three higher-order-function folds
  * (zip_with + aggregate ×3) the interpreted path evaluates per pair.
  * On the all-pairs shapes (semDeDup's within-cluster verify, the
  * brute-force top-k baseline) the HOF chain was the bottleneck: every
  * pair allocated a zipped array and walked three lambda folds through
  * interpreted eval.
  *
  * BIT-COMPATIBLE with the HOF formulation (and therefore with every
  * existing DuckDB oracle): the dot product and both self-dots
  * accumulate left-to-right from 0.0 — the same IEEE operation order as
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — and the result is
  * `dot / (sqrt(aa) * sqrt(bb))`, term for term. */
// ArrayDoubleBinaryInputs: analysis-time enforcement — getDouble over an
// array<float>'s packed 4-byte elements would silently reinterpret
// garbage, so an uncast embedding column must fail ANALYSIS, not results
final case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ArrayDoubleBinaryInputs {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cos(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.pipeline.CosineSim.cos($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Static runtime kernel shared by interpreted and generated code.
    * Accumulation order matches the HOF folds exactly (left-to-right
    * from 0.0); trailing elements of the longer array are ignored, the
    * zip_with-with-null semantics the previous formulation never hit
    * (equal dims) but must not crash on. */
  def cos(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y
      i += 1
    }
    i = 0
    while (i < a.numElements()) { val x = a.getDouble(i); aa += x * x; i += 1 }
    i = 0
    while (i < b.numElements()) { val y = b.getDouble(i); bb += y * y; i += 1 }
    dot / (math.sqrt(aa) * math.sqrt(bb))
  }
}
