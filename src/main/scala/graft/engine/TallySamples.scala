package graft.engine

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.DataType
import org.apache.spark.util.LongAccumulator

/** Pass-through expression that bumps a `LongAccumulator` once per
  * evaluated row — the in-scan MaxSamples meter. Wrapping the selector's
  * step column (always consumed by the downstream aggregation, so never
  * pruned) counts each sample once per window it serves, matching the
  * reference's per-step sample accounting, with ZERO extra passes: the
  * counting rides inside the same whole-stage-codegen'd scan+filter+explode
  * pipeline the query already runs, and the watchdog reads the accumulator
  * driver-side as task updates stream in (reference envelope:
  * src/internal/metric-store/metric_store.go:296).
  *
  * Codegen'd (a bare `$acc.add(1)` after the child's code), so it never
  * breaks a WholeStageCodegen span. Declared NON-deterministic so the
  * optimizer can never duplicate the side effect: a deterministic tally
  * gets substituted into predicates pushed through the aggregate above it
  * (PushDownPredicates rewrites a filter on the grouping attribute into
  * the grouping EXPRESSION — each reference then bumps the accumulator
  * again, a measured 5× overcount on subquery shapes). Non-determinism
  * keeps every downstream filter above the tally projection; the selector's
  * own scan filters sit below it and still push to parquet.
  */
final case class TallySamples(child: Expression, acc: LongAccumulator)
  extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "tally_samples"
  override lazy val deterministic: Boolean = false
  // NEVER foldable, even over a literal child (UnaryExpression would
  // inherit the child's foldability): ConstantFolding folds on `foldable`
  // alone, which would evaluate the tally ONCE at plan time and replace
  // it with its value — deleting the meter from the executed plan. A
  // single-step grid wraps a literal step exactly this way.
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = {
    acc.add(1L)
    child.eval(input)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val accRef = ctx.addReferenceObj("tallyAcc", acc, classOf[LongAccumulator].getName)
    val childCode = child.genCode(ctx)
    ev.copy(
      code = childCode.code + code"\n$accRef.add(1L);",
      isNull = childCode.isNull,
      value = childCode.value)
  }

  override protected def withNewChildInternal(newChild: Expression): TallySamples =
    copy(child = newChild)
}
