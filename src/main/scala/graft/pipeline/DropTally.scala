package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.LongAccumulator

/** "Is this bucket over the cap?" as a tallying predicate: returns true
  * (⇒ the caller filters the bucket out) AND bumps the dropped-bucket /
  * dropped-doc accumulators when it fires — so capped-bucket recall loss
  * in [[Dedup.hammingPairs]] is counted in the SAME pass that drops it.
  *
  * Accumulators, not `Dataset.observe`: observed-metric nodes are lost
  * when AQE's re-optimization collapses an empty downstream stage (the
  * exact all-buckets-dropped case the counter exists for), while
  * accumulator updates report through task completion of the aggregation
  * stage regardless of how later stages re-plan. Same machinery and
  * caveat as the engine's TallySamples meter: updates ride a
  * transformation, so stage retries / speculative duplicates can
  * OVERcount — a diagnostic signal, not an exactly-once metric.
  *
  * `child` is the bucket's collected size (IntegerType); marked
  * non-deterministic so Catalyst never collapses, reorders past, or
  * double-evaluates the side effect. */
final case class DropTally(child: Expression, cap: Int,
                           buckets: LongAccumulator, docs: LongAccumulator)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "drop_tally"
  override lazy val deterministic: Boolean = false

  override def eval(input: InternalRow): Any = {
    val n = child.eval(input).asInstanceOf[Int]
    val dropped = n > cap
    if (dropped) { buckets.add(1L); docs.add(n.toLong) }
    dropped
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("dropBuckets", buckets, classOf[LongAccumulator].getName)
    val d = ctx.addReferenceObj("dropDocs", docs, classOf[LongAccumulator].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
          |boolean ${ev.value} = ${c.value} > $cap;
          |if (${ev.value}) { $b.add(1L); $d.add((long) ${c.value}); }
          |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): DropTally =
    copy(child = newChild)
}
