package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** PromQL's overflow-safe incremental mean as a DeclarativeAggregate —
  * the reference's avg aggregator (vendor/.../promql/engine.go:2694-2715):
  *
  *   mean += v/n - mean/n        (divide-then-subtract avoids overflow)
  *
  * with the Inf special cases: once the running mean is ±Inf, a same-sign
  * Inf or any finite value keeps it (subtracting Inf/n would produce NaN).
  *
  * The buffer is (mean DOUBLE, n LONG) — UnsafeRow-mutable primitives, so
  * the aggregation stays a codegen'd whole-stage HashAggregate; merge uses
  * the scale-first weighted form mean1*(n1/n) + mean2*(n2/n), which cannot
  * overflow for finite partial means. A naive sum(v)/count(v) would round
  * large-magnitude groups through ±Inf (corpus aggregators.test
  * big/bigzero); a window pre-count (the v0 shape) costs an extra
  * input-sized sort+shuffle.
  */
object AvgAgg {
  def column(value: Column): Column =
    ColumnBridge.column(AvgIncremental(ColumnBridge.expression(value)).toAggregateExpression())
}

/** The engine always feeds a DoubleType `value` column — no input cast
  * machinery needed. */
final case class AvgIncremental(child: Expression)
  extends DeclarativeAggregate with UnaryLike[Expression] {

  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "avg_incremental"

  private lazy val mean = AttributeReference("mean", DoubleType, nullable = false)()
  private lazy val n = AttributeReference("n", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(mean, n)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0.0), Literal(0L))

  private def isInf(e: Expression): Expression =
    Or(EqualTo(e, Literal(Double.PositiveInfinity)),
      EqualTo(e, Literal(Double.NegativeInfinity)))

  override lazy val updateExpressions: Seq[Expression] = {
    val v = child
    val n1 = Add(n, Literal(1L))
    val nd = Cast(n1, DoubleType)
    // engine.go:2695-2711: an Inf mean absorbs same-sign Inf and all
    // finite values; only an opposite-sign Inf or NaN reaches the formula
    val keepInf = And(isInf(mean),
      Or(And(isInf(v), EqualTo(GreaterThan(mean, Literal(0.0)), GreaterThan(v, Literal(0.0)))),
        And(Not(isInf(v)), Not(IsNaN(v)))))
    val stepped = Add(mean, Subtract(Divide(v, nd), Divide(mean, nd)))
    Seq(
      If(IsNull(v), mean, If(keepInf, mean, stepped)),
      If(IsNull(v), n, n1))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val nTot = Add(n.left, n.right)
    val nd = Cast(nTot, DoubleType)
    // scale each side by its weight BEFORE adding: |mean_i * (n_i/n)| <=
    // |mean_i|, so finite partials cannot overflow; empty sides contribute
    // exactly 0 (mean initial value is 0.0, n_i/n = 0)
    val merged = Add(
      Multiply(mean.left, Divide(Cast(n.left, DoubleType), nd)),
      Multiply(mean.right, Divide(Cast(n.right, DoubleType), nd)))
    // an Inf side must absorb a finite side directly: Inf * weight + x is
    // correct already, but a ZERO-weighted Inf side (n_i = 0 cannot have
    // Inf mean — initial 0.0) never occurs, so no extra casing is needed
    Seq(If(EqualTo(nTot, Literal(0L)), Literal(0.0), merged), nTot)
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(n, Literal(0L)), Literal(null, DoubleType), mean)

  override protected def withNewChildInternal(newChild: Expression): AvgIncremental =
    copy(child = newChild)
}
