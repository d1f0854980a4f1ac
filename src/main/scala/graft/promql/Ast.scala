package graft.promql

/** PromQL abstract syntax tree.
  *
  * Shapes mirror the reference grammar's node set (reference:
  * vendor/github.com/prometheus/prometheus/promql/parser/ast.go —
  * VectorSelector, MatrixSelector, SubqueryExpr, AggregateExpr, BinaryExpr,
  * Call, ParenExpr, UnaryExpr, NumberLiteral, StringLiteral) re-expressed as
  * a plain Scala ADT. Times/durations are epoch/interval milliseconds.
  */
sealed trait Expr

final case class NumberLiteral(value: Double) extends Expr
final case class StringLiteral(value: String) extends Expr

sealed trait MatchOp
object MatchOp {
  case object Eq extends MatchOp        // =
  case object NotEq extends MatchOp     // !=
  case object Re extends MatchOp        // =~
  case object NotRe extends MatchOp     // !~
}

final case class LabelMatcher(name: String, op: MatchOp, value: String)

/** `@ start()` / `@ end()` / `@ <unix seconds>` pinning. */
sealed trait AtModifier
object AtModifier {
  case object Start extends AtModifier
  case object End extends AtModifier
  final case class At(tsMs: Long) extends AtModifier
}

final case class VectorSelector(
    name: Option[String],
    matchers: Seq[LabelMatcher],
    offsetMs: Long = 0L,
    at: Option[AtModifier] = None) extends Expr

final case class MatrixSelector(vs: VectorSelector, rangeMs: Long) extends Expr

final case class SubqueryExpr(
    expr: Expr,
    rangeMs: Long,
    stepMs: Option[Long], // None => engine default resolution
    offsetMs: Long = 0L,
    at: Option[AtModifier] = None) extends Expr

/** `sum by (a,b) (expr)`; `without=true` for `without (...)`. `param` carries
  * the scalar/string first argument of topk/bottomk/quantile/count_values. */
final case class AggregateExpr(
    op: String,
    expr: Expr,
    param: Option[Expr],
    grouping: Seq[String],
    without: Boolean) extends Expr

sealed trait Cardinality
object Cardinality {
  case object OneToOne extends Cardinality
  case object ManyToOne extends Cardinality  // group_left
  case object OneToMany extends Cardinality  // group_right
  case object ManyToMany extends Cardinality // and/or/unless
}

/** Vector matching clause: `on(...)`/`ignoring(...)` +
  * `group_left(include...)`/`group_right(include...)`. */
final case class VectorMatching(
    on: Boolean,
    labels: Seq[String],
    card: Cardinality,
    include: Seq[String])

object VectorMatching {
  val default: VectorMatching =
    VectorMatching(on = false, Nil, Cardinality.OneToOne, Nil)
  val setOp: VectorMatching =
    VectorMatching(on = false, Nil, Cardinality.ManyToMany, Nil)
}

final case class BinaryExpr(
    op: String,
    lhs: Expr,
    rhs: Expr,
    matching: VectorMatching,
    returnBool: Boolean) extends Expr

final case class Call(fn: String, args: Seq[Expr]) extends Expr
final case class UnaryExpr(op: String, expr: Expr) extends Expr
final case class ParenExpr(expr: Expr) extends Expr

final case class ParseException(msg: String, pos: Int)
    extends RuntimeException(s"$msg (at offset $pos)")
