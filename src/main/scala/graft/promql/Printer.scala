package graft.promql

/** Canonical PromQL text for an [[Expr]] — the engine's analog of the
  * vendored parser's `Expr.String()` (ast.go), serving
  * GET /api/v1/format_query (web/api/v1/api.go:368). The output is a
  * FIXPOINT of the parser: `parse(print(parse(q)))` equals `parse(q)`
  * for every expression the parser accepts — pinned over the whole
  * golden corpus by PrinterSpec. (The vendored route uses the
  * multi-line `Pretty(0)` layout; canonical one-line text carries the
  * same normalization — spacing, duration units, matcher quoting —
  * without reimplementing the pretty-printer's wrap heuristics.)
  */
object Printer {

  def format(e: Expr): String = print(e)

  /** Milliseconds → PromQL duration text (`90000` → `"1m30s"`). */
  def duration(ms: Long): String = {
    require(ms >= 0, s"negative duration: $ms")
    if (ms == 0) return "0s"
    val units = Seq(
      "w" -> 604800000L, "d" -> 86400000L, "h" -> 3600000L,
      "m" -> 60000L, "s" -> 1000L, "ms" -> 1L)
    val sb = new StringBuilder
    var rest = ms
    for ((u, w) <- units; if rest >= w) {
      sb.append(rest / w).append(u)
      rest %= w
    }
    sb.toString
  }

  private def num(v: Double): String =
    if (v.isNaN) "NaN"
    else if (v.isPosInfinity) "Inf"
    else if (v.isNegInfinity) "-Inf"
    else if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\t' => "\\t"
      case c => c.toString
    } + "\""

  private def matcher(m: LabelMatcher): String = {
    val op = m.op match {
      case MatchOp.Eq => "="
      case MatchOp.NotEq => "!="
      case MatchOp.Re => "=~"
      case MatchOp.NotRe => "!~"
    }
    s"${m.name}$op${quote(m.value)}"
  }

  /** name + matcher braces, WITHOUT offset/@ (matrix selectors interpose
    * the range before those). */
  private def selectorBase(vs: VectorSelector): String = {
    val braces =
      if (vs.matchers.isEmpty) ""
      else vs.matchers.map(matcher).mkString("{", ",", "}")
    vs.name.getOrElse("") + (if (vs.name.isEmpty && braces.isEmpty) "{}" else braces)
  }

  private def modifiers(offsetMs: Long, at: Option[AtModifier]): String = {
    val atPart = at.map {
      case AtModifier.Start => " @ start()"
      case AtModifier.End => " @ end()"
      case AtModifier.At(ts) =>
        " @ " + String.format(java.util.Locale.ROOT, "%.3f", Double.box(ts / 1000.0))
    }.getOrElse("")
    val off =
      if (offsetMs == 0) ""
      else if (offsetMs > 0) s" offset ${duration(offsetMs)}"
      else s" offset -${duration(-offsetMs)}"
    off + atPart
  }

  private def print(e: Expr): String = e match {
    case NumberLiteral(v) => num(v)
    case StringLiteral(s) => quote(s)
    case vs: VectorSelector =>
      selectorBase(vs) + modifiers(vs.offsetMs, vs.at)
    case MatrixSelector(vs, rangeMs) =>
      selectorBase(vs) + s"[${duration(rangeMs)}]" + modifiers(vs.offsetMs, vs.at)
    case SubqueryExpr(inner, rangeMs, stepMs, offsetMs, at) =>
      val step = stepMs.map(duration).getOrElse("")
      s"${print(inner)}[${duration(rangeMs)}:$step]" + modifiers(offsetMs, at)
    case AggregateExpr(op, inner, param, grouping, without) =>
      val grp =
        if (grouping.isEmpty && !without) ""
        else (if (without) " without " else " by ") +
          grouping.mkString("(", ", ", ")")
      val args = (param.toSeq.map(print) :+ print(inner)).mkString(", ")
      s"$op$grp ($args)"
    case BinaryExpr(op, lhs, rhs, m, bool) =>
      val boolPart = if (bool) " bool" else ""
      // `on` prints even with empty labels (on() = match-on-nothing is
      // semantically distinct from no clause); bare `ignoring()` equals
      // the default matching, so only a non-empty ignoring prints
      val onPart =
        if (m.on) " on " + m.labels.mkString("(", ", ", ")")
        else if (m.labels.nonEmpty) " ignoring " + m.labels.mkString("(", ", ", ")")
        else ""
      // the include list ALWAYS prints its parens — a bare `group_left`
      // followed by a parenthesized rhs would re-parse the rhs's opening
      // paren as an include list
      val cardPart = m.card match {
        case Cardinality.ManyToOne => " group_left" + m.include.mkString("(", ", ", ")")
        case Cardinality.OneToMany => " group_right" + m.include.mkString("(", ", ", ")")
        case _ => ""
      }
      s"${print(lhs)} $op$boolPart$onPart$cardPart ${print(rhs)}"
    case Call(fn, args) => s"$fn(${args.map(print).mkString(", ")})"
    case UnaryExpr(op, inner) => s"$op${print(inner)}"
    case ParenExpr(inner) => s"(${print(inner)})"
  }
}
