package graft.promql

import Lexer._

/** Recursive-descent PromQL parser.
  *
  * Precedence ladder (loosest → tightest), matching the reference grammar
  * (reference: vendor/github.com/prometheus/prometheus/promql/parser/
  * generated_parser.y):
  *
  *   or | and, unless | == != <= < >= > | + - | * / % atan2 | ^ (right) |
  *   unary +/- | postfix: [range], [range:step] subquery, offset, @
  */
object Parser {

  private val aggregators = Set(
    "sum", "avg", "count", "min", "max", "group", "stddev", "stdvar",
    "topk", "bottomk", "quantile", "count_values", "limitk", "limit_ratio")
  private val aggWithParam = Set("topk", "bottomk", "quantile", "count_values")

  def parse(input: String): Expr = {
    val p = new Parser(Lexer.lex(input))
    val e = p.parseExpr()
    p.expectEof()
    e
  }

  /** Parse a duration string like "5m" on its own (rule files etc.). */
  def parseDuration(s: String): Long =
    Lexer.lex(s) match {
      case Vector(Dur(ms, _), Eof(_)) => ms
      case Vector(Num(v, _), Eof(_)) => (v * 1000).toLong // bare seconds
      case _ => throw ParseException(s"invalid duration '$s'", 0)
    }

  private final class Parser(toks: Vector[Tok]) {
    private var pos = 0
    private def cur: Tok = toks(pos)
    private def advance(): Tok = { val t = cur; pos += 1; t }

    private def isOp(s: String): Boolean = cur match {
      case Op(o, _) => o == s
      case _ => false
    }
    // keywords (by/without/on/.../and/or/unless and aggregator names) are
    // case-insensitive in PromQL; metric/label/function names are not
    private def isIdent(s: String): Boolean = cur match {
      case Ident(i, _) => i.equalsIgnoreCase(s)
      case _ => false
    }
    private def eat(s: String): Boolean =
      if (isOp(s) || isIdent(s)) { advance(); true } else false
    private def expect(s: String): Unit =
      if (!eat(s)) throw ParseException(s"expected '$s' but found $cur", cur.pos)

    def expectEof(): Unit = cur match {
      case Eof(_) => ()
      case t => throw ParseException(s"trailing input $t", t.pos)
    }

    def parseExpr(): Expr = parseBinary(0)

    // precedence levels, loosest first
    private val levels: Seq[Set[String]] = Seq(
      Set("or"),
      Set("and", "unless"),
      Set("==", "!=", "<=", "<", ">=", ">"),
      Set("+", "-"),
      Set("*", "/", "%", "atan2"))

    private def peekBinOp(ops: Set[String]): Option[String] = cur match {
      case Op(o, _) if ops(o) => Some(o)
      case Ident(i, _) if ops(i.toLowerCase) => Some(i.toLowerCase)
      case _ => None
    }

    private def parseBinary(level: Int): Expr = {
      if (level >= levels.length) return parseUnary()
      var lhs = parseBinary(level + 1)
      var op = peekBinOp(levels(level))
      while (op.isDefined) {
        advance()
        val (matching, bool) = parseMatchingModifiers(op.get)
        val rhs = parseBinary(level + 1)
        lhs = BinaryExpr(op.get, lhs, rhs, matching, bool)
        op = peekBinOp(levels(level))
      }
      lhs
    }

    // unary -/+ binds LOOSER than ^ (`-2^2` == `-(2^2)`), but ^ accepts a
    // unary expression on its right (`2^-1`); ^ is right-associative
    private def parseUnary(): Expr =
      if (isOp("-")) { advance(); UnaryExpr("-", parseUnary()) }
      else if (isOp("+")) { advance(); UnaryExpr("+", parseUnary()) }
      else parsePow()

    private def parsePow(): Expr = {
      val base = parsePostfix(parsePrimary())
      if (isOp("^")) {
        advance()
        val (matching, bool) = parseMatchingModifiers("^")
        val exp = parseUnary()
        BinaryExpr("^", base, exp, matching, bool)
      } else base
    }

    /** `bool`, `on(...)/ignoring(...)`, `group_left(...)/group_right(...)`. */
    private def parseMatchingModifiers(op: String): (VectorMatching, Boolean) = {
      var bool = false
      if (isIdent("bool")) { advance(); bool = true }
      var on = false
      var labels: Seq[String] = Nil
      var card: Cardinality =
        if (op == "and" || op == "or" || op == "unless") Cardinality.ManyToMany
        else Cardinality.OneToOne
      var include: Seq[String] = Nil
      var explicit = false
      if (isIdent("on") || isIdent("ignoring")) {
        explicit = true
        on = isIdent("on")
        advance()
        labels = parseLabelList()
      }
      if (isIdent("group_left") || isIdent("group_right")) {
        card = if (isIdent("group_left")) Cardinality.ManyToOne else Cardinality.OneToMany
        advance()
        if (isOp("(")) include = parseLabelList()
      }
      val m =
        if (!explicit && card == Cardinality.ManyToMany) VectorMatching.setOp
        else VectorMatching(on, labels, card, include)
      (m, bool)
    }

    private def parseLabelList(): Seq[String] = {
      expect("(")
      val out = Seq.newBuilder[String]
      if (!isOp(")")) {
        var done = false
        while (!done) {
          cur match {
            case Ident(s, _) => out += s; advance()
            case Str(s, _) => out += s; advance() // quoted label names (UTF-8 names)
            case t => throw ParseException(s"expected label name, found $t", t.pos)
          }
          if (!eat(",")) done = true
        }
      }
      expect(")")
      out.result()
    }

    private def parsePrimary(): Expr = cur match {
      case Num(v, _) => advance(); NumberLiteral(v)
      case Str(s, _) => advance(); StringLiteral(s)
      case Op("(", _) =>
        advance()
        val e = parseExpr()
        expect(")")
        ParenExpr(e)
      case Op("{", _) => parseVectorSelector(None)
      case Ident(name, _) if aggregators(name.toLowerCase) && peekIsAggStart() =>
        parseAggregate(name.toLowerCase)
      case Ident(name, p) =>
        advance()
        if (isOp("(")) parseCall(name, p)
        else parseVectorSelector(Some(name))
      case t => throw ParseException(s"unexpected token $t", t.pos)
    }

    /** After an aggregator ident we must see `(`, `by`, or `without` for it
      * to be an aggregation; else it's a metric name like `sum{...}`. */
    private def peekIsAggStart(): Boolean = {
      val next = toks(pos + 1)
      next match {
        case Op("(", _) => true
        case Ident(kw, _) => kw.equalsIgnoreCase("by") || kw.equalsIgnoreCase("without")
        case _ => false
      }
    }

    private def parseAggregate(op: String): Expr = {
      advance() // aggregator name
      var grouping: Seq[String] = Nil
      var without = false
      if (isIdent("by")) { advance(); grouping = parseLabelList() }
      else if (isIdent("without")) { advance(); without = true; grouping = parseLabelList() }
      expect("(")
      var param: Option[Expr] = None
      var body: Expr = null
      if (aggWithParam(op)) {
        param = Some(parseExpr())
        expect(",")
        body = parseExpr()
      } else {
        body = parseExpr()
      }
      expect(")")
      if (grouping.isEmpty && !without && (isIdent("by") || isIdent("without"))) {
        if (isIdent("by")) { advance(); grouping = parseLabelList() }
        else { advance(); without = true; grouping = parseLabelList() }
      }
      AggregateExpr(op, body, param, grouping, without)
    }

    private def parseCall(fn: String, fnPos: Int): Expr = {
      expect("(")
      val args = Seq.newBuilder[Expr]
      if (!isOp(")")) {
        var done = false
        while (!done) {
          args += parseExpr()
          if (!eat(",")) done = true
        }
      }
      expect(")")
      Call(fn, args.result())
    }

    private def parseVectorSelector(name: Option[String]): Expr = {
      val matchers = Seq.newBuilder[LabelMatcher]
      if (isOp("{")) {
        advance()
        if (!isOp("}")) {
          var done = false
          while (!done) {
            val lname = cur match {
              case Ident(s, _) => advance(); s
              case Str(s, _) => advance(); s
              case t => throw ParseException(s"expected label name, found $t", t.pos)
            }
            val op = cur match {
              case Op("=", _) => advance(); MatchOp.Eq
              case Op("!=", _) => advance(); MatchOp.NotEq
              case Op("=~", _) => advance(); MatchOp.Re
              case Op("!~", _) => advance(); MatchOp.NotRe
              case t => throw ParseException(s"expected matcher op, found $t", t.pos)
            }
            val v = cur match {
              case Str(s, _) => advance(); s
              case t => throw ParseException(s"expected quoted label value, found $t", t.pos)
            }
            matchers += LabelMatcher(lname, op, v)
            if (!eat(",")) done = true
          }
        }
        expect("}")
      }
      VectorSelector(name, matchers.result())
    }

    /** Postfix chain on a primary: `[range]`, `[range:step]`, `offset d`,
      * `@ ts`. Subqueries attach to any expression; ranges only to selectors. */
    private def parsePostfix(e0: Expr): Expr = {
      var e = e0
      var continue = true
      while (continue) {
        if (isOp("[")) {
          advance()
          val range = cur match {
            case Dur(ms, _) => advance(); ms
            case Num(v, _) => advance(); (v * 1000).toLong
            case t => throw ParseException(s"expected duration, found $t", t.pos)
          }
          if (eat(":")) {
            val step = cur match {
              case Dur(ms, _) => advance(); Some(ms)
              case Num(v, _) => advance(); Some((v * 1000).toLong)
              case _ => None
            }
            expect("]")
            e = SubqueryExpr(e, range, step)
          } else {
            expect("]")
            e = e match {
              case vs: VectorSelector => MatrixSelector(vs, range)
              case other => throw ParseException("range selector on non-selector expression (use subquery [r:s])", cur.pos)
            }
          }
        } else if (isIdent("offset")) {
          advance()
          val neg = eat("-")
          val d = cur match {
            case Dur(ms, _) => advance(); ms
            case Num(v, _) => advance(); (v * 1000).toLong
            case t => throw ParseException(s"expected duration after offset, found $t", t.pos)
          }
          val off = if (neg) -d else d
          e = applyOffset(e, off)
        } else if (isOp("@")) {
          advance()
          val at: AtModifier = cur match {
            case Ident("start", _) => advance(); expect("("); expect(")"); AtModifier.Start
            case Ident("end", _) => advance(); expect("("); expect(")"); AtModifier.End
            case Num(v, _) => advance(); AtModifier.At((v * 1000).toLong)
            case Op("-", _) =>
              advance()
              cur match {
                case Num(v, _) => advance(); AtModifier.At((-v * 1000).toLong)
                case t => throw ParseException(s"expected timestamp after @-, found $t", t.pos)
              }
            case t => throw ParseException(s"expected timestamp after @, found $t", t.pos)
          }
          e = applyAt(e, at)
        } else continue = false
      }
      e
    }

    private def applyOffset(e: Expr, off: Long): Expr = e match {
      case vs: VectorSelector => vs.copy(offsetMs = vs.offsetMs + off)
      case MatrixSelector(vs, r) => MatrixSelector(vs.copy(offsetMs = vs.offsetMs + off), r)
      case sq: SubqueryExpr => sq.copy(offsetMs = sq.offsetMs + off)
      case ParenExpr(inner) => ParenExpr(applyOffset(inner, off))
      case _ => throw ParseException("offset modifier must follow a selector or subquery", cur.pos)
    }

    private def applyAt(e: Expr, at: AtModifier): Expr = e match {
      case vs: VectorSelector => vs.copy(at = Some(at))
      case MatrixSelector(vs, r) => MatrixSelector(vs.copy(at = Some(at)), r)
      case sq: SubqueryExpr => sq.copy(at = Some(at))
      case ParenExpr(inner) => ParenExpr(applyAt(inner, at))
      case _ => throw ParseException("@ modifier must follow a selector or subquery", cur.pos)
    }
  }
}
