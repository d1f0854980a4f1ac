package graft.promql

import org.scalatest.funsuite.AnyFunSuite

class ParserSpec extends AnyFunSuite {
  import MatchOp._

  test("plain selector with matchers") {
    val e = Parser.parse("""http_requests{job="api", code=~"5..", env!="dev"}""")
    assert(e == VectorSelector(Some("http_requests"), Seq(
      LabelMatcher("job", Eq, "api"),
      LabelMatcher("code", Re, "5.."),
      LabelMatcher("env", NotEq, "dev"))))
  }

  test("name-only and brace-only selectors") {
    assert(Parser.parse("up") == VectorSelector(Some("up"), Nil))
    assert(Parser.parse("""{__name__="up"}""") ==
      VectorSelector(None, Seq(LabelMatcher("__name__", Eq, "up"))))
  }

  test("matrix selector with duration forms") {
    assert(Parser.parse("up[5m]") == MatrixSelector(VectorSelector(Some("up"), Nil), 300000L))
    assert(Parser.parse("up[1h30m]") == MatrixSelector(VectorSelector(Some("up"), Nil), 5400000L))
    assert(Parser.parse("up[90s]") == MatrixSelector(VectorSelector(Some("up"), Nil), 90000L))
  }

  test("offset and @ modifiers") {
    assert(Parser.parse("up offset 5m") == VectorSelector(Some("up"), Nil, offsetMs = 300000L))
    assert(Parser.parse("up offset -5m") == VectorSelector(Some("up"), Nil, offsetMs = -300000L))
    assert(Parser.parse("up @ 100") == VectorSelector(Some("up"), Nil, at = Some(AtModifier.At(100000L))))
    assert(Parser.parse("up @ start() offset 1m") ==
      VectorSelector(Some("up"), Nil, offsetMs = 60000L, at = Some(AtModifier.Start)))
    assert(Parser.parse("up[5m] offset 1h") ==
      MatrixSelector(VectorSelector(Some("up"), Nil, offsetMs = 3600000L), 300000L))
  }

  test("aggregations by/without, param aggregators") {
    val e = Parser.parse("sum by (job, group) (http_requests)")
    assert(e == AggregateExpr("sum", VectorSelector(Some("http_requests"), Nil), None, Seq("job", "group"), without = false))
    val w = Parser.parse("avg without (instance) (up)")
    assert(w == AggregateExpr("avg", VectorSelector(Some("up"), Nil), None, Seq("instance"), without = true))
    val t = Parser.parse("topk(3, up)")
    assert(t == AggregateExpr("topk", VectorSelector(Some("up"), Nil), Some(NumberLiteral(3.0)), Nil, without = false))
    // trailing grouping clause
    val tr = Parser.parse("sum(up) by (job)")
    assert(tr == AggregateExpr("sum", VectorSelector(Some("up"), Nil), None, Seq("job"), without = false))
  }

  test("aggregator name used as metric name") {
    assert(Parser.parse("""sum{job="x"}""") ==
      VectorSelector(Some("sum"), Seq(LabelMatcher("job", Eq, "x"))))
  }

  test("binary precedence and associativity") {
    // 1 + 2 * 3 == 1 + (2*3)
    val e = Parser.parse("1 + 2 * 3")
    assert(e == BinaryExpr("+", NumberLiteral(1), BinaryExpr("*", NumberLiteral(2), NumberLiteral(3), VectorMatching.default, false), VectorMatching.default, false))
    // 2 ^ 3 ^ 2 right-assoc
    val p = Parser.parse("2 ^ 3 ^ 2")
    assert(p == BinaryExpr("^", NumberLiteral(2), BinaryExpr("^", NumberLiteral(3), NumberLiteral(2), VectorMatching.default, false), VectorMatching.default, false))
    // -2^2 = -(2^2)
    val u = Parser.parse("-2^2")
    assert(u == UnaryExpr("-", BinaryExpr("^", NumberLiteral(2), NumberLiteral(2), VectorMatching.default, false)))
  }

  test("vector matching modifiers") {
    val e = Parser.parse("""a / on(job) group_left(extra) b""").asInstanceOf[BinaryExpr]
    assert(e.matching == VectorMatching(on = true, Seq("job"), Cardinality.ManyToOne, Seq("extra")))
    val b = Parser.parse("a > bool b").asInstanceOf[BinaryExpr]
    assert(b.returnBool)
    val s = Parser.parse("a and b").asInstanceOf[BinaryExpr]
    assert(s.matching.card == Cardinality.ManyToMany)
    val ig = Parser.parse("a or ignoring(code) b").asInstanceOf[BinaryExpr]
    assert(ig.matching == VectorMatching(on = false, Seq("code"), Cardinality.ManyToMany, Nil))
  }

  test("function calls") {
    val e = Parser.parse("""rate(http_requests{job="api"}[5m])""")
    assert(e == Call("rate", Seq(MatrixSelector(
      VectorSelector(Some("http_requests"), Seq(LabelMatcher("job", Eq, "api"))), 300000L))))
    val lr = Parser.parse("""label_replace(up, "dst", "$1", "src", "(.*)")""")
    assert(lr == Call("label_replace", Seq(VectorSelector(Some("up"), Nil),
      StringLiteral("dst"), StringLiteral("$1"), StringLiteral("src"), StringLiteral("(.*)"))))
  }

  test("subqueries") {
    val e = Parser.parse("rate(x[5m])[30m:1m]")
    assert(e == SubqueryExpr(
      Call("rate", Seq(MatrixSelector(VectorSelector(Some("x"), Nil), 300000L))),
      1800000L, Some(60000L)))
    val d = Parser.parse("x[30m:]")
    assert(d == SubqueryExpr(VectorSelector(Some("x"), Nil), 1800000L, None))
  }

  test("complex nested expression") {
    val q = """sum by (group) (rate(http_requests{job="api-server"}[5m])) / ignoring(group) group_left sum(rate(http_requests[5m]))"""
    val e = Parser.parse(q).asInstanceOf[BinaryExpr]
    assert(e.op == "/")
    assert(e.matching.card == Cardinality.ManyToOne)
    assert(e.lhs.isInstanceOf[AggregateExpr])
  }

  test("number literals") {
    assert(Parser.parse("0x1f") == NumberLiteral(31.0))
    assert(Parser.parse("1e3") == NumberLiteral(1000.0))
    assert(Parser.parse(".5") == NumberLiteral(0.5))
    assert(Parser.parse("Inf") == NumberLiteral(Double.PositiveInfinity))
    val nan = Parser.parse("NaN").asInstanceOf[NumberLiteral]
    assert(nan.value.isNaN)
  }

  test("errors") {
    assertThrows[ParseException](Parser.parse("sum("))
    assertThrows[ParseException](Parser.parse("""up{job=}"""))
    assertThrows[ParseException](Parser.parse("(1 + 2)[5m]")) // range on non-selector
    assertThrows[ParseException](Parser.parse("up up"))
  }
}
