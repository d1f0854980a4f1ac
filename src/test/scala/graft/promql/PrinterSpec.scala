package graft.promql

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The canonical printer is a PARSER FIXPOINT: for every expression the
  * parser accepts, parse(print(parse(q))) == parse(q). Pinned over every
  * eval expression of the reference's golden corpus plus a hand-picked
  * set covering the syntax the corpus underuses. */
class PrinterSpec extends AnyFunSuite {

  private def roundTrips(q: String): Unit = {
    val ast =
      try Parser.parse(q)
      catch { case _: Throwable => return } // unparseable (fail-mode evals)
    val printed = Printer.format(ast)
    val re =
      try Parser.parse(printed)
      catch { case e: Throwable =>
        fail(s"printed form does not parse: '$q' -> '$printed' -- ${e.getMessage}")
      }
    // structural toString, not ==: Double's NaN != NaN would fail even
    // identical trees containing a NaN literal
    assert(re.toString == ast.toString, s"'$q' -> '$printed' reparses differently")
  }

  test("hand-picked syntax round-trips") {
    Seq(
      "1", "-1.5", "0.123e-7", "Inf", "NaN", "\"a \\\"b\\\" c\"",
      "m", "m{a=\"1\"}", "{__name__=~\"a.*\",x!~\"y\"}", "m{a=\"1\",b!=\"2\"}",
      "m[5m]", "m{a=\"1\"}[1h30m]", "m offset 5m", "m offset -90s",
      "m @ 100.000", "m @ start()", "m[5m] @ end()", "m[5m] offset 1w",
      "sum(m)", "sum by (a, b) (m)", "sum without () (m)",
      "topk(5, m)", "quantile by (x) (0.9, m)", "count_values(\"v\", m)",
      "a + b", "a + on (x) b", "a / ignoring (y) b", "a * on () b",
      "a + on (x) group_left() b", "a + ignoring (x) group_right(z) b",
      "a == bool b", "a unless on (x) b", "-sum(m)", "(a + b) * c",
      "rate(m[5m])", "clamp(m, 0, 1)", "m[1h:5m]", "(a)[30m:]",
      "max_over_time((a + b)[30m:5m] offset 1m)", "1 ^ 2 ^ 3",
      "label_replace(m, \"a\", \"$1\", \"b\", \"(.*)\")"
    ).foreach(roundTrips)
  }

  test("every golden-corpus eval expression round-trips") {
    val corpusDir =
      "/root/reference/vendor/github.com/prometheus/prometheus/promql/testdata"
    assume(Files.exists(Paths.get(corpusDir)), "reference corpus not present")
    var n = 0
    for {
      f <- new java.io.File(corpusDir).listFiles().toSeq
      if f.getName.endsWith(".test")
      line <- scala.io.Source.fromFile(f, "UTF-8").getLines()
      t = line.trim
      if t.startsWith("eval")
    } {
      // strip the "eval <mode> " prefix (instant/range/ordered/fail
      // variants) and the "at <time>" clause the DSL adds
      val expr = t
        .replaceFirst("^eval\\s+\\S+\\s+", "")
        .replaceFirst("^at\\s+\\S+\\s+", "")
      roundTrips(expr)
      n += 1
    }
    info(s"round-tripped $n corpus eval expressions")
    assert(n > 500)
  }
}
