package graft.testkit

import scala.collection.mutable

import graft.promql.{LabelMatcher, MatchOp, Parser, VectorSelector}

/** Loader for the reference's golden-query DSL (format documented in
  * FIXTURES.md §2; harness semantics: vendor/.../promql/test.go). The files
  * themselves are read at test time from the read-only reference checkout —
  * they are DATA (queries + expected outputs), not code.
  */
object PromTestDsl {

  final case class Sample(tMs: Long, value: Double, stale: Boolean)
  final case class Series(name: String, labels: Map[String, String], samples: Seq[Sample])

  sealed trait Cmd
  final case class Load(series: Seq[Series]) extends Cmd
  case object Clear extends Cmd
  final case class Eval(
      mode: String, // "instant" | "ordered" | "fail"
      atMs: Long,
      expr: String,
      expected: Seq[(Map[String, String], Seq[Double])], // labels (incl __name__) -> values
      scalarExpected: Option[Double],
      line: Int) extends Cmd

  def parseFile(text: String): Seq[Cmd] = {
    val lines = text.split("\n", -1)
    val cmds = mutable.ArrayBuffer[Cmd]()
    var i = 0
    def indented(s: String): Boolean = s.startsWith(" ") || s.startsWith("\t")
    while (i < lines.length) {
      val line = lines(i)
      val trimmed = line.trim
      if (trimmed.isEmpty || trimmed.startsWith("#")) { i += 1 }
      else if (trimmed == "clear") { cmds += Clear; i += 1 }
      else if (trimmed.startsWith("load ")) {
        val gapMs = Parser.parseDuration(trimmed.stripPrefix("load ").trim)
        i += 1
        val series = mutable.ArrayBuffer[Series]()
        while (i < lines.length && indented(lines(i)) && lines(i).trim.nonEmpty) {
          series += parseSeries(lines(i).trim, gapMs)
          i += 1
        }
        cmds += Load(series.toSeq)
      } else if (trimmed.startsWith("eval")) {
        val evalLine = i + 1
        val (mode, rest) =
          if (trimmed.startsWith("eval_fail ")) ("fail", trimmed.stripPrefix("eval_fail "))
          else if (trimmed.startsWith("eval_ordered ")) ("ordered", trimmed.stripPrefix("eval_ordered "))
          else ("instant", trimmed.stripPrefix("eval "))
        val m = "^instant\\s+at\\s+(\\S+)\\s+(.*)$".r
        rest.trim match {
          case m(atStr, expr) =>
            val atMs = parseSignedDuration(atStr)
            i += 1
            val expected = mutable.ArrayBuffer[(Map[String, String], Seq[Double])]()
            var scalarExpected: Option[Double] = None
            while (i < lines.length && indented(lines(i)) && lines(i).trim.nonEmpty) {
              val e = lines(i).trim
              if (!e.startsWith("#")) {
                if (e.startsWith("{") || e.matches("^[a-zA-Z_:][a-zA-Z0-9_:]*\\{.*")
                    || e.matches("^[a-zA-Z_:][a-zA-Z0-9_:]*(\\s+.*)?$")
                      && !e.matches("^[+-]?[0-9.].*") && !isNumToken(e.split("\\s+")(0))) {
                  expected += parseExpected(e)
                } else {
                  scalarExpected = Some(parseNum(e.split("\\s+")(0)))
                }
              }
              i += 1
            }
            cmds += Eval(mode, atMs, expr, expected.toSeq, scalarExpected, evalLine)
          case other =>
            throw new IllegalArgumentException(s"unsupported eval form at line ${i + 1}: $trimmed")
        }
      } else {
        throw new IllegalArgumentException(s"unparseable line ${i + 1}: $trimmed")
      }
    }
    cmds.toSeq
  }

  private def isNumToken(s: String): Boolean =
    s.matches("[+-]?(Inf|NaN|[0-9.].*)")

  private def parseSignedDuration(s: String): Long =
    if (s.startsWith("-")) -Parser.parseDuration(s.drop(1)) else Parser.parseDuration(s)

  /** `metric{l="v",...} v1 v2 _ stale 0+10x3 ...` */
  private def parseSeries(line: String, gapMs: Long): Series = {
    val (selPart, valuesPart) = splitSelector(line)
    val (name, labels) = parseMetric(selPart)
    val samples = mutable.ArrayBuffer[Sample]()
    var k = 0
    valuesPart.split("\\s+").filter(_.nonEmpty).foreach { tok =>
      expand(tok).foreach {
        case None => k += 1 // gap
        case Some((v, stale)) =>
          samples += Sample(k * gapMs, v, stale)
          k += 1
      }
    }
    Series(name, labels, samples.toSeq)
  }

  private def parseExpected(line: String): (Map[String, String], Seq[Double]) = {
    val (selPart, valuesPart) = splitSelector(line)
    val (name, labels) = parseMetric(selPart)
    val withName = if (name != null && name.nonEmpty) labels + ("__name__" -> name) else labels
    val values = valuesPart.split("\\s+").filter(_.nonEmpty).flatMap(expand)
      .collect { case Some((v, _)) => v }
    (withName, values.toSeq)
  }

  /** Split `metric{...} rest` / `{...} rest` / `metric rest` into selector
    * text and the rest. */
  private def splitSelector(line: String): (String, String) = {
    val braceStart = line.indexOf('{')
    val firstSpace = line.indexWhere(_.isWhitespace)
    if (braceStart >= 0 && (firstSpace < 0 || braceStart < firstSpace)) {
      var depth = 0
      var j = braceStart
      var end = -1
      var inStr = false
      var quote = ' '
      while (j < line.length && end < 0) {
        val c = line.charAt(j)
        if (inStr) {
          if (c == '\\') j += 1
          else if (c == quote) inStr = false
        } else if (c == '"' || c == '\'') { inStr = true; quote = c }
        else if (c == '{') depth += 1
        else if (c == '}') { depth -= 1; if (depth == 0) end = j }
        j += 1
      }
      (line.substring(0, end + 1), line.substring(end + 1))
    } else if (firstSpace >= 0) {
      (line.substring(0, firstSpace), line.substring(firstSpace + 1))
    } else (line, "")
  }

  /** Metric selector text -> (name, labels); uses the engine's own parser. */
  private def parseMetric(sel: String): (String, Map[String, String]) =
    Parser.parse(sel) match {
      case VectorSelector(name, matchers, _, _) =>
        val labels = matchers.collect {
          case LabelMatcher(n, MatchOp.Eq, v) if n != "__name__" => n -> v
        }.toMap
        val nameFromMatcher = matchers.collectFirst {
          case LabelMatcher("__name__", MatchOp.Eq, v) => v
        }
        (name.orElse(nameFromMatcher).getOrElse(""), labels)
      case other => throw new IllegalArgumentException(s"bad series selector '$sel'")
    }

  /** Series-expansion notation: `a+bxN` (N additional increments), `axN`
    * (repeat), plain value, `_` gap (None), `stale` marker. */
  def expand(tok: String): Seq[Option[(Double, Boolean)]] = {
    if (tok == "_") return Seq(None)
    if (tok == "stale") return Seq(Some((Double.NaN, true)))
    val xIdx = findRepeatX(tok)
    if (xIdx < 0) return Seq(Some((parseNum(tok), false)))
    val n = tok.substring(xIdx + 1).toInt
    val head = tok.substring(0, xIdx)
    // split head into a and signed b: scan for +/- beyond position 0,
    // skipping an exponent's sign (e.g. 1e-3+2x4)
    var splitAt = -1
    var j = 1
    while (j < head.length && splitAt < 0) {
      val c = head.charAt(j)
      if ((c == '+' || c == '-') && !isExponentSign(head, j)) splitAt = j
      j += 1
    }
    val (a, b) =
      if (splitAt < 0) (parseNum(head), 0.0)
      else (parseNum(head.substring(0, splitAt)), parseNum(head.substring(splitAt)))
    (0 to n).map(k => Some((a + k * b, false)))
  }

  private def isExponentSign(s: String, j: Int): Boolean =
    j > 0 && (s.charAt(j - 1) == 'e' || s.charAt(j - 1) == 'E')

  /** The x of `a+bxN` — the LAST x followed by digits only. */
  private def findRepeatX(tok: String): Int = {
    var i = tok.length - 1
    while (i >= 0 && tok.charAt(i).isDigit) i -= 1
    if (i > 0 && i < tok.length - 1 && tok.charAt(i) == 'x') i else -1
  }

  def parseNum(s: String): Double = s match {
    case "Inf" | "+Inf" => Double.PositiveInfinity
    case "-Inf" => Double.NegativeInfinity
    case "NaN" => Double.NaN
    case other => other.toDouble
  }
}
