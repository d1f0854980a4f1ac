package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.model.Points

/** Prometheus scrape connector (reference: src/internal/scraping/
  * scraper.go:26,66-100 — periodic pull of /metrics targets, append as
  * points).
  *
  * The text-exposition parser is a pure function `(body, ts) → rows`, so
  * the distributed shape is: a targets DataFrame → fetch per partition →
  * flatMap parse → append to [[PointsStore]]. Fetching needs egress, so
  * [[scrapeTargets]] takes a pluggable fetcher (the test injects literal
  * bodies; production plugs an HTTP client).
  */
object Scrape {

  final case class ScrapedPoint(name: String, labels: Map[String, String],
                                t: Long, value: Double)

  /** Parse Prometheus text exposition format:
    * `metric{l1="v1",...} value [timestampMs]`, '#' comments, TYPE/HELP
    * ignored, escaped label values, +Inf/-Inf/NaN values. */
  def parseExposition(body: String, defaultTsMs: Long): Seq[ScrapedPoint] =
    body.split("\n").toSeq.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap(parseLine(_, defaultTsMs))

  private def parseLine(line: String, defaultTsMs: Long): Option[ScrapedPoint] = {
    val (name, labels, rest) =
      if (line.contains("{")) {
        val open = line.indexOf('{')
        val close = matchingBrace(line, open)
        if (close < 0) return None
        (line.substring(0, open).trim,
          parseLabels(line.substring(open + 1, close)),
          line.substring(close + 1).trim)
      } else {
        val sp = line.indexWhere(_.isWhitespace)
        if (sp < 0) return None
        (line.substring(0, sp), Map.empty[String, String], line.substring(sp + 1).trim)
      }
    if (name.isEmpty) return None
    val parts = rest.split("\\s+").filter(_.nonEmpty)
    if (parts.isEmpty) return None
    val value = parseValue(parts(0))
    val ts = if (parts.length > 1) parts(1).toLong else defaultTsMs
    Some(ScrapedPoint(name, labels, ts, value))
  }

  private def matchingBrace(s: String, open: Int): Int = {
    var i = open + 1
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else if (c == '"') inStr = true
      else if (c == '}') return i
      i += 1
    }
    -1
  }

  private def parseLabels(s: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    while (i < s.length) {
      val eq = s.indexOf('=', i)
      if (eq < 0) return out.result()
      val key = s.substring(i, eq).trim.stripSuffix(",").trim
      var j = s.indexOf('"', eq) + 1
      val sb = new StringBuilder
      var done = false
      while (j < s.length && !done) {
        val c = s.charAt(j)
        if (c == '\\' && j + 1 < s.length) {
          s.charAt(j + 1) match {
            case 'n' => sb += '\n'
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case other => sb += other
          }
          j += 2
        } else if (c == '"') { done = true; j += 1 }
        else { sb += c; j += 1 }
      }
      if (key.nonEmpty) out += key -> sb.toString
      i = j
      while (i < s.length && (s.charAt(i) == ',' || s.charAt(i) == ' ')) i += 1
    }
    out.result()
  }

  private def parseValue(s: String): Double = s match {
    case "+Inf" | "Inf" => Double.PositiveInfinity
    case "-Inf" => Double.NegativeInfinity
    case "NaN" => Double.NaN
    case other => other.toDouble
  }

  /** Scrape a set of targets with a pluggable fetcher and return appendable
    * points (sanitized through the same ingest rules as the nozzle path). */
  def scrapeTargets(spark: SparkSession, targets: Seq[String],
                    fetch: String => String, tsMs: Long): DataFrame = {
    import spark.implicits._
    val rows = targets.flatMap { target =>
      parseExposition(fetch(target), tsMs)
        .map(p => (p.name, p.labels + ("instance" -> target), p.t, p.value))
    }
    val df = rows.toDF("name", "labels", "t", "value")
    Points.withSig(df.where(!col("value").isNaN &&
      col("value") =!= Double.PositiveInfinity && col("value") =!= Double.NegativeInfinity))
  }
}
