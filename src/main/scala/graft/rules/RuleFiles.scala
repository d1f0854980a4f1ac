package graft.rules

import scala.collection.mutable

import graft.promql.Parser

/** Loader for Prometheus rulefmt rule files (FIXTURES §7; reference rule
  * persistence: src/internal/rules local_rule_manager.go /
  * replicated_rule_manager.go). Parses the narrow YAML
  * subset rulefmt actually uses — nested `groups/rules` sequences, scalar
  * fields, inline `{k: v}` flow maps and simple indented maps — with no
  * external YAML dependency (zero-egress build).
  */
object RuleFiles {

  final case class RuleGroup(
      name: String,
      intervalMs: Long,
      recording: Seq[Rules.RecordingRule],
      alerting: Seq[Rules.AlertingRule])

  def parse(text: String): Seq[RuleGroup] = {
    val lines = text.split("\n").toIndexedSeq
      .map(stripComment).filter(_.trim.nonEmpty)
    val groups = mutable.ArrayBuffer[RuleGroup]()

    var i = 0
    def indentOf(s: String): Int = s.takeWhile(_ == ' ').length

    // current group accumulation
    var gName = ""
    var gInterval = 60000L
    var recs = mutable.ArrayBuffer[Rules.RecordingRule]()
    var alerts = mutable.ArrayBuffer[Rules.AlertingRule]()
    var inGroup = false

    def flushGroup(): Unit = if (inGroup) {
      groups += RuleGroup(gName, gInterval, recs.toSeq, alerts.toSeq)
      recs = mutable.ArrayBuffer(); alerts = mutable.ArrayBuffer()
      inGroup = false
    }

    // current rule accumulation
    var rFields = mutable.Map[String, String]()
    var rLabels = Map.empty[String, String]
    var inRule = false

    def flushRule(): Unit = if (inRule) {
      if (rFields.contains("record")) {
        recs += Rules.RecordingRule(rFields("record"), rFields("expr"), rLabels)
      } else if (rFields.contains("alert")) {
        alerts += Rules.AlertingRule(rFields("alert"), rFields("expr"),
          rFields.get("for").map(Parser.parseDuration).getOrElse(0L), rLabels)
      }
      rFields = mutable.Map(); rLabels = Map.empty
      inRule = false
    }

    while (i < lines.length) {
      val line = lines(i)
      val t = line.trim
      if (t == "groups:") { /* header */ }
      else if (t.startsWith("- name:") && indentOf(line) == 0) {
        flushRule(); flushGroup()
        inGroup = true
        gName = unquote(t.stripPrefix("- name:").trim)
        gInterval = 60000L
      } else if (t.startsWith("interval:")) {
        gInterval = Parser.parseDuration(t.stripPrefix("interval:").trim)
      } else if (t == "rules:") { /* header */ }
      else if (t.startsWith("- record:") || t.startsWith("- alert:")) {
        flushRule()
        inRule = true
        val (k, v) =
          if (t.startsWith("- record:")) ("record", t.stripPrefix("- record:").trim)
          else ("alert", t.stripPrefix("- alert:").trim)
        rFields(k) = unquote(v)
      } else if (inRule) {
        t.split(":", 2) match {
          case Array(key, value) =>
            val k = key.trim
            val v = value.trim
            k match {
              case "labels" | "annotations" =>
                val (m, skipped) = parseMap(v, lines, i, indentOf(line))
                if (k == "labels") rLabels = m
                i += skipped
              case other => rFields(other) = unquote(v)
            }
          case _ => ()
        }
      }
      i += 1
    }
    flushRule(); flushGroup()
    groups.toSeq
  }

  /** `{k: v, k2: "v2"}` inline flow map, or indented `k: v` lines below. */
  private def parseMap(inline: String, lines: IndexedSeq[String], at: Int,
                       parentIndent: Int): (Map[String, String], Int) = {
    if (inline.startsWith("{")) {
      val body = inline.stripPrefix("{").stripSuffix("}")
      val m = body.split(",").filter(_.contains(":")).map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim -> unquote(v.trim)
      }.toMap
      (m, 0)
    } else {
      val out = Map.newBuilder[String, String]
      var j = at + 1
      var consumed = 0
      while (j < lines.length &&
        lines(j).takeWhile(_ == ' ').length > parentIndent &&
        lines(j).contains(":")) {
        val Array(k, v) = lines(j).trim.split(":", 2)
        out += k.trim -> unquote(v.trim)
        consumed += 1
        j += 1
      }
      (out.result(), consumed)
    }
  }

  private def stripComment(s: String): String = {
    // '#' outside quotes starts a comment
    var inQ = false; var q = ' '
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == q) inQ = false }
      else if (c == '"' || c == '\'') { inQ = true; q = c }
      else if (c == '#') return s.substring(0, i)
      i += 1
    }
    s
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
}
