package graft.api

import com.sun.net.httpserver.HttpExchange

import graft.promql.Parser
import graft.rules.RuleManagers
import graft.rules.RuleManagers.{ManagerExistsException, ManagerNotExistsException, Rule, RuleGroup}

/** Rule-management HTTP surface mirroring the reference's RulesAPI
  * (src/internal/api/rules_api.go:73-74):
  *
  *   POST   /rules/manager                     → 201 (409 exists, 400 bad)
  *   POST   /rules/manager/:id/group           → 201 (400 bad/missing manager)
  *   DELETE /rules/manager/:id                 → 204 (404 missing)
  *
  * plus the Prometheus listing `GET /api/v1/rules` (vendored web/api/v1
  * route table). Payload shapes follow src/pkg/rulesclient: managers are
  * `{"data":{"id":...,"alertmanagers":[...]}}`, groups are
  * `{"data":{"name":...,"interval":"1m","rules":[{record|alert, expr,
  * for, labels, annotations}]}}`.
  */
object RulesApi {

  def route(rm: RuleManagers, ex: HttpExchange): (Int, String) = {
    val method = ex.getRequestMethod.toUpperCase
    val rest = ex.getRequestURI.getPath.stripPrefix("/rules/manager")
    val parts = rest.split("/").filter(_.nonEmpty)
    try {
      (method, parts.toList) match {
        case ("POST", Nil) => createManager(rm, body(ex))
        case ("POST", id :: "group" :: Nil) => upsertGroup(rm, id, body(ex))
        case ("DELETE", id :: Nil) =>
          try { rm.deleteManager(id); (204, "") }
          catch { case e: ManagerNotExistsException => (404, err(e.getMessage)) }
        case _ => (404, err(s"no route for $method $rest"))
      }
    } catch {
      case e: IllegalArgumentException => (400, err(e.getMessage))
      case e: graft.promql.ParseException => (400, err(e.getMessage))
    }
  }

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)

  private def err(msg: String): String =
    s"""{"status":"error","error":${MiniJson.str(msg)}}"""

  private def createManager(rm: RuleManagers, raw: String): (Int, String) = {
    val data = obj(obj(MiniJson.parse(raw), "payload").getOrElse("data", Map.empty[String, Any]), "data")
    val id0 = data.getOrElse("id", "").toString
    val id = if (id0.isEmpty) java.util.UUID.randomUUID().toString else id0
    val ams = data.get("alertmanagers") match {
      case Some(xs: List[_]) => xs.map(_.toString)
      case _ => Nil
    }
    try {
      val m = rm.createManager(id, ams)
      (201, s"""{"data":{"id":${MiniJson.str(m.id)},"alertmanagers":${MiniJson.arr(m.alertmanagers)}}}""")
    } catch {
      case e: ManagerExistsException => (409, err(e.getMessage))
    }
  }

  private def upsertGroup(rm: RuleManagers, managerId: String, raw: String): (Int, String) = {
    val data = obj(obj(MiniJson.parse(raw), "payload")
      .getOrElse("data", throw new IllegalArgumentException("missing data")), "data")
    val group = parseGroup(data)
    try {
      rm.upsertRuleGroup(managerId, group)
      (201, s"""{"data":${groupJson(group)}}""")
    } catch {
      // the reference maps a missing manager on upsert to 400 (rules_api.go)
      case e: ManagerNotExistsException => (400, err(e.getMessage))
    }
  }

  private def obj(v: Any, what: String): Map[String, Any] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case _ => throw new IllegalArgumentException(s"$what must be a JSON object")
  }

  private def strMap(v: Any): Map[String, String] =
    obj(v, "labels").map { case (k, x) => k -> x.toString }

  private def parseGroup(data: Map[String, Any]): RuleGroup = {
    val name = data.getOrElse("name", "").toString
    val interval = data.get("interval").map(s => Parser.parseDuration(s.toString))
    val rules = data.get("rules") match {
      case Some(xs: List[_]) => xs.map(r => parseRule(obj(r, "rule")))
      case _ => Nil
    }
    RuleGroup(name, interval, rules)
  }

  private def parseRule(r: Map[String, Any]): Rule = Rule(
    record = r.get("record").map(_.toString).filter(_.nonEmpty),
    alert = r.get("alert").map(_.toString).filter(_.nonEmpty),
    expr = r.getOrElse("expr", "").toString,
    forMs = r.get("for").map(s => Parser.parseDuration(s.toString.replace("\"", ""))).getOrElse(0L),
    labels = r.get("labels").map(strMap).getOrElse(Map.empty),
    annotations = r.get("annotations").map(strMap).getOrElse(Map.empty))

  // ---- serialization ----------------------------------------------------

  private def durStr(ms: Long): String = {
    val units = Seq("w" -> 604800000L, "d" -> 86400000L, "h" -> 3600000L,
      "m" -> 60000L, "s" -> 1000L, "ms" -> 1L)
    if (ms == 0) "0s"
    else units.collectFirst { case (u, f) if ms % f == 0 => s"${ms / f}$u" }.get
  }

  private def ruleJson(r: Rule): String = {
    val base = Seq(
      "expr" -> MiniJson.str(r.expr),
      "labels" -> MiniJson.strMap(r.labels),
      "annotations" -> MiniJson.strMap(r.annotations))
    val typed = (r.record, r.alert) match {
      case (Some(rec), _) => Seq("record" -> MiniJson.str(rec))
      case (_, Some(a)) => Seq("alert" -> MiniJson.str(a), "for" -> MiniJson.str(durStr(r.forMs)))
      case _ => Nil
    }
    MiniJson.objOf(typed ++ base)
  }

  private def groupJson(g: RuleGroup): String = MiniJson.objOf(Seq(
    "name" -> MiniJson.str(g.name)) ++
    g.intervalMs.map(i => "interval" -> MiniJson.str(durStr(i))) ++ Seq(
    "rules" -> g.rules.map(ruleJson).mkString("[", ",", "]")))

  /** GET /api/v1/rules — the Prometheus listing shape (vendored
    * web/api/v1): one entry per group with typed rule details. */
  def listing(rm: RuleManagers): String = {
    val groups = for {
      m <- rm.all
      g <- m.groups.values.toSeq.sortBy(_.name)
    } yield {
      val rules = g.rules.map { r =>
        (r.record, r.alert) match {
          case (Some(rec), _) => MiniJson.objOf(Seq(
            "type" -> MiniJson.str("recording"),
            "name" -> MiniJson.str(rec),
            "query" -> MiniJson.str(r.expr),
            "labels" -> MiniJson.strMap(r.labels),
            "health" -> MiniJson.str("ok")))
          case (_, a) => MiniJson.objOf(Seq(
            "type" -> MiniJson.str("alerting"),
            "name" -> MiniJson.str(a.getOrElse("")),
            "query" -> MiniJson.str(r.expr),
            "duration" -> (r.forMs / 1000.0).toString,
            "labels" -> MiniJson.strMap(r.labels),
            "annotations" -> MiniJson.strMap(r.annotations),
            "state" -> MiniJson.str("inactive"),
            "health" -> MiniJson.str("ok"),
            "alerts" -> "[]"))
        }
      }
      MiniJson.objOf(Seq(
        "name" -> MiniJson.str(g.name),
        "file" -> MiniJson.str(m.id),
        "interval" -> (g.intervalMs.getOrElse(60000L) / 1000.0).toString,
        "rules" -> rules.mkString("[", ",", "]")))
    }
    s"""{"status":"success","data":{"groups":${groups.mkString("[", ",", "]")}}}"""
  }

  private def iso(ms: Long): String =
    java.time.Instant.ofEpochMilli(ms).toString

  /** GET /api/v1/alerts — active (pending/firing) alerts from the live
    * `for:` state (vendored web/api/v1 alerts endpoint shape). */
  def alerts(rm: graft.rules.RuleManagers): String = {
    val items = rm.activeAlerts.map { a =>
      MiniJson.objOf(Seq(
        "labels" -> MiniJson.strMap(a.labels + ("alertname" -> a.alertname)),
        "annotations" -> MiniJson.strMap(a.annotations),
        "state" -> MiniJson.str(if (a.firing) "firing" else "pending"),
        "activeAt" -> MiniJson.str(iso(a.sinceMs)),
        "value" -> MiniJson.str(a.value.toString)))
    }
    s"""{"status":"success","data":{"alerts":${items.mkString("[", ",", "]")}}}"""
  }

  /** GET /api/v1/alertmanagers — configured notifier endpoints. */
  def alertmanagers(rm: graft.rules.RuleManagers): String = {
    val active = rm.all.flatMap(_.alertmanagers).distinct.map(u =>
      MiniJson.objOf(Seq("url" -> MiniJson.str(u))))
    s"""{"status":"success","data":{"activeAlertmanagers":${active.mkString("[", ",", "]")},"droppedAlertmanagers":[]}}"""
  }
}
