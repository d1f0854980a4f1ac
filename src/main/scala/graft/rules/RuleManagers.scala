package graft.rules

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.promql.Parser

/** Rule-manager registry with the reference's CRUD semantics
  * (src/internal/api/rules_api.go:73-74 + src/pkg/rulesclient):
  * managers are created with an id (+ optional alertmanager URLs), each
  * holds named rule GROUPS that are upserted atomically, and deletion
  * removes the whole manager. Validation mirrors rulesclient:
  * group name required, at least one rule, interval >= 1m when given;
  * a rule is exactly one of record/alert, with a parseable expr and `for`.
  *
  * The reference persists each manager as a rule file and reloads a
  * vendored Prometheus rule manager; here the registry is the source of
  * truth and [[evaluationTick]] runs one engine evaluation per rule —
  * the caller schedules ticks (cron / streaming trigger) and appends the
  * returned recording points to the store.
  */
object RuleManagers {

  final case class Rule(
      record: Option[String],
      alert: Option[String],
      expr: String,
      forMs: Long = 0L,
      labels: Map[String, String] = Map.empty,
      annotations: Map[String, String] = Map.empty) {
    def validate(): Unit = {
      if (record.isEmpty == alert.isEmpty)
        throw new IllegalArgumentException("rule must have exactly one of record/alert")
      Parser.parse(expr) // throws ParseException on bad PromQL
      if (record.isDefined && forMs != 0)
        throw new IllegalArgumentException("'for' is only valid on alerting rules")
    }
  }

  final case class RuleGroup(name: String, intervalMs: Option[Long], rules: Seq[Rule]) {
    def validate(): Unit = {
      if (name.isEmpty) throw new IllegalArgumentException("name is required")
      if (intervalMs.exists(_ < 60000L))
        throw new IllegalArgumentException("interval is too short")
      if (rules.isEmpty) throw new IllegalArgumentException("at least one rule is required")
      rules.foreach(_.validate())
    }
  }

  final class ManagerExistsException(id: String) extends RuntimeException(
    s"Could not create ruleManager, a ruleManager with name $id already exists")
  final class ManagerNotExistsException(id: String) extends RuntimeException(
    s"Could not delete ruleManager, a ruleManager with name $id does not exist")
}

final class RuleManagers {
  import RuleManagers._

  final class Manager(val id: String, val alertmanagers: Seq[String]) {
    val groups = new TrieMap[String, RuleGroup]()
    /** Per alerting rule (group/alert) -> alert state between ticks. */
    private[rules] val alertState = new TrieMap[(String, String), DataFrame]()
    /** Timestamp of the last evaluation tick (0 before the first). */
    @volatile private[rules] var lastTickMs: Long = 0L
  }

  /** One active (pending or firing) alert series, for /api/v1/alerts. */
  final case class ActiveAlert(alertname: String, labels: Map[String, String],
                               annotations: Map[String, String],
                               sinceMs: Long, value: Double, firing: Boolean)

  private val managers = new TrieMap[String, Manager]()

  def createManager(id: String, alertmanagers: Seq[String]): Manager = {
    val m = new Manager(id, alertmanagers)
    managers.putIfAbsent(id, m) match {
      case Some(_) => throw new ManagerExistsException(id)
      case None => m
    }
  }

  def deleteManager(id: String): Unit =
    if (managers.remove(id).isEmpty) throw new ManagerNotExistsException(id)

  def upsertRuleGroup(managerId: String, group: RuleGroup): Unit = {
    group.validate()
    val m = managers.getOrElse(managerId,
      throw new ManagerNotExistsException(managerId))
    m.groups.put(group.name, group)
  }

  def get(id: String): Option[Manager] = managers.get(id)
  def all: Seq[Manager] = managers.values.toSeq.sortBy(_.id)

  /** Live ACTIVE alerts from the per-rule `for:` state of the last tick —
    * the data behind /api/v1/alerts (vendored web/api/v1 alerts endpoint).
    * State relations are alert-sized, so the collect is result-sized. */
  def activeAlerts: Seq[ActiveAlert] =
    for {
      m <- all
      ((gName, alert), state) <- m.alertState.toSeq.sortBy(_._1)
      rule <- m.groups.get(gName).toSeq.flatMap(_.rules)
        .find(_.alert.contains(alert)).toSeq
      row <- state.collect().toSeq
    } yield {
      val labels = Option(row.getAs[Map[String, String]]("labels")).getOrElse(Map.empty)
      val since = row.getAs[Long]("since")
      ActiveAlert(alert, labels ++ rule.labels, rule.annotations, since,
        row.getAs[Double]("value"),
        firing = m.lastTickMs - since >= rule.forMs)
    }

  /** One evaluation tick over every group of every manager: returns the
    * recording-rule output (appendable points relation, empty when no
    * recording rules exist) and posts firing alerts to each manager's
    * alertmanagers via `notifier`. */
  def evaluationTick(spark: SparkSession, points: DataFrame, tsMs: Long,
                     notifier: Notifier = Notifier.noop,
                     lookbackMs: Long = 300000L): Option[DataFrame] = {
    var recorded: Option[DataFrame] = None
    for (m <- all) m.lastTickMs = tsMs
    for (m <- all; g <- m.groups.values.toSeq.sortBy(_.name); r <- g.rules) {
      (r.record, r.alert) match {
        case (Some(rec), _) =>
          val out = Rules.recordingTick(spark, points,
            Rules.RecordingRule(rec, r.expr, r.labels), tsMs, lookbackMs)
          recorded = recorded.map(_.unionByName(out)).orElse(Some(out))
        case (_, Some(alert)) =>
          val key = (g.name, alert)
          val prev = m.alertState.getOrElse(key, Rules.emptyState(spark))
          val (state, firing) = Rules.alertingTick(spark, points,
            Rules.AlertingRule(alert, r.expr, r.forMs, r.labels), prev, tsMs, lookbackMs)
          // state persists between ticks; localCheckpoint cuts the lineage
          // so state does not re-evaluate every past tick's query
          val pinned = state.localCheckpoint(true)
          m.alertState.put(key, pinned)
          val alerts = firing.collect().map { row =>
            val labels = Option(row.getAs[Map[String, String]]("labels")).getOrElse(Map.empty)
            Notifier.Alert(
              labels = labels ++ r.labels + ("alertname" -> alert),
              annotations = r.annotations,
              startsAtMs = row.getAs[Long]("since"))
          }.toSeq
          if (alerts.nonEmpty) notifier.send(m.alertmanagers, alerts)
        case _ => ()
      }
    }
    recorded
  }
}
