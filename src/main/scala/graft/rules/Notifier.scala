package graft.rules

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Instant
import java.time.format.DateTimeFormatter

import graft.api.MiniJson

/** Alertmanager delivery path (reference: the vendored notifier manager
  * wired in src/internal/rules/prom_manager.go:44-56, posting evaluated
  * alerts to each configured alertmanager's `/api/v2/alerts`).
  *
  * Driver-side and result-sized by construction: only FIRING alert rows
  * (already collected by the rules tick) are serialized and posted.
  * Delivery is best-effort per alertmanager — a dead receiver never fails
  * the evaluation tick (the reference's notifier queues and drops the
  * same way).
  */
trait Notifier {
  def send(alertmanagerUrls: Seq[String], alerts: Seq[Notifier.Alert]): Unit
}

object Notifier {

  final case class Alert(
      labels: Map[String, String],
      annotations: Map[String, String] = Map.empty,
      startsAtMs: Long,
      endsAtMs: Option[Long] = None)

  /** RFC3339 with millisecond precision, UTC — the alertmanager wire
    * format for startsAt/endsAt. */
  private[rules] def rfc3339(ms: Long): String =
    DateTimeFormatter.ISO_INSTANT.format(Instant.ofEpochMilli(ms))

  private[rules] def toJson(alerts: Seq[Alert]): String =
    alerts.map { a =>
      val fields = Seq(
        "labels" -> MiniJson.strMap(a.labels),
        "annotations" -> MiniJson.strMap(a.annotations),
        "startsAt" -> MiniJson.str(rfc3339(a.startsAtMs))) ++
        a.endsAtMs.map(e => "endsAt" -> MiniJson.str(rfc3339(e)))
      MiniJson.objOf(fields)
    }.mkString("[", ",", "]")

  val noop: Notifier = (_, _) => ()

  /** HTTP notifier: POST /api/v2/alerts on every alertmanager URL. */
  final class Http(timeoutMs: Long = 5000L) extends Notifier {
    private val client = HttpClient.newHttpClient()

    override def send(alertmanagerUrls: Seq[String], alerts: Seq[Alert]): Unit = {
      if (alerts.isEmpty) return
      val body = toJson(alerts)
      alertmanagerUrls.foreach { base =>
        try {
          val req = HttpRequest.newBuilder()
            .uri(URI.create(base.stripSuffix("/") + "/api/v2/alerts"))
            .timeout(java.time.Duration.ofMillis(timeoutMs))
            .header("Content-Type", "application/json")
            .POST(HttpRequest.BodyPublishers.ofString(body))
            .build()
          client.send(req, HttpResponse.BodyHandlers.discarding())
        } catch {
          case _: Exception => () // best-effort, like the reference's queue-and-drop
        }
      }
    }
  }
}
