package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.rules.Rules
import graft.sources.Scrape
import graft.streaming.Nozzle

/** Driver gates for the ingest-side operators that previously had only
  * local specs: nozzle envelope→point conversion (sanitization, NaN/Inf
  * rejection, gauge fan-out), the Prometheus text-exposition parser, and
  * the alerting `for:` state machine. Each builds its input
  * deterministically from the `events` table so a DuckDB oracle can
  * reproduce the expected output exactly.
  */
object IngestQueries {

  private val DAY = QueryKit.DAY
  private val T0 = QueryKit.T0

  /** events → envelope relation: even users emit a gauge envelope with two
    * metrics (one name needs dot→underscore sanitization, one space→
    * underscore; the second value turns +Inf every 97th user to exercise
    * rejection), odd users emit a counter with a dash-bearing name. A tag
    * key starting with a digit exercises label-key sanitization. */
  private def envelopes(s: SparkSession, dir: String): DataFrame = {
    val ev = s.read.parquet(s"$dir/events.parquet")
    val tsNs = graft.model.Points.eventTsNanos(ev)
    ev.select(
      col("event_type").as("source_id"),
      tsNs.as("timestamp"),
      map(lit("user"), col("user_id").cast("string"), lit("1bad"), lit("x")).as("tags"),
      when(pmod(col("user_id"), lit(2)) === 0, lit("gauge")).otherwise(lit("counter")).as("kind"),
      map(
        lit("cpu.pct"), col("value"),
        lit("mem used"), when(pmod(col("user_id"), lit(97)) === 0,
          lit(Double.PositiveInfinity)).otherwise(col("value") * 2)).as("gauge"),
      concat(col("event_type"), lit("-total")).as("name"),
      col("value").as("total"),
      lit(null).cast("long").as("start"),
      lit(null).cast("long").as("stop"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_nozzle_points" -> ((s, dir) => {
      val pts = Nozzle.toPoints(envelopes(s, dir))
      pts.select(col("name"),
        col("labels").getItem("user").as("user"),
        col("labels").getItem("_bad").as("bad"),
        col("labels").getItem("source_id").as("source_id"),
        col("t"), col("value"))
    }),

    "q_scrape_parse" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val tMs = graft.model.Points.eventTsMillis(ev)
      val rows = ev.where(col("user_id") < 5)
        .select(col("event_type"), col("user_id"), tMs.as("t"), col("value"))
        .orderBy(col("t"), col("user_id"), col("event_type"), col("value"))
        .collect()
      // text exposition: escaped quote in a label value, +Inf every 7th
      // user (rejected at the sanitize step like the ingest path)
      val body = rows.map { r =>
        val uid = r.getAs[Long]("user_id")
        val v =
          if (uid % 7 == 0) "+Inf"
          else r.getAs[Double]("value").toString
        s"""ev_total{user="$uid",src="${r.getAs[String]("event_type")}",esc="q\\"x"} $v ${r.getAs[Long]("t")}"""
      }.mkString("\n# HELP ev_total synthetic\n", "\n", "\n")
      val pts = Scrape.scrapeTargets(s, Seq("target-a"), _ => body, T0)
      pts.select(col("name"),
        col("labels").getItem("user").as("user"),
        col("labels").getItem("src").as("src"),
        col("labels").getItem("esc").as("esc"),
        col("labels").getItem("instance").as("instance"),
        col("t"), col("value"))
    }),

    // §3 OTLP/HTTP ingest: an ExportMetricsServiceRequest built from the
    // events table (one resource per event_type; gauge + monotonic sum +
    // explicit-bounds histogram + summary per resource, plus a delta sum
    // and an exponential histogram that MUST be rejected) goes through
    // the real wire codec (encode → decode) and the Prometheus
    // translation rules; the oracle reproduces every translated sample.
    "q_otlp_points" -> ((s, dir) => {
      val MS = 1000000L // ns per ms
      val ev = s.read.parquet(s"$dir/events.parquet")
      val tMs = graft.model.Points.eventTsMillis(ev)
      val rows = ev.where(col("user_id") < 8)
        .select(col("event_type"), col("user_id"), tMs.as("t"), col("value"))
        .orderBy(col("t"), col("user_id"), col("event_type"), col("value"))
        .collect()
      val req = rows.groupBy(_.getAs[String]("event_type")).toSeq.sortBy(_._1)
        .map { case (et, rs) =>
          def num(f: org.apache.spark.sql.Row => Double) = rs.toSeq.map { r =>
            graft.api.Otlp.NumberPoint(
              Seq("user.id" -> r.getAs[Long]("user_id").toString),
              r.getAs[Long]("t") * MS, f(r))
          }
          val hist = rs.toSeq.map { r =>
            val uid = r.getAs[Long]("user_id")
            graft.api.Otlp.HistogramPoint(
              Seq("user.id" -> uid.toString), r.getAs[Long]("t") * MS,
              count = uid % 3 + uid % 5 + uid % 7,
              sum = Some(r.getAs[Double]("value")),
              bucketCounts = Seq(uid % 3, uid % 5, uid % 7),
              bounds = Seq(0.5, 2.5))
          }
          val summ = rs.toSeq.map { r =>
            val uid = r.getAs[Long]("user_id")
            graft.api.Otlp.SummaryPoint(
              Seq("user.id" -> uid.toString), r.getAs[Long]("t") * MS,
              count = uid + 1, sum = r.getAs[Double]("value"),
              quantiles = Seq((0.5, r.getAs[Double]("value")),
                (0.99, r.getAs[Double]("value") * 3)))
          }
          graft.api.Otlp.ResourceMetrics(
            Seq("service.name" -> et, "service.namespace" -> "prod",
              "service.instance.id" -> "inst-0", "host.name" -> s"h-$et"),
            Seq(
              graft.api.Otlp.Metric("sys.cpu.load", "1",
                graft.api.Otlp.Gauge(num(_.getAs[Double]("value")))),
              graft.api.Otlp.Metric("http.requests", "",
                graft.api.Otlp.Sum(num(_.getAs[Double]("value") * 2))),
              graft.api.Otlp.Metric("rpc.latency", "s",
                graft.api.Otlp.Histogram(hist)),
              graft.api.Otlp.Metric("rpc.size", "By",
                graft.api.Otlp.Summary(summ)),
              graft.api.Otlp.Metric("dropped.metric", "",
                graft.api.Otlp.Sum(num(_ => 1.0),
                  graft.api.Otlp.TemporalityDelta)),
              graft.api.Otlp.Metric("dropped.exp", "",
                graft.api.Otlp.ExpHistogram())))
        }
      val tr = graft.api.Otlp.toRows(graft.api.Otlp.decode(graft.api.Otlp.encode(req)))
      require(tr.errors.length == 2 * req.length, "expected per-resource rejections")
      import s.implicits._
      tr.rows.map(r => (r.name,
          r.labels.getOrElse("job", null), r.labels.getOrElse("instance", null),
          r.labels.get("user_id").orNull, r.labels.get("le").orNull,
          r.labels.get("quantile").orNull, r.labels.get("host_name").orNull,
          r.t, r.value))
        .toDF("name", "job", "instance", "user", "le", "quantile",
          "host_name", "t", "value")
    }),

    "q_alert_for_state" -> ((s, dir) => {
      // the threshold lives in the PromQL expression (comparison filter),
      // exactly like a real alerting rule; `for: 2d` must hold across
      // consecutive daily ticks before the alert fires. The 5 daily ticks
      // evaluate as ONE grid plan (Rules.alertingTickGrid — ticks-as-data):
      // one range-query pass over the points + one window fold replaces 5
      // sequential instant-query analyses and per-tick state checkpoints;
      // AlertGridSpec pins row-for-row equivalence with the per-tick fold
      val pts = graft.model.Points.eventsPoints(s, dir)
      val rule = Rules.AlertingRule("HighClick",
        "sum by (user) (click) > 10", forMs = 2 * DAY)
      val lastTick = T0 + 14 * DAY
      val (_, firing) = Rules.alertingTickGrid(s, pts, rule,
        Rules.emptyState(s), T0 + 10 * DAY, lastTick, DAY, lookbackMs = DAY)
      firing.select(col("labels").getItem("user").as("user"),
        round(col("value"), 6).as("value"), col("since"), lit(lastTick).as("t"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_nozzle_points" ->
      """WITH base AS (
        |  SELECT event_type, user_id, epoch_us(ts) // 1000 AS t, value FROM events),
        |pts AS (
        |  SELECT 'cpu_pct' AS name, user_id, event_type, t, value
        |  FROM base WHERE user_id % 2 = 0
        |  UNION ALL
        |  SELECT 'mem_used', user_id, event_type, t, value * 2
        |  FROM base WHERE user_id % 2 = 0 AND user_id % 97 <> 0
        |  UNION ALL
        |  SELECT replace(event_type, '-', '_') || '_total', user_id, event_type, t, value
        |  FROM base WHERE user_id % 2 = 1)
        |SELECT name, CAST(user_id AS VARCHAR) AS "user", 'x' AS bad,
        |       event_type AS source_id, t, value
        |FROM pts""".stripMargin,

    "q_scrape_parse" ->
      """SELECT 'ev_total' AS name, CAST(user_id AS VARCHAR) AS "user",
        |       event_type AS src, 'q"x' AS esc, 'target-a' AS instance,
        |       epoch_us(ts) // 1000 AS t, value
        |FROM events WHERE user_id < 5 AND user_id % 7 <> 0""".stripMargin,

    "q_otlp_points" ->
      """WITH base AS (
        |  SELECT event_type AS et, user_id AS uid,
        |         epoch_us(ts) // 1000 AS t, value
        |  FROM events WHERE user_id < 8),
        |out AS (
        |  SELECT 'sys_cpu_load_ratio' AS name, et, uid,
        |         NULL AS le, NULL AS quantile, NULL AS host_name, t, value AS v
        |  FROM base
        |  UNION ALL SELECT 'http_requests_total', et, uid, NULL, NULL, NULL, t, value * 2 FROM base
        |  UNION ALL SELECT 'rpc_latency_seconds_sum', et, uid, NULL, NULL, NULL, t, value FROM base
        |  UNION ALL SELECT 'rpc_latency_seconds_count', et, uid, NULL, NULL, NULL, t,
        |            CAST(uid % 3 + uid % 5 + uid % 7 AS DOUBLE) FROM base
        |  UNION ALL SELECT 'rpc_latency_seconds_bucket', et, uid, '0.5', NULL, NULL, t,
        |            CAST(uid % 3 AS DOUBLE) FROM base
        |  UNION ALL SELECT 'rpc_latency_seconds_bucket', et, uid, '2.5', NULL, NULL, t,
        |            CAST(uid % 3 + uid % 5 AS DOUBLE) FROM base
        |  UNION ALL SELECT 'rpc_latency_seconds_bucket', et, uid, '+Inf', NULL, NULL, t,
        |            CAST(uid % 3 + uid % 5 + uid % 7 AS DOUBLE) FROM base
        |  UNION ALL SELECT 'rpc_size_bytes_sum', et, uid, NULL, NULL, NULL, t, value FROM base
        |  UNION ALL SELECT 'rpc_size_bytes_count', et, uid, NULL, NULL, NULL, t,
        |            CAST(uid + 1 AS DOUBLE) FROM base
        |  UNION ALL SELECT 'rpc_size_bytes', et, uid, NULL, '0.5', NULL, t, value FROM base
        |  UNION ALL SELECT 'rpc_size_bytes', et, uid, NULL, '0.99', NULL, t, value * 3 FROM base
        |  UNION ALL SELECT 'target_info', et, NULL, NULL, NULL, 'h-' || et, max(t), 1.0
        |            FROM base GROUP BY et)
        |SELECT name, 'prod/' || et AS job, 'inst-0' AS instance,
        |       CAST(uid AS VARCHAR) AS "user", le, quantile, host_name, t,
        |       CAST(v AS DOUBLE) AS value
        |FROM out""".stripMargin,

    "q_alert_for_state" -> {
      val lastTick = T0 + 14 * DAY
      QueryKit.withClauses(QueryKit.pSql,
        QueryKit.stepsSql(T0 + 10 * DAY, lastTick, DAY),
        QueryKit.instSql(DAY, "p.name = 'click'")) +
        s"""
           |, s AS (
           |  SELECT "user", step, sum(value) AS v FROM inst GROUP BY 1, 2),
           |c AS (
           |  SELECT *, step // $DAY - row_number() OVER (PARTITION BY "user" ORDER BY step) AS grp
           |  FROM s WHERE v > 10),
           |r AS (SELECT "user", grp, min(step) AS since FROM c GROUP BY 1, 2)
           |SELECT c."user", round(c.v, 6) AS value, r.since, CAST($lastTick AS BIGINT) AS t
           |FROM c JOIN r USING ("user", grp)
           |WHERE c.step = $lastTick AND $lastTick - r.since >= ${2 * DAY}""".stripMargin
    }
  )
}
