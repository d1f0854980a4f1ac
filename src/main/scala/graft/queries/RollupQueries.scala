package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Rollups
import graft.rules.Rules

/** Gate queries for the ingest-side streaming operators (SURVEY §2.8),
  * run through the batch-equivalent path (the same column logic drives
  * the readStream variant) over `events` viewed as timer envelopes:
  * source_id = event_type, start = ts, stop = ts + value milliseconds.
  */
object RollupQueries {

  private val DAY = QueryKit.DAY

  /** events → timer-envelope relation (timestamp/start/stop in ns). */
  private def timers(s: SparkSession, dir: String): DataFrame = {
    val ev = s.read.parquet(s"$dir/events.parquet")
    val tsNs = graft.model.Points.eventTsNanos(ev)
    ev.select(
      col("event_type").as("source_id"),
      tsNs.as("timestamp"),
      tsNs.as("start"),
      (tsNs + (col("value") * 1000000L).cast("long")).as("stop"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rollup_counter" -> ((s, dir) =>
      Rollups.counterRollup(timers(s, dir), DAY)),
    "q_rollup_histogram" -> ((s, dir) =>
      Rollups.histogramRollup(timers(s, dir), DAY)
        .withColumn("value", round(col("value"), 6))),
    // histogram_quantile over le-bucketed series constructed from events:
    // per UTC day, cumulative counts of click values <= {50,100,150,+Inf}
    // become click_bucket{le=...} points at the day boundary; the engine
    // then evaluates the PromQL through the full pipeline
    "q_fn_histogram_quantile" -> ((s, dir) => {
      val ev = graft.model.Points.eventsPoints(s, dir).where(col("name") === "click")
      val byDay = ev.groupBy(((col("t") / DAY).cast("long") * DAY + DAY).as("t"))
        .agg(
          sum(when(col("value") <= 50, 1L).otherwise(0L)).as("c50"),
          sum(when(col("value") <= 100, 1L).otherwise(0L)).as("c100"),
          sum(when(col("value") <= 150, 1L).otherwise(0L)).as("c150"),
          count(lit(1)).as("cinf"))
      // one pass: explode the four bucket rows out of each day row instead
      // of unioning four re-aggregations of the same groupBy
      val bucketStructs = array(
        Seq(("50.0", "c50"), ("100.0", "c100"), ("150.0", "c150"), ("+Inf", "cinf")).map {
          case (le, c) => struct(lit(le).as("le"), col(c).cast("double").as("v"))
        }: _*)
      val buckets = byDay
        .select(col("t"), explode(bucketStructs).as("b"))
        .select(lit("click_bucket").as("name"),
          map(lit("le"), col("b.le")).as("labels"),
          col("t"), col("b.v").as("value"))
      // the bucket relation is tiny (days x 4 rows) but sits on a full
      // events scan + day agg — materialize it once so the engine's passes
      // don't recompute the subtree
      val pts = graft.model.Points.withSig(buckets).cache()
      val out = graft.engine.Engine.rangeQuery(s, pts,
        "histogram_quantile(0.9, click_bucket)",
        QueryKit.START, QueryKit.T_END, DAY, lookbackMs = 1L)
      out.select(col("t"), round(col("value"), 6).as("value"))
    }),
    // recording-rule BACKFILL: the whole historical grid as ONE range
    // query (promtool create-blocks-from rules), renamed+labeled like
    // the live tick — 5 daily steps of the same rule q_rule_recording
    // ticks once
    "q_rule_backfill" -> ((s, dir) => {
      val out = Rules.backfill(s, graft.model.Points.eventsPoints(s, dir),
        Rules.RecordingRule("par:click:sum", "sum by (par) (click)",
          Map("rule_group" -> "g1")),
        QueryKit.T0 + 10 * DAY, QueryKit.T0 + 14 * DAY, DAY, lookbackMs = DAY)
      out.select(col("name"), col("labels").getItem("par").as("par"),
        col("labels").getItem("rule_group").as("rule_group"),
        col("t"), round(col("value"), 6).as("value"))
    }),

    "q_rule_recording" -> ((s, dir) => {
      val out = Rules.recordingTick(s, graft.model.Points.eventsPoints(s, dir),
        Rules.RecordingRule("par:click:sum", "sum by (par) (click)",
          Map("rule_group" -> "g1")),
        QueryKit.T0 + 10 * DAY, lookbackMs = DAY)
      out.select(col("name"), col("labels").getItem("par").as("par"),
        col("labels").getItem("rule_group").as("rule_group"),
        col("t"), round(col("value"), 6).as("value"))
    })
  )

  private val bucketSelects = Rollups.DefaultBuckets.zipWithIndex.map { case (b, i) =>
    s"SELECT w AS window_start, sid AS source_id, '$b' AS le, round(CAST(le_$i AS DOUBLE), 6) AS value, 'bucket' AS kind FROM agg"
  }.mkString("\nUNION ALL ")
  private val bucketAggs = Rollups.DefaultBuckets.zipWithIndex.map { case (b, i) =>
    s"sum(CASE WHEN dur <= $b THEN 1 ELSE 0 END) AS le_$i"
  }.mkString(", ")

  val oracle: Map[String, String] = Map(
    "q_rollup_counter" ->
      s"""SELECT (epoch_us(ts) // 1000 // $DAY) * $DAY AS window_start,
         |       event_type AS source_id, count(*) AS value
         |FROM events GROUP BY 1, 2""".stripMargin,

    "q_rollup_histogram" ->
      s"""WITH base AS (
         |  SELECT (epoch_us(ts) // 1000 // $DAY) * $DAY AS w,
         |         event_type AS sid, value / 1000.0 AS dur
         |  FROM events),
         |agg AS (
         |  SELECT w, sid, $bucketAggs, count(*) AS cnt, sum(dur) AS dsum
         |  FROM base GROUP BY 1, 2)
         |$bucketSelects
         |UNION ALL SELECT w, sid, '+Inf', CAST(cnt AS DOUBLE), 'bucket' FROM agg
         |UNION ALL SELECT w, sid, CAST(NULL AS VARCHAR), CAST(cnt AS DOUBLE), 'count' FROM agg
         |UNION ALL SELECT w, sid, CAST(NULL AS VARCHAR), round(dsum, 6), 'sum' FROM agg""".stripMargin,

    "q_fn_histogram_quantile" ->
      s"""WITH base AS (
         |  SELECT (epoch_us(ts) // 1000 // $DAY) * $DAY + $DAY AS t, value
         |  FROM events WHERE event_type = 'click'),
         |agg AS (
         |  SELECT t,
         |    sum(CASE WHEN value <= 50 THEN 1 ELSE 0 END) AS c50,
         |    sum(CASE WHEN value <= 100 THEN 1 ELSE 0 END) AS c100,
         |    sum(CASE WHEN value <= 150 THEN 1 ELSE 0 END) AS c150,
         |    count(*) AS cinf
         |  FROM base GROUP BY t),
         |r AS (SELECT *, 0.9 * cinf AS rank FROM agg WHERE t <= ${QueryKit.T_END})
         |SELECT t, round(CASE
         |    WHEN rank <= c50 THEN (50 - 0) * (rank / c50)
         |    WHEN rank <= c100 THEN 50 + (100 - 50) * ((rank - c50) / (c100 - c50))
         |    WHEN rank <= c150 THEN 100 + (150 - 100) * ((rank - c100) / (c150 - c100))
         |    ELSE 150 END, 6) AS value
         |FROM r WHERE cinf > 0""".stripMargin,

    "q_rule_backfill" -> {
      QueryKit.withClauses(QueryKit.pSql,
        QueryKit.stepsSql(QueryKit.T0 + 10 * DAY, QueryKit.T0 + 14 * DAY, DAY),
        QueryKit.instSql(DAY, "p.name = 'click'")) +
        s"""
           |SELECT 'par:click:sum' AS name, par, 'g1' AS rule_group,
           |       step AS t, round(sum(value), 6) AS value
           |FROM inst GROUP BY par, step""".stripMargin
    },

    "q_rule_recording" -> {
      val at = QueryKit.T0 + 10 * DAY
      QueryKit.withClauses(QueryKit.pSql,
        QueryKit.stepsSql(at, at, DAY),
        QueryKit.instSql(DAY, "p.name = 'click'")) +
        s"""
           |SELECT 'par:click:sum' AS name, par, 'g1' AS rule_group,
           |       round(sum(value), 6) AS value, step AS t
           |FROM inst GROUP BY par, step""".stripMargin
    }
  )
}
