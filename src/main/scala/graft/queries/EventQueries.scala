package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Events

/** Driver gates for the event-analytics operators (sessionization, ordered
  * funnel, cohort retention) over the `events` table. Every output column
  * is integer-exact (epoch-ms timestamps, counts), so the DuckDB oracles
  * match bit-for-bit with no rounding.
  */
object EventQueries {

  private def ev(s: SparkSession, dir: String) = s.read.parquet(s"$dir/events.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_evt_sessionize" -> ((s, dir) => Events.sessionize(ev(s, dir))),
    "q_evt_funnel" -> ((s, dir) =>
      Events.funnel(ev(s, dir), Seq("view", "click", "purchase"))),
    "q_evt_retention" -> ((s, dir) => Events.retention(ev(s, dir))),
    "q_evt_transitions" -> ((s, dir) => Events.transitions(ev(s, dir)))
  )

  val oracle: Map[String, String] = Map(
    // same window chain: lag-gap flag, running sum session index, group
    "q_evt_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) // 1000 AS t FROM events),
        |l AS (
        |  SELECT *, CASE WHEN t - lag(t) OVER
        |      (PARTITION BY user_id ORDER BY t, event_id) > 1800000
        |    THEN 1 ELSE 0 END AS ns
        |  FROM e),
        |s AS (
        |  SELECT *, 1 + CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM l)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(t) AS start_ms, max(t) AS end_ms, max(t) - min(t) AS duration_ms
        |FROM s GROUP BY 1, 2""".stripMargin,

    // strictly-ordered first-occurrence chain view -> click -> purchase
    "q_evt_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) // 1000 AS t FROM events),
        |f1 AS (SELECT user_id, min(t) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |f2 AS (SELECT e.user_id, min(e.t) AS t2 FROM e JOIN f1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.t > f1.t1 GROUP BY 1),
        |f3 AS (SELECT e.user_id, min(e.t) AS t3 FROM e JOIN f2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.t > f2.t2 GROUP BY 1)
        |SELECT f1.user_id,
        |  1 + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
        |    + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS reached,
        |  t1, coalesce(t2, -1) AS t2, coalesce(t3, -1) AS t3
        |FROM f1 LEFT JOIN f2 USING (user_id) LEFT JOIN f3 USING (user_id)""".stripMargin,

    // first-order event-type transition counts along each user timeline
    "q_evt_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) // 1000 AS t
        |  FROM events),
        |l AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id)
        |      AS to_type
        |  FROM e)
        |SELECT from_type, to_type, count(*) AS n
        |FROM l WHERE to_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    "q_evt_retention" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, (epoch_us(ts) // 1000) // 86400000 AS day
        |  FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1)
        |SELECT cohort_day, day - cohort_day AS offset_days, count(*) AS n_users
        |FROM d JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin
  )
}
