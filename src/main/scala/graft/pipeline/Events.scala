package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` relation (event_id, ts,
  * user_id, event_type, value): gap-based sessionization, ordered funnel
  * analysis, and daily cohort retention.
  *
  * These are the classic product-analytics operators a metrics platform's
  * event side feeds (the reference's envelope stream carries the same
  * per-user timer/event shape through its rollup path —
  * reference: src/pkg/nozzle/rollup.go — but stops at counter/histogram
  * rollups; sessions/funnels/retention are the downstream questions users
  * answer OVER that data, so the engine provides them first-class).
  *
  * Scale notes (100 TB): every operator here shuffles ONCE on `user_id`
  * (hash partition) and does all per-user work inside the partition —
  * sessionization is a sort + running sum within the user's slice, the
  * funnel is per-step min-aggregations re-joined on the same user key
  * (co-partitioned, AQE broadcasts the shrinking step frames), and
  * retention is two aggregations over (user, day). Nothing is quadratic,
  * nothing collects to the driver, and the user-key shuffle is the same
  * partitioning a bucketed events table would make free.
  */
object Events {

  /** 30 minutes — the conventional inactivity gap. */
  val DefaultGapMs: Long = 30 * 60 * 1000L

  private def withT(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_id"), col("event_type"),
      graft.model.Points.eventTsMillis(events).as("t"))

  /** Gap-based sessionization: a new session starts when the gap from the
    * user's previous event exceeds `gapMs`. One row per (user, session)
    * with event count and start/end/duration. Ordering ties break on
    * event_id (the testdata has none; determinism anyway).
    */
  def sessionize(events: DataFrame, gapMs: Long = DefaultGapMs): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("t", "event_id")
    withT(events)
      .withColumn("ns",
        when(col("t") - lag("t", 1).over(w) > gapMs, 1).otherwise(0))
      .withColumn("session_idx",
        sum("ns").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) + 1)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min("t").as("start_ms"), max("t").as("end_ms"),
        (max("t") - min("t")).as("duration_ms"))
  }

  /** Strictly-ordered funnel: step k counts only if its FIRST qualifying
    * occurrence is after the user's step-(k-1) time. Returns one row per
    * user who performed step 1: the furthest step reached and each step's
    * first-occurrence time (−1 where never reached, so the relation is
    * null-free for hashing).
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = withT(events)
    // fold: frame k has (user_id, t1..tk) for users who reached step k
    val first = base.where(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("t").as("t1"))
    val frames = steps.zipWithIndex.drop(1).scanLeft(first) {
      case (prev, (step, i)) =>
        base.where(col("event_type") === step)
          .join(prev, "user_id")
          .where(col("t") > col(s"t$i"))
          .groupBy(col("user_id") +: (1 to i).map(k => col(s"t$k")): _*)
          .agg(min("t").as(s"t${i + 1}"))
    }
    val joined = frames.tail.foldLeft(first) { (acc, f) =>
      acc.join(f.select("user_id", s"t${f.columns.length - 1}"), Seq("user_id"), "left")
    }
    val reached = (2 to steps.length)
      .map(k => when(col(s"t$k").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1): Column)(_ + _)
    val tCols = (1 to steps.length)
      .map(k => coalesce(col(s"t$k"), lit(-1L)).as(s"t$k"))
    joined.select((col("user_id") +: reached.as("reached") +: tCols): _*)
  }

  /** Event-type transition matrix (first-order path analysis): counts of
    * consecutive (from → to) event pairs per user timeline — the Markov
    * view funnels summarize. Same single user-keyed shuffle as
    * [[sessionize]]; the matrix itself is |types|²-sized. */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("t", "event_id")
    withT(events)
      .withColumn("next", lead("event_type", 1).over(w))
      .where(col("next").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Open per-user session state for the streaming sessionizer. */
  final case class OpenSession(start: Long, end: Long, n: Long)

  /** Streaming sessionization with CUSTOM state (`flatMapGroupsWithState`
    * + event-time timeout): emits each session exactly once, WHEN IT
    * CLOSES — i.e. when the event-time watermark passes the session's
    * last event + gap. The built-in `session_window` aggregation covers
    * the windowed-aggregate form; this state formulation is for the
    * shapes it can't express (eager emission on close, custom session
    * payloads, side effects per closed session).
    *
    * Input: a STREAMING frame with `user_id: Long` and `t: Long` (epoch
    * ms). Out-of-order events are handled within the configured
    * `latenessMs` watermark delay: late rows inside the gap extend the
    * open session backwards/forwards, while a late row more than the gap
    * BEFORE the open session closes immediately as its own session (the
    * batch semantics for that timeline); rows older than the watermark
    * are dropped by Spark upstream (with the default delay of 0, only
    * within-batch disorder is absorbed — raise it to tolerate
    * cross-batch lateness, at the cost of sessions closing later).
    *
    * Output: (user_id, start_ms, end_ms, n_events), append-mode.
    */
  def sessionizeStream(events: DataFrame, gapMs: Long = DefaultGapMs,
                       latenessMs: Long = 0L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.select(col("user_id").cast("long"), col("t").cast("long"),
        timestamp_millis(col("t")).as("ts2"))
      .withWatermark("ts2", s"$latenessMs milliseconds")
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[OpenSession]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator((user, s.start, s.end, s.n))
          } else {
            // interval merge over (open-state interval + batch events),
            // sorted by start: adjacent intervals with gap <= gapMs fuse.
            // This matches batch sessionize for every arrival order the
            // watermark admits — in particular a late event more than
            // gapMs BEFORE the open session's start becomes its own
            // session instead of stretching the open one backwards (the
            // old merge branch only split on t - end > gapMs).
            val ivs = (state.getOption.map(s => (s.start, s.end, s.n)).toList ++
              rows.map(r => (r._2, r._2, 1L))).sortBy(v => (v._1, v._2))
            val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
            ivs.foreach { case (s0, e0, n0) =>
              merged.lastOption match {
                case Some((s1, e1, n1)) if s0 - e1 <= gapMs =>
                  merged(merged.length - 1) = (s1, math.max(e1, e0), n1 + n0)
                case _ => merged += ((s0, e0, n0))
              }
            }
            // the latest interval stays open (more events may extend it);
            // every earlier one is already further than a gap behind it,
            // hence closed — emitted now, exactly once
            val open = merged.last
            state.update(OpenSession(open._1, open._2, open._3))
            state.setTimeoutTimestamp(open._2 + gapMs)
            merged.dropRight(1).iterator
              .map { case (s0, e0, n0) => (user, s0, e0, n0) }
          }
        })
      .toDF("user_id", "start_ms", "end_ms", "n_events")
  }

  /** Daily cohort retention: cohort = epoch-day of the user's first event;
    * one row per (cohort_day, offset_days) with the count of distinct
    * users from that cohort active that day.
    */
  def retention(events: DataFrame): DataFrame = {
    val days = withT(events)
      .select(col("user_id"), expr("t div 86400000").as("day"))
      .distinct()
    val cohort = days.groupBy("user_id").agg(min("day").as("cohort_day"))
    days.join(cohort, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
      .agg(count(lit(1)).as("n_users"))
  }
}
