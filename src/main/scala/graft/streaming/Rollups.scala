package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Timer → windowed counter/histogram rollups (reference:
  * src/internal/nozzle/rollup/counter.go:31-69, histogram.go:36-130).
  *
  * The reference pre-aggregates gorouter `http` timer envelopes into
  * per-interval counters (`http_total`) and cumulative-`le` histograms
  * (`http_duration_seconds_*`). Here both are tumbling-window group-bys
  * that run identically over a static DataFrame (batch backfill, and the
  * driver's oracle gate) and a `readStream` DataFrame (production path,
  * with `withWatermark` + `window()` and a `foreachBatch` append into
  * [[graft.sources.PointsStore]]).
  *
  * Bucket bounds are the Prometheus defaults (FIXTURES §4).
  */
object Rollups {

  val DefaultBuckets: Seq[Double] =
    Seq(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)

  private def windowStart(tsMs: Column, intervalMs: Long): Column =
    (tsMs.cast("long") / intervalMs).cast("long") * intervalMs

  /** Count of timer events per (window, source_id [+ tags]) — the
    * `http_total` counter rollup. Input columns: timestamp (ns), source_id,
    * start, stop. Output: window_start (ms), source_id, count. */
  def counterRollup(timers: DataFrame, intervalMs: Long): DataFrame =
    timers
      .withColumn("w", windowStart(col("timestamp") / 1000000L, intervalMs))
      .groupBy(col("w").as("window_start"), col("source_id"))
      .agg(count(lit(1)).as("value"))
      .select(col("window_start"), col("source_id"), col("value"))

  /** Cumulative-`le` histogram rollup of timer durations ((stop-start) ns →
    * seconds): per window and key, one row per bucket with the CUMULATIVE
    * count (monotone in `le`), plus `_count` (= +Inf bucket) and `_sum`.
    * Output: window_start, source_id, le (string, "+Inf" last), value,
    * kind ('bucket'|'count'|'sum'). */
  def histogramRollup(timers: DataFrame, intervalMs: Long,
                      buckets: Seq[Double] = DefaultBuckets): DataFrame = {
    val dur = (col("stop") - col("start")) / 1e9
    val base = timers
      .withColumn("w", windowStart(col("timestamp") / 1000000L, intervalMs))
      .withColumn("dur", dur)
    // one aggregation pass: cumulative bucket counts as conditional sums —
    // no explode, no second shuffle; map-side combine keeps partials small
    // (index-suffixed names: a literal bound like 0.005 in a column name
    // would parse as a nested-field path)
    val bucketCols = buckets.zipWithIndex.map { case (b, i) =>
      sum(when(col("dur") <= b, 1L).otherwise(0L)).as(s"le_$i")
    }
    val agged = base.groupBy(col("w").as("window_start"), col("source_id"))
      .agg(bucketCols.head, (bucketCols.tail :+
        count(lit(1)).as("le_inf") :+ sum(col("dur")).as("dsum")): _*)
    val bucketRows: Seq[Column] = buckets.zipWithIndex.map { case (b, i) =>
      struct(lit(b.toString).as("le"), col(s"le_$i").cast("double").as("value"),
        lit("bucket").as("kind"))
    } ++ Seq(
      struct(lit("+Inf").as("le"), col("le_inf").cast("double").as("value"),
        lit("bucket").as("kind")),
      struct(lit(null).cast("string").as("le"), col("le_inf").cast("double").as("value"),
        lit("count").as("kind")),
      struct(lit(null).cast("string").as("le"), col("dsum").cast("double").as("value"),
        lit("sum").as("kind")))
    agged
      .select(col("window_start"), col("source_id"),
        explode(array(bucketRows: _*)).as("b"))
      .select(col("window_start"), col("source_id"),
        col("b.le").as("le"), col("b.value").as("value"), col("b.kind").as("kind"))
  }

  /** Streaming wrapper: same aggregations over a readStream relation with
    * an event-time watermark (the reference uses processing-time windows
    * and no lateness handling — the watermark is our upgrade). */
  def streamingCounterRollup(timers: DataFrame, intervalMs: Long): DataFrame =
    timers
      .withColumn("ets", timestamp_millis((col("timestamp") / 1000000L).cast("long")))
      .withWatermark("ets", "10 minutes")
      .groupBy(window(col("ets"), s"$intervalMs milliseconds"), col("source_id"))
      .agg(count(lit(1)).as("value"))
      .select(unix_millis(col("window.start")).as("window_start"),
        col("source_id"), col("value"))
}
