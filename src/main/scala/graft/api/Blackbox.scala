package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Engine

/** Continuous blackbox probes, the analogs of the reference's deployed
  * canary calculators (src/internal/blackbox/):
  *
  *  - reliability (reliability_calculator.go:48-144): received/expected
  *    sample ratio for magic canary metrics over a window — each metric is
  *    counted with a range-selector query, expected = window/emission
  *    interval, and the ratio averages over the metrics that answered.
  *  - performance (performance_calculator.go:55-91): latency + magnitude
  *    of `sum(count_over_time(canary[...]))` (the Bench canary section
  *    runs the same probe shape at 10M samples).
  */
object Blackbox {

  /** Reference magic metric names (blackbox.go MagicMetricNames) minus the
    * node-pair variants — a single-engine deployment has one store. */
  val MagicMetricName = "blackbox_test_metric"

  final case class Reliability(received: Long, expected: Long, ratio: Double)

  /** received/expected over `[windowMs]` ending at `tsMs` for one metric:
    * one range-selector query counts the stored samples. */
  def reliability(spark: SparkSession, points: DataFrame, metric: String,
                  sourceId: String, tsMs: Long, windowMs: Long,
                  emissionIntervalMs: Long): Reliability = {
    val windowSec = windowMs / 1000
    val received = Engine.instantQuery(spark, points,
      s"""count_over_time($metric{source_id="$sourceId"}[${windowSec}s])""", tsMs)
      .collect().map(_.getAs[Double]("value")).sum.toLong
    val expected = windowMs / emissionIntervalMs
    Reliability(received, expected,
      if (expected == 0) 0.0 else received.toDouble / expected)
  }

  final case class Performance(latencyMs: Long, magnitude: Double)

  /** Latency + magnitude of the reference's perf-canary query. */
  def performance(spark: SparkSession, points: DataFrame, metric: String,
                  sourceId: String, tsMs: Long, windowMs: Long): Performance = {
    val windowSec = windowMs / 1000
    val t0 = System.nanoTime()
    val rows = Engine.instantQuery(spark, points,
      s"""sum(count_over_time($metric{source_id="$sourceId"}[${windowSec}s]))""", tsMs)
      .collect()
    val latency = (System.nanoTime() - t0) / 1000000
    Performance(latency, rows.headOption.map(_.getAs[Double]("value")).getOrElse(0.0))
  }
}
