package graft.rules

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Engine
import graft.model.Points

/** Recording and alerting rules on top of the engine (reference:
  * src/internal/rules/prom_manager.go:34-143 + vendored rules manager).
  *
  * The reference ticks every evaluation interval (1 min default,
  * metric_store.go:43), runs an instant query, and appends the result as
  * new series (`record:`) or tracks per-alert `for:` state. Here each tick
  * is one engine evaluation; the scheduler is the caller's (a Structured
  * Streaming trigger or a cron loop calling [[recordingTick]] /
  * [[alertingTick]] and appending to [[graft.sources.PointsStore]]).
  */
object Rules {

  final case class RecordingRule(record: String, expr: String,
                                 labels: Map[String, String] = Map.empty)
  final case class AlertingRule(alert: String, expr: String, forMs: Long,
                                labels: Map[String, String] = Map.empty)

  /** One recording-rule tick: evaluate at `tsMs`, rename to the rule name,
    * merge rule labels; result is appendable points. */
  def recordingTick(spark: SparkSession, points: DataFrame,
                    rule: RecordingRule, tsMs: Long,
                    lookbackMs: Long = 300000L): DataFrame = {
    val res = Engine.instantQuery(spark, points, rule.expr, tsMs, lookbackMs)
    val withLabels = rule.labels.foldLeft(
      res.withColumn("name", lit(rule.record))) { case (df, (k, v)) =>
      df.withColumn("labels", graft.engine.Labels.set(col("labels"), k, lit(v)))
    }
    Points.withSig(withLabels.select(col("name"), col("labels"), col("t"), col("value")))
  }

  /** Alert state: one row per active (pending or firing) series.
    * Schema: sig LONG, labels MAP, since LONG (first tick the condition
    * held), value DOUBLE (latest). */
  def emptyState(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("sig", LongType), StructField("labels", MapType(StringType, StringType)),
        StructField("since", LongType), StructField("value", DoubleType))))
  }

  /** Alert transition event emitted by the streaming path. */
  final case class AlertEvent(sig: Long, alertname: String, status: String,
                              tMs: Long, value: Double)

  /** Per-series `for:` tracking state (public: Catalyst's encoder codegen
    * needs constructor access). */
  final case class AlertState(sinceMs: Long, firing: Boolean)

  /** Streaming per-series threshold alerting directly on a points stream:
    * `value > threshold for: forMs` tracked with
    * `flatMapGroupsWithState` — the stateful-streaming deployment of the
    * reference's pending→firing `for:` machinery for simple threshold
    * rules (complex PromQL rules go through the batch [[alertingTick]]
    * inside foreachBatch instead). Emits pending/firing/resolved
    * transition events in Append mode. */
  def streamingThresholdAlerts(
      spark: SparkSession,
      points: DataFrame, // streaming: sig, name, labels, t, value
      alertname: String,
      metric: String,
      threshold: Double,
      forMs: Long): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = points.where(col("name") === metric)
      .select(col("sig"), col("t"), col("value")).as[(Long, Long, Double)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (sig: Long, rows: Iterator[(Long, Long, Double)], state: GroupState[AlertState]) => {
          val out = Seq.newBuilder[AlertEvent]
          var st = state.getOption
          rows.toSeq.sortBy(_._2).foreach { case (_, t, v) =>
            if (v > threshold) {
              st match {
                case None =>
                  st = Some(AlertState(t, firing = false))
                  out += AlertEvent(sig, alertname, "pending", t, v)
                case Some(s) if !s.firing && t - s.sinceMs >= forMs =>
                  st = Some(s.copy(firing = true))
                  out += AlertEvent(sig, alertname, "firing", t, v)
                case _ => ()
              }
            } else if (st.isDefined) {
              out += AlertEvent(sig, alertname, "resolved", t, v)
              st = None
            }
          }
          st match {
            case Some(s) => state.update(s)
            case None => state.remove()
          }
          out.result().iterator
        })
      .toDF()
  }

  /** One alerting tick. Returns (newState, firing):
    *  - a series in this tick's result keeps (or gains) `since`;
    *  - a series absent from the result is dropped (alert resolves);
    *  - firing = active series with tsMs - since >= forMs
    * (the reference's pending→firing `for:` transition). The caller
    * persists `newState` between ticks (Delta MERGE / parquet overwrite /
    * flatMapGroupsWithState in a streaming deployment). */
  def alertingTick(spark: SparkSession, points: DataFrame, rule: AlertingRule,
                   state: DataFrame, tsMs: Long,
                   lookbackMs: Long = 300000L): (DataFrame, DataFrame) = {
    val res = Engine.instantQuery(spark, points, rule.expr, tsMs, lookbackMs)
      .select(Points.sigOf(col("name"), col("labels")).as("sig"),
        col("labels"), col("value"))
    val prev = state.select(col("sig"), col("since"))
    val newState = res
      .join(prev, Seq("sig"), "left")
      .select(col("sig"), col("labels"),
        coalesce(col("since"), lit(tsMs)).as("since"), col("value"))
    val firing = newState
      .where(lit(tsMs) - col("since") >= rule.forMs)
      .withColumn("alertname", lit(rule.alert))
    (newState, firing)
  }
}
