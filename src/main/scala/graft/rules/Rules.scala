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

  // ---- checkpointed deployment of full-PromQL alerting -----------------

  /** Newest persisted `for:` state for `alert` under `stateDir` older than
    * `beforeTs`, or the empty state. Only versions with a _SUCCESS marker
    * are considered, so a crash mid-write is invisible (the previous
    * version stays newest); `beforeTs` keeps a REPLAYED tick from reading
    * the version it is about to overwrite. */
  def loadAlertState(spark: SparkSession, stateDir: String, alert: String,
                     beforeTs: Long = Long.MaxValue): DataFrame = {
    val base = new org.apache.hadoop.fs.Path(s"$stateDir/$alert")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return emptyState(spark)
    val versions = fs.listStatus(base).toSeq
      .filter(_.getPath.getName.startsWith("v="))
      .filter(st => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName.drop(2).toLong)
      .filter(_ < beforeTs)
    if (versions.isEmpty) emptyState(spark)
    else spark.read.parquet(s"$base/v=${versions.max}")
  }

  /** One PERSISTED alerting tick: load newest state, run [[alertingTick]],
    * write the successor state as `stateDir/<alert>/v=<tsMs>` (idempotent
    * on replay of the same tick — the reference's rule manager re-reads
    * its persisted alert state on restart, prom_manager.go:34-143 /
    * acceptance metric_store_test.go:1509), prune all but the two newest
    * versions, and return the firing set. */
  def persistedAlertingTick(spark: SparkSession, points: DataFrame,
                            rule: AlertingRule, stateDir: String, tsMs: Long,
                            lookbackMs: Long = 300000L): DataFrame = {
    val st = loadAlertState(spark, stateDir, rule.alert, beforeTs = tsMs)
    val (newState, firing) = alertingTick(spark, points, rule, st, tsMs, lookbackMs)
    val out = firing.cache()
    out.count() // one materialization serves both the write and the caller
    newState.write.mode("overwrite").parquet(s"$stateDir/${rule.alert}/v=$tsMs")
    val base = new org.apache.hadoop.fs.Path(s"$stateDir/${rule.alert}")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(base).toSeq
      .filter(_.getPath.getName.startsWith("v="))
      .map(s => (s.getPath.getName.drop(2).toLong, s.getPath))
      .sortBy(-_._1)
    versions.drop(2).foreach { case (_, p) => fs.delete(p, true) }
    out
  }

  /** `writeStream.foreachBatch` sink running arbitrary-PromQL alerting on a
    * points stream: each micro-batch appends to the store, then every rule
    * ticks at the batch's max sample time over the WHOLE persisted store
    * (instant query + lookback), with `for:` state surviving restarts via
    * [[persistedAlertingTick]]. `onFiring` receives each rule's firing
    * rows (alertmanager notifier hook). */
  def alertingSink(storeDir: String, stateDir: String, rules: Seq[AlertingRule],
                   lookbackMs: Long = 300000L,
                   onFiring: (AlertingRule, Array[org.apache.spark.sql.Row]) => Unit =
                     (_, _) => ())
      : (DataFrame, Long) => Unit = (batch, _) => {
    graft.sources.PointsStore.append(batch, storeDir)
    val spark = batch.sparkSession
    val maxT = batch.agg(max(col("t"))).head.getAs[Any](0)
    if (maxT != null) {
      val tsMs = maxT.asInstanceOf[Long]
      // partition-pruned read bounded by what the rules' OWN selectors can
      // reach: the lookback horizon plus the widest range window/offset/
      // subquery in any rule expression — at fleet scale this is the
      // difference between scanning the whole retention window and the
      // day(s) a tick actually touches. An `@`-pinned selector can reach
      // ANY absolute timestamp (start()/end()/unix pin), which the
      // relative-reach algebra cannot bound — those rules read unpruned
      // rather than silently evaluating against missing data.
      val stored =
        if (rules.exists(r => hasAtModifier(r.expr)))
          graft.sources.PointsStore.read(spark, storeDir, Long.MinValue, Long.MaxValue)
        else {
          val horizon = lookbackMs +
            rules.map(r => maxSelectorReachMs(r.expr)).foldLeft(0L)(math.max)
          graft.sources.PointsStore.read(spark, storeDir, tsMs - horizon, tsMs)
        }
      rules.foreach { rule =>
        val firing = persistedAlertingTick(spark, stored, rule, stateDir, tsMs, lookbackMs)
        val rows = firing.collect()
        if (rows.nonEmpty) onFiring(rule, rows)
        firing.unpersist()
      }
    }
  }

  /** Does any selector/subquery in `promql` carry an `@` modifier? Such
    * expressions evaluate at an absolute pinned timestamp, so the relative
    * reach from [[maxSelectorReachMs]] does not bound the data they touch. */
  def hasAtModifier(promql: String): Boolean = {
    import graft.promql._
    def walk(e: Expr): Boolean = e match {
      case vs: VectorSelector => vs.at.isDefined
      case MatrixSelector(vs, _) => vs.at.isDefined
      case sq: SubqueryExpr => sq.at.isDefined || walk(sq.expr)
      case ParenExpr(x) => walk(x)
      case UnaryExpr(_, x) => walk(x)
      case AggregateExpr(_, x, p, _, _) => walk(x) || p.exists(walk)
      case BinaryExpr(_, l, r, _, _) => walk(l) || walk(r)
      case Call(_, args) => args.exists(walk)
      case _ => false
    }
    walk(Parser.parse(promql))
  }

  /** How far before the evaluation timestamp the selectors of `promql` can
    * reach: max over selectors of range + offset (+ enclosing subquery
    * ranges/offsets). Drives the alerting sink's pruned store read —
    * callers must check [[hasAtModifier]] first (an `@` pin escapes this
    * relative bound). */
  def maxSelectorReachMs(promql: String): Long = {
    import graft.promql._
    def walk(e: Expr, inherited: Long): Long = e match {
      case vs: VectorSelector => inherited + vs.offsetMs
      case MatrixSelector(vs, rangeMs) => inherited + rangeMs + vs.offsetMs
      case SubqueryExpr(x, rangeMs, _, offsetMs, _) =>
        walk(x, inherited + rangeMs + offsetMs)
      case ParenExpr(x) => walk(x, inherited)
      case UnaryExpr(_, x) => walk(x, inherited)
      case AggregateExpr(_, x, p, _, _) =>
        math.max(walk(x, inherited), p.map(walk(_, inherited)).getOrElse(0L))
      case BinaryExpr(_, l, r, _, _) =>
        math.max(walk(l, inherited), walk(r, inherited))
      case Call(_, args) =>
        args.map(walk(_, inherited)).foldLeft(0L)(math.max)
      case _ => 0L
    }
    walk(Parser.parse(promql), 0L)
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
