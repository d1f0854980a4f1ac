package graft.engine

import java.util.concurrent.{Semaphore, TimeUnit}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.promql._

/** Query resource guards, mirroring the reference's engine envelope
  * (src/internal/metric-store/metric_store.go:296,109,295-316):
  *
  *  - MaxSamples 20e6: abort before evaluation when the samples a query's
  *    selectors would load exceed the budget. Spark-native shape: ONE
  *    cheap pre-count scan (pushdown-filtered, counts all selector windows
  *    in a single pass) instead of the reference's per-step accounting.
  *  - Query timeout (reference code default 10 s): the evaluation runs in
  *    a job group that is cancelled at the deadline.
  *  - Max concurrent queries (reference ActiveQueryTracker, 20): a
  *    semaphore slot held for the duration of execution.
  */
object Guards {

  /** Reference defaults: metric_store.go:296 (MaxSamples), :109 (timeout),
    * :122 (maxConcurrentQueries). */
  final case class QueryLimits(
      maxSamples: Long = 20000000L,
      timeoutMs: Long = 10000L,
      maxConcurrent: Int = 20)

  final class TooManySamplesException extends RuntimeException(
    "query processing would load too many samples into memory in query execution")
  final class QueryTimeoutException extends RuntimeException(
    "query timed out in query execution")

  /** Count the samples every selector in `promql` would load — one
    * filtered scan, all selector windows summed — and abort when the
    * total exceeds the budget. A mild overcount versus the reference's
    * per-step dedup accounting is acceptable for a guard. */
  def checkSampleBudget(points: DataFrame, promql: String, grid: StepGrid,
                        limits: QueryLimits, lookbackMs: Long = 300000L): Unit = {
    val conds = selectorConds(Parser.parse(promql), grid, lookbackMs)
    if (conds.isEmpty) return
    val perSelector = conds.map(c => when(c, 1L).otherwise(0L)).reduce(_ + _)
    val total = points.agg(sum(perSelector).as("n")).collect().head.getAs[Any]("n") match {
      case null => 0L
      case n: Long => n
      case n: Number => n.longValue()
    }
    if (total > limits.maxSamples) throw new TooManySamplesException
  }

  /** One membership predicate per selector: label matchers AND the full
    * time window the selector can touch across the grid (lookback/range,
    * offset, `@` pin — the same algebra the compiler applies). */
  private def selectorConds(ast: Expr, grid: StepGrid, lookbackMs: Long): Seq[Column] = {
    def selCond(vs: VectorSelector, windowMs: Long): Column = {
      val (lo, hi) = vs.at match {
        case Some(at) =>
          val ts = (at match {
            case AtModifier.Start => grid.startMs
            case AtModifier.End => grid.endMs
            case AtModifier.At(t) => t
          }) - vs.offsetMs
          (ts - windowMs, ts)
        case None =>
          (grid.startMs - vs.offsetMs - windowMs, grid.endMs - vs.offsetMs)
      }
      val nameCond = vs.name.map(n => col("name") === n).getOrElse(lit(true))
      nameCond && Compiler.matcherFilter(vs.matchers) &&
        col("t") >= lo && col("t") <= hi
    }
    def walk(e: Expr): Seq[Column] = e match {
      case vs: VectorSelector => Seq(selCond(vs, lookbackMs))
      case MatrixSelector(vs, rangeMs) => Seq(selCond(vs, rangeMs))
      case sq: SubqueryExpr =>
        // the inner expression evaluates over a grid widened by the
        // subquery range (plus offset/@ shifts) — widen and recurse
        val (s, e2) = sq.at match {
          case Some(at) =>
            val ts = (at match {
              case AtModifier.Start => grid.startMs
              case AtModifier.End => grid.endMs
              case AtModifier.At(t) => t
            }) - sq.offsetMs
            (ts - sq.rangeMs, ts)
          case None => (grid.startMs - sq.offsetMs - sq.rangeMs, grid.endMs - sq.offsetMs)
        }
        selectorConds(sq.expr, StepGrid(s, math.max(s, e2), grid.stepMs), lookbackMs)
      case ParenExpr(inner) => walk(inner)
      case UnaryExpr(_, inner) => walk(inner)
      case AggregateExpr(_, inner, param, _, _) =>
        walk(inner) ++ param.toSeq.flatMap(walk)
      case BinaryExpr(_, l, r, _, _) => walk(l) ++ walk(r)
      case Call(_, args) => args.flatMap(walk)
      case _ => Nil
    }
    walk(ast)
  }

  // ---- timeout + concurrency gate --------------------------------------

  private val slots = new java.util.concurrent.ConcurrentHashMap[Int, Semaphore]()

  /** Crash-forensics analog of the reference's mmap'd active-query log
    * (vendored promql/query_logger.go wired at metric_store.go:295-316):
    * every guarded run registers here for its duration, so a wedged
    * process can be inspected for the queries it was executing. */
  final case class ActiveQuery(group: String, startedMs: Long, description: String)
  private val active = new java.util.concurrent.ConcurrentHashMap[String, ActiveQuery]()
  def activeQueries: Seq[ActiveQuery] =
    active.values().toArray(Array.empty[ActiveQuery]).toSeq.sortBy(_.startedMs)

  /** Run `body` (the driver-side action of a query) under the limits:
    * a concurrency slot is acquired first (blocking, like the reference's
    * ActiveQueryTracker), and the Spark jobs it spawns are tagged with a
    * job group that is cancelled if the deadline passes. */
  def run[T](spark: SparkSession, limits: QueryLimits,
             description: String = "")(body: => T): T = {
    val sem = slots.computeIfAbsent(limits.maxConcurrent, n => new Semaphore(n, true))
    sem.acquire()
    val group = s"graft-query-${System.nanoTime()}"
    active.put(group, ActiveQuery(group, System.currentTimeMillis(), description))
    val sc = spark.sparkContext
    try {
      @volatile var timedOut = false
      val watchdog = new Thread(() => {
        try {
          Thread.sleep(limits.timeoutMs)
          timedOut = true
          sc.cancelJobGroup(group)
        } catch { case _: InterruptedException => () }
      }, s"$group-watchdog")
      watchdog.setDaemon(true)
      sc.setJobGroup(group, "graft guarded query", interruptOnCancel = true)
      watchdog.start()
      try body
      catch {
        case e: Throwable if timedOut => throw new QueryTimeoutException
      } finally {
        watchdog.interrupt()
        sc.clearJobGroup()
      }
    } finally {
      active.remove(group)
      sem.release()
    }
  }
}
