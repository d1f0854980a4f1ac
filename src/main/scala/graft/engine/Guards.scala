package graft.engine

import java.util.concurrent.Semaphore

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.promql._

/** Query resource guards, mirroring the reference's engine envelope
  * (src/internal/metric-store/metric_store.go:296,109,295-316):
  *
  *  - MaxSamples 20e6: the samples a query's selectors load are counted
  *    IN-SCAN by a [[TallySamples]] accumulator riding the selector's own
  *    codegen'd pipeline — zero extra passes over the data (a pre-count
  *    scan would double every guarded query's I/O at fleet scale). The
  *    watchdog polls the accumulator as task updates stream in and cancels
  *    the job group mid-flight once the budget is exceeded; a query that
  *    finishes under the poll interval is still rejected post-hoc.
  *    Accumulator caveat (documented contract): updates happen in a
  *    TRANSFORMATION stage, so a stage retry after a fetch failure, a
  *    speculative duplicate task, or a plan that executes the selector
  *    subtree twice without exchange reuse can OVERcount — the guard then
  *    errs toward rejecting, never toward letting an over-budget query
  *    through (memoized selectors compile to one subtree, so reuse
  *    normally dedups the common double-consume shapes).
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

  /** Fresh MaxSamples meter for one guarded query: pass it to
    * `Engine.rangeQuery(sampleTally = Some(acc))` (it rides the selector's
    * scan via [[TallySamples]]) and hand the same instance to [[run]]. */
  def newTally(spark: SparkSession): org.apache.spark.util.LongAccumulator =
    spark.sparkContext.longAccumulator("graft.samples")

  // ---- exact confirmation count -----------------------------------------

  /** EXACT sample count for every selector in `promql`: one
    * pushdown-filtered scan summing per-selector window membership. The
    * in-scan [[TallySamples]] accumulator can OVERcount (stage retries,
    * speculative duplicates, a plan consuming the selector subtree twice),
    * so [[run]] uses this as the confirmation oracle before rejecting —
    * the extra scan is paid only in the rare tripped-meter case, never on
    * the happy path. Count shape matches the accumulator's contract:
    * stored points inside each selector's [window × matcher] region. */
  def exactSampleCount(points: DataFrame, promql: String, grid: StepGrid,
                       lookbackMs: Long = 300000L): Long = {
    val conds = selectorConds(Parser.parse(promql), grid, lookbackMs)
    if (conds.isEmpty) return 0L
    val perSelector = conds.map(c => when(c, 1L).otherwise(0L)).reduce(_ + _)
    points.agg(sum(perSelector).as("n")).collect().head.getAs[Any]("n") match {
      case null => 0L
      case n: Long => n
      case n: Number => n.longValue()
    }
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
    * job group. The watchdog cancels the group when the deadline passes OR
    * when `tally` (the in-scan [[TallySamples]] meter) exceeds MaxSamples;
    * the budget is re-checked after `body` so fast queries that complete
    * between polls are still rejected deterministically.
    *
    * Because the accumulator is updated in a TRANSFORMATION (not
    * exactly-once: stage retries, speculative duplicates, double-consumed
    * subtrees overcount), a tripped meter is CONFIRMED against
    * `confirmExact` (an exact, pushdown-filtered count of the selectors'
    * samples — [[exactSampleCount]]) before the query is cancelled or
    * rejected. A confirmed-under verdict is sticky: the exact count is a
    * property of the query's full selector windows, so it cannot flip as
    * more tasks report. Failures of `body` are mapped to the guard
    * exceptions ONLY when they are cancellations this watchdog caused;
    * unrelated query failures rethrow as themselves. */
  def run[T](spark: SparkSession, limits: QueryLimits,
             description: String = "",
             tally: Option[org.apache.spark.util.LongAccumulator] = None,
             confirmExact: Option[() => Long] = None)(body: => T): T = {
    val sem = slots.computeIfAbsent(limits.maxConcurrent, n => new Semaphore(n, true))
    sem.acquire()
    val group = s"graft-query-${System.nanoTime()}"
    active.put(group, ActiveQuery(group, System.currentTimeMillis(), description))
    val sc = spark.sparkContext
    try {
      @volatile var timedOut = false
      @volatile var overBudget = false
      @volatile var confirmedUnder = false
      def budgetExceeded: Boolean = tally.exists(_.value > limits.maxSamples)
      // Exact confirmation: true = definitely over budget. On any failure
      // of the exact count itself, fall back to trusting the meter (the
      // guard never silently waves an over-budget query through).
      def confirmOver(): Boolean = confirmExact match {
        case Some(f) =>
          val over = try f() > limits.maxSamples catch { case _: Throwable => true }
          if (!over) confirmedUnder = true
          over
        case None => true
      }
      val deadline = System.nanoTime() + limits.timeoutMs * 1000000L
      val watchdog = new Thread(() => {
        try {
          var done = false
          while (!done) {
            if (System.nanoTime() >= deadline) {
              timedOut = true
              sc.cancelJobGroup(group)
              done = true
            } else if (budgetExceeded && !confirmedUnder) {
              // confirm on the watchdog thread (no job group set here, so
              // the count survives the group cancel) BEFORE killing the
              // query — a retry-inflated meter must not abort a valid one
              if (confirmOver()) {
                overBudget = true
                sc.cancelJobGroup(group)
                done = true
              }
            } else Thread.sleep(50)
          }
        } catch { case _: InterruptedException => () }
      }, s"$group-watchdog")
      watchdog.setDaemon(true)
      sc.setJobGroup(group, "graft guarded query", interruptOnCancel = true)
      watchdog.start()
      try {
        val result = body
        // overBudget is already exact-confirmed by the watchdog; a meter
        // that tripped between polls confirms here before rejecting
        if (overBudget || (!confirmedUnder && budgetExceeded && confirmOver()))
          throw new TooManySamplesException
        result
      } catch {
        case e: TooManySamplesException => throw e
        case e: QueryTimeoutException => throw e
        case e: Throwable if overBudget && isCancellation(e) =>
          throw new TooManySamplesException
        case e: Throwable if timedOut && isCancellation(e) =>
          throw new QueryTimeoutException
      } finally {
        watchdog.interrupt()
        sc.clearJobGroup()
      }
    } finally {
      active.remove(group)
      sem.release()
    }
  }

  /** Did this failure come from the watchdog's job-group cancel (vs an
    * unrelated query error that must rethrow as itself)? Spark surfaces
    * group cancellation as a SparkException("Job ... cancelled ...") or an
    * InterruptedException in the driver action thread. */
  private def isCancellation(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(t => t != null)
      .take(10)
      .exists { t =>
        t.isInstanceOf[InterruptedException] ||
          Option(t.getMessage).exists(m => m.toLowerCase.contains("cancel"))
      }
}
