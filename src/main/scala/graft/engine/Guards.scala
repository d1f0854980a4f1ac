package graft.engine

import java.util.concurrent.Semaphore

import org.apache.spark.sql.SparkSession

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
    * between polls are still rejected deterministically. */
  def run[T](spark: SparkSession, limits: QueryLimits,
             description: String = "",
             tally: Option[org.apache.spark.util.LongAccumulator] = None)(body: => T): T = {
    val sem = slots.computeIfAbsent(limits.maxConcurrent, n => new Semaphore(n, true))
    sem.acquire()
    val group = s"graft-query-${System.nanoTime()}"
    active.put(group, ActiveQuery(group, System.currentTimeMillis(), description))
    val sc = spark.sparkContext
    try {
      @volatile var timedOut = false
      @volatile var overBudget = false
      def budgetExceeded: Boolean = tally.exists(_.value > limits.maxSamples)
      val deadline = System.nanoTime() + limits.timeoutMs * 1000000L
      val watchdog = new Thread(() => {
        try {
          var done = false
          while (!done) {
            if (System.nanoTime() >= deadline) {
              timedOut = true
              sc.cancelJobGroup(group)
              done = true
            } else if (budgetExceeded) {
              overBudget = true
              sc.cancelJobGroup(group)
              done = true
            } else Thread.sleep(50)
          }
        } catch { case _: InterruptedException => () }
      }, s"$group-watchdog")
      watchdog.setDaemon(true)
      sc.setJobGroup(group, "graft guarded query", interruptOnCancel = true)
      watchdog.start()
      try {
        val result = body
        if (overBudget || budgetExceeded) throw new TooManySamplesException
        result
      } catch {
        case _: TooManySamplesException => throw new TooManySamplesException
        case e: Throwable if overBudget => throw new TooManySamplesException
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
