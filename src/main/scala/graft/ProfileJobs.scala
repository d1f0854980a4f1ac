package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Optimization-round measurement harness: runs named gate queries and
  * prints EVERY Spark job the run launched — wall-clock and the call site
  * that triggered it — so fixed per-job overhead (tiny metadata reads,
  * isEmpty probes, bounded-count guards, checkpoints) is attributable to
  * exact code lines instead of guessed at (guide §1: measure first).
  *
  * Usage: runMain graft.ProfileJobs [sfDir] [queryName...]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq else Seq("q_sim_ivfpq_rerank")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      // match Bench exactly for the canary gates (the rate-family kernels
      // are ObjectHashAggregates; the default 128-key fallback would turn
      // them into sorts and misattribute the profile)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false")
    // A/B knobs for attribution runs, e.g.
    // SPARK_GRAFT_PROFILE_CONF="spark.sql.codegen.wholeStage=false"
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    // per-ACTION wall (includes driver-side planning+codegen the job
    // timings miss): name, total ns
    val actions = mutable.ArrayBuffer[(String, Long)]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        actions.synchronized(actions += ((funcName, durationNs)))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })
    spark.sparkContext.setLogLevel("WARN")
    val jobs = mutable.ArrayBuffer[(Int, Long, String)]()
    val starts = mutable.Map[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
        val site = Option(j.properties.getProperty("callSite.short"))
          .filter(_.nonEmpty)
          .orElse(j.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        starts(j.jobId) = (System.nanoTime(), site)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized {
        starts.remove(j.jobId).foreach { case (t0, cs) =>
          jobs += ((j.jobId, (System.nanoTime() - t0) / 1000000L, cs))
        }
      }
    })
    // the shared warmup Bench uses, so first-call codegen/JIT is not
    // misattributed to the profiled query
    try {
      spark.read.parquet(s"$sfDir/events.parquet").count()
      Seq("q1_agg", "q_sel_instant", "q_fn_rate")
        .foreach(q => SparkEntry.queries.get(q).foreach(_(spark, sfDir).count()))
    } catch { case _: Throwable => () }
    // canary gates live in Bench, not SparkEntry: resolve them against the
    // same reusable bench store so the scan ceiling is attributable per job
    val storeRoot = sys.env.getOrElse("SPARK_GRAFT_BENCH_STORE", "target/bench-store")
    lazy val canaries: Map[String, () => Long] = {
      Bench.ensureStore(spark, s"$storeRoot/c1x", Bench.N_SERIES)
      Bench.ensureStore(spark, s"$storeRoot/c10x", Bench.N_SERIES * 10)
      (Bench.canaryQueries(spark, s"$storeRoot/c1x", "canary") ++
        Bench.canaryQueries(spark, s"$storeRoot/c10x", "canary10x")).toMap
    }
    names.foreach { name =>
      val run: () => Unit =
        if (name.startsWith("canary")) () => canaries(name)()
        else () => SparkEntry.queries(name)(spark, sfDir).count(): Unit
      run() // warm run (min-of-2's steady state)
      Thread.sleep(300)
      jobs.synchronized(jobs.clear())
      actions.synchronized(actions.clear())
      val t0 = System.nanoTime()
      run()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // drain listener bus
      val snap = jobs.synchronized(jobs.toVector.sortBy(_._1))
      val acts = actions.synchronized(actions.toVector)
      println(f"JOBPROFILE $name wall=$wall%.3f njobs=${snap.size} " +
        f"jobms=${snap.map(_._2).sum} nactions=${acts.size} " +
        f"actms=${acts.map(_._2 / 1000000L).sum}")
      snap.foreach { case (id, ms, cs) =>
        println(f"  job $id%4d $ms%6d ms  $cs")
      }
      acts.sortBy(-_._2).take(12).foreach { case (n, ns) =>
        println(f"  action ${ns / 1000000L}%6d ms  $n")
      }
    }
    spark.stop()
  }
}
