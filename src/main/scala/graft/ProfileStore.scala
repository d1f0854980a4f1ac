package graft

import org.apache.spark.sql.SparkSession

/** Perf iteration helper for the STORE-BACKED canary path: breaks one
  * store-backed query into its phases (driver-side read resolution, dict
  * resolution, plan build, action) and counts Spark jobs per query, so
  * "per-query fixed cost" claims can be attributed instead of guessed.
  *
  * Usage: runMain graft.ProfileStore [storeDir] [nRuns] [promql] [kind]
  *   kind: range (default) | instant
  */
object ProfileStore {
  def main(args: Array[String]): Unit = {
    val store = args.headOption.getOrElse("target/bench-store/c10x")
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val promql = args.lift(2).getOrElse("sum by (instance_id) (rate(canary[5m]))")
    val kind = args.lift(3).getOrElse("range")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val T0 = 1704067200000L
    val END = T0 + (10080L - 1) * 60000L
    val (startMs, endMs, stepMs) =
      if (kind == "instant") (END, END, 1000L) else (END - 3600000L, END, 60000L)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        jobStart.put(js.jobId, js.time)
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val dur = (je.time - jobStart.getOrDefault(je.jobId, je.time)) / 1e3
        if (sys.env.contains("PROFILE_JOBS"))
          println(f"    job ${je.jobId}%3d ${dur}%6.2f s")
      }
    })
    (1 to n).foreach { i =>
      val j0 = jobs.get()
      def phase[T](name: String)(body: => T): T = {
        val t0 = System.nanoTime()
        val r = body
        println(f"  $name%-12s ${(System.nanoTime() - t0) / 1e9}%7.3f s  jobs=${jobs.get() - j0}")
        r
      }
      val grid = graft.engine.StepGrid(startMs, endMs, stepMs)
      val (lo, hi) = graft.engine.Guards.selectorWindowBounds(promql, grid)
        .getOrElse((startMs - 300000L, endMs))
      println(s"run $i:")
      val pts = phase("read") { graft.sources.PointsStore.read(spark, store, lo, hi) }
      if (sys.env.contains("PROFILE_EXP")) {
        import org.apache.spark.sql.functions._
        val slim = pts.where(col("name") === "canary")
          .select(col("sig"), col("t"), col("value"))
        def fold(df: org.apache.spark.sql.DataFrame) = df
          .groupBy(col("sig"), col("step"))
          .agg(graft.engine.SeriesAgg.fold(
            graft.engine.SeriesAgg.Extrapolated(300000L, isCounter = true, isRate = true),
            col("t"), col("value"), col("step")).as("value"))
          .where(col("value").isNotNull).count()
        phase("explode-agg") {
          fold(graft.engine.Selectors.explodeToSteps(slim, grid, 300000L, None)
            .select(col("sig"), col("step"), col("t"), col("value")))
        }
        phase("part-first") {
          fold(graft.engine.Selectors.explodeToSteps(
            slim.repartition(col("sig")), grid, 300000L, None)
            .select(col("sig"), col("step"), col("t"), col("value")))
        }
      }
      if (sys.env.contains("PROFILE_SCAN")) {
        import org.apache.spark.sql.functions.col
        phase("scan-only") {
          pts.where(col("name") === "canary" &&
            col("t") >= startMs - 360000L && col("t") <= endMs)
            .select("sig", "t", "value").count()
        }
      }
      val dict = phase("readDict") { graft.sources.PointsStore.readDict(spark, store) }
      val df = phase("plan") {
        graft.engine.Engine.rangeQuery(spark, pts, promql, startMs, endMs, stepMs,
          seriesDict = dict)
      }
      phase("action") { df.count() }
      if (i == n && sys.env.contains("PROFILE_EXPLAIN"))
        println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
