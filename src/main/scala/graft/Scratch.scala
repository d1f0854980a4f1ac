package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMING $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    val T0 = 1704067200000L
    val WEEK_MIN = 10080L
    val N_SERIES = 1000L
    val pts = graft.model.Points.withSig(
      spark.range(WEEK_MIN * N_SERIES).select(
        lit("canary").as("name"),
        map(
          lit("source_id"), lit("blackbox"),
          lit("app_id"), lit("9f2a"),
          lit("deployment"), lit("cf"),
          lit("job"), lit("router"),
          lit("instance_id"), pmod((col("id") / WEEK_MIN).cast("long"), lit(16)).cast("string"),
          lit("series"), (col("id") / WEEK_MIN).cast("long").cast("string")).as("labels"),
        (lit(T0) + (col("id") % WEEK_MIN) * 60000L).as("t"),
        lit(10.0).as("value"))).cache()
    t("cache populate")(pts.count())
    t("scan cached")(pts.count())
    t("canonical per row")(pts.select(graft.model.Points.canonical(col("labels")).as("lc")).count())
    t("agg by (sig,step-const)")(
      pts.groupBy(col("sig")).agg(count(lit(1))).count())
    t("agg by (name,lc)")(
      pts.withColumn("_lc", graft.model.Points.canonical(col("labels")))
        .groupBy(col("name"), col("_lc")).agg(count(lit(1))).count())
    t("agg by (sig) + first(lc) [objhash? sort?]")(
      pts.withColumn("_lc", graft.model.Points.canonical(col("labels")))
        .groupBy(col("sig")).agg(count(lit(1)), first(col("_lc"))).count())
    val end = T0 + (WEEK_MIN - 1) * 60000L
    val grid = graft.engine.StepGrid(end, end, 1000L)
    val m = graft.engine.Selectors.range(pts, grid, 7L * 24 * 3600 * 1000)
    t("A matrix agg (name,_lc,step)")(
      m.groupBy(col("name"), col("_lc"), col("step")).agg(count(lit(1))).count())
    t("B matrix agg (sig,step)+first(name,_lc)")(
      m.groupBy(col("sig"), col("step"))
        .agg(count(lit(1)), first(col("name")), first(col("_lc"))).count())
    t("C matrix agg (sig,step)+dict join")({
      val agg = m.groupBy(col("sig"), col("step")).agg(count(lit(1)).as("n"))
      val dict = pts.select(col("sig"), col("name"), col("labels")).dropDuplicates("sig")
      agg.join(dict, Seq("sig")).count()
    })
    val q = graft.engine.Engine.instantQuery(spark, pts,
      "sum(count_over_time(canary[1w]))", end)
    q.explain("formatted")
    t("count_over_time full")(q.count())
    spark.stop()
  }
}
