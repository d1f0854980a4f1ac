package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScratchCanary {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val T0 = 1704067200000L
    val WEEK_MIN = 10080L
    val N = 1000L
    val pts = graft.model.Points.withSig(
      spark.range(WEEK_MIN * N).select(
        lit("canary").as("name"),
        map(lit("source_id"), lit("blackbox"), lit("app_id"), lit("9f2a"),
          lit("deployment"), lit("cf"), lit("job"), lit("router"),
          lit("instance_id"), pmod((col("id") / WEEK_MIN).cast("long"), lit(16)).cast("string"),
          lit("series"), (col("id") / WEEK_MIN).cast("long").cast("string")).as("labels"),
        (lit(T0) + (col("id") % WEEK_MIN) * 60000L).as("t"),
        lit(10.0).as("value"))).cache()
    t("cache-build")(pts.count())
    val end = T0 + (WEEK_MIN - 1) * 60000L
    t("count_over_time-1")(graft.engine.Engine.instantQuery(spark, pts,
      "sum(count_over_time(canary[1w]))", end).count())
    t("count_over_time-2")(graft.engine.Engine.instantQuery(spark, pts,
      "sum(count_over_time(canary[1w]))", end).count())
    // pieces: range selector alone
    val grid = graft.engine.StepGrid(end, end, 1000L)
    val rng = graft.engine.Selectors.range(pts.where(col("name") === "canary"), grid, 604800000L)
    t("range-selector")(rng.count())
    t("range-agg-sig-only")(rng.groupBy(col("sig"), col("step")).agg(count(lit(1))).count())
    t("range-agg-with-lc")(rng.groupBy(col("sig"), col("step"))
      .agg(count(lit(1)).as("value"), first(col("name")).as("name"), first(col("_lc")).as("_lc")).count())
    t("canonical-only")(pts.select(graft.model.Points.canonical(col("labels")).as("c"))
      .agg(sum(length(col("c")))).head())
    t("instant-1")(graft.engine.Engine.instantQuery(spark, pts, """canary{instance_id="5"}""", end).count())
    t("instant-2")(graft.engine.Engine.instantQuery(spark, pts, """canary{instance_id="5"}""", end).count())
    spark.stop()
  }
}
