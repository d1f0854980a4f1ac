package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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
    // warmup
    spark.read.parquet(s"$sfDir/events.parquet").count()
    t("warmup q1")(SparkEntry.queries("q1_agg")(spark, sfDir).count())
    import org.apache.spark.sql.functions._
    t("events rows")(spark.read.parquet(s"$sfDir/events.parquet").count())
    t("eventsPoints click")(graft.model.Points.eventsPoints(spark, sfDir)
      .where(col("name") === "click").count())
    t("day agg")(graft.model.Points.eventsPoints(spark, sfDir)
      .where(col("name") === "click")
      .groupBy(((col("t") / 86400000L).cast("long")).as("d"))
      .agg(count(lit(1))).count())
    // split the gate into bucket-construction+cache vs engine eval
    val ev = graft.model.Points.eventsPoints(spark, sfDir).where(col("name") === "click")
    val DAY = 86400000L
    val byDay = ev.groupBy(((col("t") / DAY).cast("long") * DAY + DAY).as("t"))
      .agg(
        sum(when(col("value") <= 50, 1L).otherwise(0L)).as("c50"),
        sum(when(col("value") <= 100, 1L).otherwise(0L)).as("c100"),
        sum(when(col("value") <= 150, 1L).otherwise(0L)).as("c150"),
        count(lit(1)).as("cinf"))
    val bucketStructs = array(
      Seq(("50.0", "c50"), ("100.0", "c100"), ("150.0", "c150"), ("+Inf", "cinf")).map {
        case (le, c) => struct(lit(le).as("le"), col(c).cast("double").as("v"))
      }: _*)
    val buckets = byDay
      .select(col("t"), explode(bucketStructs).as("b"))
      .select(lit("click_bucket").as("name"),
        map(lit("le"), col("b.le")).as("labels"),
        col("t"), col("b.v").as("value"))
    val pts = graft.model.Points.withSig(buckets).cache()
    t("cache populate")(pts.count())
    val q = graft.engine.Engine.rangeQuery(spark, pts,
      "histogram_quantile(0.9, click_bucket)",
      graft.queries.QueryKit.START, graft.queries.QueryKit.T_END, DAY, lookbackMs = 1L)
    t("engine eval")(q.select(col("t"), round(col("value"), 6).as("value")).count())
    t("engine eval 2nd")(q.select(col("t"), round(col("value"), 6).as("value")).count())
    spark.stop()
  }
}
