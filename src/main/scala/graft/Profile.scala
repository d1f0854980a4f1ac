package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perf iteration helper: times named gate queries N times each (after the
  * shared warm-up Bench uses) and prints per-run seconds, so plan changes
  * can be judged against run-to-run variance instead of a single sample.
  *
  * Usage: runMain graft.Profile [sfDir] [nRuns] [queryName...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val names = if (args.length > 2) args.drop(2).toSeq else Seq("q_dedup_minhash")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/events.parquet").count()
    Seq("q1_agg", "q_sel_instant", "q_fn_rate").foreach(q =>
      SparkEntry.queries.get(q).foreach(_(spark, sfDir).count()))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name%-30s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
