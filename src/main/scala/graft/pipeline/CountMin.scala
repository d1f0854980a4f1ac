package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) over the corpus token
  * stream: fixed-size frequency summaries with one-sided error — the
  * sketch a 100 TB pipeline keeps when exact token counts (billions of
  * distinct tokens) no longer fit, for stop-list construction, rare-token
  * filtering, and repetition heuristics.
  *
  * Deliberately RELATIONAL: the sketch IS the (depth, bucket, cnt)
  * relation — one exploded projection and one hash aggregation build it
  * (map-side combined, ≤ depth×width rows total regardless of corpus
  * size), and Catalyst handles distribution/merging for free. That is
  * the Spark-native formulation of the classic mergeable-summary
  * update/merge loop, and it is exactly reproducible in SQL — the gate's
  * DuckDB oracle rebuilds every counter and probe estimate bit-for-bit
  * (md5-derived bucket hashing, min-over-rows estimate).
  */
object CountMin {

  val Depth = 4
  val Width = 1024

  /** Row-d bucket of a token: the top 20 bits of md5("d|tok") mod width.
    * Driver-side twin of the SQL/Column formulations below. */
  def bucketOf(d: Int, tok: String): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d|$tok".getBytes("UTF-8"))
    val hex = h.take(3).map(b => f"$b%02x").mkString // 6 hex chars = 24 bits
    (java.lang.Long.parseLong(hex.take(5), 16) % Width).toInt
  }

  /** Column formulation of [[bucketOf]] (codegen'd: md5 + conv). */
  private def bucketCol(d: Int, tok: org.apache.spark.sql.Column) =
    pmod(conv(substring(md5(concat(lit(s"$d|"), tok)), 1, 5), 16, 10)
      .cast("long"), lit(Width))

  /** Build the sketch: (d, bucket, cnt), at most Depth×Width rows.
    * The corpus-sized work is ONE token-count aggregation (map-side
    * combined); the ×Depth explode and md5 bucket hashing run on the
    * VOCAB-sized count table, not the token stream — at 200M token
    * occurrences that is 4×50k hashed rows instead of 800M. */
  def sketch(docs: DataFrame): DataFrame = {
    val tokCnt = docs.select(explode(split(col("text"), " ")).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("tc"))
    val rows = (0 until Depth).map(d =>
      struct(lit(d).as("d"), bucketCol(d, col("tok")).as("bucket")))
    tokCnt.select(col("tc"), explode(array(rows: _*)).as("db"))
      .groupBy(col("db.d").as("d"), col("db.bucket").as("bucket"))
      .agg(sum("tc").as("cnt"))
  }

  /** Point-estimate the probes' frequencies: min over rows of the
    * probed counters (0 when a bucket is empty). Upper-bounds the true
    * count; equals it when no collision lands in all Depth buckets. */
  def estimate(docs: DataFrame, probes: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sk = sketch(docs)
    val probeRows = for (tok <- probes; d <- 0 until Depth)
      yield (tok, d, bucketOf(d, tok))
    val pb = probeRows.toDF("tok", "d", "bucket")
    // the sketch is ≤ Depth×Width rows — broadcast it as the build side
    // of a probe-preserving left join (a right-outer with the broadcast
    // on the preserved side would silently fall back to a shuffle)
    pb.join(broadcast(sk), Seq("d", "bucket"), "left")
      .groupBy("tok")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
