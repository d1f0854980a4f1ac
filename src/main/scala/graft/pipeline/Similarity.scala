package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * - [[cosine]] / [[bruteForceTopK]]: the exact baseline. The fold is a pure
  *   codegen'd higher-order function (zip_with + aggregate in doubles, left
  *   fold — bit-stable and oracle-reproducible); the query side is expected
  *   to be a bounded set that Spark broadcasts, so the scan of the corpus
  *   stays single-pass and shuffle-free until the per-query top-k.
  * - [[lshBuckets]] / [[annTopK]]: the scale path — random-hyperplane LSH.
  *   Planes are derived deterministically from md5, so the bucketing is
  *   reproducible across engines and runs (no RNG state on executors).
  *   Probing joins only same-bucket rows: candidate count ≈ corpus / 2^bits
  *   per query, independent of total corpus size per bucket on average.
  */
object Similarity {

  /** Left-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with fixed association dot / (norm(a) * norm(b)). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k neighbours for each query vector (queries: (vec_id,
    * embedding)). Output: (qid, cid, cos, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qe"))
    val c = corpus.select(col("vec_id").as("cid"), asDouble(col("embedding")).as("ce"))
    val scored = q.join(c, col("qid") =!= col("cid"))
      .withColumn("cos", cosine(col("qe"), col("ce")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("cid"), round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** Deterministic pseudo-random ±1 hyperplane component for (plane, dim):
    * the top bit of the first md5 nibble of "p:d". */
  private def planeSign(p: Int, d: Int): Double =
    if ((Integer.parseInt(org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$p:$d").substring(0, 1), 16) & 0x8) != 0) 1.0
    else -1.0

  /** Bucket id = `bits`-bit signature of sign(plane·v). */
  def lshBucket(embedding: Column, bits: Int, dims: Int): Column = {
    val planes: Seq[Column] = (0 until bits).map { p =>
      val proj = (0 until dims).map(d =>
        element_at(embedding, d + 1) * lit(planeSign(p, d))).reduce(_ + _)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    planes.reduce(_ + _)
  }

  def lshBuckets(corpus: DataFrame, bits: Int = 8, dims: Int = 64): DataFrame =
    corpus.select(col("vec_id"),
      lshBucket(asDouble(col("embedding")), bits, dims).as("bucket"),
      asDouble(col("embedding")).as("e"))

  /** Approximate top-k: exact cosine, but only within the query's LSH
    * bucket. Recall improves with multi-probe (neighbouring buckets) —
    * bump `bits` down or add probes for higher recall. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bits: Int = 8, dims: Int = 64): DataFrame = {
    val c = lshBuckets(corpus, bits, dims)
      .select(col("bucket"), col("vec_id").as("cid"), col("e").as("ce"))
    val q = lshBuckets(queries, bits, dims)
      .select(col("bucket"), col("vec_id").as("qid"), col("e").as("qe"))
    val scored = q.join(c, Seq("bucket")).where(col("qid") =!= col("cid"))
      .withColumn("cos", cosine(col("qe"), col("ce")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("cid"), round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, bounded to a
    * vec_id prefix for the exact gate query (the scale path feeds LSH
    * buckets instead of the full cross join). */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
                   filter: Column = lit(true)): DataFrame = {
    val e = corpus.where(filter)
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val a = e.select(col("vec_id").as("vec_a"), col("e").as("ea"))
    val b = e.select(col("vec_id").as("vec_b"), col("e").as("eb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("ea"), col("eb")))
      .where(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
  }
}
