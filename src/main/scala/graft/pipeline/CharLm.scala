package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Character-trigram language-model scoring — the perplexity-style
  * quality filter of CCNet/Gopher-era curation (Wenzek et al. 2020 score
  * with a KenLM; this is the distributed add-one-smoothed char-trigram
  * variant, self-trained on the corpus being filtered): documents whose
  * average per-character log-probability is far below the corpus norm
  * are boilerplate/garbage candidates; far above are repetitive.
  *
  * Model: P(c | ab) = (c3(abc) + 1) / (c2(ab) + V), where c3/c2 are
  * corpus trigram/context counts (c2 aggregated from the SAME trigram
  * stream, so the conditional normalizes exactly) and V is the corpus
  * character vocabulary. Score(doc) = mean over interior positions of
  * ln P.
  *
  * Scale shape: one explode of the char stream (linear) feeds BOTH count
  * tables (two hash aggregations over 3-char keys — at most |charset|³
  * rows, corpus-size-independent); scoring joins the count tables back
  * on the same keys (AQE broadcasts them while small) and one doc-keyed
  * aggregation averages. Nothing is corpus-quadratic, nothing collects.
  */
object CharLm {

  /** (doc_id, tri, bi) interior trigram stream. */
  private def triRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(expr("transform(sequence(1, greatest(length(text) - 2, 1)), " +
          "i -> substring(text, i, 3))")).as("tri"))
      .where(length(col("tri")) === 3)
      .withColumn("bi", substring(col("tri"), 1, 2))

  /** Per-doc average char log-probability under the corpus model:
    * (doc_id, n_trigrams, avg_logprob rounded to 6). */
  def score(docs: DataFrame): DataFrame = {
    val tr = triRows(docs)
    val c3 = tr.groupBy("tri").agg(count(lit(1)).as("c3"))
    val c2 = tr.groupBy("bi").agg(count(lit(1)).as("c2"))
    // character vocabulary: a corpus-wide scalar, computed once
    val v = docs.select(explode(expr(
        "transform(sequence(1, length(text)), i -> substring(text, i, 1))")).as("c"))
      .distinct().count()
    val scored = tr
      .join(c3, "tri")
      .join(c2, "bi")
      .withColumn("lp", log((col("c3") + lit(1)).cast("double") /
        (col("c2") + lit(v)).cast("double")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"), sum("lp").as("s"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        round(coalesce(col("s") / col("n_trigrams"), lit(0.0)), 6).as("avg_logprob"))
  }
}
