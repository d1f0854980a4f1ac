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
  * Scale shape: the per-doc trigram stream comes from the [[CharGrams]]
  * codegen kernel as DISTINCT (packed-long key, in-doc count) pairs —
  * no per-position explode, no interpreted `transform` lambdas, no gram
  * strings in any exchange (the first formulation exploded 1.4 B
  * per-position substrings through interpreted HOFs three times: 879 s
  * at 1M docs; this one is 45 s). c3 is one aggregation over that
  * stream; c2 is a prefix rollup OF c3 (c2(ab) = Σ_c c3(abc) — summing
  * the finished c3 table is exactly equal and costs |charset|³ rows —
  * the aggregate-from-the-smallest-table rule recorded in SCALE.md);
  * the char vocabulary V is the kernel at n=1 (per-doc distinct chars —
  * a charset-sized stream, not a per-char one). Scoring joins the count
  * tables back on the packed keys (AQE broadcasts them while small) and
  * one doc-keyed aggregation weights each distinct gram's log-prob by
  * its count — real-arithmetic-equal to the per-position sum, inside
  * the shared round(6). Nothing is corpus-quadratic, nothing collects
  * beyond the V scalar.
  */
object CharLm {

  /** Per-doc average char log-probability under the corpus model:
    * (doc_id, n_trigrams, avg_logprob rounded to 6). */
  def score(docs: DataFrame): DataFrame = {
    val tr = docs
      .select(col("doc_id"), explode(CharGrams.column(col("text"), 3)).as("g"))
      .select(col("doc_id"), col("g.k").as("k"), col("g.cnt").as("cnt"))
    val c3 = tr.groupBy("k").agg(sum("cnt").as("c3"))
    val c2 = c3.groupBy(shiftright(col("k"), 21).as("bi"))
      .agg(sum("c3").as("c2"))
    // character vocabulary: a corpus-wide scalar, computed once
    val v = docs.select(explode(CharGrams.column(col("text"), 1)).as("g"))
      .select(col("g.k")).distinct().count()
    val scored = tr
      .join(c3, "k")
      .withColumn("bi", shiftright(col("k"), 21))
      .join(c2, "bi")
      .withColumn("lp", col("cnt").cast("double") *
        log((col("c3") + lit(1)).cast("double") /
          (col("c2") + lit(v)).cast("double")))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_trigrams"), sum("lp").as("s"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        round(coalesce(col("s") / col("n_trigrams"), lit(0.0)), 6).as("avg_logprob"))
  }
}
