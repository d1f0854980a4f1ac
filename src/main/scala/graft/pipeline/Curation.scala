package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between raw crawl and tokenizer: repetition-based quality signals
  * (the Gopher rules), PII/URL scrubbing, per-source caps, and
  * deterministic hash-based train/val/test splits. All are column
  * expressions or single keyed aggregations — linear in corpus size,
  * no driver materialization, no all-pairs shapes — so they run
  * unchanged over a 100 TB corpus.
  */
object Curation {

  private def toks = split(col("text"), " ")

  /** Word n-grams of `text` as an array column; empty when the document
    * has fewer than n tokens (guarded — Spark's `sequence(1, 0)` would
    * DESCEND, not return empty). */
  private def grams(n: Int) = {
    val t = toks
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))))
      .otherwise(array())
  }

  /** Gopher-style repetition signals (Rae et al. 2021, appendix A1.1):
    * `top_bigram_frac` — the fraction of word-bigram positions taken by
    * the single most frequent bigram — and `dup_trigram_frac` — the
    * fraction of word-trigram positions whose trigram occurs more than
    * once in the document. High values flag boilerplate / templated /
    * looping text that exact and MinHash dedup both miss (the duplicate
    * is WITHIN the document).
    *
    * Shape: both gram widths ride ONE exploded stream (tagged by n) into
    * one (doc_id, n, gram) count with map-side partial aggregation, then
    * a doc_id-keyed rollup — two hash aggregates sharing a shuffle
    * chain, nothing quadratic, no per-doc state beyond the gram counts. */
  def repetition(docs: DataFrame): DataFrame = {
    val tagged = docs.select(col("doc_id"),
      explode(concat(
        transform(grams(2), g => struct(lit(2).as("n"), g.as("g"))),
        transform(grams(3), g => struct(lit(3).as("n"), g.as("g"))))).as("t"))
    val counts = tagged
      .groupBy(col("doc_id"), col("t.n").as("n"), col("t.g").as("g"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy("doc_id").agg(
      max(when(col("n") === 2, col("cnt"))).as("m2"),
      sum(when(col("n") === 2, col("cnt"))).as("t2"),
      sum(when(col("n") === 3 && col("cnt") > 1, col("cnt"))).as("d3"),
      sum(when(col("n") === 3, col("cnt"))).as("t3"))
      .select(col("doc_id"),
        round(col("m2").cast("double") / col("t2"), 6).as("top_bigram_frac"),
        round(coalesce(col("d3"), lit(0L)).cast("double") / col("t3"), 6)
          .as("dup_trigram_frac"))
  }

  /** Scrub patterns, ordered: each is (regex, replacement token). The
    * regexes use only syntax Java regex and RE2 (the DuckDB oracle)
    * interpret identically — character classes, `+`/`{n,}` quantifiers,
    * `\s` — so redaction counts and the scrubbed text agree across
    * engines. URLs are scrubbed FIRST so an address or id inside a URL
    * is counted once, as the URL. */
  val scrubPatterns: Seq[(String, String)] = Seq(
    "https?://[^\\s]+" -> "<URL>",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "[0-9]{9,}" -> "<ID>")

  /** PII / boilerplate scrubbing: redact URLs, email addresses, and long
    * digit runs (phone/account/id numbers) with typed placeholder
    * tokens, keeping per-doc redaction counts. Counts are taken on the
    * PRE-scrub text per pattern in the same order the replacements run.
    * Pure `regexp_replace`/`regexp_extract_all` column expressions —
    * codegen'd, linear in text length, shuffle-free. */
  def scrub(docs: DataFrame): DataFrame = {
    val scrubbed = scrubPatterns.foldLeft(col("text")) {
      case (c, (re, tok)) => regexp_replace(c, re, tok)
    }
    def hits(re: String) = size(regexp_extract_all(col("text"), lit(re), lit(0)))
    docs.select(
      col("doc_id"),
      hits(scrubPatterns(0)._1).as("n_urls"),
      hits(scrubPatterns(1)._1).as("n_emails"),
      hits(scrubPatterns(2)._1).as("n_ids"),
      md5(scrubbed).as("scrub_sig"))
  }

  /** Per-source document cap — the "at most K pages per domain" rule
    * that keeps one over-crawled site from dominating a training mix.
    * Deterministic: the K smallest doc_ids per source survive, with
    * their rank.
    *
    * Shape: one window over (source, doc_id) — a single hash-partitioned
    * sort per source. At 100 TB with a skewed domain (one source = 10%
    * of the corpus), swap the window for the bounded top-K aggregation
    * ([[BoundedCollectAgg]]) so the heavy source carries a K-sized
    * buffer per map task instead of a full sort partition; semantics
    * are identical, so the window form stays the reference
    * implementation here. */
  def sourceCap(docs: DataFrame, k: Int): DataFrame =
    docs
      .withColumn("rank_in_source",
        row_number().over(Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      .where(col("rank_in_source") <= k)
      .select(col("doc_id"), col("source"), col("rank_in_source"))

  /** Deterministic content-addressed train/val/test split: the first
    * two hex chars of md5(doc_id) pick one of 256 buckets; buckets
    * `[00, e6)` → train (~90%), `[e6, f3)` → val (~5%), the rest →
    * test. Hash-based splits are the standard pipeline idiom because
    * they are stable under re-runs, shard-order changes, and corpus
    * growth — a document never migrates between splits. Pure column
    * expression; both engines lowercase-hex their md5, so the bucket
    * comparison is engine-independent. */
  def hashSplit(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val bucket = substring(md5(col(idCol).cast("string")), 1, 2)
    docs.select(col(idCol), bucket.as("bucket"),
      when(bucket < "e6", "train").when(bucket < "f3", "val")
        .otherwise("test").as("split"))
  }
}
