package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: language-ID (stopword-count
  * heuristic), quality scoring (length/punctuation/stopword ratios), token
  * counting (whitespace + a BPE-ish regex), and document fingerprinting
  * (min-hash over word shingles, a winnowing-lite rolling fingerprint).
  * Pure column expressions — codegen'd, linear, shuffle-free per document.
  */
object TextAnalysis {

  def toks(text: Column): Column = split(text, " ")

  /** BPE-ish token count: word pieces OR single non-word-non-space chars. */
  def bpeTokenCount(text: Column): Column =
    size(expr("regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\\\s]', 0)"))

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "y", "de", "es"),
    "fr" -> Seq("le", "la", "et", "de", "est"))

  private def stopHits(lang: String): Column =
    size(filter(toks(col("text")), t => t.isInCollection(stopwords(lang))))

  /** Language-ID: arg-max of per-language stopword hits, fixed precedence
    * en > de > es > fr on ties (a CASE chain any SQL oracle can mirror). */
  def langId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      stopHits("en").as("s_en"), stopHits("de").as("s_de"),
      stopHits("es").as("s_es"), stopHits("fr").as("s_fr"))
      .withColumn("lang_pred",
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
          .when(col("s_es") >= col("s_fr"), "es")
          .otherwise("fr"))

  /** Quality metrics per document; every ratio is a single division over
    * integer counts (bit-stable vs an oracle). */
  def quality(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val nTok = size(t)
    val nStop = size(filter(t, x => x.isInCollection(stopwords("en"))))
    val nPunct = length(col("text")) - length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""))
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      nTok.as("n_tokens"),
      round(nStop.cast("double") / nTok, 6).as("stop_ratio"),
      round(nPunct.cast("double") / length(col("text")), 6).as("punct_ratio"),
      round((length(col("text")) - (nTok - 1)).cast("double") / nTok, 6).as("avg_tok_len"))
  }

  /** Token counts: whitespace and BPE-ish. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(toks(col("text"))).as("n_ws_tokens"),
      bpeTokenCount(col("text")).as("n_bpe_tokens"))

  /** Document fingerprint: minimum md5 over the document's word 5-shingles
    * (rolling window), falling back to md5(text) for short docs. Equal
    * fingerprints are strong near-dup candidates at fleet scale. */
  def fingerprint(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val n = size(t)
    val shingles = transform(sequence(lit(1), n - 4),
      i => md5(concat_ws(" ", slice(t, i, lit(5)))))
    docs.select(col("doc_id"),
      when(n >= 5, array_min(shingles)).otherwise(md5(col("text"))).as("fingerprint"))
  }
}
