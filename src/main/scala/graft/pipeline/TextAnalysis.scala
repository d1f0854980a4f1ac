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

  private[pipeline] val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "y", "de", "es"),
    "fr" -> Seq("le", "la", "et", "de", "est"))

  // ---- language identification ------------------------------------------

  /** Character-trigram profiles (Cavnar & Trenkle, "N-Gram-Based Text
    * Categorization", 1994 — the method behind textcat/langdetect): the
    * most frequent space-padded trigrams of each language, 40 per
    * language so raw hit counts are comparable without normalization.
    * Scoring is set-intersection counting — the SQL-mirrorable
    * simplification of the out-of-place rank metric — which, unlike the
    * old stopword heuristic, discriminates on unseen words and
    * morphology (e.g. "ção"/"ão " for pt, "sch"/"cht" for de, "ión" for
    * es) rather than a handful of ambiguous function words ("de", "la"
    * appear in four of these languages). */
  val trigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" th", "the", "he ", "ed ", " an", "and", "nd ", " of", "of ",
      " in", "ing", "ng ", " to", "to ", "ion", "on ", "ent", " co", "er ",
      "at ", "tio", " is", "is ", " be", " re", "es ", " wi", "ith", "th ",
      " ha", "hat", "tha", " it", "it ", "as ", " he", "ere", " ar", "are", " no"),
    "de" -> Seq("en ", "er ", "ch ", "cht", " de", "der", "ie ", "die", " di",
      "und", " un", "nd ", "ein", " ei", "ich", "sch", " sc", "che", "den",
      " ge", "gen", "ung", "ng ", "in ", " be", "ver", " ve", "das", " da",
      "ten", "te ", "ber", " au", "auf", "eit", "hen", "ht ", "lic", "ist", " zu"),
    "es" -> Seq(" de", "de ", "os ", "la ", " la", "el ", " el", "en ", " en",
      "es ", " es", "as ", "ón ", "ión", "ció", "aci", "que", " qu", "ue ",
      "nte", "con", " co", "ent", "ado", "do ", "ar ", "una", " un", "no ",
      "ra ", "por", " po", "par", " pa", "sta", "est", " se", "or ", "a d", "e l"),
    "fr" -> Seq(" de", "de ", "es ", " le", "le ", "ent", "nt ", "la ", " la",
      "et ", " et", "ion", "on ", "re ", " co", "e d", "e l", "que", " qu",
      "ue ", "les", "des", " pa", "par", "tio", "eur", "our", " po", "pou",
      "ur ", "dan", " da", "ans", "ne ", "une", " un", "er ", "it ", " au", "ait"),
    "it" -> Seq(" di", "di ", "to ", "la ", " la", "che", " ch", "he ", "re ",
      "no ", "o d", "e d", " co", "con", "one", "ion", "zio", "azi", "ne ",
      "ato", "ell", "lla", " de", "del", "le ", "li ", "gli", " gl", " un",
      "una", "per", " pe", "er ", "ri ", " in", "in ", "si ", "non", " no", "ità"),
    "pt" -> Seq(" de", "de ", "os ", "o d", "as ", " a ", "ão ", "ção", "açã",
      " co", "con", "es ", " es", "do ", " do", "da ", " da", "em ", " em",
      "que", " qu", "ue ", "ent", "nte", "ara", " pa", "par", "ra ", "com",
      "a d", "ade", "dad", "um ", " um", "is ", "or ", "res", "ais", " se", "s d"),
    "nl" -> Seq(" de", "de ", "en ", "n d", " he", "het", "et ", " va", "van",
      "an ", " ee", "een", " ge", "gen", "cht", " da", "dat", "at ", " in",
      "in ", "ijk", "lij", "ver", " ve", "er ", "der", "aar", " aa", "oor",
      " vo", "voo", "rde", "nde", "ing", "ng ", "te ", " te", "sch", " op", "op "),
    "sv" -> Seq("en ", "et ", "ar ", "tt ", "att", " at", "och", " oc", "ch ",
      "som", " so", "om ", "för", " fö", "ör ", "de ", "er ", "ing", "ng ",
      "til", " ti", "ill", "ll ", "på ", " på", "av ", " av", "är ", " är",
      "and", "nde", "den", " de", "har", " ha", "ter", " st", "sta", "lig", "ka "))

  /** Letters of the eight profiled languages; everything else separates
    * words. Shared with the SQL oracle verbatim. */
  val langLetterClass = "[^a-zàâäáãåçèéêëìíîïñòóôöõùúûüß]+"

  /** Lowercase, strip non-letters, pad with spaces so word-boundary
    * trigrams (" th", "ng ") exist at the edges. */
  def langNorm(text: Column): Column =
    concat(lit(" "), regexp_replace(lower(text), langLetterClass, " "), lit(" "))

  /** Top function words per language — the second evidence channel. A
    * function-word hit outweighs [[functionWordWeight]] trigram hits: on
    * in-domain prose the channels agree, while on out-of-domain text
    * (jargon, code-like word lists) whole-word matches are far more
    * reliable than generic letter sequences like "le "/"er " that fire
    * inside technical vocabulary. */
  val functionWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "a", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "eine", "von"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "las", "por", "con", "una"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "une", "dans", "pour"),
    "it" -> Seq("il", "la", "di", "che", "e", "per", "una", "del", "non", "gli"),
    "pt" -> Seq("o", "a", "de", "que", "e", "da", "do", "uma", "para", "não"),
    "nl" -> Seq("de", "het", "een", "van", "en", "dat", "is", "op", "niet", "voor"),
    "sv" -> Seq("och", "att", "det", "som", "en", "på", "är", "av", "för", "med"))

  val functionWordWeight = 10

  /** Language-ID: arg-max of per-language evidence = trigram-profile hits
    * + 10 × function-word hits, fixed precedence en > de > es > fr > it
    * > pt > nl > sv on ties (a CASE chain any SQL oracle can mirror).
    * Evidence comes from the native [[LangEvidence]] kernel — ONE pass
    * over the normalized string with bitmask profile lookups, replacing
    * 16 interpreted `filter`/`isInCollection` folds per document (750 s
    * → seconds at 1M-doc scale); integer counts, so the arg-max and the
    * SQL oracle are unchanged. */
  def langId(docs: DataFrame): DataFrame = {
    val langs = trigramProfiles.map(_._1)
    val scored = docs
      .select(col("doc_id"), LangEvidence.column(langNorm(col("text"))).as("_e"))
      .select(col("doc_id") +: langs.zipWithIndex.map { case (lang, i) =>
        element_at(col("_e"), i + 1).as(s"s_$lang")
      }: _*)
    scored.withColumn("lang_pred", langPredFrom(lang => col(s"s_$lang")))
  }

  /** The arg-max CASE chain over per-language scores, parameterized by
    * how a language's score column is obtained — shared by [[langId]]
    * (named s_* columns) and [[withLangPred]] (element_at on the raw
    * evidence array). */
  private def langPredFrom(score: String => Column): Column = {
    val langs = trigramProfiles.map(_._1)
    def wins(lang: String): Column = {
      val rest = langs.dropWhile(_ != lang).drop(1)
      rest.map(o => score(lang) >= score(o)).reduceOption(_ && _)
        .getOrElse(lit(true))
    }
    langs.init.foldLeft(when(lit(false), "")) { (c, lang) =>
      c.when(wins(lang), lang)
    }.otherwise(langs.last)
  }

  /** Composable form of [[langId]]: ADDS `lang_pred` to `df` via the
    * [[LangPred]] kernel — ONE expression, no temp columns, no joins —
    * so a pipeline can stack it with other per-doc signals in a single
    * projection stage, and a pushed-down filter referencing it costs
    * one evidence pass per reference (the CASE-chain form exploded to
    * 56 kernel copies per row under alias inlining —
    * [[CurationPipeline.curate]]'s plan). Same arg-max, same
    * precedence. */
  def withLangPred(df: DataFrame, textCol: String = "text"): DataFrame =
    // coalesce for null-text parity with langId: its CASE chain falls
    // through `otherwise` to the last language on null input, while the
    // kernel null-propagates
    df.withColumn("lang_pred",
      coalesce(LangPred.column(langNorm(col(textCol))),
        lit(trigramProfiles.last._1)))

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
    * fingerprints are strong near-dup candidates at fleet scale.
    *
    * Computed by the [[ShingleMin]] codegen kernel — one digest pass per
    * window, no shingle strings or per-window hex in the plan (the HOF
    * `array_min(transform(..., md5(concat_ws(slice(...)))))` walked
    * interpreted lambdas per window: 126 s at 1M docs, kernel 2.9 s;
    * fingerprints identical bit-for-bit). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      coalesce(ShingleMin.column(toks(col("text")), 5), md5(col("text")))
        .as("fingerprint"))

  /** BM25 ranking (Robertson/Sparck Jones; the Lucene-style
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf) of the corpus against a
    * bag of query terms — relevance-ranked retrieval / quality-weighted
    * sampling over a training corpus.
    *
    * Scale shape: the exploded token stream is pruned to the query terms
    * BEFORE its groupBy shuffle, so tf is |matching tokens|-sized, never
    * corpus-sized; df and the (N, avgdl) corpus stats are one-row/tiny
    * aggregates broadcast onto the tf stream; the final ordering sorts
    * only docs that matched ≥1 term, and ranks are assigned after the
    * top-N cut. Per-term contributions are accumulated in FIXED query
    * order (one conditional sum per term), so the double addition order
    * is deterministic and an external oracle reproduces it exactly. */
  def bm25(docs: DataFrame, queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75, topN: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val dl = docs.select(col("doc_id"), size(toks(col("text"))).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))
    val tf = docs.select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .where(col("tok").isin(queryTerms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("df"))
    val contrib = tf
      .join(broadcast(df), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("c",
        col("idf") * col("tf") * (lit(k1) + lit(1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
    val perTerm = contrib.groupBy("doc_id").agg(
      sum(when(col("tok") === queryTerms.head, col("c"))).as("_s0"),
      queryTerms.tail.zipWithIndex.map { case (t, i) =>
        sum(when(col("tok") === t, col("c"))).as(s"_s${i + 1}")
      }: _*)
    val score = queryTerms.indices
      .map(i => coalesce(col(s"_s$i"), lit(0.0)))
      .reduceLeft(_ + _)
    val top = perTerm.withColumn("score", score)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
    // rank assignment runs on the ≤ topN cut, not the corpus
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), round(col("score"), 6).as("score"), col("rank"))
  }
}
