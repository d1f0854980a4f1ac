package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed end-to-end curation run — raw crawl to training shards —
  * chaining the individually-gated operators in the order published
  * pipelines use them (C4 / Gopher / RefinedWeb shape):
  *
  *   1. markup strip       ([[Curation.cleanExpr]] — C4 text extraction)
  *   2. PII scrub          ([[Curation.scrubExpr]])
  *   3. language filter    ([[TextAnalysis.langId]])
  *   4. quality filter     ([[Curation.qualityScore]] ≥ threshold)
  *   5. repetition filter  ([[Curation.repetition]] Gopher bounds)
  *   6. exact dedup        (content-hash keep-smallest, [[Dedup.exact]]
  *      semantics)
  *   7. sequence packing   ([[Curation.packSequences]])
  *   8. shard write        ([[Curation.writeShards]])
  *
  * Stages 1-2 are shuffle-free column rewrites fused into one projection;
  * 3-5 are per-doc signals (langId and qualityScore are codegen'd column
  * expressions; repetition is the [[GramStats]] kernel) — the whole
  * filter chain runs in a single stage over the corpus scan. Dedup adds
  * the one content-hash shuffle, packing its bucketed prefix sum. Every
  * stage is deterministic (content-addressed, no RNG), so re-running the
  * pipeline over the same corpus reproduces the same shards byte-for-byte
  * — the property that makes a 100 TB curation run resumable and
  * auditable.
  */
object CurationPipeline {

  /** Pipeline thresholds; defaults follow the published pipelines'
    * ballpark (Gopher repetition bounds, mid quality cut). */
  final case class Config(
    langs: Set[String] = Set("en"),
    minQuality: Double = 0.3,
    maxTopBigramFrac: Double = 0.30,
    maxDupTrigramFrac: Double = 0.30,
    tokensPerSeq: Long = 1024L,
    nShards: Int = 16,
    maxRecordsPerShard: Int = 1 << 20)

  /** Stages 1-6: returns the curated corpus — (doc_id, text, lang,
    * quality_score) with markup stripped, PII scrubbed, off-language /
    * low-quality / repetitive / duplicate docs removed. Every signal is
    * a per-doc COLUMN expression (the kernels + logistic score), stacked
    * in one projection — no joins between signal frames, so stages 1-5
    * really are a single stage over the corpus scan; a doc too short to
    * HAVE bigrams carries null repetition fractions and passes those
    * filters rather than vanishing. */
  /** Stages 1-2: markup strip + PII scrub as one text rewrite. */
  private def cleaned(raw: DataFrame): DataFrame =
    raw.withColumn("text",
      Curation.scrubExpr(Curation.cleanExpr(col("text"))))
      .where(length(col("text")) > 0)

  /** Stages 3-5: the signal columns + threshold filter, each signal
    * referenced ONCE in the filter (`coalesce(frac, 0) <= bound`
    * instead of an isNull disjunct — a null fraction means "no
    * evidence", which passes; the single reference keeps alias inlining
    * from duplicating the kernel). Keeps ALL input columns (the
    * streaming caller needs its event-time column downstream) — the
    * narrow projection is [[outputShape]]. Runs post-dedup in batch
    * (the window is its pushdown barrier) and PRE-dedup in streaming
    * (so dedup state holds only survivors); both orders give the same
    * survivors because exact duplicates share every signal. Pure
    * projections — legal in Structured Streaming. */
  private def signalFilter(docs: DataFrame, cfg: Config): DataFrame = {
    val t = split(col("text"), " ")
    TextAnalysis.withLangPred(docs)
      .withColumn("quality_score", Curation.qualityScoreExpr)
      .withColumn("top_bigram_frac", Curation.topBigramFracExpr(t))
      .withColumn("dup_trigram_frac", Curation.dupTrigramFracExpr(t))
      .where(col("lang_pred").isin(cfg.langs.toSeq: _*) &&
        col("quality_score") >= cfg.minQuality &&
        coalesce(col("top_bigram_frac"), lit(0.0)) <= cfg.maxTopBigramFrac &&
        coalesce(col("dup_trigram_frac"), lit(0.0)) <= cfg.maxDupTrigramFrac)
  }

  private def outputShape(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("text"), col("lang_pred").as("lang"),
      col("quality_score"))

  private def signalSelect(docs: DataFrame, cfg: Config): DataFrame =
    outputShape(signalFilter(docs, cfg))

  /** Single-pass filter audit: attributes every RAW document to the
    * first pipeline stage that would drop it — `empty` / `off_language`
    * / `low_quality` / `repetitive` / `pass` — and returns (stage,
    * n_docs) counts. This is the per-filter diagnosis [[run]]'s boundary
    * counts cannot give (the production filter chain is one fused
    * predicate, so intermediate populations never materialize), at the
    * cost of ONE corpus pass: all signals evaluate in a single
    * projection (ProjectExec's codegen does common-subexpression
    * elimination, so the shared cleaned-text chain computes once per
    * row), then a 5-row aggregation. Dedup is not attributed here — it
    * is corpus-relative, not per-doc; its drop count is
    * `pass − |curate|`. */
  def audit(raw: DataFrame, cfg: Config = Config()): DataFrame = {
    val ct = Curation.scrubExpr(Curation.cleanExpr(col("text")))
    val t = split(ct, " ")
    val langOk = coalesce(LangPred.column(TextAnalysis.langNorm(ct)),
      lit(TextAnalysis.trigramProfiles.last._1))
      .isin(cfg.langs.toSeq: _*)
    // null text folds into `empty` EXPLICITLY: curate() drops it at the
    // length>0 filter (length(NULL) is NULL, so the where rejects), while
    // the lang coalesce below would otherwise misfile it as the fallback
    // profile's language — the two paths must agree on every input
    val stage = when(col("text").isNull || length(ct) === 0, "empty")
      .when(!langOk, "off_language")
      .when(round(QualityScore.column(ct), 6) < cfg.minQuality, "low_quality")
      .when(coalesce(Curation.topBigramFracExpr(t), lit(0.0)) >
          cfg.maxTopBigramFrac ||
        coalesce(Curation.dupTrigramFracExpr(t), lit(0.0)) >
          cfg.maxDupTrigramFrac, "repetitive")
      .otherwise("pass")
    raw.select(stage.as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_docs"))
  }

  def curate(raw: DataFrame, cfg: Config = Config()): DataFrame =
    // dedup FIRST (exact-text duplicates have identical signals, so
    // dedup-then-filter equals filter-then-dedup — and the Window is a
    // pushdown barrier: the signal filter cannot be inlined below it,
    // so the text-clean chain runs once per row below the exchange and
    // each signal kernel once per reference above it, on the smaller
    // deduped row set). Keep-smallest via one content-hash window
    // (16-byte key), never a self-join.
    signalSelect(
      cleaned(raw)
        .withColumn("_rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
        .where(col("_rk") === 1).drop("_rk"),
      cfg)

  /** The streaming curation pipeline: the SAME clean + signal + filter
    * chain as [[curate]] (shared code), with the batch keep-smallest
    * window replaced by [[Dedup.exactStream]]'s watermark-bounded
    * content-hash dedup. Semantics delta vs batch, by necessity: the
    * stream keeps the FIRST ARRIVAL of each distinct text (a stream
    * cannot know a smaller doc_id is coming), and a duplicate arriving
    * after its original's state eviction is re-emitted — run batch
    * [[curate]] over the stored corpus as the exactness backstop.
    *
    * Input: a STREAMING frame with doc_id, text, and event-time column
    * `tsCol`. Output: curated append stream. */
  def curateStream(raw: DataFrame, tsCol: String, cfg: Config = Config(),
                   lateness: String = "10 minutes"): DataFrame =
    // filter BEFORE the stateful dedup: state and shuffle then hold only
    // filter survivors, not every distinct off-language/junk text on the
    // feed (at crawl scale the state store is the scarce resource; the
    // single-reference kernels make the pre-barrier filter's inlined
    // re-evaluations a bounded CPU cost, not a correctness or memory
    // one). Batch curate orders the other way because its window
    // exchange doubles as the pushdown barrier.
    outputShape(
      Dedup.exactStream(signalFilter(cleaned(raw), cfg), tsCol, lateness))

  /** The full run (stages 1-8): curate, assign sequences, write bounded
    * parquet shards (same md5 order as the packing, so a sequence's
    * documents are contiguous in the written layout), and return the
    * document count at each pipeline boundary — (stage, n_docs) rows
    * `raw` / `curated` / `shards_written`, all DOCUMENT counts (the
    * filter stages share one projection, so the intermediate per-filter
    * populations never materialize; compute them with the individual
    * signal operators when debugging a specific filter). The boundary
    * counts cost one extra pass each (driver-sized output); skip them in
    * production by calling [[curate]] + [[Curation.writeShards]]
    * directly. */
  def run(raw: DataFrame, dir: String, cfg: Config = Config()): DataFrame = {
    val spark = raw.sparkSession
    val curated = curate(raw, cfg).cache()
    val packed = curated.join(
      Curation.packSequences(curated, cfg.tokensPerSeq), Seq("doc_id"))
    Curation.writeShards(packed, dir, cfg.nShards, cfg.maxRecordsPerShard)
    val funnel = Seq(
      "raw" -> raw.count(),
      "curated" -> curated.count(),
      "shards_written" -> spark.read.parquet(dir).count())
    curated.unpersist()
    spark.createDataFrame(funnel).toDF("stage", "n_docs")
  }
}
