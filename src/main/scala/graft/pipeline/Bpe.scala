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
    * (a, b). Stops early when no pair repeats (`minCount`).
    *
    * Execution shape: the corpus is touched by exactly ONE aggregation
    * (the word-frequency table). When that table's distinct-word count
    * fits `maxLocalWords` (it is vocab-sized — millions of rows even at
    * 100 TB, not corpus-sized), it is collected and the merge loop runs
    * LOCALLY with incremental pair statistics — a real 32k-merge vocab
    * trains in seconds instead of scheduling 2 Spark jobs per merge
    * (~64k jobs). The distributed per-round loop remains as the overflow
    * path for word tables past the bound, producing the identical merge
    * sequence (BpeSpec proves parity). */
  def train(docs: DataFrame, nMerges: Int, minCount: Long = 2,
            maxLocalWords: Long = 4000000L): Seq[Merge] = {
    val wc = wordCounts(docs)
    // limit(bound+1) bounds what the driver ever holds; the extra row only
    // signals overflow (its contents are never used)
    val head = wc.select(col("w"), col("cnt"))
      .limit(math.min(maxLocalWords, Int.MaxValue - 8L).toInt + 1).collect()
    if (head.length <= maxLocalWords) {
      val words = head.map(r => (r.getString(0), r.getLong(1)))
      trainLocal(words, nMerges, minCount)
    } else trainDistributed(docs, nMerges, minCount)
  }

  /** UTF-8 byte-order comparison (= code-point order) — Spark's
    * UTF8String sorts strings by their UTF-8 bytes, while Java's
    * String.compareTo sorts by UTF-16 code units; they disagree for
    * supplementary characters vs U+E000..U+FFFF. The local tie-break must
    * match the distributed `orderBy`. */
  private[pipeline] def utf8Lt(x: String, y: String): Boolean = {
    var i = 0
    var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i)
      val cy = y.codePointAt(j)
      if (cx != cy) return cx < cy
      i += Character.charCount(cx)
      j += Character.charCount(cy)
    }
    x.length - i < y.length - j
  }

  /** Exact sequential BPE over a collected (word, count) table with
    * incremental pair statistics (the classic in-memory trainer shape:
    * only words CONTAINING the merged pair are rewritten each round, and
    * the candidate max is kept in a lazy heap whose stale entries are
    * repaired on pop). Merge-for-merge identical to [[trainDistributed]];
    * O(affected-word symbols) per round instead of two Spark jobs. */
  private[pipeline] def trainLocal(words: Array[(String, Long)], nMerges: Int,
                                   minCount: Long): Seq[Merge] = {
    type Pair = (String, String)
    val syms = words.map { case (w, _) =>
      val b = new scala.collection.mutable.ArrayBuffer[String](w.length)
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        b += w.substring(i, i + n)
        i += n
      }
      b
    }
    val cnt = words.map(_._2)
    val stats = scala.collection.mutable.HashMap.empty[Pair, Long]
    val index = scala.collection.mutable.HashMap.empty[Pair, scala.collection.mutable.HashSet[Int]]
    def addPairs(wi: Int, sign: Long): Unit = {
      val s = syms(wi)
      var i = 0
      while (i + 1 < s.length) {
        val p = (s(i), s(i + 1))
        val next = stats.getOrElse(p, 0L) + sign * cnt(wi)
        if (next == 0L) stats.remove(p) else stats(p) = next
        if (sign > 0) index.getOrElseUpdate(p, scala.collection.mutable.HashSet.empty) += wi
        i += 1
      }
      if (sign < 0) {
        i = 0
        while (i + 1 < s.length) {
          val p = (s(i), s(i + 1))
          index.get(p).foreach { set => set -= wi; if (set.isEmpty) index.remove(p) }
          i += 1
        }
      }
    }
    var wi = 0
    while (wi < syms.length) { addPairs(wi, 1L); wi += 1 }
    // lazy max-heap: (count desc, a asc, b asc); entries go stale when a
    // pair's count drops — a popped entry is validated against `stats` and
    // re-pushed with the live count on mismatch
    val heapOrd = new java.util.Comparator[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int =
        if (x._1 != y._1) java.lang.Long.compare(y._1, x._1)
        else if (x._2 != y._2) { if (utf8Lt(x._2, y._2)) -1 else 1 }
        else if (x._3 != y._3) { if (utf8Lt(x._3, y._3)) -1 else 1 }
        else 0
    }
    val heap = new java.util.PriorityQueue[(Long, String, String)](math.max(stats.size, 16), heapOrd)
    stats.foreach { case ((a, b), c) => heap.add((c, a, b)) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var k = 0
    var done = false
    while (k < nMerges && !done) {
      var winner: Pair = null
      while (winner == null && !done && !heap.isEmpty) {
        val (c, a, b) = heap.poll()
        stats.get((a, b)) match {
          case Some(live) if live == c => if (c >= minCount) winner = (a, b) else done = true
          case Some(live) => heap.add((live, a, b)) // stale; repair lazily
          case None => () // pair vanished entirely
        }
      }
      if (winner == null) done = true
      else {
        val (a, b) = winner
        merges += Merge(k, a, b)
        val affected = index.get((a, b)).map(_.toArray).getOrElse(Array.empty[Int])
        affected.foreach { w =>
          addPairs(w, -1L)
          val merged = mergeOnce(syms(w).toSeq, a, b)
          syms(w).clear()
          syms(w) ++= merged
          addPairs(w, 1L)
          // push the NEW pairs (and repaired neighbors); stale entries for
          // decremented pairs are handled on pop
          val s = syms(w)
          var i = 0
          while (i + 1 < s.length) {
            val p = (s(i), s(i + 1))
            stats.get(p).foreach(c => heap.add((c, s(i), s(i + 1))))
            i += 1
          }
        }
        k += 1
      }
    }
    merges.toSeq
  }

  /** The distributed per-round loop — the overflow path when the word
    * table exceeds the driver bound. Two jobs per merge over vocab-sized
    * data; merge-for-merge identical to [[trainLocal]]. */
  private[pipeline] def trainDistributed(docs: DataFrame, nMerges: Int,
                                         minCount: Long = 2): Seq[Merge] = {
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
