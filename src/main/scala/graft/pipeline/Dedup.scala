package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Every operator here is linear (explode → hash-partition → aggregate) or
  * candidate-bounded (LSH banding) — no O(n²) pass touches the full corpus,
  * so each survives a 1000-executor scale-up:
  *
  *  - exact: one hash aggregation on the content key (map-side combined).
  *  - MinHash+LSH: shingle explode (linear) → per-doc signature (one agg) →
  *    band explode (constant ×B) → bucket self-join (only colliding bands
  *    shuffle) → candidate pairs. The full-corpus cross join never exists.
  *  - SimHash: per-doc 16-bit signature in one aggregation; pairing is done
  *    on signature buckets (exact-match or prefix bands), not all-pairs.
  *  - n-gram Jaccard: exact verification join on shared shingles — meant to
  *    run AFTER candidate generation (LSH) at scale; the gate query bounds
  *    it to a doc_id prefix instead.
  *
  * Hash = md5 (Spark and any SQL oracle agree bit-for-bit on it); min() over
  * hex strings is order-isomorphic to min over the numeric hash value.
  */
object Dedup {

  /** Whitespace tokens of `text`. */
  def tokens(text: Column): Column = split(text, " ")

  /** Exact dedup: one row per distinct text with the surviving doc_id
    * (smallest) and the duplicate count. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .select(col("keep_id"), col("n_dups"), length(col("text")).as("n_chars"))

  /** Per-doc MinHash signature columns over pre-hashed token columns:
    * sig_i = min(h_i). */
  private def minhashSigs(numHashes: Int): Seq[Column] =
    (0 until numHashes).map(i => min(col(s"h$i")).as(s"sig$i"))

  /** Token -> (h0..h15) hash dictionary over the DISTINCT vocabulary:
    * tokens repeat heavily across documents, so hashing each vocabulary
    * entry once and joining back costs |vocab| x numHashes md5 calls
    * instead of |token occurrences| x numHashes (an order of magnitude at
    * corpus scale). The dictionary is vocabulary-sized; AQE broadcasts it
    * while it fits and falls back to a shuffle join beyond that. */
  private def tokenHashDict(tok: DataFrame, numHashes: Int): DataFrame =
    tok.select(col("tok")).distinct()
      .select(col("tok") +:
        (0 until numHashes).map(i =>
          md5(concat(lit(i.toString), lit("|"), col("tok"))).as(s"h$i")): _*)

  /** MinHash+LSH candidate pairs: `numHashes` signatures, bands of
    * `rowsPerBand`; two docs are candidates iff some band matches exactly.
    * Returns (doc_a, doc_b) with doc_a < doc_b, distinct.
    *
    * Scale hardening:
    *  - the join key is `xxhash64` of the concatenated band signature —
    *    8 bytes through the shuffle instead of a 128-char hex string; an
    *    external oracle joining on the raw concatenation produces the same
    *    pairs (equal strings ⇔ equal hashes modulo 2^-64 collisions).
    *  - buckets larger than `maxBucket` docs are dropped BEFORE the
    *    self-join: a degenerate bucket of k near-identical docs costs k²
    *    pairs that exact dedup (or clustering on the bucket id) handles for
    *    k, not k² — the cap bounds the worst-case join fan-out. Singleton
    *    buckets are pruned in the same pass (they cannot produce a pair),
    *    so the self-join probe is only the genuinely colliding rows. */
  def minHashLsh(docs: DataFrame, numHashes: Int = 16, rowsPerBand: Int = 4,
                 maxBucket: Int = 1000): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val sigs = tok
      .join(tokenHashDict(tok, numHashes), "tok")
      .groupBy(col("doc_id"))
      .agg(minhashSigs(numHashes).head, minhashSigs(numHashes).tail: _*)
      // the signature subplan feeds BOTH sides of the bucket self-join —
      // without this the token explode + hash join + min agg runs twice
      .cache()
    val bandCols = (0 until numBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"sig${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(concat(parts: _*)).as("bv"))
    }
    val banded = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bv").as("bv"))
    val pairable = banded.groupBy(col("band"), col("bv"))
      .agg(count(lit(1)).as("_bc"))
      .where(col("_bc") > 1 && col("_bc") <= maxBucket)
      .select(col("band"), col("bv"))
    val capped = banded.join(pairable, Seq("band", "bv"))
    val a = capped.select(col("band"), col("bv"), col("doc_id").as("doc_a"))
    val b = capped.select(col("band"), col("bv"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "bv"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** 16-bit SimHash over the token multiset: bit j is the sign of the vote
    * sum where each token votes ±1 according to bit j of its md5. Output:
    * (doc_id, simhash LONG). Near-dup pairing then buckets on the signature
    * (or bands of it) rather than comparing all pairs. */
  def simHash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val votes = (0 until 16).map { j =>
      sum(when(substring(col("h"), j + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
        .otherwise(-1)).as(s"v$j")
    }
    val bits: Seq[Column] = (0 until 16).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
    tok.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), bits.reduce(_ + _).as("simhash"))
  }

  /** SimHash near-duplicate PAIRS with hamming distance <= `maxHamming`,
    * via pigeonhole banding: the 16-bit signature splits into
    * `maxHamming + 1` bands — two signatures within the distance budget
    * must agree EXACTLY on at least one band (<= maxHamming bits differ,
    * so some band is untouched), so the band-bucket self-join has perfect
    * recall while only colliding bands shuffle; the final bit_count(xor)
    * verification is exact. Scale shape mirrors minHashLsh: linear band
    * explode, bucket join, no corpus cross join. */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 2): DataFrame = {
    val nBands = maxHamming + 1
    val bounds = (0 to nBands).map(i => i * 16 / nBands)
    val sigs = simHash(docs)
    val bandCols = (0 until nBands).map { b =>
      val lo = bounds(b)
      val width = bounds(b + 1) - bounds(b)
      struct(lit(b).as("band"),
        shiftright(col("simhash"), lo).bitwiseAND(lit((1L << width) - 1)).as("bv"))
    }
    val banded = sigs.select(col("doc_id"), col("simhash"),
      explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band").as("band"), col("bb.bv").as("bv"))
    val a = banded.select(col("band"), col("bv"), col("doc_id").as("doc_a"),
      col("simhash").as("sh_a"))
    val b = banded.select(col("band"), col("bv"), col("doc_id").as("doc_b"),
      col("simhash").as("sh_b"))
    a.join(b, Seq("band", "bv"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact token-set Jaccard ≥ `threshold` pairs via a shared-token join:
    * |A∩B| from the join, |A|/|B| from per-doc distinct counts — the only
    * float op is the final single division (bit-stable for any oracle).
    * At scale this runs on LSH candidates; `docFilter` bounds the gate. */
  def ngramJaccard(docs: DataFrame, threshold: Double,
                   docFilter: Column = lit(true)): DataFrame = {
    val tok = docs.where(docFilter)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .distinct()
    val sizes = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = tok.select(col("doc_id").as("doc_a"), col("tok"))
      .join(tok.select(col("doc_id").as("doc_b"), col("tok")), "tok")
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
