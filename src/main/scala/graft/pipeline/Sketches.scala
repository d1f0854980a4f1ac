package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable set sketches for corpus-scale cardinality and membership —
  * the summaries a 100 TB pipeline keeps when exact distinct-token sets
  * (billions of keys) no longer fit: HyperLogLog (Flajolet et al. 2007)
  * for distinct counting and a Bloom filter (Bloom 1970) for
  * seen-before membership (URL dedup lists, blocklists).
  *
  * Both are deliberately RELATIONAL, like [[CountMin]]: the sketch IS a
  * bounded relation — HLL is the (group, register, max-rho) table
  * (≤ groups×1024 rows at any corpus size), the Bloom filter is the
  * distinct set-bit-position table (≤ m rows) — built by ONE hash
  * aggregation that Catalyst map-side combines, merged across
  * partitions/groups for free by the same aggregation, and exactly
  * reproducible in SQL (md5-derived hashing, integer-only rho/position
  * arithmetic), so the gates' DuckDB oracles rebuild every register and
  * bit bit-for-bit.
  */
object Sketches {

  // ---- HyperLogLog: p = 10 → m = 1024 registers, 60-bit md5 hash ----

  val HllP = 10
  val HllM = 1024 // 1 << HllP

  /** Bits of hash left after the register index. 60-bit hash (15 hex
    * chars of md5 — stays inside a positive BIGINT in both engines)
    * minus 10 register bits. */
  val HllW = 50

  /** alpha_1024 (Flajolet et al. 2007, fig. 3). Evaluated from the same
    * decimal literals the oracle SQL spells out, so both engines hold
    * the identical double. */
  val HllAlpha: Double = 0.7213 / (1.0 + 1.079 / 1024.0)

  /** alpha * m^2 * 2^51 — the raw-estimate numerator after the exact
    * integer Z scaling below. scalb keeps the power-of-two factor exact;
    * the oracle re-parses this constant's shortest decimal repr to the
    * identical bits. */
  val HllScale: Double = HllAlpha * math.scalb(1.0, 2 * HllP + 51)

  /** 60-bit hash of the key: first 15 hex chars of md5. */
  private[pipeline] def hash60(key: Column): Column =
    conv(substring(md5(key), 1, 15), 16, 10).cast("long")

  /** Per-group HLL register table: (groups..., reg, maxrho) — at most
    * groups × 1024 rows out of ONE map-side-combined aggregation over
    * the item stream. rho is the leading-zero count of the low 50 hash
    * bits plus one (position of the first 1-bit), 51 when all-zero;
    * `51 - length(bin(w))` computes it with exact integer/string ops
    * that Spark and DuckDB share. */
  def hllRegisters(items: DataFrame, key: Column, groups: Seq[String]): DataFrame = {
    val h = hash60(key)
    val w = h.bitwiseAND(lit((1L << HllW) - 1))
    val rho = when(w === 0, lit(HllW + 1))
      .otherwise(lit(HllW + 1) - length(bin(w)))
    items
      .select(groups.map(col) :+ shiftright(h, HllW).as("reg") :+ rho.as("rho"): _*)
      .groupBy((groups :+ "reg").map(col): _*)
      .agg(max("rho").as("maxrho"))
  }

  /** Per-group distinct-count estimate from the register table:
    * (groups..., n_used, v_empty, zs, est). The harmonic-mean
    * denominator is kept EXACT: Z = Σ 2^-M_j scaled by 2^51 is the
    * integer Σ 2^(51-M_j) (≤ 1024·2^51 = 2^61, inside BIGINT), with
    * empty registers contributing 2^51 each — so the only float ops are
    * the final division and the small-range `m·ln(m/V)` linear-counting
    * correction (Flajolet et al. §4), both single IEEE ops on identical
    * operands in both engines. */
  def hllEstimate(items: DataFrame, key: Column, groups: Seq[String]): DataFrame = {
    val perReg = expr(s"shiftleft(CAST(1 AS BIGINT), ${HllW + 1} - maxrho)")
    val agg = hllRegisters(items, key, groups)
      .groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("n_used"), sum(perReg).as("zs_used"))
    val vEmpty = lit(HllM.toLong) - col("n_used")
    val zs = col("zs_used") + vEmpty * lit(1L << (HllW + 1))
    val raw = lit(HllScale) / zs.cast("double")
    val est = when(raw <= lit(2.5 * HllM) && vEmpty > 0,
      lit(HllM.toDouble) * log(lit(HllM.toDouble) / vEmpty.cast("double")))
      .otherwise(raw)
    agg.select(
      groups.map(col) ++ Seq(
        col("n_used"),
        vEmpty.as("v_empty"),
        zs.as("zs"),
        round(est, 6).as("est")): _*)
  }

  // ---- Bloom filter: m = 2^20 bits, k = 7 hashes ----

  /** 2^20 bits. Sized for realistic vocab: at n = 100k distinct keys the
    * fill is kn/m ≈ 0.49 → false-positive rate (1-e^{-kn/m})^k ≈ 0.6%;
    * a 16k-bit demo filter saturated at only ~5k keys. Still a tiny
    * bounded relation: ≤ m rows of one BIGINT. The 20-bit md5 prefix in
    * [[posCol]] spans exactly [0, 2^20), so every hash bit feeds the
    * position. */
  val BloomM = 1 << 20
  val BloomK = 7

  /** Hash-i bit position of a key: the 20-bit md5 prefix of "i|key"
    * mod m — the same nibble arithmetic as [[CountMin.bucketOf]], so
    * the oracle's positional hex sum reproduces it exactly. */
  private def posCol(i: Int, key: Column): Column =
    pmod(conv(substring(md5(concat(lit(s"$i|"), key)), 1, 5), 16, 10)
      .cast("long"), lit(BloomM.toLong))

  /** Driver-side twin of [[posCol]] for probe construction and specs. */
  def bloomPosOf(i: Int, key: String): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i|$key".getBytes("UTF-8"))
    val hex = h.take(3).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(5), 16) % BloomM
  }

  /** The filter: the distinct set-bit-position relation (≤ m rows at
    * any corpus size). The k-way hashing runs on the DISTINCT key
    * table, not the occurrence stream (the CountMin vocab-table rule —
    * at 200M token occurrences that is 7×50k hashes, not 1.4B). */
  def bloomBits(keys: DataFrame, key: Column): DataFrame = {
    val ks = keys.select(key.as("k")).distinct()
    val positions = (0 until BloomK).map(i => posCol(i, col("k")))
    ks.select(explode(array(positions: _*)).as("pos")).distinct()
  }

  /** Probe the filter: (tok, n_hit, might_contain, n_bits_set).
    * might_contain is the classic all-k-bits-set test (no false
    * negatives; false-positive rate (1-e^{-kn/m})^k). The bit relation
    * is ≤ m rows — broadcast to the probe side; n_bits_set reports the
    * fill so callers can monitor saturation. */
  def bloomProbe(keys: DataFrame, key: Column, probes: Seq[String]): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    // ONE distributed pass materializes the set-bit relation — bounded
    // ≤ m rows by construction, so it collects like a vocab table (≤ 8 MB
    // at full fill). The fill count and every probe verdict then derive
    // from the SAME collected bits; the previous formulation evaluated
    // the bloomBits subplan twice (once for the fill aggregate, once for
    // the probe join), doubling the corpus-sized distinct+hash scan. The
    // probe side is a driver-provided token list, so the "join" is k set
    // lookups per probe — no second job at all.
    val bits = bloomBits(keys, key).as[Long].collect().toSet
    val nSet = bits.size.toLong
    probes.map { t =>
      val hits = (0 until BloomK).count(i => bits(bloomPosOf(i, t))).toLong
      (t, hits, hits == BloomK.toLong, nSet)
    }.toDF("tok", "n_hit", "might_contain", "n_bits_set")
  }

  // ---- Quantile sketch: bottom-k priority sample ----

  /** Default sample size: rank error ≈ 1/√k ≈ 2.2 % of n. */
  val QuantileK = 2048

  /** The quantile sketch relation: per group, the [[QuantileK]]-bounded
    * bottom-k-by-md5-priority sample plus the group's EXACT count —
    * (groups..., n, pri, v), at most k rows per group out of ONE
    * map-side-combined aggregation whose partials are k-bounded heaps
    * ([[BottomKSample]]).
    *
    * Why a bottom-k sample and not a KLL/GK summary: KLL's compactor
    * cascade and GK's insert/compress loop are inherently SEQUENTIAL —
    * their kept set depends on arrival order, so no external engine can
    * re-derive it relationally and the house bit-exact-oracle rule would
    * be unmeetable. The bottom-k sample is the mergeable quantile summary
    * that IS a pure function of the input multiset ("k smallest md5
    * priorities"), with the textbook O(1/√k) rank-error bound (Agarwal
    * et al. 2013, "Mergeable Summaries" §5) — the price over KLL's
    * O(1/k·log) is a constant-factor-larger k, which at k=2048 is still
    * a ≤ 32 KB relation per group at ANY corpus size. Merging two
    * sketches = union + keep-k-smallest, asserted in the spec. */
  def quantileSample(items: DataFrame, key: Column, value: Column,
                     groups: Seq[String], k: Int = QuantileK): DataFrame =
    items
      .groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("n"),
        BottomKSample.column(hash60(key), value.cast("double"), k).as("smp"))
      .select(groups.map(col) ++ Seq(col("n"),
        explode(col("smp")).as("kv")): _*)
      .select(groups.map(col) ++ Seq(col("n"),
        col("kv.pri").as("pri"), col("kv.v").as("v")): _*)

  /** Quantile estimates from the sketch: (groups..., q, n, m, est) for
    * each requested q — est is the sample's lower quantile, the value at
    * zero-based sorted index ⌊q·(m−1)⌋ (m = |sample| = min(n, k)). The
    * rank/pick arithmetic runs on the k-bounded sample relation (window
    * over ≤ k rows per group), not the corpus; when n ≤ k the sample is
    * the group itself and the estimate is exact. */
  def quantiles(items: DataFrame, key: Column, value: Column,
                groups: Seq[String], qs: Seq[Double],
                k: Int = QuantileK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val smp = quantileSample(items, key, value, groups, k)
    val w = Window.partitionBy(groups.map(col): _*).orderBy(col("v"), col("pri"))
    val ranked = smp
      .withColumn("rn0", row_number().over(w) - 1)
      .withColumn("m", count(lit(1)).over(
        Window.partitionBy(groups.map(col): _*)))
    ranked
      .select(groups.map(col) ++ Seq(col("n"), col("m"), col("rn0"), col("v"),
        explode(array(qs.map(lit): _*)).as("q")): _*)
      .where(col("rn0") === floor(col("q") * (col("m") - 1)).cast("int"))
      .select(groups.map(col) ++ Seq(col("q"), col("n"), col("m"),
        col("v").as("est")): _*)
  }
}
