package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Persisted, APPENDABLE IVF index — the ANN state a continuously-fed
  * corpus searches and grows batch by batch, applying [[SigIndex]]'s
  * marker-manifest discipline to [[Similarity.ivfBuild]]'s
  * cell-partitioned layout (which is rebuild-only):
  *
  * {{{
  * dir/_gen.<ts>.<gid>                generation markers (newest wins)
  * dir/gen-<gid>/centroids/           the generation's coarse quantizer
  * dir/gen-<gid>/codebooks/           PQ codebooks (product-quantized mode)
  * dir/gen-<gid>/batch=<name>/cell=<i>/  one append, partitioned by cell
  * dir/gen-<gid>/_live.<ts>.<name>    batch visibility markers
  * dir/gen-<gid>/_seen.<ts>.<name>    folded-batch replay records
  * dir/gen-<gid>/_slot.<seq>          writer-sequence claims
  * }}}
  *
  *  - APPEND assigns the batch against the CURRENT generation's fixed
  *    centroids (one codegen'd projection — the quantizer rides the
  *    stage binary) and writes a fresh `batch=<name>/` directory
  *    partitioned by cell, then publishes its marker with one atomic
  *    create: a crashed append is invisible, concurrent readers see the
  *    batch all-or-nothing, and a replayed `foreachBatch` name is
  *    detected and skipped ([[SigIndex]]'s exact contract).
  *  - SEARCH probes `nProbe` cells via a literal cell-set predicate over
  *    the UNION of live batch directories: every batch root carries the
  *    same `cell=<i>` partition layout, so Catalyst partition pruning
  *    lists and scans only probed × live-batch directories — query cost
  *    tracks nProbe/k of the corpus REGARDLESS of how many appends built
  *    it, the flat-probe property the SCALE anchors measure.
  *  - COMPACT folds aged batches into one directory per generation
  *    (bounding the batch-dir count a long stream accumulates) with
  *    publish-before-retire ordering — a concurrent reader sees at worst
  *    duplicate vectors, which SEARCH collapses with a (qid, cid)
  *    dedup before ranking. Reader-grace vacuum as in
  *    [[SigIndex.compact]].
  *  - RETRAIN is the drift story: when appends skew the cell histogram
  *    (the coarse quantizer no longer balances the data — [[skew]]
  *    measures max/mean occupancy), [[retrain]] trains fresh centroids
  *    on a bounded sample of the live index, re-assigns every live
  *    vector into a NEW generation directory (one fold batch), carries
  *    the old generation's batch names forward as `_seen` records so
  *    replay detection survives, and flips visibility with ONE atomic
  *    `_gen` marker create. Readers planned against the old generation
  *    keep its files (directories are only vacuumed after the reader
  *    grace window); new readers resolve the new quantizer and layout.
  *
  * WRITER CONTRACT (same as [[SigIndex]]): appends, compactions and
  * retrains are SEQUENTIAL per index — the streaming `foreachBatch`
  * shape. The contract is ENFORCED, not just documented: every append
  * claims the next monotonic `_slot.<seq>` of its GENERATION with a
  * create-no-overwrite, so a second writer racing the same index fails
  * loud ([[ConcurrentWriterException]]) instead of silently splitting
  * survivors across kept-sets that never saw each other (the guard
  * [[SigIndex.append]] carries, applied to the generation layout); and
  * an append that lands while a retrain flips generations throws rather
  * than stranding the batch in a retired generation — the generation is
  * re-checked both BEFORE and AFTER the marker create (the post-create
  * re-check withdraws the marker, closing the window where a flip lands
  * between the pre-check and the create and the batch would otherwise
  * be silently invisible to new-generation readers).
  *
  * Reference for the IVF structure: Jégou/Douze/Schmid, "Product
  * quantization for nearest neighbor search" (TPAMI 2011) §IV-A; the
  * incremental visibility rules are this engine's store discipline
  * ([[graft.sources.PointsStore]]), not a port of anything.
  */
object IvfIndex {

  /** Stored cell rows: corpus id + embedding (cell is the partition col). */
  val cellSchema: StructType = StructType(Seq(
    StructField("cell", IntegerType),
    StructField("cid", LongType),
    StructField("ce", ArrayType(DoubleType))))

  private val GenPrefix = "_gen."
  private val MarkerPrefix = "_live."
  private val SeenPrefix = "_seen."
  private val SlotPrefix = "_slot."
  private val HistPrefix = "_hist."
  private val HistTmpPrefix = "_histtmp."

  /** A second writer raced this index: the sequence slot this append
    * computed for its generation was claimed by someone else first. */
  final class ConcurrentWriterException(dir: String, seq: Long)
    extends IllegalStateException(
      s"IvfIndex at $dir: batch sequence slot $seq was claimed by a " +
        "concurrent writer — appends must be sequential per index; this " +
        "batch was NOT appended (its directory is an unmarked orphan)")

  /** Test seam: runs ONCE between an append's slot read and its claim —
    * the concurrent-writer window — then self-clears. */
  private[pipeline] val appendTestHook =
    new java.util.concurrent.atomic.AtomicReference[() => Unit](null)

  /** Test seam: runs ONCE between an append's slot claim and its marker
    * create — the retrain-flip window the post-create re-check closes —
    * then self-clears. */
  private[pipeline] val preMarkerTestHook =
    new java.util.concurrent.atomic.AtomicReference[() => Unit](null)

  private def maxSlot(f: org.apache.hadoop.fs.FileSystem, gp: String): Long = {
    val root = new org.apache.hadoop.fs.Path(gp)
    if (!f.exists(root)) return -1L
    f.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(SlotPrefix))
      .flatMap(_.drop(SlotPrefix.length).toLongOption)
      .foldLeft(-1L)(math.max)
  }

  private def claimSlot(f: org.apache.hadoop.fs.FileSystem, gp: String,
                        seq: Long): Unit = {
    val slot = new org.apache.hadoop.fs.Path(gp, s"$SlotPrefix$seq")
    try f.create(slot, false).close()
    catch {
      // only an actually-taken slot is a contract violation; a transient
      // I/O failure must surface as what it is, not as a phantom racer
      case e: java.io.IOException =>
        if (f.exists(slot)) throw new ConcurrentWriterException(gp, seq)
        else throw e
    }
  }

  /** The sequence slot the NEXT append must claim — read this BEFORE
    * taking the kept-set snapshot a batch dedups against
    * ([[Similarity.semDeDupIncremental]]) and pass it to [[append]]: the
    * claim then covers the whole read→dedup→append span, so a second
    * writer whose snapshot raced yours fails loud at its claim even when
    * the two `append` calls themselves never overlap.
    *
    * PRECISELY what the guard detects: any two writers whose slot-read →
    * claim spans overlap collide on a slot and the later claim throws. A
    * writer whose ENTIRE span lands inside another's claim → marker gap
    * (milliseconds of driver-side filesystem calls, no Spark jobs) reads
    * the higher slot and passes undetected — the guard is a tripwire for
    * uncoordinated writers, not a lock; sequential dispatch (the
    * `foreachBatch` shape) remains the contract. */
  def nextAppendSeq(spark: SparkSession, dir: String): Long = {
    val (_, gp) = requireGen(spark, dir)
    maxSlot(fs(spark, dir), gp) + 1
  }

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def stamped(prefix: String, n: String): Option[(Long, String)] = {
    val rest = n.drop(prefix.length)
    val dot = rest.indexOf('.')
    if (!n.startsWith(prefix) || dot < 0) None
    else rest.take(dot).toLongOption.map(ts => (ts, rest.substring(dot + 1)))
  }

  private def names(f: org.apache.hadoop.fs.FileSystem, root: org.apache.hadoop.fs.Path,
                    prefix: String): Seq[(Long, String)] =
    if (!f.exists(root)) Nil
    else f.listStatus(root).toSeq.map(_.getPath.getName)
      .flatMap(stamped(prefix, _))

  /** The current generation id, by newest `_gen` marker. */
  def currentGen(spark: SparkSession, dir: String): Option[Long] = {
    val f = fs(spark, dir)
    val gens = names(f, new org.apache.hadoop.fs.Path(dir), GenPrefix)
      .flatMap { case (ts, gid) => gid.toLongOption.map(g => (ts, g)) }
    if (gens.isEmpty) None else Some(gens.max._2)
  }

  private def genPath(dir: String, gid: Long): String = s"$dir/gen-$gid"

  private def requireGen(spark: SparkSession, dir: String): (Long, String) = {
    val gid = currentGen(spark, dir).getOrElse(throw new IllegalStateException(
      s"IvfIndex at $dir has no generation — call init() first"))
    (gid, genPath(dir, gid))
  }

  /** Create the index with an initial quantizer (generation 0). Pass
    * `codebooks` to make the index PRODUCT-QUANTIZED (the paper's IVFADC
    * — [[Similarity.ivfPqBuild]]'s structure, appendable): every append
    * then also encodes its vectors into M-code arrays against the
    * generation's persisted codebooks, [[searchPq]] scores candidates by
    * ADC table probes reading ONLY the code column (parquet column
    * pruning — the scan I/O per candidate is M small ints, never the
    * dims×8-byte embedding), and [[retrain]] re-trains the codebooks
    * alongside the coarse quantizer and re-encodes into the new
    * generation. Raw vectors are RETAINED beside the codes — that is the
    * appendable trade: re-encoding on retrain is impossible from lossy
    * codes alone, and the incremental SemDeDup consumers need exact
    * cosines; the scan-I/O story is untouched because the columnar
    * layout prices reads by the columns touched, not the row width. */
  def init(spark: SparkSession, dir: String,
           centroids: Array[Array[Double]],
           codebooks: Option[Array[Array[Array[Double]]]] = None,
           rotation: Option[Array[Array[Double]]] = None): Unit =
    initCoarse(spark, dir, FlatCoarse(centroids), codebooks, rotation)

  /** [[init]] with the TWO-LEVEL (inverted multi-index) coarse
    * quantizer: `halves` are the two half-space codebooks (the
    * [[Similarity.trainCodebooks]]/[[Similarity.fixedCodebooks]] M=2
    * product shape); the cell id is first-half argmin · K + second-half
    * argmin, giving K² effective cells for 2K distance evaluations per
    * appended vector — the assignment-cost story that makes √n cell
    * counts affordable at billion-vector scale. Every other IvfIndex
    * behavior (appends, folds, retrain, PQ codes, snapshots, SemDeDup)
    * is unchanged: cells are cells. */
  def initImi(spark: SparkSession, dir: String,
              halves: Array[Array[Array[Double]]],
              codebooks: Option[Array[Array[Array[Double]]]] = None,
              rotation: Option[Array[Array[Double]]] = None): Unit = {
    require(halves.length == 2,
      s"IvfIndex at $dir: IMI quantizes exactly two half-spaces, got ${halves.length}")
    initCoarse(spark, dir, ImiCoarse(halves), codebooks, rotation)
  }

  private def initCoarse(spark: SparkSession, dir: String, coarse: Coarse,
                         codebooks: Option[Array[Array[Array[Double]]]],
                         rotation: Option[Array[Array[Double]]]): Unit = {
    require(currentGen(spark, dir).isEmpty, s"IvfIndex at $dir already exists")
    require(rotation.isEmpty || codebooks.isDefined,
      s"IvfIndex at $dir: an OPQ rotation without codebooks has nothing to rotate for")
    writeGen(spark, dir, 0L, coarse, codebooks, rotation, Nil, Nil)
  }

  /** The current generation's FLAT quantizer, cell-ordered (fails on an
    * IMI-quantized index — use [[cellAssigner]]/[[imiHalves]] there). */
  def centroids(spark: SparkSession, dir: String): Array[Array[Double]] =
    centroidsIn(spark, requireGen(spark, dir)._2)

  private def centroidsIn(spark: SparkSession, gp: String): Array[Array[Double]] =
    // k×dims quantizer metadata the driver consumes (the centroids ride
    // into codegen'd expressions as literals) — direct driver read
    // ([[QuantizerFiles]]), not a distributed job per append/search
    QuantizerFiles.readIntVec(spark, s"$gp/centroids")

  /** The current generation's IMI half codebooks (None on a flat index). */
  def imiHalves(spark: SparkSession,
                dir: String): Option[Array[Array[Array[Double]]]] = {
    val gp = requireGen(spark, dir)._2
    coarseIn(spark, gp) match {
      case ImiCoarse(h) => Some(h)
      case _ => None
    }
  }

  // ---- the pluggable coarse quantizer ------------------------------------
  // A generation's cells come from either a FLAT k-centroid quantizer
  // (`centroids/`) or the TWO-LEVEL inverted multi-index construction
  // (`imicb/` — Babenko & Lempitsky CVPR 2012: cell = first-half argmin
  // · K + second-half argmin, K² effective cells for 2K evaluations per
  // vector). Everything downstream — the cell=<i> directory layout,
  // partition pruning, folds, retrains, snapshots, PQ codes — is
  // quantizer-agnostic: a cell id is a cell id.

  private[pipeline] sealed trait Coarse { def kEff: Int }
  private[pipeline] final case class FlatCoarse(centroids: Array[Array[Double]])
    extends Coarse { def kEff: Int = centroids.length }
  private[pipeline] final case class ImiCoarse(halves: Array[Array[Array[Double]]])
    extends Coarse { def kEff: Int = halves(0).length * halves(1).length }

  private def coarseIn(spark: SparkSession, gp: String): Coarse = {
    val p = new org.apache.hadoop.fs.Path(s"$gp/imicb")
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      ImiCoarse(Similarity.readCodebooks(spark, p.toString))
    else FlatCoarse(centroidsIn(spark, gp))
  }

  /** Single-cell assignment column for corpus-side rows. */
  private def assignCol(c: Coarse, e: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = c match {
    case FlatCoarse(cents) => NearestCells.cell(e, cents)
    case ImiCoarse(h) => Similarity.imiCell(e, h)
  }

  /** Expand a bounded query frame (carrying `qid`, `qe` and any rider
    * columns) to its `nProbe` probed cells: flat kernel explode, or the
    * IMI pair ranking — the rider columns (PQ LUTs) survive both. */
  private def probeExploded(c: Coarse, q: DataFrame, nProbe: Int): DataFrame =
    c match {
      case FlatCoarse(cents) =>
        q.withColumn("cell", explode(NearestCells.column(col("qe"), cents, nProbe)))
      case ImiCoarse(h) => Similarity.imiProbedCells(q, h, nProbe)
    }

  /** Driver-side twin of [[probeExploded]]'s per-row cell expansion —
    * the same kernels for both coarse shapes, invoked on collected rows
    * ([[Similarity.cellProbeLocal]]/[[Similarity.imiProbeLocal]]). */
  private def probeLocal(c: Coarse, nProbe: Int): Array[Double] => Array[Int] =
    c match {
      case FlatCoarse(cents) => Similarity.cellProbeLocal(cents, nProbe)
      case ImiCoarse(h) => Similarity.imiProbeLocal(h, nProbe)
    }

  /** The CURRENT generation's cell-assignment function — incremental
    * consumers ([[Similarity.semDeDupIncremental]]) assign batches with
    * it, so they work over flat AND IMI-quantized indexes. */
  def cellAssigner(spark: SparkSession, dir: String)
      : org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    cellAssignerGen(spark, dir)._2

  /** [[cellAssigner]] plus the generation id it resolved. A caller that
    * later hands the assigned batch to [[appendAssigned]] passes the gid
    * along: cell ids are meaningful only within the generation whose
    * quantizer produced them, so the append fails loud if a retrain
    * flipped generations between the assignment and the append (the
    * append's own requireGen would otherwise happily write stale-gen
    * cells into the new generation's layout). */
  private[pipeline] def cellAssignerGen(spark: SparkSession, dir: String)
      : (Long, org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
    val (gid, gp) = requireGen(spark, dir)
    val c = coarseIn(spark, gp)
    (gid, e => assignCol(c, e))
  }

  /** The current generation's PQ codebooks (None on a flat index) —
    * [[Similarity.readCodebooks]] over the generation's parquet. */
  def codebooks(spark: SparkSession,
                dir: String): Option[Array[Array[Array[Double]]]] =
    codebooksIn(spark, requireGen(spark, dir)._2)

  private def codebooksIn(spark: SparkSession,
                          gp: String): Option[Array[Array[Array[Double]]]] = {
    val p = new org.apache.hadoop.fs.Path(s"$gp/codebooks")
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)) None
    else Some(Similarity.readCodebooks(spark, p.toString))
  }

  /** The current generation's OPQ rotation (None on a plain index). */
  def rotation(spark: SparkSession,
               dir: String): Option[Array[Array[Double]]] =
    Similarity.readRotation(spark, requireGen(spark, dir)._2)

  /** Whether batch `name` already landed in the CURRENT generation —
    * live, folded, or carried forward across a retrain. */
  def contains(spark: SparkSession, dir: String, name: String): Boolean = {
    val (_, gp) = requireGen(spark, dir)
    val f = fs(spark, dir)
    val root = new org.apache.hadoop.fs.Path(gp)
    names(f, root, MarkerPrefix).exists(_._2 == name) ||
      names(f, root, SeenPrefix).exists(_._2 == name)
  }

  /** Append `vectors` (vec_id, embedding) under batch `name`: assign each
    * vector to its nearest current-generation centroid and write the
    * batch partitioned by cell. Returns false when `name` already landed
    * (idempotent replay). Throws [[ConcurrentWriterException]] when a
    * second writer claimed this append's generation sequence slot first
    * (pass `seq` from [[nextAppendSeq]] to cover a kept-set read that
    * preceded this call), and [[IllegalStateException]] if a retrain
    * flipped generations while the batch was writing — in both cases the
    * batch directory is an unmarked orphan the next [[compact]] sweeps,
    * and the batch must be re-run. */
  def append(vectors: DataFrame, dir: String, name: String,
             seq: Option[Long] = None): Boolean =
    appendCore(vectors.sparkSession, dir, name, seq, gp =>
      // quantizer from the SAME generation resolution as the layout (gp):
      // a retrain flipping in this window cannot pair the new quantizer's
      // assignment with the old generation's directories — the discipline
      // every search path follows (coarseIn/readColsIn)
      vectors.select(col("vec_id").as("cid"),
          col("embedding").cast("array<double>").as("ce"))
        .withColumn("cell", assignCol(coarseIn(vectors.sparkSession, gp), col("ce"))))

  /** [[append]] for a batch whose cell assignment ALREADY happened
    * against generation `assignedGen`'s quantizer (`assigned`: (cell,
    * vec_id, e)) — [[Similarity.semDeDupIncremental]] assigns its batch
    * once (the checkpointed frame that feeds the probe set and both
    * dedup joins) and appends the survivors from that same frame, so the
    * write does not re-read the batch source or re-run the assignment
    * kernel per survivor. Caller contract: the assignment comes from
    * [[cellAssignerGen]], whose gid is passed here — cell ids are
    * generation-specific, so a retrain flipping between the assignment
    * and this append throws (the internal pre/post checks only cover
    * flips INSIDE the append; without the gid pin a pre-append flip
    * would silently write stale-generation cells into the new layout). */
  private[pipeline] def appendAssigned(assigned: DataFrame, dir: String,
                                       name: String, seq: Option[Long],
                                       assignedGen: Long): Boolean =
    appendCore(assigned.sparkSession, dir, name, seq, _ =>
      assigned.select(col("cell"), col("vec_id").as("cid"),
        col("e").cast("array<double>").as("ce")),
      expectGen = Some(assignedGen))

  private def appendCore(spark: SparkSession, dir: String, name: String,
                         seq: Option[Long],
                         mkAssigned: String => DataFrame,
                         expectGen: Option[Long] = None): Boolean = {
    val (gid, gp) = requireGen(spark, dir)
    // idempotency FIRST: a retry of an already-landed batch stays a no-op
    // even when it carries a stale assignedGen (a retrain that landed
    // after the first attempt committed must not turn the replay into a
    // spurious failure — the marker carried across the flip, nothing is
    // written). The generation pin below guards NOT-landed batches only.
    if (contains(spark, dir, name)) return false
    expectGen.filter(_ != gid).foreach(eg =>
      throw new IllegalStateException(
        s"IvfIndex append '$name' raced a retrain at $dir: the batch was " +
          s"assigned against generation $eg but the index is at $gid — " +
          "cell assignments are generation-specific; re-run the batch " +
          "against the new quantizer"))
    val f = fs(spark, dir)
    // slot read FIRST (before the quantizer read — the start of this
    // append's view of the index), claim before the marker create
    val next = seq.getOrElse(maxSlot(f, gp) + 1)
    val cbs = codebooksIn(spark, gp)
    val rot = Similarity.readRotation(spark, gp)
    val assigned = mkAssigned(gp)
    // a PQ generation also encodes AT APPEND TIME against its persisted
    // codebooks (one more codegen'd projection in the same pass) — the
    // code column is what [[searchPq]] scans; an OPQ generation rotates
    // before the subspace split (codes live in the rotated space)
    cbs.fold(assigned.select("cell", "cid", "ce"))(b =>
        assigned.withColumn("codes",
            Similarity.pqCodesCol(Similarity.rotatedCol(col("ce"), rot), b))
          .select("cell", "cid", "ce", "codes"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$gp/batch=$name")
    // an EMPTY batch (routine: every survivor of a semDeDup batch was a
    // near-dup) publishes its marker WITHOUT a directory — a zero-row
    // partitionBy write emits no parquet footer, which later reads could
    // not parse; [[readBatch]]/[[read]] treat the missing directory as
    // the empty relation. Emptiness is read OFF THE WRITTEN DIRECTORY
    // (no cell= children) instead of a separate isEmpty pre-action,
    // which cost one full extra pass over the batch's dedup lineage per
    // append; a crash between the write and this delete leaves an
    // unmarked orphan dir, exactly like a crash mid-write — [[compact]]
    // sweeps it.
    val outDir = new org.apache.hadoop.fs.Path(s"$gp/batch=$name")
    val wroteRows = f.exists(outDir) && f.listStatus(outDir).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith("cell="))
    if (wroteRows)
      // the per-cell occupancy histogram rides along as a tiny sidecar
      // (footer row counts of the just-written directory — no data pages
      // decode): [[skew]] then prices quantizer drift from sidecar sums
      // instead of scanning the index
      writeHist(spark, f, gp, name)
    else f.delete(outDir, true)
    Option(appendTestHook.getAndSet(null)).foreach(_.apply())
    if (currentGen(spark, dir) != Some(gid))
      throw new IllegalStateException(
        s"IvfIndex append '$name' raced a retrain at $dir (generation " +
          s"moved past $gid) — re-run the batch against the new quantizer")
    claimSlot(f, gp, next)
    Option(preMarkerTestHook.getAndSet(null)).foreach(_.apply())
    val marker = new org.apache.hadoop.fs.Path(gp,
      s"$MarkerPrefix${System.currentTimeMillis()}.$name")
    f.create(marker, false).close()
    // post-create re-check: a retrain that flipped between the pre-check
    // and the create would leave this marker in a RETIRED generation —
    // append would report success while new-generation readers never see
    // the batch. Withdraw the marker and fail loud instead.
    if (currentGen(spark, dir) != Some(gid)) {
      f.delete(marker, false)
      throw new IllegalStateException(
        s"IvfIndex append '$name' raced a retrain at $dir (generation " +
          s"moved past $gid after the marker create) — marker withdrawn; " +
          "re-run the batch against the new quantizer")
    }
    true
  }

  /** The rows one batch appended (None when not individually readable —
    * never landed, or folded/retired past the grace window). A marker
    * without a directory is a landed EMPTY batch. */
  def readBatch(spark: SparkSession, dir: String,
                name: String): Option[DataFrame] = {
    val (_, gp) = requireGen(spark, dir)
    val f = fs(spark, dir)
    if (!names(f, new org.apache.hadoop.fs.Path(gp), MarkerPrefix).exists(_._2 == name)) None
    else if (!f.exists(new org.apache.hadoop.fs.Path(s"$gp/batch=$name")))
      Some(emptyCells(spark))
    else
      Some(spark.read.option("basePath", gp)
        .schema(layoutSchema(withCodes = false)) // no inference job
        .parquet(s"$gp/batch=$name")
        .select(col("cell"), col("cid"), col("ce")))
  }

  private def emptyCells(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], cellSchema)

  private def liveBatchNames(spark: SparkSession, gp: String): Seq[String] =
    names(fs(spark, gp), new org.apache.hadoop.fs.Path(gp), MarkerPrefix)
      .map(_._2).distinct

  /** The live index relation (cell, cid, ce) — the union of the current
    * generation's marker-named batch directories. Every batch root shares
    * the `cell=<i>` layout, so a literal cell predicate on this relation
    * partition-prunes EVERY batch. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readCols(spark, dir, Seq("cell", "cid", "ce"), cellSchema)

  /** Stored code rows of a product-quantized generation. */
  val codedSchema: StructType = StructType(Seq(
    StructField("cell", IntegerType),
    StructField("cid", LongType),
    StructField("codes", ArrayType(IntegerType))))

  /** The live CODE relation (cell, cid, codes) of a product-quantized
    * index — the same multi-batch layout as [[read]], projecting the
    * code column instead of the embedding: parquet is columnar, so this
    * scan reads M small ints per candidate (the ADC I/O bound), never
    * the dims×8-byte raw vector stored beside them. */
  def readCodes(spark: SparkSession, dir: String): DataFrame = {
    require(codebooks(spark, dir).isDefined,
      s"IvfIndex at $dir is not product-quantized — init() with codebooks")
    readCols(spark, dir, Seq("cell", "cid", "codes"), codedSchema)
  }

  private def readCols(spark: SparkSession, dir: String, cols: Seq[String],
                       emptySchema: StructType): DataFrame =
    readColsIn(spark, requireGen(spark, dir)._2, cols, emptySchema)

  /** The user-specified schema of a batch-directory read — data columns
    * plus the `batch`/`cell` partition path columns. Handing it to the
    * reader SKIPS parquet schema inference: without it every read of the
    * layout paid one footer-sampling Spark job before any real work
    * (guide §1.2 — remove passes). The layout is written by this object,
    * so the schema is known by construction; `withCodes = false` on a
    * product-quantized generation simply never touches the code column
    * (parquet is columnar — undeclared columns are not read). */
  private def layoutSchema(withCodes: Boolean): StructType =
    StructType(Seq(
      StructField("cid", LongType),
      StructField("ce", ArrayType(DoubleType))) ++
      (if (withCodes) Seq(StructField("codes", ArrayType(IntegerType))) else Nil) ++
      Seq(StructField("batch", org.apache.spark.sql.types.StringType),
        StructField("cell", IntegerType)))

  /** [[readCols]] against an ALREADY-RESOLVED generation path — multi-
    * stage queries resolve the generation ONCE and thread it through, so
    * a retrain flipping mid-query cannot mix two quantizers' layouts. */
  private def readColsIn(spark: SparkSession, gp: String, cols: Seq[String],
                         emptySchema: StructType): DataFrame = {
    val f = fs(spark, gp)
    // empty batches land as marker-only (no directory) — skip them
    val live = liveBatchNames(spark, gp)
      .filter(n => f.exists(new org.apache.hadoop.fs.Path(s"$gp/batch=$n")))
    if (live.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], emptySchema)
    else
      // ONE FileIndex over the explicit live batch directories with the
      // generation root as basePath: `batch` and `cell` are BOTH
      // partition dimensions, so a literal cell predicate prunes every
      // batch's directory listing in a single scan node
      spark.read.option("basePath", gp)
        .schema(layoutSchema(withCodes = cols.contains("codes")))
        .parquet(live.map(n => s"$gp/batch=$n"): _*)
        .select(cols.map(col): _*)
  }

  /** Search the live index: identical contract (and output) to
    * [[Similarity.ivfSearch]], over the multi-batch layout — queries
    * assign to their `nProbe` nearest cells against the current
    * quantizer, and the literal probed-cell set prunes every live batch
    * directory to its probed `cell=` children. Query cost is
    * nProbe/k of the LIVE DATA, independent of the append count.
    *
    * The query side broadcasts UNCONDITIONALLY (the ≤k-distinct-value
    * `cell` key would make a stats-driven shuffle join maximally
    * skewed), so its post-explode size — maxQueryRows × nProbe rows ×
    * the embedding width — must fit the driver and executors:
    * [[Similarity.DefaultMaxQueryRows]]'s sizing note assumes 64-dim
    * doubles (~50 MB); at production dims lower `maxQueryRows`
    * proportionally (1024-dim doubles ⇒ ~6k rows per 50 MB). */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
             topK: Int, nProbe: Int = 4,
             maxQueryRows: Long = Similarity.DefaultMaxQueryRows): DataFrame = {
    // ONE generation resolution for the whole query: quantizer and layout
    // always agree even when a retrain flips mid-call
    val (_, gp) = requireGen(spark, dir)
    searchIn(spark, gp, coarseIn(spark, gp), queries, topK, nProbe, maxQueryRows)
  }

  private def searchIn(spark: SparkSession, gp: String, coarse: Coarse,
                       queries: DataFrame,
                       topK: Int, nProbe: Int, maxQueryRows: Long): DataFrame = {
    // the bounded query side lands on the driver ONCE
    // ([[Similarity.takeBounded]] — same bytes the broadcast below holds
    // anyway): bound check, probe-cell assignment (driver-side, same
    // kernels — [[probeLocal]]), probe set and join side all come from
    // that single materialization, with no further jobs per search
    val qFrame = queries.select(col("vec_id").as("qid"),
      col("embedding").cast("array<double>").as("qe"))
    val rows = Similarity.takeBounded(qFrame, maxQueryRows, "IvfIndex.search")
    val (q, probed) = Similarity.probedLocalFlat(spark, rows, qFrame.schema,
      probeLocal(coarse, nProbe))
    val cells = readColsIn(spark, gp, Seq("cell", "cid", "ce"), cellSchema)
      .where(col("cell").isInCollection(probed)) // literal → partition pruning
    // the query side is bounded by contract — broadcast it explicitly
    // (like [[Similarity.ivfPqSearch]]): the join key `cell` has ≤ k
    // distinct values, so letting stats push this to a shuffle join
    // would shuffle the whole probed corpus onto ≤ k keys, maximally
    // skewed; the broadcast join never shuffles the corpus side
    val scored = broadcast(q).join(cells, Seq("cell")).where(col("qid") =!= col("cid"))
      .withColumn("cos", Similarity.cosine(col("qe"), col("ce")))
      // a compaction's publish-before-retire window can expose a vector
      // in both the fold and its original batch: collapse the copies
      // BEFORE ranking (row_number would give the twin two ranks and
      // push the true k-th neighbour out). Scored FIRST and deduped on
      // scalars only — carrying the embedding arrays through the
      // aggregate would fall back to SortAggregate
      .select("qid", "cid", "cos")
      .dropDuplicates("qid", "cid")
    Similarity.rankTopK(scored, "cos", ascending = false, topK)
  }

  /** ADC search over a product-quantized index — [[Similarity.ivfPqSearch]]'s
    * contract (and output) over the APPENDABLE multi-batch layout:
    * queries rank their `nProbe` nearest cells against the current
    * quantizer and build their M×Ks lookup tables ONCE (both on the
    * bounded, broadcast query side); the code relation is read under a
    * literal cell-set predicate (partition pruning across every live
    * batch directory) and every candidate is scored by M table probes on
    * its codes — the scan touches the code column only (column pruning),
    * so probe I/O is nProbe/k of the corpus × M bytes per row no matter
    * how many appends built the index. A compaction's publish-before-
    * retire window can expose a vector twice; the twins carry identical
    * codes (deterministic encode), so the (qid, cid) dedup before
    * ranking collapses them exactly as [[search]] does.
    *
    * The broadcast query side carries M×Ks LUT columns per row — size
    * `maxQueryRows` for dims AND (M, Ks): the default assumes the
    * gate-scale M=4/Ks=8; at M=16/Ks=256 each query row is ~32 KB of
    * LUT, so cap queries in the low thousands per call. */
  def searchPq(spark: SparkSession, dir: String, queries: DataFrame,
               topK: Int, nProbe: Int = 4,
               maxQueryRows: Long = Similarity.DefaultMaxQueryRows): DataFrame = {
    val (_, gp) = requireGen(spark, dir) // one resolution per query
    val scored = adcScoredIn(spark, pqGenIn(spark, gp, dir), queries, nProbe,
      maxQueryRows, "IvfIndex.searchPq", gp)._1
    Similarity.rankTopK(scored, "adist", ascending = true, topK)
  }

  /** A product-quantized generation's resolved state — quantizer,
    * codebooks and optional OPQ rotation from ONE generation resolution,
    * read once per query (or once per BATCHED call and reused across
    * slices — the quantizer data is immutable within a generation). */
  private final case class PqGen(coarse: Coarse,
                                 cbs: Array[Array[Array[Double]]],
                                 rot: Option[Array[Array[Double]]])

  private def pqGenIn(spark: SparkSession, gp: String, dir: String): PqGen =
    PqGen(coarseIn(spark, gp),
      codebooksIn(spark, gp).getOrElse(throw new IllegalStateException(
        s"IvfIndex at $dir is not product-quantized — init() with codebooks")),
      Similarity.readRotation(spark, gp))

  /** The deduped ADC-scored relation (qid, cid, adist) of one resolved
    * generation, plus the LOCAL raw query frame (one (qid, qe) row per
    * query — [[searchPqRerank]]'s stage 2 joins it directly, no
    * array-carrying dedup that would fall back to SortAggregate) and the
    * probed cell set — [[searchPq]]'s stage shared with
    * [[searchPqRerank]], which needs the SAME generation, query snapshot
    * and probe set for both its stages. The query side materializes on
    * the driver ONCE ([[Similarity.takeBounded]] — the same bytes the
    * broadcast holds anyway); bound check, LUT build, probe set and join
    * side all derive from it, driver-side ([[Similarity.probedLocalLut]]). */
  private def adcScoredIn(spark: SparkSession, g: PqGen,
                          queries: DataFrame, nProbe: Int, maxQueryRows: Long,
                          op: String, gp: String)
      : (DataFrame, DataFrame, Seq[Int]) = {
    val qFrame = queries.select(col("vec_id").as("qid"),
      col("embedding").cast("array<double>").as("qe"))
    val rows = Similarity.takeBounded(qFrame, maxQueryRows, op)
    val qBase = Similarity.localRelation(spark, rows, qFrame.schema)
    // the LUT builder and ADC scorer call the ONE shared kernel set
    // ([[SubDists]]/[[RotateVec]] — [[Similarity.adcLutLocal]] is the
    // driver-side composition of [[Similarity.adcLutColumns]] over
    // [[Similarity.rotatedCol]]) the immutable ivfPqSearch and pqTopK
    // also compile — the gate-pinned table arithmetic cannot diverge
    // between the search paths. On an OPQ generation the LUTs build over
    // the ROTATED query (the stored codes' space); the cell probe stays
    // in the raw space.
    val (q, probed) = Similarity.probedLocalLut(spark, rows, qFrame.schema,
      probeLocal(g.coarse, nProbe), Similarity.adcLutLocal(g.cbs, g.rot),
      g.cbs.length)
    val cells = readColsIn(spark, gp, Seq("cell", "cid", "codes"), codedSchema)
      .where(col("cell").isInCollection(probed)) // literal → partition pruning
    val scored = broadcast(q).join(cells, Seq("cell"))
      .where(col("qid") =!= col("cid"))
      .withColumn("adist", Similarity.adcScoreCol(g.cbs))
      // fold-window twins carry identical deterministic codes → identical
      // adist; dedup on scalars only, before ranking (like [[search]])
      .select("qid", "cid", "adist")
      .dropDuplicates("qid", "cid")
    (scored, qBase, probed)
  }

  /** Two-stage ADC search with EXACT re-ranking (Jégou et al. TPAMI 2011
    * §IV-C's verification step): stage 1 takes an ADC shortlist of
    * `shortlist` candidates per query ([[searchPq]] — code-column scan,
    * approximate by construction); stage 2 re-scores ONLY those
    * candidates with exact cosine over the raw vectors the appendable
    * layout retains beside the codes, and returns the exact top-k of the
    * shortlist. This is the payoff of storing both columns: recall
    * approaches the flat [[search]]'s at I/O close to [[searchPq]]'s —
    * the shortlist's distinct cids push into the stage-2 scan as a
    * LITERAL In predicate (row-group stats skip groups holding none of
    * them), so the ce read is shortlist-sized; past the driver probe
    * budget it falls back to the broadcast semi-join over the probed
    * cells (nProbe/k of the corpus — the flat search's read, never the
    * whole corpus). Output matches [[search]] ((qid, cid, cos, rank),
    * exact cosines). `shortlist` defaults to 4 × topK; raising it trades
    * stage-2 reads for recall. */
  def searchPqRerank(spark: SparkSession, dir: String, queries: DataFrame,
                     topK: Int, shortlist: Int = 0, nProbe: Int = 4,
                     maxQueryRows: Long = Similarity.DefaultMaxQueryRows): DataFrame = {
    require(shortlist >= 0, s"negative shortlist $shortlist (0 = default)")
    val l = if (shortlist > 0) shortlist else 4 * topK
    require(l >= topK, s"shortlist $l must cover topK $topK")
    // ONE generation resolution, query snapshot and probe set feed BOTH
    // stages: a retrain flipping mid-call cannot pair stage-1 geometry
    // with stage-2 layout (probed cells computed against one quantizer
    // filtering another generation's re-assigned directories)
    val (_, gp) = requireGen(spark, dir)
    val (adc, q, probed) = adcScoredIn(spark, pqGenIn(spark, gp, dir), queries,
      nProbe, maxQueryRows, "IvfIndex.searchPqRerank", gp)
    // the ONE shared ranking tail cuts the shortlist too — its tie-break
    // can never diverge from searchPq's. The shortlist is bounded by
    // contract (queries × l rows): collect it ONCE — the cid probe and
    // the broadcast join side both come from that single materialization
    // (stage 1 executes exactly once, as the old localCheckpoint
    // guaranteed, minus the checkpoint and distinct-take round trips)
    val (short, shortRows) = Similarity.localized(
      Similarity.rankTopK(adc, "adist", ascending = true, l)
        .select(col("qid"), col("cid")))
    // stage 2: raw vectors for the shortlist only. The shortlist's
    // distinct cids become a LITERAL In predicate pushed into the scan —
    // row groups holding none of the shortlist never decompress their ce
    // column, keeping the stage-2 read shortlist-sized, not
    // probed-cells-sized; past the driver budget the broadcast semi-join
    // alone filters (the scan then reads the probed cells' ce — still
    // nProbe/k, never the corpus)
    val cidProbe = shortRows.map(_.getLong(1)).distinct
    val vecsAll = readColsIn(spark, gp, Seq("cell", "cid", "ce"), cellSchema)
      .where(col("cell").isInCollection(probed))
    val vecs =
      if (cidProbe.length <= MaxRerankCidProbe)
        vecsAll.where(col("cid").isInCollection(cidProbe.toSeq))
      else vecsAll
    val cand = vecs.join(broadcast(short), Seq("cid"))
    // q IS the local raw (qid, qe) frame — one row per query by the
    // family-wide unique-vec_id contract (an array-carrying first()
    // dedup buffer here would downgrade the aggregation to SortAggregate)
    val scored = broadcast(q).join(cand, Seq("qid"))
      .withColumn("cos", Similarity.cosine(col("qe"), col("ce")))
      // fold-window twins collapse on scalars, like [[search]]
      .select("qid", "cid", "cos")
      .dropDuplicates("qid", "cid")
    Similarity.rankTopK(scored, "cos", ascending = false, topK)
  }

  /** Driver budget for the stage-2 literal cid probe of
    * [[searchPqRerank]] — [[SigIndex.probedRows]]' discipline. */
  private def MaxRerankCidProbe: Int =
    Option(maxRerankCidProbeOverride.get).map(_.intValue).getOrElse(100000)

  /** Test seam: lowers the stage-2 cid probe budget so CI can drive (and
    * plan-pin) [[searchPqRerank]]'s broadcast-semi-join fallback at spec
    * scale. Production never sets it. */
  private[pipeline] val maxRerankCidProbeOverride =
    new java.util.concurrent.atomic.AtomicReference[Integer](null)

  /** [[searchPq]] over an UNBOUNDED query frame: deterministic vec_id
    * ranges of at most `batchRows` queries run one bounded [[searchPq]]
    * each against ONE generation resolution, and the per-query top-k
    * results union (queries are independent across slices — each qid's
    * answer comes from exactly one bounded call). This is how the
    * `maxQueryRows` contract composes at fleet scale: driver memory is
    * bounded by the SLICE (boundary ids are one long per `batchRows`
    * queries — a 10M-query frame holds ~100 boundaries), never the query
    * count, and the per-slice broadcast stays inside the sizing notes on
    * [[search]]/[[searchPq]]. */
  def searchPqBatched(spark: SparkSession, dir: String, queries: DataFrame,
                      topK: Int, nProbe: Int = 4,
                      batchRows: Long = Similarity.DefaultMaxQueryRows): DataFrame = {
    // ONE generation resolution for every slice: a retrain flipping
    // mid-iteration cannot answer different slices from different
    // quantizers
    val (_, gp) = requireGen(spark, dir)
    val g = pqGenIn(spark, gp, dir) // quantizer state read ONCE, all slices
    batchedOver(spark, queries, batchRows, q => {
      val scored = adcScoredIn(spark, g, q, nProbe, batchRows,
        "IvfIndex.searchPqBatched", gp)._1
      Similarity.rankTopK(scored, "adist", ascending = true, topK)
    })
  }

  /** [[search]] (exact cosine in the probed cells) over an UNBOUNDED
    * query frame — [[searchPqBatched]]'s slicing for the flat search
    * path, same bounded-driver/eager-slice discipline. */
  def searchBatched(spark: SparkSession, dir: String, queries: DataFrame,
                    topK: Int, nProbe: Int = 4,
                    batchRows: Long = Similarity.DefaultMaxQueryRows): DataFrame = {
    val (_, gp) = requireGen(spark, dir)
    val coarse = coarseIn(spark, gp) // quantizer read ONCE, all slices
    batchedOver(spark, queries, batchRows,
      searchIn(spark, gp, coarse, _, topK, nProbe, batchRows))
  }

  /** The shared unbounded-query slicing: deterministic vec_id ranges of
    * at most `batchRows` queries, each answered by one bounded call
    * against ONE already-resolved generation. Slice boundaries come from
    * a distributed sort + one pass keeping every batchRows-th id — the
    * driver holds one long per batchRows queries (a 10M-query frame ≈
    * 100 boundaries), never the query count. Slices execute EAGERLY one
    * at a time (localCheckpoint materializes each slice's bounded topK
    * result and cuts the plan lineage), so only ONE slice's broadcast
    * query frame is live at any moment — a lazy union of every slice's
    * broadcast join would pin all broadcasts simultaneously at action
    * time, re-creating exactly the driver-memory blowup maxQueryRows
    * exists to prevent. What accumulates is the result itself:
    * slice_rows × topK rows per slice, stored executor-distributed. */
  private def batchedOver(spark: SparkSession, queries: DataFrame,
                          batchRows: Long,
                          perSlice: DataFrame => DataFrame): DataFrame = {
    require(batchRows > 0, s"batchRows $batchRows must be positive")
    val bounds = queries.select(col("vec_id").cast("long"))
      .orderBy(col("vec_id")).rdd.zipWithIndex()
      .filter(_._2 % batchRows == 0).map(_._1.getLong(0)).collect().sorted
    if (bounds.isEmpty) return perSlice(queries) // empty frame: trivially bounded
    bounds.zipWithIndex.map { case (lo, i) =>
      val hi = if (i + 1 < bounds.length) Some(bounds(i + 1)) else None
      val slice = queries.where(hi.fold(col("vec_id") >= lo)(h =>
        col("vec_id") >= lo && col("vec_id") < h))
      perSlice(slice).localCheckpoint()
    }.reduce(_ unionByName _)
  }

  /** Write batch `name`'s per-cell row counts as a tiny `_hist.<name>`
    * text sidecar ("cell count" lines), computed by reading the
    * just-written directory's partition column only (parquet footer row
    * counts — no data pages decode). Every batch-producing write path
    * ([[append]], [[compact]]'s fold, [[retrain]]'s re-assigns) records
    * one, so the maintenance tick's [[skew]] probe is a metadata read. */
  private def writeHist(spark: SparkSession, f: org.apache.hadoop.fs.FileSystem,
                        gp: String, name: String): Unit = {
    val counts = scanCellCounts(spark, gp, name)
    // write-then-rename: a concurrent reader either sees the complete
    // sidecar or none at all (missing → the benign per-batch scan
    // fallback), never a torn prefix that would parse to wrong counts.
    // The tmp name uses its own prefix so no lister ever matches it;
    // [[compact]] sweeps any crash-orphaned tmp.
    val tmp = new org.apache.hadoop.fs.Path(gp, s"$HistTmpPrefix$name")
    val dst = new org.apache.hadoop.fs.Path(gp, s"$HistPrefix$name")
    val o = f.create(tmp, true)
    o.write(counts.toSeq.sorted.map { case (c, n) => s"$c $n" }.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    o.close()
    f.delete(dst, false)
    f.rename(tmp, dst)
  }

  private def readHist(f: org.apache.hadoop.fs.FileSystem, gp: String,
                       name: String): Option[Map[Int, Long]] = {
    val p = new org.apache.hadoop.fs.Path(gp, s"$HistPrefix$name")
    if (!f.exists(p)) None
    else try {
      val in = f.open(p)
      val s = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      Some(s.split("\n").filter(_.nonEmpty).map { l =>
        val sp = l.indexOf(' ')
        l.take(sp).toInt -> l.drop(sp + 1).toLong
      }.toMap)
    } catch { case _: java.io.IOException | _: NumberFormatException => None }
  }

  /** Per-cell row counts of ONE batch directory, from the parquet FOOTERS
    * directly on the driver — row-group record counts per `cell=` child,
    * no Spark job, no data pages (an append's sidecar write and the
    * repair fallback are both metadata-only and job-free; at gate scale
    * the alternative one-job read-back added ~0.3 s of fixed scheduling
    * overhead to EVERY append). */
  private def scanCellCounts(spark: SparkSession, gp: String,
                             name: String): Map[Int, Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val f = fs(spark, gp)
    val base = new org.apache.hadoop.fs.Path(s"$gp/batch=$name")
    f.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .map { cd =>
        val cell = cd.getPath.getName.drop("cell=".length).toInt
        val n = f.listStatus(cd.getPath).toSeq
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .map { st =>
            val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
            try rd.getRecordCount finally rd.close()
          }.sum
        cell -> n
      }.toMap
  }

  /** Per-cell live vector counts (missing cells = 0 occupancy) — summed
    * from the per-batch `_hist` sidecars every write path records, so the
    * maintenance tick reads a few KB of metadata instead of scanning the
    * index; a batch missing its sidecar (externally restored state) falls
    * back to a partition-column scan of THAT batch only. */
  def cellCounts(spark: SparkSession, dir: String): Map[Int, Long] =
    cellCountsIn(spark, requireGen(spark, dir)._2)

  private def cellCountsIn(spark: SparkSession, gp: String): Map[Int, Long] = {
    val f = fs(spark, gp)
    val live = liveBatchNames(spark, gp)
      .filter(n => f.exists(new org.apache.hadoop.fs.Path(s"$gp/batch=$n")))
    live.map(n => readHist(f, gp, n).getOrElse(scanCellCounts(spark, gp, n)))
      .foldLeft(Map.empty[Int, Long]) { (acc, m) =>
        m.foldLeft(acc) { case (a, (c, n)) => a.updated(c, a.getOrElse(c, 0L) + n) }
      }
  }

  /** Quantizer drift measure: max/mean cell occupancy over the k cells
    * (1.0 = perfectly balanced; k = everything in one cell). A metadata
    * read — [[cellCounts]] sums the `_hist` sidecars, never batch data. */
  def skew(spark: SparkSession, dir: String): Double = {
    val (_, gp) = requireGen(spark, dir)
    val k = coarseIn(spark, gp).kEff
    val counts = cellCountsIn(spark, gp)
    val total = counts.values.sum
    if (total == 0L) 1.0
    else counts.values.max.toDouble / (total.toDouble / k)
  }

  /** Test seam: observes the frozen re-assign relation [[retrain]] feeds
    * the new generation from — CI pins that its plan is a straight
    * parquet scan of the frozen batch listing (no Checkpoint / ExistingRDD
    * materialization of the corpus), then self-clears. */
  private[pipeline] val retrainReadTestHook =
    new java.util.concurrent.atomic.AtomicReference[DataFrame => Unit](null)

  /** Retrain the quantizer on a bounded sample of the live index and
    * rebuild into a NEW generation: fresh centroids, live vectors
    * re-assigned, replay detection carried, visibility flipped by ONE
    * atomic `_gen` marker create. On a product-quantized index the
    * CODEBOOKS retrain too (same M and Ks, per-subspace Lloyd on the same
    * bounded sample) and the rebuild re-encodes every live vector against
    * them — possible precisely because the appendable layout retains raw
    * vectors beside the codes.
    *
    * SCALE SHAPE: the generation and its live batch LISTING are frozen
    * once, and every pass below is a straight parquet scan of those
    * immutable directories — the only thing retrain pins to memory is
    * the bounded train sample (≤ `trainLimit` rows, feeding the coarse
    * Lloyd passes AND each PQ subspace's), never the corpus.
    *
    * REPLAY ACROSS THE FLIP (compact's grace discipline): batches whose
    * marker is younger than `graceMs` keep PER-BATCH identity in the new
    * generation — re-assigned into their own `batch=<name>` directory
    * with a fresh marker — so a streaming `foreachBatch` replay that
    * crosses the retrain still answers from its own batch ([[readBatch]]
    * — the survivor ID SET is assignment-invariant). Aged batches fold
    * into one directory and carry forward as `_seen` records only (a
    * replay that old fails loud, as it does across a fold).
    *
    * The old generation's directories stay on disk for in-flight readers
    * until [[compact]]'s grace-window vacuum retires them. Returns the
    * new generation id. */
  def retrain(spark: SparkSession, dir: String, k: Int = 16, iters: Int = 5,
              trainLimit: Int = 100000,
              graceMs: Long = 15 * 60 * 1000L): Long = {
    val (gid, gp) = requireGen(spark, dir)
    val f = fs(spark, dir)
    val root = new org.apache.hadoop.fs.Path(gp)
    val liveMarks = names(f, root, MarkerPrefix)
    val newest = liveMarks.groupBy(_._2).map { case (n, xs) => n -> xs.map(_._1).max }
    val now = System.currentTimeMillis()
    val recent = newest.filter(_._2 > now - graceMs).keys.toSeq.sorted
    val aged = newest.keys.toSeq.diff(recent).sorted
    // the frozen corpus view: an explicit-path parquet relation over the
    // live batch directories (immutable once marked) — both the sample
    // pass and the re-assign passes read these same bytes
    val vecs = readColsIn(spark, gp, Seq("cell", "cid", "ce"), cellSchema)
      .select(col("cid").as("vec_id"), col("ce").as("embedding"))
    Option(retrainReadTestHook.getAndSet(null)).foreach(_.apply(vecs))
    val sample = vecs.orderBy(col("vec_id")).limit(trainLimit)
      .localCheckpoint() // BOUNDED: ≤ trainLimit rows feed every Lloyd pass
    // nothing to learn from an empty index: the flip still happens (the
    // caller asked for a generation) but the quantizer carries unchanged
    val empty = sample.isEmpty
    val oldCoarse = coarseIn(spark, gp)
    // the quantizer retrains IN KIND: a flat generation trains k fresh
    // centroids; an IMI generation re-trains its two half codebooks at
    // their existing per-half K (k_eff = K² is the two-level shape's
    // invariant — resize by re-initializing, not by drift maintenance)
    val coarse: Coarse =
      if (empty) oldCoarse
      else oldCoarse match {
        case FlatCoarse(_) =>
          FlatCoarse(Similarity.trainCentroids(sample, k, iters, trainLimit))
        case ImiCoarse(h) =>
          // each half re-trains INDEPENDENTLY at its own K and its own
          // sub-width — IMI halves may be asymmetric (unequal entry
          // counts or an uneven dimension split), and the retrained
          // quantizer must keep the exact shape the index was built with
          val sub0 = h(0)(0).length
          val sub1 = h(1)(0).length
          def half(off: Int, len: Int): DataFrame = sample.select(
            col("vec_id"), slice(col("embedding"), off + 1, len).as("embedding"))
          ImiCoarse(Array(
            Similarity.trainCentroids(half(0, sub0), h(0).length, iters, trainLimit),
            Similarity.trainCentroids(half(sub0, sub1), h(1).length, iters, trainLimit)))
      }
    val oldCbs = codebooksIn(spark, gp)
    val oldRot = Similarity.readRotation(spark, gp)
    // an OPQ generation re-learns rotation AND codebooks together (the
    // alternation couples them); a plain-PQ one re-trains codebooks only
    val (newRot, newCbs) = (oldRot, oldCbs) match {
      case (_, _) if empty => (oldRot, oldCbs)
      case (Some(_), Some(old)) =>
        val (r2, c2) = Opq.train(sample, old.length, old(0).length,
          iters, trainLimit)
        (Some(r2), Some(c2))
      case (_, Some(old)) =>
        (None, Some(Similarity.trainCodebooks(sample, old.length, old(0).length,
          iters, trainLimit)))
      case _ => (None, None)
    }
    def rows(paths: Seq[String]): DataFrame =
      spark.read.option("basePath", gp)
        .schema(layoutSchema(withCodes = false)) // no inference job
        .parquet(paths: _*)
        .select(col("cid").as("vec_id"), col("ce").as("embedding"))
    val agedDirs = aged.filter(n =>
      f.exists(new org.apache.hadoop.fs.Path(s"$gp/batch=$n")))
    val fold: Seq[(String, Option[DataFrame], Long)] =
      if (agedDirs.isEmpty) Nil
      else Seq((s"fold${gid + 1}",
        Some(rows(agedDirs.map(n => s"$gp/batch=$n"))), now))
    // recent batches CARRY their ORIGINAL publish timestamp: the replay
    // grace clock runs from the stream's append, not from this retrain —
    // re-stamping would reset their age on every retrain and, under
    // recurring retrains, no batch would ever age into a fold (unbounded
    // per-batch directory growth on a long stream)
    val recentBatches: Seq[(String, Option[DataFrame], Long)] = recent.map { n =>
      (n,
        if (f.exists(new org.apache.hadoop.fs.Path(s"$gp/batch=$n")))
          Some(rows(Seq(s"$gp/batch=$n")))
        else None, // marker-only empty batch stays marker-only
        newest(n))
    }
    val carried = (names(f, root, SeenPrefix).map(_._2) ++ aged).distinct
    writeGen(spark, dir, gid + 1, coarse, newCbs, newRot,
      fold ++ recentBatches, carried)
    gid + 1
  }

  /** [[retrain]] when [[skew]] exceeds `maxSkew` — the maintenance-tick
    * form ([[Similarity.semDeDupSink]]'s `maintainEvery` calls it after
    * each compaction). The skew probe is a sidecar-metadata read, so an
    * idle tick costs no index scan. Returns the new generation id when a
    * retrain ran. */
  def maybeRetrain(spark: SparkSession, dir: String, maxSkew: Double = 4.0,
                   k: Int = 16, iters: Int = 5,
                   trainLimit: Int = 100000,
                   graceMs: Long = 15 * 60 * 1000L): Option[Long] =
    if (skew(spark, dir) > maxSkew)
      Some(retrain(spark, dir, k, iters, trainLimit, graceMs))
    else None

  private def writeGen(spark: SparkSession, dir: String, gid: Long,
                       coarse: Coarse,
                       cbs: Option[Array[Array[Array[Double]]]],
                       rot: Option[Array[Array[Double]]],
                       batches: Seq[(String, Option[DataFrame], Long)],
                       carriedNames: Seq[String]): Unit = {
    val gp = genPath(dir, gid)
    // quantizer state is a driver array — direct driver parquet writes
    // ([[QuantizerFiles]]), no Spark job per file
    def writeCbs(b: Array[Array[Array[Double]]], path: String): Unit =
      QuantizerFiles.writeIntIntVec(spark, path,
        for ((cb, mm) <- b.zipWithIndex.toSeq; (v, j) <- cb.zipWithIndex)
          yield (mm, j, v))
    coarse match {
      case FlatCoarse(centroids) =>
        QuantizerFiles.writeIntVec(spark, s"$gp/centroids", "cell", "c",
          centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq)
      case ImiCoarse(halves) => writeCbs(halves, s"$gp/imicb")
    }
    cbs.foreach(writeCbs(_, s"$gp/codebooks"))
    rot.foreach(Similarity.writeRotation(spark, gp, _))
    val f = fs(spark, dir)
    val now = System.currentTimeMillis()
    batches.foreach { case (name, vectors, markerTs) =>
      vectors.foreach { vecs =>
        val assigned = vecs.select(col("vec_id").as("cid"),
            col("embedding").cast("array<double>").as("ce"))
          .withColumn("cell", assignCol(coarse, col("ce")))
        cbs.fold(assigned.select("cell", "cid", "ce"))(b =>
            assigned.withColumn("codes",
                Similarity.pqCodesCol(Similarity.rotatedCol(col("ce"), rot), b))
              .select("cell", "cid", "ce", "codes"))
          .write.mode("overwrite").partitionBy("cell")
          .parquet(s"$gp/batch=$name")
        writeHist(spark, f, gp, name)
      }
      // markerTs preserves a carried batch's ORIGINAL publish time, so
      // its fold-grace clock survives the generation flip
      f.create(new org.apache.hadoop.fs.Path(gp,
        s"$MarkerPrefix$markerTs.$name"), false).close()
    }
    carriedNames.foreach { n =>
      f.create(new org.apache.hadoop.fs.Path(gp, s"$SeenPrefix$now.$n"), false).close()
    }
    // the atomic visibility flip
    f.create(new org.apache.hadoop.fs.Path(dir, s"$GenPrefix$now.$gid"), false).close()
  }

  /** Freeze the CURRENT generation under `dir/snapshots/<name>/` — a
    * fully valid IvfIndex directory (its own `_gen` marker, the
    * generation's centroids (and codebooks, when product-quantized),
    * live batch directories with their markers, `_seen` records so
    * replay detection survives, and the sequence-slot ledger so a
    * restored pipeline continues the sequential-writer contract):
    * search, append and retrain all work against a restored snapshot.
    * Data directories hard-link with a copy fallback
    * ([[graft.sources.PointsStore.snapshot]]'s recipe); marker/seen/slot
    * files are ZERO-BYTE names, so the snapshot re-creates them from the
    * captured listing instead of linking — a compact racing the snapshot
    * can delete an aged marker between the capture listing and the copy,
    * and a re-create cannot fail on the vanished source.
    * Readers of the original never list `snapshots/`. */
  def snapshot(spark: SparkSession, dir: String): String = {
    val (gid, gp) = requireGen(spark, dir)
    val f = fs(spark, dir)
    val name = SnapshotFiles.freshName()
    val out = s"$dir/snapshots/$name"
    def linkTree(src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Unit =
      SnapshotFiles.linkTree(spark, f, src, dst)
    val ogp = new org.apache.hadoop.fs.Path(s"$out/gen-$gid")
    f.mkdirs(ogp)
    // ONE listing is the capture point (markers and dirs from the same
    // view): a racing append is fully out, a racing compact cannot leave
    // marker-less dirs, and retired directories outlive the race by the
    // vacuum grace window
    val entries = f.listStatus(new org.apache.hadoop.fs.Path(gp)).toSeq
    val live = entries.map(_.getPath.getName)
      .flatMap(n => stamped(MarkerPrefix, n)).map(_._2).toSet
    // DIRECTORIES first: a compact racing a slower-than-grace snapshot can
    // retire a batch directory between the capture listing and the copy —
    // a vanished batch is skipped (partial copy removed) and its marker
    // suppressed below, so the snapshot never claims a landed batch whose
    // data it could not capture
    val vanished = scala.collection.mutable.Set[String]()
    entries.foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && (n == "centroids" || n == "codebooks" ||
          n == "rotation" || n == "imicb" ||
          (n.startsWith("batch=") && live.contains(n.drop("batch=".length))))) {
        try linkTree(st.getPath, new org.apache.hadoop.fs.Path(ogp, n))
        catch {
          case _: java.io.FileNotFoundException if n.startsWith("batch=") =>
            f.delete(new org.apache.hadoop.fs.Path(ogp, n), true)
            vanished += n.drop("batch=".length)
        }
      }
    }
    entries.foreach { st =>
      val n = st.getPath.getName
      if (st.isFile && (n.startsWith(SeenPrefix) || n.startsWith(SlotPrefix) ||
          // markers only for the CAPTURED live set: an append racing the
          // snapshot must be fully out, not a marker-without-directory
          // (which would read as a landed EMPTY batch)
          (n.startsWith(MarkerPrefix) &&
            stamped(MarkerPrefix, n).exists(m =>
              live.contains(m._2) && !vanished.contains(m._2)))))
        f.create(new org.apache.hadoop.fs.Path(ogp, n), false).close()
      else if (st.isFile && n.startsWith(HistPrefix) &&
          live.contains(n.drop(HistPrefix.length)) &&
          !vanished.contains(n.drop(HistPrefix.length)))
        // histogram sidecars CARRY CONTENT (unlike the zero-byte marker
        // names) — copy them; a compact racing the snapshot can retire one
        // between the capture listing and this copy, and the restored
        // index then falls back to the per-batch repair scan, so a
        // vanished source is skipped, not fatal
        try SnapshotFiles.link(spark, f, st.getPath,
          new org.apache.hadoop.fs.Path(ogp, n))
        catch { case _: java.io.FileNotFoundException => () }
    }
    f.create(new org.apache.hadoop.fs.Path(out,
      s"$GenPrefix${System.currentTimeMillis()}.$gid"), false).close()
    name
  }

  /** Driver budget for [[compact]]'s duplicate-cid probe ([[SigIndex]]'s
    * probedRows discipline) and the fold's output file-size goal. */
  private def MaxFoldDupProbe: Int =
    Option(maxFoldDupProbeOverride.get).map(_.intValue).getOrElse(100000)
  private val FoldTargetBytes = 128L * 1024 * 1024

  /** Test seam: lowers the fold's duplicate-probe budget so CI can drive
    * the full-row distinct fallback at spec scale. Production never sets
    * it ([[maxRerankCidProbeOverride]] pattern). */
  private[pipeline] val maxFoldDupProbeOverride =
    new java.util.concurrent.atomic.AtomicReference[Integer](null)

  /** Fold aged live batches of the CURRENT generation into one directory
    * (publish-before-retire, so concurrent readers see at worst duplicate
    * vectors — harmless under search's (cos, cid) ranking), sweep retired
    * and orphaned batch directories past the reader grace window, and
    * vacuum RETIRED GENERATIONS whose `_gen` marker was superseded longer
    * than the grace window ago. The [[SigIndex.compact]] discipline on
    * the two-level layout. */
  def compact(spark: SparkSession, dir: String,
              graceMs: Long = 15 * 60 * 1000L): Unit = {
    val (gid, gp) = requireGen(spark, dir)
    val f = fs(spark, dir)
    val root = new org.apache.hadoop.fs.Path(gp)
    val now = System.currentTimeMillis()
    val cutoff = now - graceMs
    val aged = names(f, root, MarkerPrefix)
      .filter(_._1 <= cutoff).map(_._2).distinct
    if (aged.length > 1) {
      // marker-only EMPTY batches have no directory — they fold to their
      // `_seen` record alone
      val agedDirs = aged.filter(n =>
        f.exists(new org.apache.hadoop.fs.Path(s"$gp/batch=$n")))
      val foldName = s"compact-${java.util.UUID.randomUUID().toString.take(8)}"
      if (agedDirs.nonEmpty) {
        // a PQ generation's rows carry the code column — fold it verbatim
        // (codes are deterministic per (vector, generation codebooks), so
        // the keyed dedup below collapses duplicate vectors exactly)
        // existence check only (and against THIS call's generation
        // resolution, not a fresh one) — the codebook VALUES are not
        // needed to know the fold's column set
        val pq = f.exists(new org.apache.hadoop.fs.Path(s"$gp/codebooks"))
        val cols =
          if (pq) Seq("cell", "cid", "ce", "codes")
          else Seq("cell", "cid", "ce")
        def readAged() = spark.read.option("basePath", gp)
          .schema(layoutSchema(withCodes = pq)) // no inference job
          .parquet(agedDirs.map(n => s"$gp/batch=$n"): _*)
        // SET-SEMANTICS dedup (a fold racing a fold, or a crash between a
        // fold's publish and its retire markers, exposes a vector in two
        // batch dirs) on the KEYS, not the rows: within one generation
        // `cid` determines (cell, ce, codes) — same quantizer, same
        // deterministic encode — so the old full-row distinct() shuffled
        // the embedding/code arrays only to compare keys (guide §2.3
        // "shuffle keys and metadata instead of payloads"). Pass 1 scans
        // the two path columns + cid (column-pruned — no array pages
        // decode) and finds cids present in >1 batch dir; in the common
        // duplicate-free case the payload then moves source→fold with NO
        // exchange at all, and otherwise the bounded loser set drops the
        // extra copies via a broadcast anti-join. A loser set past the
        // driver budget (mass duplication — repeatedly crashed folds)
        // falls back to the full-row distinct.
        val copies = readAged()
          .groupBy(col("cid")).agg(collect_set(col("batch")).as("bs"))
          .where(size(col("bs")) > 1)
          .take(MaxFoldDupProbe + 1)
        val folded =
          if (copies.length > MaxFoldDupProbe)
            readAged().select(cols.map(col): _*).distinct()
          else if (copies.isEmpty)
            readAged().select(cols.map(col): _*)
          else {
            // keeper = lexicographically smallest batch name
            // (deterministic); every other (cid, batch) copy loses
            val losers = copies.flatMap { r =>
              r.getSeq[String](1).sorted.tail.map(b => (r.getLong(0), b))
            }.toSeq
            import spark.implicits._
            readAged()
              .join(broadcast(losers.toDF("cid", "batch")),
                Seq("cid", "batch"), "left_anti")
              .select(cols.map(col): _*)
          }
        // scale-adaptive output sizing replaces the removed exchange's
        // AQE coalescing: merge scan partitions locally (no shuffle) to
        // ~targetBytes outputs so the fold actually shrinks file counts
        val agedBytes = agedDirs.map(n =>
          f.getContentSummary(new org.apache.hadoop.fs.Path(s"$gp/batch=$n"))
            .getLength).sum
        val nOut = math.max(1, (agedBytes / FoldTargetBytes).toInt)
        folded.coalesce(nOut)
          .write.mode("overwrite").partitionBy("cell")
          .parquet(s"$gp/batch=$foldName")
      }
      if (agedDirs.nonEmpty) {
        writeHist(spark, f, gp, foldName)
        f.create(new org.apache.hadoop.fs.Path(root,
          s"$MarkerPrefix${System.currentTimeMillis()}.$foldName"), false).close()
      }
      aged.foreach { n =>
        f.create(new org.apache.hadoop.fs.Path(root,
          s"$SeenPrefix${System.currentTimeMillis()}.$n"), false).close()
      }
      f.listStatus(root).toSeq.map(_.getPath).foreach { p =>
        if (stamped(MarkerPrefix, p.getName).exists(m => aged.contains(m._2)))
          f.delete(p, false)
      }
      // histogram sidecars follow their markers: a retired batch's counts
      // are no longer summed, so the sidecar retires with the marker
      aged.foreach { n =>
        f.delete(new org.apache.hadoop.fs.Path(root, s"$HistPrefix$n"), false)
      }
    }
    // crash-orphaned histogram tmp files (a writeHist that died between
    // create and rename) sweep once past the grace window
    f.listStatus(root).toSeq.foreach { st =>
      if (st.isFile && st.getPath.getName.startsWith(HistTmpPrefix) &&
          st.getModificationTime <= now - graceMs)
        f.delete(st.getPath, false)
    }
    // sequence-slot ledger of the current generation: only the MAX
    // matters (the next append's predecessor) — fold the tail
    val slots = f.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(SlotPrefix))
      .flatMap(n => n.drop(SlotPrefix.length).toLongOption.map((_, n)))
    if (slots.length > 1) {
      val keep = slots.maxBy(_._1)._2
      slots.filter(_._2 != keep).foreach { case (_, n) =>
        f.delete(new org.apache.hadoop.fs.Path(root, n), false)
      }
    }
    // reader-grace vacuum of retired/orphaned batch dirs (current gen);
    // re-stamp `now` so _seen records the fold above just wrote age from
    // their own creation, not from this call's start
    val now2 = System.currentTimeMillis()
    val seenTs = names(f, root, SeenPrefix)
      .groupBy(_._2).map { case (n, xs) => n -> xs.map(_._1).min }
    val live = liveBatchNames(spark, gp).toSet
    if (f.exists(root)) f.listStatus(root).toSeq.foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("batch=")) {
        val nm = n.drop("batch=".length)
        if (!live.contains(nm)) {
          val retiredPastGrace = seenTs.get(nm).exists(_ <= now2 - graceMs)
          val orphanPastGrace =
            !seenTs.contains(nm) && st.getModificationTime <= now2 - graceMs
          if (retiredPastGrace || orphanPastGrace) {
            f.delete(st.getPath, true)
            // a crashed append can leave a histogram sidecar beside its
            // orphan directory — it retires with the directory
            f.delete(new org.apache.hadoop.fs.Path(root, s"$HistPrefix$nm"), false)
          }
        }
      }
    }
    // retired generations: deletable once SUPERSEDED for the reader grace
    // window — aged from the NEWER marker's timestamp (its age bounds the
    // supersession age from below), never from the retired generation's
    // own creation time, which says nothing about how recently readers
    // could still have planned against it
    val gens = names(f, new org.apache.hadoop.fs.Path(dir), GenPrefix)
      .flatMap { case (ts, g) => g.toLongOption.map(x => (ts, x)) }
    gens.foreach { case (ts, g) =>
      val supersededLongEnough = gens.exists { case (nts, ng) =>
        (nts > ts || (nts == ts && ng > g)) && now2 - nts >= graceMs
      }
      if (g != gid && supersededLongEnough) {
        f.delete(new org.apache.hadoop.fs.Path(dir, s"$GenPrefix$ts.$g"), false)
        f.delete(new org.apache.hadoop.fs.Path(genPath(dir, g)), true)
      }
    }
  }
}
