package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet storage for the points relation — the Spark
  * mapping of the reference's 24-hour TSM shards (SURVEY §1.3/§1.4):
  *
  *  - one partition directory per UTC day (`date=YYYY-MM-DD`), so Catalyst
  *    partition pruning replaces the reference's shard pruning by time range
  *    (reference: influx_adapter.go:364-389);
  *  - retention = whole-partition deletion, the analog of shard expiry
  *    (reference: persistence/store.go:158-214);
  *  - appends are plain parquet appends into the day partition — the
  *    streaming sink (`foreachBatch`) and the batch writer share this.
  *
  * At 100 TB: day partitions keep any time-bounded query to the touched
  * days only; within a day, files are splittable parquet scanned in
  * parallel by every executor. For heavy per-series workloads, an optional
  * repartition by name spreads series files so a selector for one metric
  * prunes by partition AND row-group stats.
  */
object PointsStore {

  /** Parquet bloom-filter write options for the two row-group-skipping
    * columns of every data file. Within a row group, `name` and `sig` are
    * usually dictionary-encoded (the clustered layout repeats them in
    * runs) and parquet then skips the bloom — the dictionary page itself
    * gives exact row-group filtering. The bloom matters exactly when the
    * dictionary gives out: past ~128k distinct series per row group the
    * 1 MB dictionary page overflows, `sig` falls back to PLAIN, and a
    * selective read (a lone-series selector's pushed `In(sig, …)`) would
    * otherwise have to scan every row group whose [min, max] spans the
    * probe — which for a hash-valued sig is ALL of them. This is the
    * fleet-scale regime: 100 TB day partitions hold millions of series
    * per file. The reference's TSM engine keeps a per-file series-key
    * index for the same lookup (vendor/github.com/influxdata/influxdb/
    * tsdb/engine/tsm1/DESIGN.md); a per-row-group bloom is the parquet
    * analog. NDV 262144 ≈ the series count of a 128 MB row group at
    * ~500 B/series-day; parquet caps the bitset at its 1 MB default when
    * overestimated, and an underestimate only raises the false-positive
    * rate (reads stay correct, just less skipping). */
  private val bloomWriteOptions: Map[String, String] = Map(
    "parquet.bloom.filter.enabled#name" -> "true",
    "parquet.bloom.filter.enabled#sig" -> "true",
    // ADAPTIVE sizing: the writer keeps several candidate bitsets and
    // persists the smallest that meets the FPP for the chunk's OBSERVED
    // ndv — a streaming micro-batch's small file gets a small bloom
    // instead of the fixed ~512 KB a 262144-NDV estimate would pin per
    // chunk (the write-path cost that showed up in the store-writing
    // gates), while a full 128 MB compacted row group still grows the
    // real thing
    "parquet.bloom.filter.adaptive.enabled" -> "true",
    "parquet.bloom.filter.expected.ndv#name" -> "1024",
    "parquet.bloom.filter.expected.ndv#sig" -> "262144")

  /** Monotonic per-JVM write-generation stamp: every append carries it as
    * the `_seq` column (constant per batch — dictionary-encodes to ~0
    * bytes), giving compaction a total write order for last-write-wins
    * (sig, t) dedup. Wall-clock based so stamps ALSO order across writer
    * restarts; the atomic max(+1) keeps two same-millisecond appends from
    * one JVM distinct. */
  private val lastSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  private def nextSeq(): Long =
    lastSeq.updateAndGet(prev => math.max(prev + 1, System.currentTimeMillis()))

  // ---- self-telemetry (served at /metrics; reference: the registrar
  // counters of src/internal/metrics/metrics.go) -------------------------
  //
  // The write-path row counts accumulate in Spark ACCUMULATORS — the
  // within-partition dedup pass already touches every row, so counting
  // rides for free on the executors; the registry exposes the live
  // accumulator values at scrape time. Stage retries/speculation can
  // overcount, the standard accumulator caveat — acceptable for
  // operational counters (the reference's registrar makes no stronger
  // promise across its process restarts either).
  private val writeAccs = new java.util.concurrent.atomic.AtomicReference[
    (org.apache.spark.SparkContext,
      org.apache.spark.util.LongAccumulator,
      org.apache.spark.util.LongAccumulator)]()
  private val expiredShardsTotal = graft.api.Telemetry.counter(
    "metric_store_expired_shards_total", "Day partitions dropped by retention")
  private val compactionsTotal = graft.api.Telemetry.counter(
    "graft_store_compactions_total", "Day-partition (and dict) rewrites published")
  locally {
    def accValue(pick: ((org.apache.spark.SparkContext,
      org.apache.spark.util.LongAccumulator,
      org.apache.spark.util.LongAccumulator)) => org.apache.spark.util.LongAccumulator) =
      () => Option(writeAccs.get()).map(t => pick(t).value.toDouble).getOrElse(0.0)
    graft.api.Telemetry.counterSupplier("metric_store_written_points_total",
      "Rows written to day partitions (post within-batch dedup)")(accValue(_._2))
    graft.api.Telemetry.counterSupplier("graft_store_lww_dropped_points_total",
      "Within-batch (sig, t) duplicates dropped at write time (LWW)")(accValue(_._3))
  }
  private def storeAccs(spark: SparkSession):
      (org.apache.spark.util.LongAccumulator, org.apache.spark.util.LongAccumulator) = {
    val sc = spark.sparkContext
    val cur = writeAccs.get()
    if (cur != null && (cur._1 eq sc)) (cur._2, cur._3)
    else {
      val w = sc.longAccumulator("graft.store.writtenPoints")
      val d = sc.longAccumulator("graft.store.lwwDroppedPoints")
      writeAccs.set((sc, w, d))
      (w, d)
    }
  }

  /** Write points (sig/name/labels/t/value) partitioned by UTC day.
    *
    * Within each written file, rows are CLUSTERED by (name, sig, t) —
    * the path-based analog of bucketing by metric name: parquet row-group
    * min/max stats on `name` then become selective for every selector's
    * name-equality pushdown (a metric's rows occupy a contiguous run of
    * row groups instead of smearing across all of them), and series
    * arrive time-ordered per sig — the layout the reference's TSM
    * compaction maintains per series key. The sort is per write batch
    * (micro-batch sized), mirroring the reference's compaction cost.
    *
    * The canonical label string `_lc` is persisted alongside the map
    * (computed ONCE here at ingest): selectors then read it as a column —
    * dictionary-encoded to ~8 B/row since it repeats per series within the
    * clustered row groups — instead of decoding + sorting + joining the
    * map on every query's every row. The reference's TSM engine stores
    * the series key once per series for the same reason.
    *
    * LAST-WRITE-WINS: a re-sent (series, t) point is overwritten, matching
    * the reference's TSM per-(series, ts) overwrite semantics
    * (influx_adapter.go:63-86 feeding tsm1). The write itself is a plain
    * append — the winner is selected by (sig, t) keep-newest-`_seq` dedup
    * applied at BOTH read boundaries: [[compact]] (durable, collapses the
    * copies on disk) and [[read]]'s [[lwwGuard]] (covers the window
    * between compactions, so LWW holds from the moment the re-send
    * lands). Exactly-once sinks avoid the duplicate entirely via
    * [[appendOnce]]. */
  def append(points: DataFrame, path: String): Unit = {
    // `stale` is part of the store's canonical schema (OTLP ingest writes
    // staleness markers — Otlp.toPoints), but most producers (nozzle,
    // remote write, rollups) don't carry it. Normalize HERE so every file
    // in the store has the same columns: a store mixing stale-carrying and
    // stale-less files would otherwise read whichever schema parquet
    // inference sampled — either dropping the column (markers surface as
    // NaN samples) or reading stale-less rows as stale=null, which
    // Selectors' `!stale` filter silently drops (NULL is not TRUE).
    // ONE pass over the batch source: the dict write and the data write
    // below both consume the canonicalized batch, and `_lc`/`sig` are the
    // expensive per-row computations (map sort + concat + hash) — without
    // the persist each write re-reads the source and re-derives them. The
    // cache is an intra-append intermediate (unpersisted before return),
    // bounded by the batch (micro-batch sized on the streaming path;
    // MEMORY_AND_DISK spills rather than OOMs on large backfill appends).
    // Write ORDERING is unchanged: the dict job runs first and is what
    // materializes the cache, so a crash between the writes still leaves
    // the dict a superset of the data — the documented contract.
    val withLc = graft.model.Points.withCanonical(normalizeStale(points))
      .withColumn("date", to_date(timestamp_millis(col("t"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // series-dictionary sidecar: sig -> (name, _lc, lastDay), one row per
    // series per batch (map-side partial dedup keeps the shuffle
    // series-sized; sig functionally determines name and _lc, so they ride
    // as group keys). Selectors reading this store can then aggregate on
    // the 8-byte sig alone and join the labels back at RESULT size instead
    // of carrying the canonical string through every exchange (the
    // relational analog of the reference's TSM series-key file).
    // `lastDay` (the newest day the series was seen) lets [[expire]] prune
    // dictionary entries with the data. Batches may repeat series;
    // [[readDict]] / [[compact]] dedup keeping max lastDay.
    //
    // Written BEFORE the data so the dictionary is always a SUPERSET of
    // the data's series: a crash between the two writes leaves dict
    // entries whose data never arrived (harmless) — never data whose
    // series the dict-join would silently drop. Readers must take their
    // data snapshot before (or with) their dict snapshot for the same
    // reason; [[read]] + [[readDict]] callers get this by reading data
    // first.
    withLc.groupBy(col("sig"), col("name"), col("_lc"))
      .agg(max(col("date")).as("lastDay"))
      .write.mode(SaveMode.Append).parquet(s"$path/$DictDir")
    // `_sub`: per-row monotonic order WITHIN the batch (partition-major,
    // then row order — monotonically_increasing_id), computed BEFORE the
    // cluster sort so the stamp follows the row. When one append itself
    // carries two samples for the same (series, t) — a self-duplicating
    // sender — the batch's LAST row must win, matching the reference's
    // TSM cache keep-last-write within one WritePoints call. Duplicates
    // WITHIN a task partition are dropped right here, shuffle-free
    // ([[dropWithinPartitionDups]] rides the cluster sort the write
    // already pays — the relational analog of the TSM cache overwrite);
    // duplicates ACROSS batch partitions land in different files of the
    // day, where [[readLiveInfo]]'s multi-file signal arms [[lwwGuard]]
    // and (t, _seq desc, _sub desc) picks the later row.
    val stamped = withLc
      .withColumn("_seq", lit(nextSeq()))
      .withColumn("_sub", monotonically_increasing_id())
      .sortWithinPartitions(col("date"), col("name"), col("sig"), col("t"),
        col("_sub"))
    dropWithinPartitionDups(stamped)
      .write
      .options(bloomWriteOptions)
      .partitionBy("date")
      .mode(SaveMode.Append)
      .parquet(path)
    } finally withLc.unpersist(blocking = false)
  }

  /** Keep the LAST row of each within-partition (date, sig, t) run — the
    * input is already clustered (date, name, sig, t, _sub), so duplicates
    * are adjacent and one forward-looking linear pass suffices: no
    * shuffle, no window, order (hence parquet row-group clustering)
    * preserved. */
  private def dropWithinPartitionDups(df: DataFrame): DataFrame = {
    val schema = df.schema
    val di = schema.fieldIndex("date")
    val si = schema.fieldIndex("sig")
    val ti = schema.fieldIndex("t")
    val (written, dropped) = storeAccs(df.sparkSession)
    df.mapPartitions { it =>
      new Iterator[org.apache.spark.sql.Row] {
        private var pending: org.apache.spark.sql.Row = if (it.hasNext) it.next() else null
        def hasNext: Boolean = pending != null
        def next(): org.apache.spark.sql.Row = {
          var cur = pending
          var nxt: org.apache.spark.sql.Row = if (it.hasNext) it.next() else null
          // skip forward over duplicates of (date, sig, t): later _sub wins
          while (nxt != null && cur.get(di) == nxt.get(di) &&
            cur.getLong(si) == nxt.getLong(si) && cur.getLong(ti) == nxt.getLong(ti)) {
            cur = nxt
            dropped.add(1L)
            nxt = if (it.hasNext) it.next() else null
          }
          pending = nxt
          written.add(1L)
          cur
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Exactly-once [[append]] for at-least-once replay contexts (a
    * streaming `foreachBatch` sink): the write is skipped — returning
    * false — when this (path, batchId) already committed, so a replayed
    * micro-batch cannot double-count in any downstream
    * rate/count_over_time. The marker commits AFTER the append: a crash
    * between append and marker replays the whole append, and the
    * resulting duplicates are removed by [[compact]]'s (sig, t)
    * last-write-wins dedup (replayed batches carry identical values, so
    * any surviving copy is correct). */
  def appendOnce(points: DataFrame, path: String, batchId: Long): Boolean = {
    val markers = new org.apache.hadoop.fs.Path(path, BatchMarkerDir)
    val fs = markers.getFileSystem(points.sparkSession.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(markers, s"batch-$batchId")
    if (fs.exists(marker)) return false
    append(points, path)
    fs.mkdirs(markers)
    fs.create(marker, true).close()
    true
  }

  /** Dictionary dir name: underscore-prefixed, so data readers' file
    * listings (and Spark partition discovery) never see it. */
  private val DictDir = "_dict"

  /** Batch-idempotence marker dir for [[appendOnce]]. */
  private val BatchMarkerDir = "_batches"

  /** Dedup dictionary rows across append batches: one row per sig, keeping
    * the newest lastDay. (sig, name, _lc) are the group keys — sig alone
    * determines the other two — so the aggregation buffer holds only the
    * DateType max and the plan stays a codegen'd HashAggregate. */
  private def dedupDict(df: DataFrame): DataFrame =
    if (df.columns.contains("lastDay"))
      df.groupBy(col("sig"), col("name"), col("_lc"))
        .agg(max(col("lastDay")).as("lastDay"))
    else df.dropDuplicates("sig") // pre-lastDay sidecar layout

  /** The store's series dictionary (sig, name, _lc, lastDay), deduped
    * across append batches; None when the store predates the sidecar.
    * Respects the `_dict` manifest ([[compact]] folds the sidecar into one
    * deduped file with the same MVCC visibility flip the day partitions
    * use) — and when exactly one live file remains (a compacted store with
    * no later appends), it is returned as-is: no dedup shuffle on the
    * query path. */
  def readDict(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/$DictDir")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val live = liveDayFiles(fs, p)
    // driver-direct footer schema ([[sampleFooterSchema]]): a bare
    // spark.read.parquet pays a schema-inference JOB per dict read — one
    // per store-backed query (the dict rides every selector evaluation)
    def dictRead(files: Seq[String]) =
      spark.read.schema(sampleFooterSchema(spark, files.head)(
        spark.read.parquet(files.head).schema)).parquet(files: _*)
    if (live.isEmpty) None
    else if (live.length == 1) Some(dictRead(live))
    else Some(dedupDict(dictRead(live)))
  }

  /** Read back, pruning day partitions to [startMs-slackMs, endMs]. The
    * slack covers lookback/range windows that reach before the grid start.
    * `Long.MinValue`/`Long.MaxValue` bounds mean "unbounded" on that side
    * (no date predicate — `timestamp_millis` of the sentinels would
    * overflow the timestamp range).
    *
    * Reads go through the per-day MANIFEST view ([[liveFiles]]): a
    * compacting writer never renames or deletes a file a planned reader
    * might hold — it adds its outputs under new names and atomically
    * publishes a manifest flipping which names are live — so a reader
    * concurrent with compaction sees either the old file set or the new
    * one, both complete, never half of each. The date predicates are still
    * applied on the partition column, so the plan shows the same
    * PartitionFilters a path-based read had (and the driver-side day
    * pruning in liveFiles already restricted the listing). */
  def read(spark: SparkSession, path: String,
           startMs: Long, endMs: Long, slackMs: Long = 0L,
           lww: Boolean = true): DataFrame = {
    val conds = Seq(
      if (startMs == Long.MinValue) None
      else Some(col("date") >= to_date(timestamp_millis(lit(startMs - slackMs)))),
      if (endMs == Long.MaxValue) None
      else Some(col("date") <= to_date(timestamp_millis(lit(endMs))))
    ).flatten
    val (base, mayDuplicate) = readLiveInfo(spark, path, startMs, endMs, slackMs)
    val bounded = conds.foldLeft(base)(_.where(_))
    (if (lww && mayDuplicate) lwwGuard(bounded) else bounded).drop("date")
  }

  /** Read-time last-write-wins guard: keep the newest-`_seq` row per
    * (sig, t) — the SAME window-lag dedup [[compact]] applies, so a plain
    * re-sent `append` (a remote-write retry whose first attempt actually
    * landed — the documented at-least-once case of the /api/v1/write
    * receiver) cannot double-count in rate/count_over_time BETWEEN
    * compactions. The reference's TSM engine overwrites per (series, ts)
    * at write time (influx_adapter.go:63-86); appends here are immutable
    * parquet, so the overwrite is enforced at the two read boundaries
    * instead: compaction (durable) and this guard (until then).
    *
    * Cost: one sig-partitioned shuffle — paid ONLY when the live file
    * layout can actually hold duplicates ([[readLiveInfo]]); a compacted
    * day (one generation, globally deduped) or a single-append-file day
    * skips it entirely, so steady-state compacted stores read guard-free. */
  private def lwwGuard(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("sig")).orderBy(lwwOrder(df.columns): _*)
    df.withColumn("_prevT", lag(col("t"), 1).over(w))
      .where(col("_prevT").isNull || col("_prevT") =!= col("t"))
      .drop("_prevT")
  }

  /** The LWW dedup sort: newest write wins per (sig, t) — batch stamp
    * `_seq` first, then the within-batch row stamp `_sub` (desc puts
    * non-null after-null, so files from a pre-`_sub` layout read alongside
    * new ones still order correctly: cross-batch pairs are decided by
    * `_seq` alone, and within-batch pairs always carry `_sub`). Absent
    * columns (older store layouts) simply drop out of the ordering. */
  private def lwwOrder(columns: Seq[String]): Seq[org.apache.spark.sql.Column] =
    Seq(Some(col("t")),
      if (columns.contains("_seq")) Some(col("_seq").desc) else None,
      if (columns.contains("_sub")) Some(col("_sub").desc) else None).flatten

  /** Make `stale` a total boolean column: add `false` when absent, map
    * null → false when present (a null would make Selectors' `!stale`
    * filter drop the row — NULL is not TRUE). [[append]] applies this at
    * every write so new files are uniform; [[readPointFiles]] applies it
    * at every read so files from pre-`stale` layouts are too. */
  private def normalizeStale(df: DataFrame): DataFrame =
    if (df.columns.contains("stale"))
      df.withColumn("stale", coalesce(col("stale").cast(
        org.apache.spark.sql.types.BooleanType), lit(false)))
    else df.withColumn("stale", lit(false))

  /** Read an explicit point-file set with a NORMALIZED schema. Plain
    * parquet inference samples ONE footer; over a file set mixing
    * stale-carrying (OTLP-era) and stale-less (older-layout) files it
    * would nondeterministically either drop the column — OTLP staleness
    * markers then surface as ordinary NaN samples — or surface it with
    * nulls on the stale-less rows, which downstream `!stale` filters
    * silently drop. Instead: sample one footer (the same I/O inference
    * pays), inject `stale: boolean` when the sample lacks it, read the
    * set under that EXPLICIT schema (files missing a schema column yield
    * null, by-name resolution), and fold null → false. Every reader —
    * queries, compaction rewrites, delete rewrites — then sees the same
    * columns regardless of which ingest paths fed the store. */
  /** Spark schema of one parquet file, read DRIVER-DIRECT from its footer's
    * Spark row-metadata key. `spark.read.parquet(file).schema` launches a
    * full Spark JOB for the same footer bytes (~100-200 ms of scheduler +
    * planning), and [[readPointFiles]] samples a footer on EVERY store read
    * and every compact/delete day-rewrite — pure fixed overhead at any
    * scale (guide §1.2: remove passes; the [[graft.pipeline.QuantizerFiles]]
    * discipline for metadata I/O). Store data files are all Spark-written
    * and carry the metadata key; anything without it (or an unreadable
    * footer) falls back to the inference job with identical results. */
  private def sampleFooterSchema(spark: SparkSession, file: String)(
      fallback: => org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file),
        spark.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val meta = try r.getFooter.getFileMetaData.getKeyValueMetaData
                 finally r.close()
      Option(meta.get("org.apache.spark.sql.parquet.row.metadata")) match {
        case Some(json) =>
          org.apache.spark.sql.types.DataType.fromJson(json)
            .asInstanceOf[org.apache.spark.sql.types.StructType]
        case None => fallback
      }
    } catch { case scala.util.control.NonFatal(_) => fallback }

  private def readPointFiles(spark: SparkSession, files: Seq[String],
                             basePath: Option[String]): DataFrame = {
    def reader = basePath.foldLeft(spark.read)((r, p) => r.option("basePath", p))
    val sampled = sampleFooterSchema(spark, files.head)(
      reader.parquet(files.head).schema)
    // inject every KNOWN optional store column the sampled footer lacks,
    // so a mixed-layout file set cannot silently drop a column another
    // file carries: `stale` (pre-normalization layouts would otherwise
    // lose markers) and the `_seq`/`_sub` write stamps (losing them from
    // the schema would strip lwwOrder's newest-write ordering — files
    // without them read as null, which `desc` sorts last: cross-layout
    // pairs resolve to the stamped, newer write, the correct LWW answer).
    // Hot-label `lbl_*` columns cannot be injected generically; a store
    // using appendFlattened writes them from its first batch.
    val schema = Seq(
      ("stale", org.apache.spark.sql.types.BooleanType: org.apache.spark.sql.types.DataType),
      ("_seq", org.apache.spark.sql.types.LongType),
      ("_sub", org.apache.spark.sql.types.LongType))
      .foldLeft(sampled) { case (s, (n, t)) =>
        if (s.fieldNames.contains(n)) s else s.add(n, t)
      }
    normalizeStale(reader.schema(schema).parquet(files: _*))
  }

  // ---- manifest-gated file visibility ----------------------------------
  //
  // Compaction output files carry the `compacted-` prefix and are visible
  // ONLY when the day's newest `_manifest.<ts>` +lists them; plain append
  // files (Spark `part-*`) are visible unless -listed. The manifest file
  // is published with an atomic rename, so visibility flips as one unit:
  // before the flip a reader sees the old live set (old files are still on
  // disk), after it the compacted set — the reader-visible gap of the old
  // rename-the-directory swap is gone. Dead files are vacuumed by a LATER
  // compaction once the manifest that killed them is older than the grace
  // window, so in-flight plans keep their files.

  private val CompactedPrefix = "compacted-"
  private val ManifestPrefix = "_manifest."

  /** A rewrite lost the optimistic manifest check: between reading the
    * live set and publishing, some other rewrite flipped the day's
    * manifest. The staged outputs were discarded; the caller re-reads the
    * (new) live set and retries. */
  final class RewriteLostException(dir: String) extends RuntimeException(
    s"concurrent rewrite published a newer manifest for $dir")

  // Rewrites of ONE day dir must serialize: two concurrent rewrites each
  // read a live set, and an unserialized publish race could undo the
  // other's rewrite — if the loser was a deleteSeries, its deletion would
  // be silently resurrected by a winner built from the pre-delete live
  // set. Serve runs the maintenance-tick compaction concurrently with the
  // admin delete_series route in one JVM, so a striped in-process mutex
  // closes that deployment's race completely (cheaply — no namespace
  // traffic); cross-process racers are handled by the chained-manifest
  // protocol in [[publishRewrite]]/[[resolveTip]]: both publishes land as
  // a visible namespace fork, resolution is deterministic, and the loser
  // detects it post-rename and retries against the winner's live set.
  private val rewriteStripes = Array.fill(64)(new Object)
  private def withDirLock[A](dir: org.apache.hadoop.fs.Path)(f: => A): A =
    rewriteStripes(math.floorMod(dir.toString.hashCode, 64)).synchronized(f)

  /** Run `attempt` (a read-live-then-publish rewrite of one dir),
    * retrying when it loses the manifest CAS to a concurrent rewrite.
    * Bounded: losing means SOMEONE ELSE made progress, so unbounded
    * livelock would need an unbounded stream of racing rewrites. */
  private def retryRewrite[A](dir: org.apache.hadoop.fs.Path,
                              attempts: Int = 5)(attempt: => A): A = {
    var left = attempts
    while (true) {
      try return withDirLock(dir)(attempt)
      catch {
        case e: RewriteLostException =>
          left -= 1
          if (left <= 0) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def isHidden(name: String): Boolean =
    name.startsWith("_") || name.startsWith(".")

  /** Unique generation id for one rewrite: wall-clock millis (orders
    * generations and drives the grace window) plus a nanoTime uniquifier —
    * two rewrites of the same dir within one millisecond (or clock-skewed
    * writers) can no longer collide on manifest/output names. */
  private def newGen(nowMs: Long): String =
    s"$nowMs-${java.lang.Long.toUnsignedString(System.nanoTime(), 36)}"

  /** Parse a manifest file name into its ordering stamp: (publish ms,
    * full suffix — the tie-break within one millisecond). Returns None for
    * stray `_manifest.*` files that don't start with a timestamp, which
    * are simply ignored rather than breaking every read of the dir. */
  private def manifestStamp(fileName: String): Option[(Long, String)] = {
    val suffix = fileName.drop(ManifestPrefix.length)
    val digits = suffix.takeWhile(_.isDigit)
    if (digits.isEmpty || digits.length > 18) None
    else Some((digits.toLong, suffix))
  }

  // ---- manifest chain resolution ---------------------------------------
  //
  // Manifest names CHAIN their parent generation:
  // `_manifest.<gen>_p_<parentGen>` (parentGen = "root" for the first
  // publish). The current manifest ("tip") is resolved by WALKING the
  // chain, not by comparing timestamps — so two cross-process rewrites
  // that both passed the pre-rename check and both renamed produce a
  // visible FORK in the namespace (two manifests naming the same parent)
  // instead of a silent last-stamp-wins overwrite. Fork resolution is
  // deterministic (earliest rename wins, see [[resolveTip]]), every
  // publisher re-resolves AFTER its rename ([[publishRewrite]]), and the
  // loser throws [[RewriteLostException]] and retries against the
  // winner's live set — a cross-process deleteSeries racing a compaction
  // is DETECTED rather than resurrected. Pre-chain manifests
  // (`_manifest.<gen>`) order by stamp as before; the first chained
  // publish names the legacy tip as its parent.

  private val ParentSep = "_p_"
  private val RootToken = "root"

  /** One parsed manifest file: stamp ts (grace ordering), own generation,
    * parent generation (None = pre-chain legacy name), file name, and the
    * file's modification time — set when the staged `.tmp` manifest was
    * written, milliseconds before its rename, and preserved by the
    * rename, so it orders manifests by PUBLISH time (stamps are taken
    * before the rewrite's Spark write and can be minutes older). */
  private[sources] final case class MEnt(ts: Long, gen: String, parent: Option[String],
                                name: String, mtime: Long)

  private def parseManifest(st: org.apache.hadoop.fs.FileStatus): Option[MEnt] = {
    val name = st.getPath.getName
    manifestStamp(name).map { case (ts, suffix) =>
      val i = suffix.indexOf(ParentSep)
      if (i < 0) MEnt(ts, suffix, None, name, st.getModificationTime)
      else MEnt(ts, suffix.substring(0, i),
        Some(suffix.substring(i + ParentSep.length)), name, st.getModificationTime)
    }
  }

  private[sources] def listManifests(fs: org.apache.hadoop.fs.FileSystem,
                            day: org.apache.hadoop.fs.Path): Seq[MEnt] =
    fs.listStatus(day).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith(ManifestPrefix))
      .flatMap(parseManifest)

  /** Resolve the dir's current manifest by walking the parent chain.
    *
    * Start: the chained manifest whose parent is `root` or no longer
    * present (vacuumed ancestors leave a single fragment —
    * [[vacuum]] removes on-chain ancestors only when the namespace is
    * fork-free, so fragments are unambiguous); else the newest legacy
    * manifest (first chained publish named it as parent). At each step
    * the child with the EARLIEST (mtime, name) wins a fork: mtime tracks
    * rename order, so a racer that renamed after the winner — or any
    * later would-be usurper — deterministically loses, and discovers it
    * in its own post-rename re-resolution. Cycle-guarded (a cycle would
    * need a forged name); falls back to stamp order if the walk cannot
    * start. */
  private[sources] def resolveTip(ents: Seq[MEnt]): Option[MEnt] = {
    if (ents.isEmpty) return None
    val chained = ents.filter(_.parent.isDefined)
    val byStamp = ents.maxBy(e => (e.ts, e.name))
    if (chained.isEmpty) return Some(byStamp) // pure legacy dir
    val gens = ents.map(_.gen).toSet
    val roots = chained.filter(e =>
      e.parent.contains(RootToken) || !gens.contains(e.parent.get))
    val legacyTip = ents.filter(_.parent.isEmpty) match {
      case l if l.nonEmpty => Some(l.maxBy(e => (e.ts, e.name)))
      case _ => None
    }
    val start = if (roots.nonEmpty) Some(roots.minBy(e => (e.mtime, e.name)))
                else legacyTip
    start match {
      case None => Some(byStamp) // unreachable without forged names
      case Some(s) =>
        var cur = s
        var steps = 0
        while (steps <= ents.size) {
          chained.filter(_.parent.get == cur.gen) match {
            case cs if cs.isEmpty => return Some(cur)
            case cs => cur = cs.minBy(e => (e.mtime, e.name))
          }
          steps += 1
        }
        Some(cur)
    }
  }

  /** Generations on the tip chain: tip plus every present ancestor. */
  private[sources] def chainGens(ents: Seq[MEnt], tip: MEnt): Set[String] = {
    val byGen = ents.map(e => e.gen -> e).toMap
    var cur = Option(tip)
    val out = Set.newBuilder[String]
    var steps = 0
    while (cur.isDefined && steps <= ents.size) {
      out += cur.get.gen
      cur = cur.get.parent.filterNot(_ == RootToken).flatMap(byGen.get)
      steps += 1
    }
    out.result()
  }

  /** Current manifest of a day dir: (publish stamp, +live set, -dead set). */
  private def newestManifest(fs: org.apache.hadoop.fs.FileSystem,
                             day: org.apache.hadoop.fs.Path)
      : Option[(Long, Set[String], Set[String])] = {
    resolveTip(listManifests(fs, day)).map { tip =>
      val in = fs.open(new org.apache.hadoop.fs.Path(day, tip.name))
      val text = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
        out.toString("UTF-8")
      } finally in.close()
      val lines = text.split("\n").filter(_.nonEmpty)
      (tip.ts,
        lines.filter(_.startsWith("+")).map(_.drop(1)).toSet,
        lines.filter(_.startsWith("-")).map(_.drop(1)).toSet)
    }
  }

  /** The unique FILE NAME of a dir's current manifest (None when no
    * manifest was ever published) — the generation token the rewrite CAS
    * in [[publishRewrite]] compares. */
  private[sources] def newestManifestName(fs: org.apache.hadoop.fs.FileSystem,
                                 day: org.apache.hadoop.fs.Path): Option[String] =
    resolveTip(listManifests(fs, day)).map(_.name)

  /** The files of one day a reader may see: manifest-+listed compacted
    * outputs, plus append files not -listed. Unlisted `compacted-` files
    * (a compaction that crashed before publishing, or one mid-publish) are
    * never visible. */
  private def liveDayFiles(fs: org.apache.hadoop.fs.FileSystem,
                           day: org.apache.hadoop.fs.Path): Seq[String] =
    liveDayFilesWithGen(fs, day)._1

  /** [[liveDayFiles]] plus the generation token (newest manifest file
    * name) the set was computed under — the pair a rewrite needs for its
    * publish-time CAS. `newestManifest` re-lists internally; a publish
    * landing between the two listings only makes the token OLDER than the
    * set actually read, which fails the CAS conservatively (a retry, never
    * a resurrect). */
  private def liveDayFilesWithGen(fs: org.apache.hadoop.fs.FileSystem,
                                  day: org.apache.hadoop.fs.Path)
      : (Seq[String], Option[String]) = {
    val gen = newestManifestName(fs, day)
    val files = fs.listStatus(day).toSeq
      .filter(s => s.isFile && !isHidden(s.getPath.getName))
    val (plus, minus) = newestManifest(fs, day) match {
      case Some((_, p, m)) => (p, m)
      case None => (Set.empty[String], Set.empty[String])
    }
    (files.map(_.getPath).filter { p =>
      val n = p.getName
      if (n.startsWith(CompactedPrefix)) plus.contains(n)
      else !minus.contains(n)
    }.map(_.toString), gen)
  }

  /** DataFrame over the manifest-visible files of the days intersecting
    * [startMs-slackMs, endMs]; `basePath` keeps the `date` partition
    * column derivable so callers' date predicates still show as
    * PartitionFilters. */
  private def readLive(spark: SparkSession, path: String,
                       startMs: Long, endMs: Long, slackMs: Long): DataFrame =
    readLiveInfo(spark, path, startMs, endMs, slackMs)._1

  /** [[readLive]] plus the duplicate-possibility signal for the read-time
    * LWW guard: a day's live set can hold (sig, t) duplicates only when it
    * mixes at least one plain append file with any other file — all live
    * `compacted-` files belong to ONE generation (the newest manifest
    * +lists only its own rewrite's outputs) and that generation was
    * globally deduped when written, while a lone append file cannot hold
    * duplicates either: one file is one batch task partition, and
    * [[append]] drops within-partition (sig, t) duplicates at write time
    * (a self-duplicating batch's cross-partition copies land in separate
    * files, tripping the multi-file signal). Keeping the lone-file fast
    * path matters at fleet scale: the guard's sig window is a pushdown
    * barrier, and fresh single-batch stores must still push selector
    * equality into the scan. */
  private def readLiveInfo(spark: SparkSession, path: String,
                           startMs: Long, endMs: Long, slackMs: Long)
      : (DataFrame, Boolean) = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return (spark.read.parquet(path), false) // preserve error
    def dayOf(ms: Long): java.time.LocalDate =
      java.time.Instant.ofEpochMilli(ms).atZone(java.time.ZoneOffset.UTC).toLocalDate
    val lo = if (startMs == Long.MinValue) None else Some(dayOf(startMs - slackMs))
    val hi = if (endMs == Long.MaxValue) None else Some(dayOf(endMs))
    val days = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
      .filter { s =>
        val d = java.time.LocalDate.parse(s.getPath.getName.stripPrefix("date="))
        lo.forall(l => !d.isBefore(l)) && hi.forall(h => !d.isAfter(h))
      }
    val perDay = days.map(d => liveDayFiles(fs, d.getPath))
    val mayDuplicate = perDay.exists { dayFiles =>
      dayFiles.length > 1 && dayFiles.exists(f =>
        !new org.apache.hadoop.fs.Path(f).getName.startsWith(CompactedPrefix))
    }
    val files = perDay.flatten
    if (files.isEmpty) {
      // derive the empty result's schema from live files of ANY day (the
      // range just missed) rather than scanning the root: the root may
      // hold a non-hidden `snapshots/` dir whose nested `date=` layers
      // would break partition discovery
      val dayDirs = fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
      val anyLive = dayDirs.iterator.map(d => liveDayFiles(fs, d.getPath))
        .find(_.nonEmpty).getOrElse(Nil)
      if (anyLive.nonEmpty)
        (readPointFiles(spark, anyLive, Some(path)).where(lit(false)), false)
      else {
        // no live file ANYWHERE (all expired, or only unpublished
        // rewrite outputs): derive the schema from any parquet file
        // under a date= dir — dead files share the live schema. NEVER
        // scan the root: it may hold the standard `snapshots/` tree,
        // whose nested date= layers break partition discovery.
        val anyFile = dayDirs.iterator
          .flatMap(d => fs.listStatus(d.getPath).toSeq)
          .find(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.toString).toSeq
        if (anyFile.nonEmpty)
          (readPointFiles(spark, anyFile, Some(path)).where(lit(false)), false)
        else {
          // a never-written (or day-dirs-deleted) store: fall back to a
          // snapshot day for the schema when one exists, else preserve
          // the plain-read error for a truly empty path
          val snapDay = Option(new org.apache.hadoop.fs.Path(root, "snapshots"))
            .filter(fs.exists(_))
            .toSeq.flatMap(p => fs.listStatus(p).toSeq.filter(_.isDirectory))
            .flatMap(sn => fs.listStatus(sn.getPath).toSeq
              .filter(d => d.isDirectory && d.getPath.getName.startsWith("date="))
              .map(d => (sn.getPath.toString, d.getPath.toString)))
            .headOption
          snapDay match {
            case Some((snapRoot, day)) =>
              (normalizeStale(spark.read.option("basePath", snapRoot).parquet(day))
                .where(lit(false)), false)
            case None =>
              (normalizeStale(spark.read.parquet(path)).where(lit(false)), false)
          }
        }
      }
    }
    else (readPointFiles(spark, files, Some(path)), mayDuplicate)
  }

  /** Hot-label flattening: selected label keys are ALSO stored as physical
    * `lbl_<key>` columns next to the map, so equality/range predicates on
    * them push into parquet (row-group stats + dictionary pruning) — the
    * map column itself cannot prune. The map stays authoritative; the
    * flattened columns are denormalized copies dropped on read. */
  def appendFlattened(points: DataFrame, path: String, hotKeys: Seq[String]): Unit = {
    val flattened = hotKeys.foldLeft(points) { (df, k) =>
      df.withColumn(s"lbl_$k", element_at(col("labels"), k))
    }
    append(flattened, path)
  }

  /** Read with hot-label equality pushdown: `hotFilters` are applied to the
    * flattened columns (reaching the parquet scan), then dropped. */
  def readFlattened(spark: SparkSession, path: String,
                    startMs: Long, endMs: Long,
                    hotFilters: Map[String, String],
                    slackMs: Long = 0L): DataFrame = {
    val (base0, mayDuplicate) = readLiveInfo(spark, path, startMs, endMs, slackMs)
    val base = base0
      .where(col("date") >= to_date(timestamp_millis(lit(startMs - slackMs))) &&
        col("date") <= to_date(timestamp_millis(lit(endMs))))
    val filtered = hotFilters.foldLeft(base) { case (df, (k, v)) =>
      df.where(col(s"lbl_$k") === v)
    }
    // LWW guard AFTER the label filters (fewer rows shuffled): a (sig, t)
    // duplicate pair shares its labels, so both copies pass or fail the
    // same equality filters and the per-pair winner is unchanged.
    val guarded = if (mayDuplicate) lwwGuard(filtered) else filtered
    guarded.drop("date").drop(guarded.columns.filter(_.startsWith("lbl_")): _*)
  }

  /** Compact one or all day partitions: streaming `foreachBatch` appends
    * leave one small file per micro-batch per day — at fleet scale the
    * small-file count, not data volume, becomes the scan bottleneck (every
    * file costs a task + footer read). Compaction rewrites a day's live
    * files into ~`targetBytes` outputs re-clustered by (name, sig, t) — the
    * reference's TSM compaction merges write-order segments into
    * series-ordered files for the same reason (persistence/store.go).
    *
    * CONCURRENT-READER SAFE (MVCC via the day manifest): the rewrite
    * stages into a dot-prefixed temp dir, moves its outputs INTO the live
    * day dir under `compacted-<ts>-` names (invisible until +listed), and
    * flips visibility with ONE atomic manifest publish — replaced files
    * are -listed, never renamed or deleted in place, so a reader planned
    * against the old set keeps every file it references. Dead files and
    * superseded manifests are vacuumed by a LATER compaction once the
    * manifest that killed them is older than `graceMs` (any reader that
    * old has finished); a crash before publish leaves only unlisted
    * `compacted-` orphans, which readers never see and the orphan sweep
    * removes. Returns the compacted partition paths. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024,
              onlyDay: Option[String] = None,
              graceMs: Long = 15 * 60 * 1000L,
              minFiles: Int = 2): Seq[String] = {
    // derive the FS from the store path, not the default FS — a store on
    // s3a:// with defaultFS=hdfs would otherwise rename on the wrong FS
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val days = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
      .filter(s => onlyDay.forall(d => s.getPath.getName == s"date=$d"))
    val done = Seq.newBuilder[String]
    // days are independent rewrite units (separate dirs, separate
    // manifests): compact them CONCURRENTLY on a bounded pool — serial
    // per-day rewrites would make compaction wall-clock scale with the
    // store's day count (a year of retention = hundreds of small
    // sequential Spark jobs), while concurrent days keep the cluster fed.
    // Spark schedules jobs from multiple submitter threads natively; the
    // uniquified generation ids keep output/manifest names collision-free.
    def compactDay(st: org.apache.hadoop.fs.FileStatus): Option[String] = retryRewrite(st.getPath) {
      val dayPath = st.getPath
      val now = System.currentTimeMillis()
      vacuum(fs, dayPath, now, graceMs)
      // ---- rewrite the current live set when it is fragmented
      val (live, liveGen) = liveDayFilesWithGen(fs, dayPath)
      if (live.length >= math.max(2, minFiles)) {
        val liveBytes = live.map(f =>
          fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum
        val nOut = math.max(1, (liveBytes / targetBytes).toInt)
        // reading the explicit live files keeps a racing appender's new
        // files out of this generation (they stay unlisted -> still live);
        // the normalized read makes the rewrite converge a mixed-layout
        // day to the uniform stale-carrying schema
        val raw = readPointFiles(spark, live, None)
        // LAST-WRITE-WINS (sig, t) dedup, keeping the newest write stamp:
        // re-sent / replayed points collapse to one sample per (series, t)
        // — the guarantee Selectors.instant documents and the reference's
        // TSM cache/compaction enforce per (series, ts). Window-lag over
        // (sig)-clustered, (t, _seq desc)-ordered rows: the first row of
        // each t run is the newest write; one shuffle, series-parallel.
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("sig")).orderBy(lwwOrder(raw.columns): _*)
        val deduped = raw
          .withColumn("_prevT", lag(col("t"), 1).over(w))
          .where(col("_prevT").isNull || col("_prevT") =!= col("t"))
          .drop("_prevT")
        publishRewrite(fs, dayPath, live, now, liveGen, tmp =>
          deduped
            .repartition(nOut)
            .sortWithinPartitions(col("name"), col("sig"), col("t"))
            .write.options(bloomWriteOptions)
            .mode(SaveMode.Overwrite).parquet(tmp.toString))
        Some(dayPath.toString)
      } else None
    }
    if (days.length == 1) {
      // the common maintenance-tick shape (onlyDay / a hot single-day
      // store): run inline — no executor churn, and the caller thread
      // holds the stripe lock itself
      compactDay(days.head).foreach { d => done += d; compactionsTotal.add(1L) }
    } else if (days.nonEmpty) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(days.length, 8))
      try {
        val futures = days.map(st => pool.submit(
          new java.util.concurrent.Callable[Option[String]] {
            def call(): Option[String] = compactDay(st)
          }))
        // await EVERY day before deciding the outcome: a single failing day
        // must not strand other days' rewrites mid-publish (each day is an
        // independent MVCC unit — the completed ones are durable and
        // correct), and the caller gets the ORIGINAL per-day exception, not
        // the pool's ExecutionException wrapper.
        val outcomes = futures.map(f =>
          try Right(f.get())
          catch {
            case e: java.util.concurrent.ExecutionException =>
              Left(Option(e.getCause).getOrElse(e))
          })
        outcomes.foreach { case Right(d) =>
          done ++= d; compactionsTotal.add(d.size.toLong)
        case Left(_) => () }
        outcomes.collectFirst { case Left(e) => e }.foreach(throw _)
      } finally pool.shutdown()
    }
    // ---- fold the series-dictionary sidecar: rewrite the accumulated
    // per-batch dict files into ONE deduped file (same MVCC manifest flip),
    // so readDict on a compacted store is a single-file read — no
    // per-query dedup shuffle, and the sidecar stops growing with append
    // count (it scales with live series again).
    val dictPath = new org.apache.hadoop.fs.Path(root, DictDir)
    if (fs.exists(dictPath)) {
      retryRewrite(dictPath) {
        val now = System.currentTimeMillis()
        vacuum(fs, dictPath, now, graceMs)
        val (live, liveGen) = liveDayFilesWithGen(fs, dictPath)
        if (live.length >= math.max(2, minFiles)) {
          publishRewrite(fs, dictPath, live, now, liveGen, tmp =>
            dedupDict(spark.read.parquet(live: _*))
              .coalesce(1)
              .write.mode(SaveMode.Overwrite).parquet(tmp.toString))
          done += dictPath.toString
        }
      }
    }
    done.result()
  }

  /** Automatic compaction policy: compact only when fragmentation crosses
    * `maxLiveFiles` live files in some day partition (or the dict
    * sidecar). File COUNT is the trigger — not bytes — because the
    * documented fleet-scale bottleneck of foreachBatch ingest is the
    * per-file task + footer cost of thousands of micro-batch files, and
    * count is readable from the manifest listing without opening anything.
    * Cheap when below threshold (one listing, no Spark job), so it is safe
    * to call on EVERY micro-batch; [[sink]] does exactly that, which keeps
    * per-day live-file count ≤ maxLiveFiles + batches-per-compaction
    * operationally, with no operator-remembered cron. */
  def maybeCompact(spark: SparkSession, path: String,
                   maxLiveFiles: Int = 16,
                   targetBytes: Long = 128L * 1024 * 1024,
                   graceMs: Long = 15 * 60 * 1000L): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val threshold = math.max(2, maxLiveFiles)
    val fragmented = fs.listStatus(root).toSeq.exists { s =>
      (s.isDirectory && s.getPath.getName.startsWith("date=") ||
        s.isDirectory && s.getPath.getName == DictDir) &&
        liveDayFiles(fs, s.getPath).length >= threshold
    }
    if (fragmented) compact(spark, path, targetBytes, None, graceMs, threshold)
    else Nil
  }

  /** Ready-made `writeStream.foreachBatch` store sink: exactly-once append
    * ([[appendOnce]]) plus the [[maybeCompact]] policy, so long-running
    * streaming ingest keeps its small-file count bounded — and LWW
    * convergence durable — without any manual compaction schedule. */
  def sink(path: String, maxLiveFiles: Int = 16,
           targetBytes: Long = 128L * 1024 * 1024,
           graceMs: Long = 15 * 60 * 1000L): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      appendOnce(batch, path, batchId)
      maybeCompact(batch.sparkSession, path, maxLiveFiles, targetBytes, graceMs)
      ()
    }

  /** Vacuum one manifest-managed dir: the previous generation's dead
    * files, superseded manifests, and never-published orphans, all past
    * the grace window (any reader that planned against them has
    * finished). */
  private def vacuum(fs: org.apache.hadoop.fs.FileSystem,
                     dir: org.apache.hadoop.fs.Path,
                     now: Long, graceMs: Long): Unit = {
    newestManifest(fs, dir) match {
      case Some((ts, plus, minus)) if now - ts >= graceMs =>
        minus.foreach(n => fs.delete(new org.apache.hadoop.fs.Path(dir, n), false))
        fs.listStatus(dir).toSeq
          .filter(s => s.isFile && s.getPath.getName.startsWith(CompactedPrefix) &&
            !plus.contains(s.getPath.getName) &&
            now - s.getModificationTime >= graceMs)
          .foreach(s => fs.delete(s.getPath, false))
      case _ => ()
    }
    // superseded manifests: never the TIP (chain-resolved, not newest
    // stamp); grace from MTIME — publish time — since a fork loser's
    // stamp predates its rename by its rewrite's whole Spark write
    val ents = listManifests(fs, dir)
    resolveTip(ents).foreach { tip =>
      val onChain = chainGens(ents, tip)
      val offChain = ents.filter(e => !onChain.contains(e.gen))
      // fork losers / usurped branches: a reader could have resolved one
      // as tip only in the instant between the racing renames, so they
      // age out on the same reader-grace as dead files
      offChain.filter(e => now - e.mtime >= graceMs)
        .foreach(e => fs.delete(new org.apache.hadoop.fs.Path(dir, e.name), false))
      // on-chain ancestors: removed ONLY when the namespace is fork-free —
      // deleting an ancestor while a fork loser remains could make the
      // loser a parent-absent root and flip [[resolveTip]] — and only as
      // a CONTIGUOUS OLDEST PREFIX of the chain: mtimes need not be
      // monotone along it (a rename that lands as copy+delete can invert
      // publish order), and deleting a MIDDLE ancestor would leave TWO
      // parent-absent roots (the true oldest fragment and the hole's
      // child), letting [[resolveTip]]'s earliest-mtime root selection
      // flip the tip to a stale manifest and resurrect deleted data.
      // Stopping at the first non-aged ancestor keeps every surviving
      // manifest's parent present except the single fragment head.
      if (offChain.isEmpty)
        vacuumableAncestors(ents, tip, now, graceMs)
          .foreach(e => fs.delete(new org.apache.hadoop.fs.Path(dir, e.name), false))
    }
  }

  /** The on-chain ancestor manifests [[vacuum]] may delete: a CONTIGUOUS
    * OLDEST PREFIX of grace-aged entries (see the rationale at the call
    * site). Walks tip→parents, reverses to oldest-first, and stops at
    * the first non-aged ancestor — so any non-aged entry shields every
    * newer ancestor, and at most one parent-absent fragment head ever
    * exists. */
  private[sources] def vacuumableAncestors(ents: Seq[MEnt], tip: MEnt,
                                           now: Long, graceMs: Long): Seq[MEnt] = {
    val byGen = ents.map(e => e.gen -> e).toMap
    val walk = scala.collection.mutable.ListBuffer[MEnt]()
    var cur = Option(tip)
    var steps = 0
    while (cur.isDefined && steps <= ents.size) {
      walk += cur.get
      cur = cur.get.parent.filterNot(_ == RootToken).flatMap(byGen.get)
      steps += 1
    }
    walk.toList.reverse // oldest ancestor first
      .takeWhile(e => e.gen != tip.gen && now - e.mtime >= graceMs)
  }

  /** Stage `writeTmp`'s output into `dir` under unique `compacted-<gen>-`
    * names (invisible until +listed) and flip visibility with ONE atomic
    * manifest publish: replaced files are -listed, never renamed or
    * deleted in place, so a reader planned against the old set keeps every
    * file it references. The generation id is uniquified ([[newGen]]) —
    * concurrent or same-millisecond rewrites cannot collide on names.
    *
    * `expect` is the generation token ([[liveDayFilesWithGen]]) the live
    * set was read under: immediately before the flip the current manifest
    * is re-checked, and on mismatch the staged outputs are discarded and
    * [[RewriteLostException]] thrown — the caller retries against the new
    * live set. Without this a compaction that read the pre-delete live
    * set but publishes AFTER a deleteSeries would silently resurrect the
    * deleted samples. In-process racers are fully excluded by
    * [[withDirLock]]. Cross-process racers that slip past the re-check
    * (both rename inside the check→rename instant) are handled by the
    * CHAINED names: both manifests land naming the same parent, the fork
    * is resolved deterministically by [[resolveTip]] (earliest rename
    * wins), and the post-rename re-resolution below makes the loser throw
    * and retry — detected, never silently undone. Residual windows, both
    * needing multiple independent publishers inside one ~millisecond
    * namespace gap (each pair already being a lost-CAS anomaly): (a) a
    * third publish chaining onto the fork's provisional winner inside
    * the racers' rename gap could itself be usurped before ITS
    * post-check; (b) mtime order can invert rename order when both
    * renames land inside the other's staged-write→rename gap (the
    * staged manifest is written microseconds before its rename precisely
    * to shrink this) — the earlier-mtime publisher whose rename landed
    * second then wins the fork after the other's post-check already
    * passed, and the first rewrite is lost without a retry. Same-ms
    * mtime ties break deterministically by name (detected, arbitrary
    * winner). Fork resolution relies on rename-preserved mtimes — exact
    * on POSIX and HDFS, best-effort on object stores whose rename is a
    * copy. */
  private def publishRewrite(fs: org.apache.hadoop.fs.FileSystem,
                             dir: org.apache.hadoop.fs.Path,
                             live: Seq[String], now: Long,
                             expect: Option[String],
                             writeTmp: org.apache.hadoop.fs.Path => Unit): Unit = {
    val gen = newGen(now)
    val tmp = new org.apache.hadoop.fs.Path(
      dir.getParent, s".compact-tmp-${dir.getName}-$gen")
    fs.delete(tmp, true)
    writeTmp(tmp)
    val parts = fs.listStatus(tmp).toSeq
      .filter(s => s.isFile && !isHidden(s.getPath.getName))
      .sortBy(_.getPath.getName)
    if (newestManifestName(fs, dir) != expect) {
      fs.delete(tmp, true)
      throw new RewriteLostException(dir.toString)
    }
    val newNames = parts.zipWithIndex.map { case (p, i) =>
      val name = s"$CompactedPrefix$gen-$i.parquet"
      fs.rename(p.getPath, new org.apache.hadoop.fs.Path(dir, name))
      name
    }
    fs.delete(tmp, true)
    // previously-dead names still on disk must stay dead in the new
    // manifest (they are append-named: unlisted would resurrect them)
    val prevMinus = newestManifest(fs, dir) match {
      case Some((_, _, m)) =>
        m.filter(n => fs.exists(new org.apache.hadoop.fs.Path(dir, n)))
      case None => Set.empty[String]
    }
    val liveNames = live.map(f => new org.apache.hadoop.fs.Path(f).getName)
    val manifestBody =
      (newNames.map("+" + _) ++ (liveNames ++ prevMinus).map("-" + _))
        .mkString("", "\n", "\n")
    // last-instant re-check (the staged outputs above are unlisted
    // `compacted-` names — invisible — so discarding here is safe)
    if (newestManifestName(fs, dir) != expect) {
      newNames.foreach(n => fs.delete(new org.apache.hadoop.fs.Path(dir, n), false))
      throw new RewriteLostException(dir.toString)
    }
    Option(publishTestHook.getAndSet(null)).foreach(_.apply())
    // the visibility flip: the manifest name CHAINS the parent generation,
    // so if a cross-process racer renamed between the check above and this
    // rename, the namespace holds a FORK (two manifests naming the same
    // parent) rather than a silent stamp-ordered overwrite. The staged
    // manifest is written HERE, after the check and microseconds before
    // the rename: its mtime — preserved by the rename — is the fork
    // resolution's publish-order signal, so it must be stamped as close
    // to the flip as possible.
    val tmpManifest = new org.apache.hadoop.fs.Path(dir, s".$ManifestPrefix$gen.tmp")
    val out = fs.create(tmpManifest, true)
    try out.write(manifestBody.getBytes("UTF-8")) finally out.close()
    val parentToken = expect.map { n =>
      val suffix = n.drop(ManifestPrefix.length)
      val i = suffix.indexOf(ParentSep)
      if (i < 0) suffix else suffix.substring(0, i)
    }.getOrElse(RootToken)
    val myName = s"$ManifestPrefix$gen$ParentSep$parentToken"
    fs.rename(tmpManifest, new org.apache.hadoop.fs.Path(dir, myName))
    // post-rename re-resolution: deterministic fork loser detection. The
    // winner is whoever [[resolveTip]] picks (earliest rename); the loser
    // leaves its manifest and outputs IN PLACE — a reader could have
    // transiently resolved them as tip between the racing renames, so
    // [[vacuum]] reclaims them after the reader grace window — and throws
    // so [[retryRewrite]] re-runs it against the winner's live set.
    val ents = listManifests(fs, dir)
    val won = resolveTip(ents).exists(tip => chainGens(ents, tip).contains(gen))
    if (!won) throw new RewriteLostException(dir.toString)
  }

  /** Test seam: runs ONCE between the pre-rename check and the rename —
    * the cross-process race window — then self-clears. Lets specs inject
    * a full concurrent rewrite exactly where a real racer could land. */
  private[sources] val publishTestHook =
    new java.util.concurrent.atomic.AtomicReference[() => Unit](null)

  /** Admin deletion — the storage side of the Prometheus admin API's
    * POST /api/v1/admin/tsdb/delete_series (the reference serves the
    * route through the vendored web/api/v1/api.go:400,1608-1640, which
    * forwards the parsed matchers to TSDB Delete): remove every sample
    * matching `selector` (a PromQL series selector) with
    * `startMs <= t <= endMs`, immediately and durably.
    *
    * Parquet is immutable, so deletion is a REWRITE of each intersecting
    * day's live file set with the matching rows filtered out — published
    * through the same MVCC manifest flip compaction uses, so concurrent
    * readers see the old complete set or the new complete set, never a
    * torn mix, and in-flight plans keep their files until the grace
    * window passes (this replaces the TSDB tombstone+compact dance: the
    * tombstone phase is unnecessary when the rewrite itself is
    * atomic-visible). Days with no matching rows are left untouched
    * (one scan decides), so the rewrite cost scales with the data that
    * actually changes — at 100 TB a one-series GDPR delete rewrites the
    * touched days only, each day in parallel like [[compact]].
    *
    * The `_dict` sidecar intentionally keeps the series entry: the dict
    * is documented as a SUPERSET of the data's series (crash rule in
    * [[append]]), and a sample-range delete cannot know whether other
    * days still hold the series. [[expire]]/[[compact]] fold it later.
    *
    * Returns the day-partition paths rewritten. */
  def deleteSeries(spark: SparkSession, path: String, selector: String,
                   startMs: Long = Long.MinValue, endMs: Long = Long.MaxValue,
                   graceMs: Long = 15 * 60 * 1000L): Seq[String] = {
    val vs = graft.promql.Parser.parse(selector) match {
      case v: graft.promql.VectorSelector if v.offsetMs == 0 && v.at.isEmpty => v
      case _ => throw new IllegalArgumentException(
        s"not a plain series selector: $selector")
    }
    val matchers = vs.name.map(n => graft.promql.LabelMatcher(
      "__name__", graft.promql.MatchOp.Eq, n)).toSeq ++ vs.matchers
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    def dayOf(ms: Long): java.time.LocalDate =
      java.time.Instant.ofEpochMilli(ms).atZone(java.time.ZoneOffset.UTC).toLocalDate
    val lo = if (startMs == Long.MinValue) None else Some(dayOf(startMs))
    val hi = if (endMs == Long.MaxValue) None else Some(dayOf(endMs))
    val days = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
      .filter { s =>
        val d = java.time.LocalDate.parse(s.getPath.getName.stripPrefix("date="))
        lo.forall(l => !d.isBefore(l)) && hi.forall(h => !d.isAfter(h))
      }
    // days are independent rewrite units — delete them CONCURRENTLY on a
    // bounded pool, same as [[compact]]: a wide retention/GDPR delete
    // over hundreds of days must not serialize hundreds of small Spark
    // jobs (the uniquified generation ids keep names collision-free)
    def deleteDay(day: org.apache.hadoop.fs.Path): Option[String] = retryRewrite(day) {
      val (live, liveGen) = liveDayFilesWithGen(fs, day)
      if (live.isEmpty) None
      else {
      val raw = readPointFiles(spark, live, None)
      val del = graft.engine.Compiler.matcherFilter(matchers,
        useLc = raw.columns.contains("_lc")) &&
        (if (startMs == Long.MinValue) lit(true) else col("t") >= startMs) &&
        (if (endMs == Long.MaxValue) lit(true) else col("t") <= endMs)
      if (raw.where(del).isEmpty) None
      else {
        publishRewrite(fs, day, live, System.currentTimeMillis(), liveGen, tmp =>
          raw.where(!del)
            .repartition(live.length)
            .sortWithinPartitions(col("name"), col("sig"), col("t"))
            .write.options(bloomWriteOptions)
            .mode(SaveMode.Overwrite).parquet(tmp.toString))
        Some(day.toString)
      }
      }
    }
    val done = Seq.newBuilder[String]
    if (days.length == 1) {
      deleteDay(days.head.getPath).foreach(done += _) // inline, like compact
    } else if (days.nonEmpty) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(days.length, 8))
      try {
        val futures = days.map(st => pool.submit(
          new java.util.concurrent.Callable[Option[String]] {
            def call(): Option[String] = deleteDay(st.getPath)
          }))
        val outcomes = futures.map(f =>
          try Right(f.get())
          catch {
            case e: java.util.concurrent.ExecutionException =>
              Left(Option(e.getCause).getOrElse(e))
          })
        outcomes.foreach { case Right(d) => done ++= d; case Left(_) => () }
        outcomes.collectFirst { case Left(e) => e }.foreach(throw _)
      } finally pool.shutdown()
    }
    done.result()
  }

  /** Admin snapshot — POST /api/v1/admin/tsdb/snapshot (vendored
    * web/api/v1/api.go:402,1642-1676: TSDB Snapshot into
    * `snapshots/<name>` under the data dir): materialize the CURRENT
    * manifest-visible file set as `snapshots/<name>/` — itself a plain
    * readable store (no manifests needed: the snapshot is one settled
    * generation). Hard-links when the filesystem allows (the TSDB
    * snapshot is hard-links too — O(files), zero bytes copied), byte
    * copy otherwise. Concurrent-writer safe the same way readers are:
    * the live set is a complete published generation. Returns the
    * snapshot name. */
  def snapshot(spark: SparkSession, path: String): String = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val name = s"${System.currentTimeMillis()}-${java.lang.Long.toUnsignedString(System.nanoTime(), 36)}"
    // the Prometheus admin-API contract places snapshots at
    // <data-dir>/snapshots/<name> (vendored api.go:1642-1676); readers
    // never touch it — every store path lists `date=` dirs explicitly
    val snapRoot = new org.apache.hadoop.fs.Path(root, s"snapshots/$name")
    val dirs = fs.listStatus(root).toSeq.filter(s => s.isDirectory &&
      (s.getPath.getName.startsWith("date=") || s.getPath.getName == DictDir))
    for (d <- dirs) {
      val out = new org.apache.hadoop.fs.Path(snapRoot, d.getPath.getName)
      fs.mkdirs(out)
      // the newest manifest rides along so the snapshot's `compacted-`
      // files stay visible under the same liveDayFiles rules (its
      // -listed dead names simply don't exist in the snapshot)
      // the chain-resolved tip rides along; its parent won't exist in the
      // snapshot, which [[resolveTip]] treats as a root — still the tip
      val manifest = resolveTip(listManifests(fs, d.getPath))
        .map(e => new org.apache.hadoop.fs.Path(d.getPath, e.name))
      for (f <- liveDayFiles(fs, d.getPath).map(new org.apache.hadoop.fs.Path(_)) ++ manifest) {
        val dst = new org.apache.hadoop.fs.Path(out, f.getName)
        val linked =
          try {
            java.nio.file.Files.createLink(
              java.nio.file.Paths.get(dst.toUri.getPath),
              java.nio.file.Paths.get(f.toUri.getPath))
            true
          } catch { case _: Throwable => false }
        if (!linked)
          org.apache.hadoop.fs.FileUtil.copy(fs, f, fs, dst, false,
            spark.sparkContext.hadoopConfiguration)
      }
    }
    name
  }

  /** Retention: drop whole day partitions older than the cutoff —
    * the reference deletes whole 24 h shards, never individual rows.
    * The series-dictionary sidecar is pruned with the data: entries whose
    * `lastDay` (newest day the series was written) predates the cutoff can
    * only reference expired partitions, so the dict keeps scaling with
    * LIVE series, not all-time series churn. The rewrite is dict-sized and
    * published with the same MVCC manifest flip compaction uses. */
  def expire(spark: SparkSession, path: String, cutoffMs: Long): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val cutoff = java.time.Instant.ofEpochMilli(cutoffMs)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val dropped = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith("date=") &&
          java.time.LocalDate.parse(p.getName.stripPrefix("date=")).isBefore(cutoff)
      }
    dropped.foreach(p => fs.delete(p, true))
    expiredShardsTotal.add(dropped.length.toLong)
    val dictPath = new org.apache.hadoop.fs.Path(root, DictDir)
    if (dropped.nonEmpty && fs.exists(dictPath)) retryRewrite(dictPath) {
      val (live, liveGen) = liveDayFilesWithGen(fs, dictPath)
      if (live.nonEmpty) {
        val dict = spark.read.parquet(live: _*)
        if (dict.columns.contains("lastDay")) {
          publishRewrite(fs, dictPath, live, System.currentTimeMillis(), liveGen, tmp =>
            dedupDict(dict)
              .where(col("lastDay") >= lit(cutoff.toString).cast("date"))
              .coalesce(1)
              .write.mode(SaveMode.Overwrite).parquet(tmp.toString))
        }
      }
    }
    dropped.map(_.toString)
  }
}
