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
    * the series key once per series for the same reason. */
  def append(points: DataFrame, path: String): Unit =
    graft.model.Points.withCanonical(points)
      .withColumn("date", to_date(timestamp_millis(col("t"))))
      .sortWithinPartitions(col("date"), col("name"), col("sig"), col("t"))
      .write
      .partitionBy("date")
      .mode(SaveMode.Append)
      .parquet(path)

  /** Read back, pruning day partitions to [startMs-slackMs, endMs]. The
    * slack covers lookback/range windows that reach before the grid start.
    * `Long.MinValue`/`Long.MaxValue` bounds mean "unbounded" on that side
    * (no date predicate — `timestamp_millis` of the sentinels would
    * overflow the timestamp range). */
  def read(spark: SparkSession, path: String,
           startMs: Long, endMs: Long, slackMs: Long = 0L): DataFrame = {
    val conds = Seq(
      if (startMs == Long.MinValue) None
      else Some(col("date") >= to_date(timestamp_millis(lit(startMs - slackMs)))),
      if (endMs == Long.MaxValue) None
      else Some(col("date") <= to_date(timestamp_millis(lit(endMs))))
    ).flatten
    conds.foldLeft(spark.read.parquet(path))(_.where(_)).drop("date")
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
    val base = spark.read.parquet(path)
      .where(col("date") >= to_date(timestamp_millis(lit(startMs - slackMs))) &&
        col("date") <= to_date(timestamp_millis(lit(endMs))))
    val filtered = hotFilters.foldLeft(base) { case (df, (k, v)) =>
      df.where(col(s"lbl_$k") === v)
    }
    filtered.drop("date").drop(filtered.columns.filter(_.startsWith("lbl_")): _*)
  }

  /** Compact one or all day partitions: streaming `foreachBatch` appends
    * leave one small file per micro-batch per day — at fleet scale the
    * small-file count, not data volume, becomes the scan bottleneck (every
    * file costs a task + footer read). Compaction rewrites a day's files
    * into ~`targetBytes` outputs re-clustered by (name, sig, t) — the
    * reference's TSM compaction merges write-order segments into
    * series-ordered files for the same reason (persistence/store.go).
    *
    * The rewrite stages into a DOT-PREFIXED temp dir (hidden from Spark's
    * file index and partition discovery, so racing readers never see
    * half-written files or a bogus partition value) and swaps with two
    * metadata renames: old -> .trash, new -> live, then delete trash. The
    * visibility gap is the latency of two renames — the closest a
    * rename-based filesystem gets to the reference's atomic shard
    * replacement; a crash inside the gap leaves the day recoverable in
    * `.compact-trash`. Returns the compacted partition paths. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024,
              onlyDay: Option[String] = None): Seq[String] = {
    // derive the FS from the store path, not the default FS — a store on
    // s3a:// with defaultFS=hdfs would otherwise rename on the wrong FS
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val days = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
      .filter(s => onlyDay.forall(d => s.getPath.getName == s"date=$d"))
    val done = Seq.newBuilder[String]
    days.foreach { st =>
      val dayPath = st.getPath
      val files = fs.listStatus(dayPath).filter(f => f.isFile &&
        !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
      if (files.length > 1) {
        val totalBytes = files.map(_.getLen).sum
        val nOut = math.max(1, (totalBytes / targetBytes).toInt)
        // dot-prefixed staging/trash dirs are invisible to Spark's file
        // index AND to partition-value inference (a `date=X.compacting`
        // sibling would corrupt the inferred partition column type)
        val tmp = new org.apache.hadoop.fs.Path(
          dayPath.getParent, ".compact-tmp-" + dayPath.getName)
        val trash = new org.apache.hadoop.fs.Path(
          dayPath.getParent, ".compact-trash-" + dayPath.getName)
        fs.delete(tmp, true)
        fs.delete(trash, true)
        spark.read.parquet(dayPath.toString)
          .repartition(nOut)
          .sortWithinPartitions(col("name"), col("sig"), col("t"))
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        fs.rename(dayPath, trash)
        fs.rename(tmp, dayPath)
        fs.delete(trash, true)
        done += dayPath.toString
      }
    }
    done.result()
  }

  /** Retention: drop whole day partitions older than the cutoff —
    * the reference deletes whole 24 h shards, never individual rows. */
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
    dropped.map(_.toString)
  }
}
