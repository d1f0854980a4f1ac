package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Canonical labeled-sample relation — the engine's universal shape.
  *
  * Mirrors the reference's ingest unit `Point{Name, Timestamp, Value, Labels}`
  * (reference: src/pkg/rpc/rpc.go:3-8) re-expressed relationally:
  *
  * {{{
  *   sig    LONG                 -- stable hash of (name, labels): series identity
  *   name   STRING               -- metric name (the reserved __name__ label)
  *   labels MAP<STRING,STRING>   -- full label set, metric name excluded
  *   t      LONG                 -- sample timestamp, epoch milliseconds
  *   value  DOUBLE               -- float64 sample
  * }}}
  *
  * Every PromQL operator in `graft.engine` consumes and produces DataFrames of
  * this shape (instant vectors carry one row per (series, step); range data
  * carries all samples per (series, step) before a range kernel folds them).
  *
  * Spark cannot group by a MapType column, so series identity is the 64-bit
  * `sig` hash over the canonicalized (sorted) label entries; the labels map
  * rides along and is recovered per group with `first(labels)`.
  */
object Points {
  /** Millisecond lookback horizon for instant selectors — reference default
    * 5m (reference: src/internal/metric-store/metric_store.go:301). */
  val DefaultLookbackMs: Long = 5 * 60 * 1000L

  /** Canonical string of a labels map: entries sorted by key, joined with
    * \\u0001 / \\u0002 separators (cannot appear in sanitized label text).
    * A native codegen expression — the equivalent HOF formulation is a
    * CodegenFallback that would poison whole-stage codegen for every
    * operator above it (see [[graft.engine.CanonicalLabels]]). */
  def canonical(labels: Column): Column =
    graft.engine.CanonicalLabels.column(labels)

  /** Series signature over labels only (vector-matching joins use this with
    * restricted label subsets). */
  def sigOf(labels: Column): Column = xxhash64(canonical(labels))

  /** Series signature over name + labels (full series identity). */
  def sigOf(name: Column, labels: Column): Column =
    xxhash64(name, canonical(labels))

  /** Attach/refresh the `sig` column from current name + labels. */
  def withSig(df: DataFrame): DataFrame =
    df.withColumn("sig", sigOf(col("name"), col("labels")))

  /** Attach the PRECOMPUTED canonical label string `_lc` (no-op when
    * already present). Computing the canonical once at ingest and
    * persisting it turns every query's per-row map-decode + sort + string
    * build into a column read — the relational analog of the reference's
    * TSM engine storing the series key once. In parquet the column
    * dictionary-encodes (one entry per series per row group), so the
    * storage cost is ~an 8-byte code per row. */
  def withCanonical(df: DataFrame): DataFrame =
    if (df.columns.contains("_lc")) df
    else df.withColumn("_lc", canonical(col("labels")))

  /** Epoch-nanosecond view of the testdata `ts` column across every type
    * the parquet reader may surface for it: LongType nanoseconds
    * (TIMESTAMP(NANOS) with `spark.sql.legacy.parquet.nanosAsLong=true`),
    * TimestampType microseconds, and TimestampNTZType (Spark 4 infers NTZ
    * for timezone-less parquet timestamps by default). The NTZ wall-clock
    * is interpreted in the session timezone; every graft entry point pins
    * `spark.sql.session.timeZone=UTC`, so the cast is exact. Integer
    * arithmetic only — epoch nanos exceed 2^53 and would lose precision
    * through a double division. */
  def eventTsNanos(events: DataFrame): Column = events.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => expr("ts")
    case org.apache.spark.sql.types.TimestampNTZType =>
      expr("unix_micros(cast(ts as timestamp)) * 1000")
    case _ => expr("unix_micros(ts) * 1000")
  }

  /** Epoch-millisecond view of the testdata `ts` column (same dispatch as
    * [[eventTsNanos]]). */
  def eventTsMillis(events: DataFrame): Column = events.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
    case org.apache.spark.sql.types.TimestampNTZType =>
      expr("unix_micros(cast(ts as timestamp)) div 1000")
    case _ => expr("unix_micros(ts) div 1000")
  }

  /** The driver testdata `events` table viewed as metric points:
    * name = event_type, labels = {user: user_id}, t = epoch ms, value. */
  def fromEvents(events: DataFrame): DataFrame = {
    val tMs = eventTsMillis(events)
    withSig(
      events.select(
        col("event_type").as("name"),
        map(
          lit("user"), col("user_id").cast("string"),
          lit("par"), pmod(col("user_id"), lit(3)).cast("string")).as("labels"),
        tMs.as("t"),
        col("value").as("value")))
  }

  /** Load the points view of `events` for a testdata scale-factor dir. */
  def eventsPoints(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame =
    fromEvents(spark.read.parquet(s"$sfDir/events.parquet"))
}
