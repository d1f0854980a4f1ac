package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Points

/** Envelope → point conversion, the ingest-side transform of the
  * reference's Loggregator nozzle (reference: src/internal/nozzle/
  * nozzle.go:317-400) re-expressed as pure column operations, so the same
  * code serves `readStream` (micro-batch) and batch backfills.
  *
  * Envelope relation (FIXTURES §3):
  *   source_id STRING, timestamp LONG (ns), tags MAP<STRING,STRING>,
  *   kind STRING ('gauge'|'counter'|'timer'),
  *   gauge MAP<STRING,DOUBLE>  -- gauge: name -> value
  *   name STRING, total DOUBLE -- counter
  *   start LONG, stop LONG     -- timer (ns)
  */
object Nozzle {

  /** Metric-name sanitization [A-Za-z_:][A-Za-z0-9_:]* (reference:
    * transform/point_translator.go:51-70): every illegal char → '_'. */
  def sanitizeName(c: Column): Column = {
    val tail = regexp_replace(c, "[^A-Za-z0-9_:]", "_")
    val headOk = substring(c, 1, 1).rlike("[A-Za-z_:]")
    when(c.isNull || length(c) === 0, lit("_"))
      .when(headOk, tail)
      .otherwise(concat(lit("_"), substring(tail, 2, 1000000)))
  }

  /** Label-name sanitization [A-Za-z_][A-Za-z0-9_]*; label values are
    * truncated to 256 chars (reference: appender.go:44,126-138). */
  def sanitizeLabels(labels: Column): Column =
    map_from_entries(transform(map_entries(labels), e => struct(
      {
        val k = e.getField("key")
        val tail = regexp_replace(k, "[^A-Za-z0-9_]", "_")
        when(substring(k, 1, 1).rlike("[A-Za-z_]"), tail)
          .otherwise(concat(lit("_"), substring(tail, 2, 1000000))).as("key")
      },
      substring(e.getField("value"), 1, 256).as("value"))))

  /** NaN/±Inf are rejected at ingest (point_translator.go:95-97). */
  private def finiteValue(v: Column): Column =
    !isnan(v) && v =!= Double.PositiveInfinity && v =!= Double.NegativeInfinity

  /** gauge envelope → one point per gauge metric; counter → one point with
    * the cumulative total. Timers are NOT stored directly — they feed the
    * windowed rollups (Rollups.scala). */
  def toPoints(envelopes: DataFrame): DataFrame = {
    val base = envelopes.withColumn("labels0",
      map_concat(coalesce(col("tags"), map().cast("map<string,string>")),
        map(lit("source_id"), col("source_id"))))
    val gauges = base.where(col("kind") === "gauge")
      .select(col("timestamp"), col("labels0"), explode(col("gauge")).as(Seq("name", "value")))
    val counters = base.where(col("kind") === "counter")
      .select(col("timestamp"), col("labels0"), col("name"), col("total").as("value"))
    val all = gauges.unionByName(counters)
      .where(finiteValue(col("value")))
      .select(
        sanitizeName(col("name")).as("name"),
        sanitizeLabels(col("labels0")).as("labels"),
        // integer division: `/` would round-trip through double, which
        // cannot represent epoch-ns exactly (2^63-scale > 2^53)
        expr("timestamp div 1000000").as("t"), // ns -> ms
        col("value"))
    Points.withSig(all)
  }
}
