package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Points

/** Column-level operations on the labels MAP column. All are pure Spark
  * builtin higher-order functions — no UDFs, fully codegen'd. */
object Labels {

  /** Keep only the listed keys (aggregation `by`, matching `on`). */
  def keep(labels: Column, keys: Seq[String]): Column =
    if (keys.isEmpty) map_filter(labels, (_, _) => lit(false))
    else map_filter(labels, (k, _) => k.isInCollection(keys))

  /** Drop the listed keys (aggregation `without`, matching `ignoring`). */
  def drop(labels: Column, keys: Seq[String]): Column =
    if (keys.isEmpty) labels
    else map_filter(labels, (k, _) => !k.isInCollection(keys))

  /** Value of a label, "" when absent (PromQL's missing-label semantics). */
  def get(labels: Column, key: String): Column =
    coalesce(element_at(labels, key), lit(""))

  /** Set `key` to `value`; an empty value removes the label instead
    * (reference: label_replace/label_join empty-value deletion,
    * vendor/.../promql/functions.go:1248-1255). */
  def set(labels: Column, key: String, value: Column): Column = {
    val others = filter(map_entries(labels), e => e.getField("key") =!= key)
    val entry = array(struct(lit(key).as("key"), value.as("value")))
    map_from_entries(
      when(coalesce(value, lit("")) === "", others)
        .otherwise(concat(others, entry)))
  }

  /** Rebuild a labels map from its canonical string (exact inverse of
    * [[Points.canonical]]; label text must not contain the \u0001/\u0002
    * separators — guaranteed for sanitized ingest). */
  def fromCanonical(c: Column): Column =
    when(c === "", map().cast("map<string,string>"))
      .otherwise(str_to_map(c, lit("\u0001"), lit("\u0002")))

  /** Recompute the series signature after a label/name change. */
  def resig(df: DataFrame): DataFrame =
    df.withColumn("sig", Points.sigOf(col("name"), col("labels")))

  /** Drop the metric name (the reference's dropMetricName after
    * value-transforming ops) and refresh sig. */
  def dropName(df: DataFrame): DataFrame =
    resig(df.withColumn("name", lit(null).cast("string")))
}
