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

  /** Rebuild a labels map from its canonical string — the exact inverse of
    * [[Points.canonical]] for ARBITRARY label text (the codec escapes its
    * own separators, so a label value containing \u0001/\u0002 round-trips
    * instead of corrupting series identity). Native expression: stays
    * inside whole-stage codegen like the builder. */
  def fromCanonical(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      CanonicalToMap(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

  /** Recompute the series signature after a label/name change. */
  def resig(df: DataFrame): DataFrame =
    df.withColumn("sig", Points.sigOf(col("name"), col("labels")))

  /** Drop the metric name (the reference's dropMetricName after
    * value-transforming ops) and refresh sig. */
  def dropName(df: DataFrame): DataFrame =
    resig(df.withColumn("name", lit(null).cast("string")))
}
