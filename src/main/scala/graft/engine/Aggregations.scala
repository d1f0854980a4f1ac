package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Points
import graft.promql._

/** PromQL aggregation operators (`sum`, `avg`, ... `by`/`without`) as a
  * single hash aggregation per step — Catalyst gives partial+final (map-side
  * combine) for free, so the shuffle carries only per-(group, step) partials
  * at scale (reference implementation: single-threaded streamed hash agg,
  * vendor/.../promql/engine.go:2528-2875).
  */
object Aggregations {

  def eval(ae: AggregateExpr, ctx: EvalContext): VectorVal = {
    val v = Compiler.evalVector(ae.expr, ctx)
    ae.op match {
      case "topk" | "bottomk" => topBottomK(ae, v, ctx)
      case "count_values" => countValues(ae, v, ctx)
      case "quantile" => quantileAgg(ae, v, ctx)
      case "sum" => simple(ae, v, sum(col("value")))
      case "avg" =>
        // two-pass mean (sum of value/n) — overflow-safe like the reference's
        // incremental mean (engine.go:2673-2715): avg of huge finite values
        // must not round-trip through an infinite sum
        val grouped = regroup(v.df, ae)
          .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("sig"), col("step"))))
        finish(grouped.groupBy(col("sig"), col("step"))
          .agg(sum(col("value") / col("_n")).as("value"), first(col("labels")).as("labels")))
      case "count" => simple(ae, v, count(lit(1)).cast("double"))
      case "group" => simple(ae, v, first(lit(1.0)))
      // NaN is "largest" in Spark orderings: exclude from min/max unless the
      // whole group is NaN (engine.go:2719-2728 NaN-aware min/max)
      case "min" =>
        simple(ae, v, coalesce(min(when(isnan(col("value")), lit(null)).otherwise(col("value"))),
          lit(Double.NaN)))
      case "max" =>
        simple(ae, v, coalesce(max(when(isnan(col("value")), lit(null)).otherwise(col("value"))),
          lit(Double.NaN)))
      case "stddev" => simple(ae, v, stddev_pop(col("value")))
      case "stdvar" => simple(ae, v, var_pop(col("value")))
      case other => throw new IllegalArgumentException(s"unknown aggregator $other")
    }
  }

  /** Grouped labels column for by/without (`without` also drops __name__ —
    * name is a separate column here, dropped for every aggregation). */
  private def groupedLabels(ae: AggregateExpr): Column =
    if (ae.without) Labels.drop(col("labels"), ae.grouping)
    else Labels.keep(col("labels"), ae.grouping)

  private def regroup(df: DataFrame, ae: AggregateExpr): DataFrame =
    df.withColumn("labels", groupedLabels(ae))
      .withColumn("sig", Points.sigOf(col("labels")))

  private def finish(aggregated: DataFrame): VectorVal =
    VectorVal(aggregated.select(
      col("sig"), lit(null).cast("string").as("name"), col("labels"),
      col("step"), col("step").as("t"), col("value")))

  private def simple(ae: AggregateExpr, v: VectorVal, aggCol: Column): VectorVal =
    finish(regroup(v.df, ae)
      .groupBy(col("sig"), col("step"))
      .agg(aggCol.as("value"), first(col("labels")).as("labels")))

  /** Attach a per-step scalar parameter column `_p` (constant-folded when
    * the parameter is a literal expression). */
  private def withParam(df: DataFrame, param: Value): DataFrame = param match {
    case ScalarVal(_, Some(c)) => df.withColumn("_p", lit(c))
    case ScalarVal(sdf, None) =>
      df.join(broadcast(sdf.withColumnRenamed("value", "_p")), "step")
    case other => throw new IllegalArgumentException(
      s"aggregator parameter must be a scalar, got ${other.getClass.getSimpleName}")
  }

  private def quantileAgg(ae: AggregateExpr, v: VectorVal, ctx: EvalContext): VectorVal = {
    val p = Compiler.eval(ae.param.get, ctx)
    finish(withParam(regroup(v.df, ae), p)
      .groupBy(col("sig"), col("step"))
      .agg(Kernels.goQuantileUdf(collect_list(col("value")), first(col("_p"))).as("value"),
        first(col("labels")).as("labels")))
  }

  /** topk/bottomk keep the ORIGINAL series labels; NaN sorts away from both
    * the top and the bottom (engine.go:2740-2777). Output ordered by rank
    * per group (the API layer surfaces this ordering). */
  private def topBottomK(ae: AggregateExpr, v: VectorVal, ctx: EvalContext): VectorVal = {
    val p = Compiler.eval(ae.param.get, ctx)
    val gsig = if (ae.without) Points.sigOf(Labels.drop(col("labels"), ae.grouping))
               else Points.sigOf(Labels.keep(col("labels"), ae.grouping))
    // tie-break on (name, canonical labels): deterministic AND reproducible
    // by an external oracle (a hash tiebreak would not be)
    val tieBreak = Seq(col("name").asc_nulls_first, Points.canonical(col("labels")).asc)
    val ordered =
      if (ae.op == "topk") Seq(isnan(col("value")).asc, col("value").desc) ++ tieBreak
      else Seq(isnan(col("value")).asc, col("value").asc) ++ tieBreak
    val w = Window.partitionBy(col("_gsig"), col("step")).orderBy(ordered: _*)
    val kCol = when(isnan(col("_p")), lit(0L)).otherwise(col("_p").cast("long"))
    val out = withParam(v.df, p)
      .withColumn("_gsig", gsig)
      .withColumn("_rank", row_number().over(w))
      .where(col("_rank") <= kCol)
      .orderBy(col("step"), col("_gsig"), col("_rank"))
      .drop("_gsig", "_rank", "_p")
    VectorVal(out)
  }

  /** count_values("lbl", v): count of series per distinct sample value; the
    * value is stringified into a new label (engine.go:2605-2630). Integral
    * values format without a decimal point, matching Go's shortest-form
    * float formatting. */
  private def countValues(ae: AggregateExpr, v: VectorVal, ctx: EvalContext): VectorVal = {
    val lbl = Compiler.constString(Compiler.eval(ae.param.get, ctx), "count_values label")
    val valueStr = when(
      col("value") === col("value").cast("long").cast("double"),
      col("value").cast("long").cast("string")
    ).otherwise(col("value").cast("string"))
    finish(regroup(v.df, ae)
      .withColumn("labels", Labels.set(col("labels"), lbl, valueStr))
      .withColumn("sig", Points.sigOf(col("labels")))
      .groupBy(col("sig"), col("step"))
      .agg(count(lit(1)).cast("double").as("value"), first(col("labels")).as("labels")))
  }
}
