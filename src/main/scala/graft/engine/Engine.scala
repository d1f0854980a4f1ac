package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.promql.Parser

/** Public query API: PromQL text + points relation + time bounds →
  * DataFrame. Mirrors the reference's two query entry points
  * (GET /api/v1/query and /api/v1/query_range, SURVEY §3.1-3.2) minus the
  * HTTP layer: an instant query is a single-step range query.
  *
  * Output schema: name STRING, labels MAP<STRING,STRING>, t LONG (epoch ms
  * of the evaluation step), value DOUBLE. Scalar results return (t, value).
  */
object Engine {

  def rangeQuery(
      spark: SparkSession,
      points: DataFrame,
      promql: String,
      startMs: Long,
      endMs: Long,
      stepMs: Long,
      lookbackMs: Long = 300000L,
      defaultSubqueryStepMs: Long = 60000L,
      strictCollision: Boolean = false): DataFrame = {
    val ctx = EvalContext(spark, points, StepGrid(startMs, endMs, stepMs),
      lookbackMs, defaultSubqueryStepMs)
    val ast = Parser.parse(promql)
    Compiler.eval(ast, ctx) match {
      case VectorVal(df0) =>
        // the collision guard's window shuffle destroys presentation order —
        // reapply the root operator's ordering afterwards
        val df1 = if (strictCollision) collisionGuard(df0) else df0
        val df = presentationOrder(ast) match {
          case Some(ord) => df1.orderBy(ord: _*)
          case None => df1
        }
        df.select(col("name"), col("labels"), col("step").as("t"), col("value"))
      case ScalarVal(df, _) => df.select(col("step").as("t"), col("value"))
      case MatrixVal(df, _, _, _) =>
        // a bare range selector (e.g. `m[5m]` as the whole query): all
        // window samples, tagged with both step and sample time; the labels
        // map is rebuilt from the canonical string the matrix carries
        df.select(col("name"), Labels.fromCanonical(col("_lc")).as("labels"),
          col("step"), col("t"), col("value"))
      case StringVal(s) =>
        spark.range(1).select(lit(startMs).as("t"), lit(s).as("value"))
    }
  }

  def instantQuery(
      spark: SparkSession,
      points: DataFrame,
      promql: String,
      tsMs: Long,
      lookbackMs: Long = 300000L,
      defaultSubqueryStepMs: Long = 60000L,
      strictCollision: Boolean = false): DataFrame =
    rangeQuery(spark, points, promql, tsMs, tsMs, 1000L, lookbackMs,
      defaultSubqueryStepMs, strictCollision)

  /** Row ordering the API surfaces for order-sensitive root operators
    * (sort/sort_desc by value; topk descending / bottomk ascending per
    * step, NaN sorted away from the extremes in all cases). */
  private def presentationOrder(ast: graft.promql.Expr)
      : Option[Seq[org.apache.spark.sql.Column]] = {
    import graft.promql._
    ast match {
      case ParenExpr(e) => presentationOrder(e)
      case Call("sort", _) =>
        Some(Seq(col("step"), isnan(col("value")).asc, col("value").asc))
      case Call("sort_desc", _) =>
        Some(Seq(col("step"), isnan(col("value")).asc, col("value").desc))
      case AggregateExpr("topk", _, _, _, _) =>
        Some(Seq(col("step"), isnan(col("value")).asc, col("value").desc))
      case AggregateExpr("bottomk", _, _, _, _) =>
        Some(Seq(col("step"), isnan(col("value")).asc, col("value").asc))
      case _ => None
    }
  }

  /** PromQL instant vectors must not contain two samples with the same
    * labelset ("vector cannot contain metrics with the same labelset").
    * Opt-in (used by the golden-corpus runner): the window count adds a
    * shuffle, so the production path skips it. */
  private def collisionGuard(df: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.model.Points.sigOf(col("name"), col("labels")), col("step"))
    df.withColumn("_cnt", count(lit(1)).over(w))
      .withColumn("value",
        when(col("_cnt") > 1,
          raise_error(lit("vector cannot contain metrics with the same labelset")).cast("double"))
          .otherwise(col("value")))
      .drop("_cnt")
  }
}
