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
      strictCollision: Boolean = true,
      sampleTally: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val ctx = EvalContext(spark, points, StepGrid(startMs, endMs, stepMs),
      lookbackMs, defaultSubqueryStepMs, sampleTally = sampleTally)
    val ast = Parser.parse(promql)
    Compiler.eval(ast, ctx) match {
      case VectorVal(df0) =>
        // the collision guard re-aggregates, destroying presentation order —
        // reapply the root operator's ordering afterwards
        val df1 = if (strictCollision && mayCollide(ast)) collisionGuard(df0) else df0
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
      strictCollision: Boolean = true,
      sampleTally: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame =
    rangeQuery(spark, points, promql, tsMs, tsMs, 1000L, lookbackMs,
      defaultSubqueryStepMs, strictCollision, sampleTally)

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

  /** Static collision analysis: most PromQL shapes CANNOT produce two
    * samples with the same labelset — a selector keyed by (name, labels),
    * an aggregation keyed by its grouping, a one-to-one binop behind its
    * duplicate-match guards — so the runtime check (reference: errors
    * unconditionally at vector materialization, engine.go:1930-1934) is
    * pure overhead for them. The guard runs only when the plan can
    * actually collide: a label-rewriting call (label_replace/label_join),
    * or a name-dropping transform / unary / vector arithmetic over an
    * input that may carry multiple metric names for one labelset (a
    * selector without a literal name). This is the Spark answer to a
    * per-row runtime check: prove it away at plan time, pay the shuffle
    * only where it buys correctness. */
  private[engine] def mayCollide(e: graft.promql.Expr): Boolean = {
    import graft.promql._
    e match {
      case Call("label_replace" | "label_join", _) => true
      case Call(_, args) => args.exists(a => multiName(a) || mayCollide(a))
      case UnaryExpr(_, x) => multiName(x) || mayCollide(x)
      case BinaryExpr(op, l, r, _, _) if !Set("and", "or", "unless").contains(op) =>
        multiName(l) || multiName(r) || mayCollide(l) || mayCollide(r)
      case BinaryExpr(_, l, r, _, _) => mayCollide(l) || mayCollide(r)
      case AggregateExpr(_, x, p, _, _) => mayCollide(x) || p.exists(mayCollide)
      case SubqueryExpr(x, _, _, _, _) => mayCollide(x)
      case MatrixSelector(_, _) => false
      case ParenExpr(x) => mayCollide(x)
      case _ => false
    }
  }

  /** Can `e`'s result hold two rows per step whose labelsets differ only by
    * metric name (the raw material for a post-name-drop collision)? */
  private def multiName(e: graft.promql.Expr): Boolean = {
    import graft.promql._
    e match {
      case vs: VectorSelector => vs.name.isEmpty
      case MatrixSelector(vs, _) => vs.name.isEmpty
      case SubqueryExpr(x, _, _, _, _) => multiName(x)
      case ParenExpr(x) => multiName(x)
      // topk/bottomk SELECT rows (original labels incl. name) rather than
      // aggregate them — multi-name inputs pass straight through
      case AggregateExpr("topk" | "bottomk", x, _, _, _) => multiName(x)
      case AggregateExpr(_, _, _, _, _) => false // keyed by grouping, no name
      case Call("label_replace" | "label_join", _) => true // rewritten labels
      case Call(_, args) => args.exists(multiName)
      case UnaryExpr(_, x) => multiName(x)
      case BinaryExpr(_, l, r, _, _) => multiName(l) || multiName(r)
      case _ => false
    }
  }

  /** PromQL instant vectors must not contain two samples with the same
    * labelset ("vector cannot contain metrics with the same labelset" —
    * the reference errors unconditionally; [[mayCollide]] proves the check
    * away for structurally collision-free plans, so this is default-on).
    *
    * Shape: ONE hash aggregation keyed by (name, canonical labels, step).
    * In the no-collision case every group has exactly one row, so the
    * "aggregation" is a pass-through that doubles as the check; the error
    * is embedded in the value column (Catalyst cannot prune it). For a
    * bare selector the keys coincide with the selector's own aggregation
    * keys, so the existing partitioning satisfies the guard and no extra
    * Exchange appears; label-rewriting operators (label_replace/join,
    * name-dropping math) get the re-key shuffle exactly where collisions
    * can actually arise. No window, no join. */
  private def collisionGuard(df: DataFrame): DataFrame =
    df.withColumn("_gl", graft.model.Points.canonical(col("labels")))
      .groupBy(col("name"), col("_gl"), col("step"))
      .agg(count(lit(1)).as("_cnt"), first(col("t")).as("t"),
        first(col("value")).as("_v"))
      .select(col("name"), Labels.fromCanonical(col("_gl")).as("labels"),
        col("step"), col("t"),
        when(col("_cnt") > 1,
          raise_error(lit("vector cannot contain metrics with the same labelset")).cast("double"))
          .otherwise(col("_v")).as("value"))
}
