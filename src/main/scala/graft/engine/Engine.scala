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
      sampleTally: Option[org.apache.spark.util.LongAccumulator] = None,
      seriesDict: Option[DataFrame] = None): DataFrame = {
    val ctx = EvalContext(spark, points, StepGrid(startMs, endMs, stepMs),
      lookbackMs, defaultSubqueryStepMs, sampleTally = sampleTally,
      strictCollision = strictCollision, seriesDict = seriesDict)
    val ast = Parser.parse(promql)
    Compiler.eval(ast, ctx) match {
      case vv: VectorVal =>
        // collision checks run at each producing materialization inside the
        // compile ([[Collision]]); the root result is already proven clean
        val df1 = vv.df
        val df = presentationOrder(ast) match {
          case Some(ord) => df1.orderBy(ord: _*)
          case None => df1
        }
        df.select(col("name"), col("labels"), col("step").as("t"), col("value"))
      case ScalarVal(df, _) => df.select(col("step").as("t"), col("value"))
      case m: MatrixVal =>
        // a bare range selector (e.g. `m[5m]` as the whole query): all
        // window samples, tagged with both step and sample time; the labels
        // map is rebuilt from the canonical string the matrix carries (or
        // joined back from the series dictionary on the slim path)
        val df = m.dict match {
          case Some(d) => m.df.join(d.select(col("sig"), col("name"), col("_lc")), Seq("sig"))
          case None => m.df
        }
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
      sampleTally: Option[org.apache.spark.util.LongAccumulator] = None,
      seriesDict: Option[DataFrame] = None): DataFrame =
    rangeQuery(spark, points, promql, tsMs, tsMs, 1000L, lookbackMs,
      defaultSubqueryStepMs, strictCollision, sampleTally, seriesDict)

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

  /** Does evaluating `e` pay a collision guard ANYWHERE in its tree —
    * i.e. is some node a collision producer (guarded at its own
    * materialization, [[producesCollision]]) or a label-rewriting call
    * (whose guard is fused into the function's re-key)? Structurally
    * collision-free shapes — a selector keyed by (name, labels), an
    * aggregation keyed by its grouping, a one-to-one binop behind its
    * duplicate-match guards — answer false and carry zero extra Exchange:
    * the Spark answer to the reference's unconditional per-materialization
    * runtime check (engine.go:1930-1934) is to prove it away at plan time
    * and pay the shuffle only where it buys correctness. */
  private[engine] def mayCollide(e: graft.promql.Expr): Boolean = {
    import graft.promql._
    e match {
      case Call("label_replace" | "label_join", _) => true // fused guard
      case c @ Call(_, args) => producesCollision(c) || args.exists(mayCollide)
      case u @ UnaryExpr(_, x) => producesCollision(u) || mayCollide(x)
      case b @ BinaryExpr(_, l, r, _, _) =>
        producesCollision(b) || mayCollide(l) || mayCollide(r)
      case AggregateExpr(_, x, p, _, _) => mayCollide(x) || p.exists(mayCollide)
      case SubqueryExpr(x, _, _, _, _) => mayCollide(x)
      case MatrixSelector(_, _) => false
      case ParenExpr(x) => mayCollide(x)
      case _ => false
    }
  }

  /** Can THIS node's own operation turn a collision-free input into a
    * vector holding two samples with one labelset? Only two shapes can:
    * a name-dropping transform over an input that may carry multiple
    * metric names for one labelset (a selector without a literal name
    * flowing through value math, a rate/over_time kernel, a unary, or a
    * vector⋈scalar arithmetic), and a label rewrite
    * (label_replace/label_join — guarded inside the function itself, so
    * excluded here). The compiler wraps exactly these nodes' outputs with
    * [[Collision.guard]] — the reference's per-materialization error
    * surfaces at the same expression depth. */
  private[engine] def producesCollision(e: graft.promql.Expr): Boolean = {
    import graft.promql._
    e match {
      // fused into the function's own re-key (Functions.labelReplace/join)
      case Call("label_replace" | "label_join", _) => false
      // name-preserving, constructed-label, grouped-without-name, or
      // statically-empty outputs cannot produce a collision
      case Call("sort" | "sort_desc" | "last_over_time" | "absent" |
                "absent_over_time" | "vector" | "time" | "pi" | "scalar" |
                "histogram_quantile" | "histogram_count" | "histogram_sum" |
                "histogram_fraction" | "histogram_stddev" | "histogram_stdvar" |
                "histogram_avg", _) => false
      case Call(_, args) => args.exists(multiName)
      case UnaryExpr(_, x) => multiName(x)
      case BinaryExpr(op, l, r, _, _) if !Set("and", "or", "unless").contains(op) =>
        multiName(l) || multiName(r)
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

}
