package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Points
import graft.promql._

/** The PromQL function registry (reference: the ~70-entry closed registry at
  * vendor/.../promql/functions.go:1414 and parser/functions.go:27-394).
  * Instant-vector math is pure codegen'd Column expressions; range-vector
  * aggregations are per-(series, step) hash aggregations; only the genuinely
  * sequential kernels (rate family, holt_winters, histogram_quantile) fold a
  * collected sample list (see [[Kernels]]).
  */
object Functions {

  def eval(fn: String, args: Seq[Expr], ctx: EvalContext): Value = fn match {
    // ---- rate / counter family (range vector -> instant vector) ----
    // native TypedImperativeAggregate kernels (SeriesAgg): primitive-array
    // buffers inside one ObjectHashAggregate, window end threaded per group
    case "rate" => foldKernel(args, ctx, m => SeriesAgg.Extrapolated(m.rangeMs, isCounter = true, isRate = true), useWindowEnd = true)
    case "increase" => foldKernel(args, ctx, m => SeriesAgg.Extrapolated(m.rangeMs, isCounter = true, isRate = false), useWindowEnd = true)
    case "delta" => foldKernel(args, ctx, m => SeriesAgg.Extrapolated(m.rangeMs, isCounter = false, isRate = false), useWindowEnd = true)
    case "irate" => foldKernel(args, ctx, _ => SeriesAgg.InstantValue(isRate = true))
    case "idelta" => foldKernel(args, ctx, _ => SeriesAgg.InstantValue(isRate = false))
    case "resets" => foldKernel(args, ctx, _ => SeriesAgg.Resets)
    case "changes" => foldKernel(args, ctx, _ => SeriesAgg.Changes)
    case "deriv" => foldKernel(args, ctx, _ => SeriesAgg.Deriv)
    // per-step scalar parameters, like the reference's per-step argument
    // re-evaluation (functions.go:952-964, 302-347)
    case "predict_linear" =>
      foldKernelP(args(0), args.slice(1, 2), ctx, SeriesAgg.PredictLinear)
    case "holt_winters" | "double_exponential_smoothing" =>
      foldKernelP(args(0), args.slice(1, 3), ctx, SeriesAgg.HoltWinters)

    // ---- *_over_time (range-vector aggregations, functions.go:453-710) ----
    case "sum_over_time" => overTime(args, ctx, sum(col("value")))
    case "avg_over_time" =>
      // single-pass overflow-safe incremental mean ([[AvgAgg]]), matching
      // the reference's divide-then-subtract form (functions.go:453-510)
      overTime(args, ctx, AvgAgg.column(col("value")))
    case "count_over_time" => overTime(args, ctx, count(lit(1)).cast("double"))
    case "min_over_time" =>
      overTime(args, ctx, coalesce(
        min(when(isnan(col("value")), lit(null)).otherwise(col("value"))), lit(Double.NaN)))
    case "max_over_time" =>
      overTime(args, ctx, coalesce(
        max(when(isnan(col("value")), lit(null)).otherwise(col("value"))), lit(Double.NaN)))
    case "last_over_time" =>
      // max_by over primitives is declarative with a mutable buffer:
      // stays inside the codegen'd HashAggregate
      overTime(args, ctx, max_by(col("value"), col("t")), keepName = true)
    case "stddev_over_time" => overTime(args, ctx, stddev_pop(col("value")))
    case "stdvar_over_time" => overTime(args, ctx, var_pop(col("value")))
    case "quantile_over_time" =>
      val m = evalMatrix(args(1), ctx)
      val withQ = Compiler.eval(args(0), ctx) match {
        case ScalarVal(_, Some(c)) => m.df.withColumn("_q", lit(c))
        case ScalarVal(sdf, None) =>
          m.df.join(broadcast(sdf.withColumnRenamed("value", "_q")), "step")
        case other => throw new IllegalArgumentException("quantile_over_time φ must be a scalar")
      }
      kernelVector(m, withQ.groupBy(col("sig"), col("step"))
        .agg(QuantileAgg.column(col("value"), col("_q")).as("value"),
          seriesAggCols(m): _*), keepName = false)
    case "present_over_time" => overTime(args, ctx, first(lit(1.0)))
    case "absent_over_time" =>
      val m = evalMatrix(args(0), ctx)
      absentFrom(m.df, argSelectorOf(args(0)), ctx)

    // ---- instant-vector math (drop __name__, functions.go:724-855) ----
    case "abs" => math1(args, ctx, abs)
    // Spark's ceil/floor return LONG (NaN -> 0, Inf -> Long.Max, huge
    // doubles clamp); Go's math.Ceil/Floor preserve NaN, +-Inf, and values
    // past 2^63 — which are already integral, so pass them through
    case "ceil" => math1(args, ctx, goIntegral(_, ceil))
    case "floor" => math1(args, ctx, goIntegral(_, floor))
    case "exp" => math1(args, ctx, exp)
    case "sqrt" => math1(args, ctx, v => when(v < 0, lit(Double.NaN)).otherwise(sqrt(v)))
    case "ln" => math1(args, ctx, goLog(_, log(_)))
    case "log2" => math1(args, ctx, goLog(_, log2))
    case "log10" => math1(args, ctx, goLog(_, log10))
    case "sgn" => math1(args, ctx, signum)
    case "sin" => math1(args, ctx, sin)
    case "cos" => math1(args, ctx, cos)
    case "tan" => math1(args, ctx, tan)
    case "asin" => math1(args, ctx, asin)
    case "acos" => math1(args, ctx, acos)
    case "atan" => math1(args, ctx, atan)
    case "sinh" => math1(args, ctx, sinh)
    case "cosh" => math1(args, ctx, cosh)
    case "tanh" => math1(args, ctx, tanh)
    case "asinh" => math1(args, ctx, asinh)
    case "acosh" => math1(args, ctx, v => when(v < 1, lit(Double.NaN)).otherwise(acosh(v)))
    case "atanh" => math1(args, ctx, v => when(abs(v) > 1, lit(Double.NaN)).otherwise(atanh(v)))
    case "deg" => math1(args, ctx, degrees)
    case "rad" => math1(args, ctx, radians)
    case "pi" => ScalarVal(ctx.grid.df(ctx.spark).withColumn("value", lit(math.Pi)), const = Some(math.Pi))

    case "clamp" =>
      // per-step scalar bounds: min > max or NaN bounds drop/NaN the step
      val v = Compiler.evalVector(args(0), ctx)
      val (df1, lo) = withScalarParam(v.df, Compiler.eval(args(1), ctx), "_lo")
      val (df2, hi) = withScalarParam(df1, Compiler.eval(args(2), ctx), "_hi")
      val clamped = df2
        .where(lo <= hi || isnan(lo) || isnan(hi))
        .withColumn("value",
          when(isnan(lo) || isnan(hi), lit(Double.NaN))
            .otherwise(least(greatest(col("value"), lo), hi)))
        .withColumn("t", col("step"))
        .drop("_lo", "_hi")
      VectorVal(Labels.dropName(clamped))
    case "clamp_min" =>
      val v = Compiler.evalVector(args(0), ctx)
      val (df, lo) = withScalarParam(v.df, Compiler.eval(args(1), ctx), "_lo")
      VectorVal(Labels.dropName(df
        .withColumn("value", greatest(col("value"), lo))
        .withColumn("t", col("step")).drop("_lo")))
    case "clamp_max" =>
      val v = Compiler.evalVector(args(0), ctx)
      val (df, hi) = withScalarParam(v.df, Compiler.eval(args(1), ctx), "_hi")
      VectorVal(Labels.dropName(df
        .withColumn("value", least(col("value"), hi))
        .withColumn("t", col("step")).drop("_hi")))
    case "round" =>
      // round to the nearest multiple of `to` (functions.go:410-430)
      val v = Compiler.evalVector(args(0), ctx)
      val toVal: Value =
        if (args.size > 1) Compiler.eval(args(1), ctx)
        else ScalarVal(null, const = Some(1.0))
      val (df, to) = withScalarParam(v.df, toVal, "_to")
      VectorVal(Labels.dropName(df
        .withColumn("value", floor(col("value") * (lit(1.0) / to) + 0.5) / (lit(1.0) / to))
        .withColumn("t", col("step")).drop("_to")))

    // ---- time component functions (UTC, functions.go:1325-1412) ----
    case "minute" => timeComponent(args, ctx, ts => minute(ts).cast("double"))
    case "hour" => timeComponent(args, ctx, ts => hour(ts).cast("double"))
    case "day_of_week" => timeComponent(args, ctx, ts => (dayofweek(ts) - 1).cast("double"))
    case "day_of_month" => timeComponent(args, ctx, ts => dayofmonth(ts).cast("double"))
    case "day_of_year" => timeComponent(args, ctx, ts => dayofyear(ts).cast("double"))
    case "days_in_month" => timeComponent(args, ctx, ts => dayofmonth(last_day(ts)).cast("double"))
    case "month" => timeComponent(args, ctx, ts => month(ts).cast("double"))
    case "year" => timeComponent(args, ctx, ts => year(ts).cast("double"))
    case "time" =>
      ScalarVal(ctx.grid.df(ctx.spark).withColumn("value", col("step") / 1000.0))
    case "timestamp" =>
      // value = the SAMPLE's timestamp; the result sample itself then sits
      // at the eval step (so nested timestamp() yields the step time)
      val v = Compiler.evalVector(args(0), ctx)
      VectorVal(Labels.dropName(v.df
        .withColumn("value", col("t") / 1000.0)
        .withColumn("t", col("step"))))

    // ---- histograms (conventional le-bucketed; quantile.go:74-123) ----
    case "histogram_quantile" =>
      histogramQuantile(Compiler.eval(args(0), ctx), Compiler.evalVector(args(1), ctx))
    // native-histogram functions: the store rejects native histograms
    // (persistence/appender.go:93-96) — statically empty results
    case "histogram_count" | "histogram_sum" | "histogram_fraction" |
         "histogram_stddev" | "histogram_stdvar" | "histogram_avg" =>
      VectorVal(Compiler.evalVector(args.last, ctx).df.limit(0))

    // ---- label manipulation (functions.go:1215-1323) ----
    case "label_replace" =>
      labelReplace(Compiler.evalVector(args(0), ctx),
        str(args(1), ctx, "dst"), str(args(2), ctx, "replacement"),
        str(args(3), ctx, "src"), str(args(4), ctx, "regex"), ctx)
    case "label_join" =>
      val v = Compiler.evalVector(args(0), ctx)
      val dst = str(args(1), ctx, "dst")
      val sep = str(args(2), ctx, "separator")
      val srcs = args.drop(3).map(a => str(a, ctx, "src label"))
      requireLabelName(dst)
      val joined = concat_ws(sep, srcs.map(s => Labels.get(col("labels"), s)): _*)
      VectorVal(rekeyed(
        v.df.withColumn("labels", Labels.set(col("labels"), dst, joined)), ctx))

    // ---- shape / sorting (functions.go:349-441,684-698,1270-1277) ----
    case "sort" => sorted(args, ctx, col("value").asc)
    case "sort_desc" => sorted(args, ctx, col("value").desc)
    case "scalar" =>
      val v = Compiler.evalVector(args(0), ctx)
      val per = v.df.groupBy("step")
        .agg(count(lit(1)).as("_n"), first(col("value")).as("_v"))
      val out = ctx.grid.df(ctx.spark).join(per, Seq("step"), "left")
        .select(col("step"),
          when(col("_n") === 1, col("_v")).otherwise(lit(Double.NaN)).as("value"))
      ScalarVal(out)
    case "vector" =>
      val s = Compiler.eval(args(0), ctx) match {
        case sv: ScalarVal => sv
        case other => throw new IllegalArgumentException("vector() takes a scalar")
      }
      val empty = map().cast("map<string,string>")
      VectorVal(s.df.select(
        Points.sigOf(lit(null).cast("string"), empty).as("sig"),
        lit(null).cast("string").as("name"), empty.as("labels"),
        col("step"), col("step").as("t"), col("value")))
    case "absent" =>
      val v = Compiler.evalVector(args(0), ctx)
      absentFrom(v.df, argSelectorOf(args(0)), ctx)

    case other => throw new IllegalArgumentException(s"unknown function $other")
  }

  // ---- helpers ----------------------------------------------------------

  private def str(e: Expr, ctx: EvalContext, what: String): String =
    Compiler.constString(Compiler.eval(e, ctx), what)

  /** Attach a scalar parameter as a column: literal for constants, a
    * broadcast per-step join otherwise (parameters may be arbitrary scalar
    * expressions in PromQL). */
  private def withScalarParam(df: DataFrame, p: Value, name: String): (DataFrame, Column) =
    p match {
      case ScalarVal(_, Some(c)) => (df.withColumn(name, lit(c)), col(name))
      case ScalarVal(sdf, None) =>
        (df.join(broadcast(sdf.withColumnRenamed("value", name)), "step"), col(name))
      case other => throw new IllegalArgumentException(
        s"$name must be a scalar, got ${other.getClass.getSimpleName}")
    }

  private def evalMatrix(e: Expr, ctx: EvalContext): MatrixVal =
    Compiler.eval(e, ctx) match {
      case m: MatrixVal => m
      case other => throw new IllegalArgumentException(
        s"expected range vector, got ${other.getClass.getSimpleName}")
    }

  /** groupBy(series, step) over range-selected samples with a builtin
    * aggregate — partial aggregation makes this one scan + one shuffle of
    * result-sized partials.
    *
    * The matrix carries the canonical label STRING `_lc` instead of the
    * map (see [[Selectors.range]]): the 8-byte sig is the hash key and the
    * canonical string rides as a small `first` buffer — far cheaper to
    * sort/carry than the map it replaces, and hashed per GROUP rather than
    * per row (range windows multiply input rows by window/step, so per-row
    * string hashing is the expensive axis). The labels map is rebuilt on
    * the result-sized output. */
  /** Series-identity columns for a matrix aggregation: carried as cheap
    * `first` buffers normally; EMPTY on the dictionary path, where the
    * exploded rows hold no strings and the output stays a SLIM
    * [[VectorVal]] ([[kernelVector]]). */
  private def seriesAggCols(m: MatrixVal): Seq[Column] =
    if (m.dict.isDefined) Nil
    else Seq(first(col("name")).as("name"), first(col("_lc")).as("_lc"))

  /** The series identity after the kernel's dropMetricName re-key (null
    * name, unchanged labels) — [[Labels.dropName]]'s resig evaluated on a
    * DICTIONARY row, so the slim output's sigs match what a full-path
    * restore-then-dropName would have produced. `canonical ∘ fromCanonical`
    * is the identity on every build-produced `_lc` (keys already sorted,
    * escaping bijective — [[CanonicalLabels]]; [[Selectors.instant]] hashes
    * the stored string under the same identity), so the string hashes
    * DIRECTLY: the previous parse-map-rebuild per dictionary row was a
    * fleet-scale-series no-op pass on every name-dropping kernel. */
  private def droppedNameSig: Column =
    xxhash64(lit(null).cast("string"), col("_lc"))

  /** Wrap a kernel's (sig, step, value) aggregate as a VectorVal. On the
    * dictionary path the output STAYS SLIM — no label string ever touches
    * the kernel result: when the kernel drops the metric name, the rows
    * are re-keyed through a dictionary-derived (sig → dropped-name sig)
    * mapping (a result-sized primitive join) and handed a DERIVED
    * dictionary, so downstream aggregations/binops continue string-free
    * and the labels materialize once, at the root. */
  private def kernelVector(m: MatrixVal, aggregated: DataFrame,
                           keepName: Boolean): VectorVal = m.dict match {
    case Some(d) =>
      if (keepName)
        VectorVal(aggregated.select(col("sig"), col("step"),
          col("step").as("t"), col("value")), Some(d))
      else {
        val out = aggregated
          .join(d.select(col("sig"), droppedNameSig.as("_sig2")), Seq("sig"))
          .select(col("_sig2").as("sig"), col("step"),
            col("step").as("t"), col("value"))
        // distinct: series differing only by metric name collapse to one
        // dictionary row (their restored rows are identical, as on the
        // full path where both carry null name + the same labels)
        val d2 = d.select(droppedNameSig.as("sig"),
          lit(null).cast("string").as("name"), col("_lc"))
          .dropDuplicates("sig")
        VectorVal(out, Some(d2))
      }
    case None =>
      val out = aggregated.select(col("sig"), col("name"),
        Labels.fromCanonical(col("_lc")).as("labels"),
        col("step"), col("step").as("t"), col("value"))
      if (keepName) VectorVal(out) else VectorVal(Labels.dropName(out))
  }

  private def overTime(args: Seq[Expr], ctx: EvalContext, aggCol: Column,
                       keepName: Boolean = false): VectorVal = {
    val m = evalMatrix(args(0), ctx)
    kernelVector(m, m.df.groupBy(col("sig"), col("step"))
      .agg(aggCol.as("value"), seriesAggCols(m): _*), keepName)
  }

  /** Fold a SeriesAgg kernel per (series, step); the extrapolation family
    * needs the true window end (step - offset / @-pin), the rest only the
    * samples. */
  private def foldKernel(args: Seq[Expr], ctx: EvalContext,
                         mk: MatrixVal => SeriesAgg.Kernel,
                         useWindowEnd: Boolean = false): VectorVal = {
    val m = evalMatrix(args(0), ctx)
    val end = if (useWindowEnd) m.windowEnd else col("step")
    rangeKernel(m, m.df, SeriesAgg.fold(mk(m), col("t"), col("value"), end))
  }

  /** Fold a parameterized kernel: scalar args become per-step columns
    * (constant-folded literals or a broadcast per-step join), captured
    * group-constant into the aggregation buffer — matching the reference's
    * per-step argument evaluation. */
  private def foldKernelP(vecArg: Expr, paramArgs: Seq[Expr], ctx: EvalContext,
                          kernel: SeriesAgg.Kernel): VectorVal = {
    val m = evalMatrix(vecArg, ctx)
    var df = m.df
    val pcols = paramArgs.zipWithIndex.map { case (pe, i) =>
      val (d2, c) = withScalarParam(df, Compiler.eval(pe, ctx), s"_p${i + 1}")
      df = d2
      c
    }
    val p1 = pcols.headOption.getOrElse(lit(0.0))
    val p2 = pcols.lift(1).getOrElse(lit(0.0))
    rangeKernel(m, df,
      SeriesAgg.fold(kernel, col("t"), col("value"), col("step"), p1, p2))
  }

  /** The fold kernels are TypedImperativeAggregates, so the plan is an
    * ObjectHashAggregate (hash-based, any buffer type) — carrying the
    * canonical STRING through `first` costs far less than the map value
    * it replaces; the map is rebuilt on the result-sized output.
    *
    * When the matrix carries its slim PRE-EXPLODE source (dict-path
    * selectors) and the kernel consumes the raw matrix, the input is
    * re-derived as repartition(sig) → explode: sig-partitioning satisfies
    * the (sig, step) grouping (subset clustering), so the aggregation runs
    * exchange-free and the one shuffle carries one slim row per SAMPLE —
    * not per-(series, step) fold buffers each serializing ~window/step
    * copies of its samples through the wire. */
  private def rangeKernel(m: MatrixVal, df: DataFrame, valueCol: Column): VectorVal = {
    val input = m.slim match {
      case Some(s) if df eq m.df =>
        val exploded = Selectors.explodeToSteps(s.pre.repartition(col("sig")),
          s.grid, s.windowMs, s.tally)
        val shifted =
          if (s.stepShiftMs == 0L) exploded
          else exploded.withColumn("step", col("step") + s.stepShiftMs)
        shifted.select(col("sig"), col("step"), col("t"), col("value"))
      case _ => df
    }
    kernelVector(m,
      input.groupBy(col("sig"), col("step"))
        .agg(valueCol.as("value"), seriesAggCols(m): _*)
        .where(col("value").isNotNull),
      keepName = false)
  }

  private def math1(args: Seq[Expr], ctx: EvalContext, f: Column => Column): Value =
    Compiler.eval(args.headOption.getOrElse(NumberLiteral(0)), ctx) match {
      case v: VectorVal => math1Vec(v, f)
      case ScalarVal(df, c) =>
        ScalarVal(df.withColumn("value", f(col("value"))))
      case other => throw new IllegalArgumentException(s"math function on $other")
    }

  private def math1Vec(v: VectorVal, f: Column => Column): VectorVal =
    VectorVal(Labels.dropName(v.df
      .withColumn("value", f(col("value")))
      .withColumn("t", col("step"))))

  /** Go log semantics: log(0) = -Inf, log(<0) = NaN (Spark's would be null). */
  private def goLog(v: Column, f: Column => Column): Column =
    when(isnan(v) || v < 0, lit(Double.NaN))
      .when(v === 0, lit(Double.NegativeInfinity))
      .otherwise(f(v))

  /** Go math.Ceil/Floor semantics over Spark's long-returning ceil/floor:
    * NaN, +-Inf, and |v| >= 2^63 (already integral at that magnitude) pass
    * through unchanged instead of casting through LongType. */
  private def goIntegral(v: Column, f: Column => Column): Column =
    when(isnan(v) || abs(v) >= lit(9.223372036854776e18), v)
      .otherwise(f(v).cast("double"))

  /** Time-component functions: arg defaults to vector(time()); values are
    * epoch seconds interpreted in UTC. */
  private def timeComponent(args: Seq[Expr], ctx: EvalContext,
                            f: Column => Column): Value = {
    val v: VectorVal = args.headOption match {
      case Some(e) => Compiler.evalVector(e, ctx)
      case None =>
        eval("vector", Seq(Call("time", Nil)), ctx).asInstanceOf[VectorVal]
    }
    math1Vec(v, c => f(timestamp_seconds(c)))
  }

  private def requireLabelName(n: String): Unit =
    if (!n.matches("[a-zA-Z_][a-zA-Z0-9_]*"))
      throw new IllegalArgumentException(s"invalid destination label name '$n'")

  private def labelReplace(v: VectorVal, dst: String, repl: String,
                           src: String, regex: String, ctx: EvalContext): VectorVal = {
    requireLabelName(dst)
    val anchored = "\\A(?:" + regex + ")\\z"
    val srcVal =
      if (src == "__name__") coalesce(col("name"), lit(""))
      else Labels.get(col("labels"), src)
    val matched = srcVal.rlike(anchored)
    val newVal = regexp_replace(srcVal, anchored, repl)
    val out =
      if (dst == "__name__")
        v.df.withColumn("name", when(matched, newVal).otherwise(col("name")))
      else
        v.df.withColumn("labels",
          when(matched, Labels.set(col("labels"), dst, newVal)).otherwise(col("labels")))
    VectorVal(rekeyed(out, ctx))
  }

  /** Re-key after a label rewrite. Strict mode FUSES the collision guard
    * into the re-key: [[Collision.guard]] computes the canonical string
    * once per row and derives BOTH the refreshed sig and the duplicate
    * check from it — one aggregation replaces the per-row re-sig
    * projection plus the separate root-level guard the engine used to
    * run (reference errors at this exact materialization,
    * engine.go:1930-1934). */
  private def rekeyed(df: DataFrame, ctx: EvalContext): DataFrame =
    if (ctx.strictCollision) Collision.guard(df) else Labels.resig(df)

  /** Presentation-order sort by value (instant queries; the driver compare
    * is order-insensitive but the API layer preserves this ordering). */
  private def sorted(args: Seq[Expr], ctx: EvalContext, o: Column): VectorVal = {
    val v = Compiler.evalVector(args(0), ctx)
    VectorVal(v.df.orderBy(o, col("sig").asc))
  }

  /** absent()/absent_over_time(): 1 for every grid step with NO series at
    * all; labels inferred from the argument's equality matchers
    * (functions.go:684-698). */
  private def absentFrom(present: DataFrame, sel: Option[VectorSelector],
                         ctx: EvalContext): VectorVal = {
    // only labels with exactly ONE matcher, and that one an equality, are
    // inferable; conflicting/duplicated matchers drop the label entirely
    // (functions.go createLabelsForAbsentFunction)
    val inferred: Seq[(String, String)] = sel match {
      case Some(vs) =>
        val byName = vs.matchers.filter(_.name != "__name__").groupBy(_.name)
        byName.toSeq.sortBy(_._1).collect {
          case (n, Seq(LabelMatcher(_, MatchOp.Eq, v))) => (n, v)
        }
      case None => Nil
    }
    val labelCol =
      if (inferred.isEmpty) map().cast("map<string,string>")
      else map(inferred.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val missing = ctx.grid.df(ctx.spark)
      .join(present.select("step").distinct(), Seq("step"), "left_anti")
    VectorVal(missing.select(
      Points.sigOf(lit(null).cast("string"), labelCol).as("sig"),
      lit(null).cast("string").as("name"), labelCol.as("labels"),
      col("step"), col("step").as("t"), lit(1.0).as("value")))
  }

  /** The underlying selector of a function argument, for absent()'s label
    * inference. */
  private def argSelectorOf(e: Expr): Option[VectorSelector] = e match {
    case vs: VectorSelector => Some(vs)
    case MatrixSelector(vs, _) => Some(vs)
    case ParenExpr(inner) => argSelectorOf(inner)
    case _ => None
  }

  private def histogramQuantile(qv: Value, v: VectorVal): VectorVal = {
    val leVal = Labels.get(col("labels"), "le")
    val leDouble = when(lower(leVal).isin("+inf", "inf"), lit(Double.PositiveInfinity))
      .when(lower(leVal) === "-inf", lit(Double.NegativeInfinity))
      .otherwise(leVal.cast("double"))
    val (withQ, qCol) = withScalarParam(v.df, qv, "_q")
    // the whole kernel — sort, coalesce, monotonicity repair, interpolation,
    // and the duplicate-labelset error (repeated exact le STRING within the
    // group; different representations of one bound are legitimately
    // distinct) — is a single native TypedImperativeAggregate: one
    // ObjectHashAggregate, no collect_list value, no distinct-agg Expand
    val grouped = withQ
      .withColumn("_le", leDouble) // must read labels BEFORE le is dropped
      .withColumn("_leStr", leVal)
      .withColumn("labels", Labels.drop(col("labels"), Seq("le")))
      .withColumn("sig", Points.sigOf(col("labels")))
      .groupBy(col("sig"), col("step"))
      .agg(
        BucketQuantileAgg.column(qCol, col("_leStr"), col("_le"), col("value")).as("value"),
        first(col("labels")).as("labels"))
      .where(col("value").isNotNull)
      .select(col("sig"), lit(null).cast("string").as("name"), col("labels"),
        col("step"), col("step").as("t"), col("value"))
    VectorVal(grouped)
  }
}
