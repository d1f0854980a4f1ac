package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import QueryKit._

/** One driver-gate query per PromQL operator family (SURVEY §2.2-2.5,
  * §2.7), each with a DuckDB oracle derived from the shared prelude. The
  * engine side always goes through the full parser → compiler → Spark plan
  * pipeline via [[QueryKit.promql]].
  */
object PromqlQueries {

  private val nullName = "CAST(NULL AS VARCHAR) AS name"
  private val nullPar = "CAST(NULL AS VARCHAR) AS par"
  private val nullUser = "CAST(NULL AS VARCHAR) AS \"user\""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.3 aggregations
    "q_agg_sum_by" -> promql("sum by (user) (click)", roundTo = 6),
    "q_agg_avg_without" -> promql("avg without (user, par) (purchase)", roundTo = 6),
    "q_agg_min" -> promql("min(error)", roundTo = 6),
    "q_agg_max" -> promql("max(error)", roundTo = 6),
    "q_agg_count" -> promql("count by (par) (view)", roundTo = 6),
    "q_agg_group" -> promql("group by (user) (signup)", roundTo = 6),
    "q_agg_stddev" -> promql("stddev(view)", roundTo = 6),
    "q_agg_stdvar" -> promql("stdvar by (par) (view)", roundTo = 6),
    "q_agg_quantile" -> promql("quantile(0.9, click)", roundTo = 6),
    "q_agg_topk" -> promql("topk(2, click)", roundTo = 6),
    "q_agg_bottomk" -> promql("bottomk by (par) (1, click)", roundTo = 6),
    "q_agg_count_values" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      val out = graft.engine.Engine.rangeQuery(s, graft.model.Points.eventsPoints(s, dir),
        """count_values("uv", signup)""", START, T_END, DAY, DAY)
      out.select(col("labels").getItem("uv").as("uv"), col("t"), col("value"))
    }),

    // §2.4 binary operators / vector matching
    "q_binop_arith" -> promql("purchase / on(user) click", roundTo = 6),
    "q_binop_pow_mod" -> promql("(click % 7) ^ 2", roundTo = 6),
    "q_binop_cmp_filter" -> promql("click > 100"),
    "q_binop_cmp_bool" -> promql("click >= bool 100"),
    "q_binop_vector_scalar" -> promql("click * 2 + 1", roundTo = 6),
    // max: order-free aggregate → the product is bit-identical to the oracle
    // (a sum/avg here would drift in the last ulp and flip exact-half rounding)
    "q_binop_group_left" -> promql("purchase * on(par) group_left max by (par) (click)", roundTo = 6),
    "q_set_and" -> promql("click and purchase"),
    "q_set_or" -> promql("click or purchase"),
    "q_set_unless" -> promql("click unless purchase"),
    "q_unary_neg" -> promql("-click", roundTo = 6),

    // §2.5 rate / counter family
    // floor-truncated, not rounded (see QueryKit.truncated): the two
    // engines produce bit-identical doubles here but their round()
    // implementations disagree at decimal tie boundaries
    "q_fn_rate" -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
      QueryKit.truncated(promql("rate(click[2d])")(s, dir), 7)),
    "q_fn_increase" -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
      QueryKit.truncated(promql("increase(click[2d])")(s, dir), 6)),
    "q_fn_delta" -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
      QueryKit.truncated(promql("delta(purchase[2d])")(s, dir), 6)),
    "q_fn_irate" -> promql("irate(click[2d])", roundTo = 9),
    "q_fn_idelta" -> promql("idelta(purchase[2d])", roundTo = 6),
    "q_fn_resets" -> promql("resets(click[2d])"),
    "q_fn_changes" -> promql("changes(click[2d])"),
    "q_fn_deriv" -> promql("deriv(click[2d])", roundTo = 9),
    "q_fn_predict_linear" -> promql("predict_linear(click[2d], 3600)", roundTo = 4),
    // NON-literal horizon: the scalar argument re-evaluates per step and
    // rides into the fold kernel as a per-step parameter column
    "q_fn_predict_linear_step" -> promql("predict_linear(click[2d], time() / 1000)", roundTo = 2),
    // floor-truncated (not rounded): the engine and oracle produce
    // bit-identical doubles, but round()'s TIE behavior differs between
    // engines (Spark rounds the shortest decimal repr, DuckDB the binary
    // value) — truncation of identical doubles always agrees
    "q_fn_holt_winters" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      val out = graft.engine.Engine.rangeQuery(s, graft.model.Points.eventsPoints(s, dir),
        "holt_winters(click[5d], 0.5, 0.3)", START, T_END, DAY, DAY)
      QueryKit.flatten(out).withColumn("value", floor(col("value") * 1e5) / 1e5)
    }),

    // §2.5 *_over_time
    "q_fn_sum_over_time" -> promql("sum_over_time(click[2d])", roundTo = 6),
    "q_fn_avg_over_time" -> promql("avg_over_time(click[2d])", roundTo = 6),
    "q_fn_count_over_time" -> promql("count_over_time(click[2d])"),
    "q_fn_min_over_time" -> promql("min_over_time(click[2d])"),
    "q_fn_max_over_time" -> promql("max_over_time(click[2d])"),
    "q_fn_last_over_time" -> promql("last_over_time(click[2d])"),
    "q_fn_stddev_over_time" -> promql("stddev_over_time(click[2d])", roundTo = 6),
    "q_fn_quantile_over_time" -> promql("quantile_over_time(0.5, click[2d])", roundTo = 6),
    "q_fn_present_over_time" -> promql("present_over_time(click[2d])"),

    // §2.5 math / shape / labels / time
    "q_fn_math_chain" -> promql("ceil(sqrt(abs(purchase - 100)))"),
    "q_fn_clamp" -> promql("clamp(click, 50, 150)", roundTo = 6),
    "q_fn_round" -> promql("round(click, 10)"),
    "q_fn_exp_ln" -> promql("exp(ln(click))", roundTo = 6),
    "q_fn_sgn_floor" -> promql("sgn(purchase - 100) * floor(purchase)"),
    "q_fn_label_replace" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      val out = graft.engine.Engine.rangeQuery(s, graft.model.Points.eventsPoints(s, dir),
        """label_replace(click, "grp", "u$1", "user", "(.*)")""", START, T_END, DAY, DAY)
      QueryKit.flatten(out, roundTo = -1, extraLabels = Seq("grp"))
    }),
    "q_fn_label_join" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      val out = graft.engine.Engine.rangeQuery(s, graft.model.Points.eventsPoints(s, dir),
        """label_join(click, "upar", "-", "user", "par")""", START, T_END, DAY, DAY)
      QueryKit.flatten(out, roundTo = -1, extraLabels = Seq("upar"))
    }),
    "q_fn_timestamp" -> promql("timestamp(click)", roundTo = 6),
    "q_fn_day_of_week" -> promql("day_of_week(timestamp(click))"),
    "q_fn_hour_month" -> promql("hour(timestamp(click)) + month(timestamp(click)) * 100"),
    "q_fn_absent" -> promql("""absent(nonexistent{user="42"})""", lookbackMs = DAY),
    "q_fn_scalar" -> promqlScalar("scalar(sum(click)) * 2", roundTo = 6),
    "q_fn_vector" -> promql("vector(scalar(sum by () (purchase)))", roundTo = 6),
    "q_fn_sort" -> promql("sort(click)"),

    // §2.2 modifiers + subquery
    "q_sel_offset_mod" -> promql("sum by (par) (click offset 1d)", roundTo = 6),
    "q_sel_at_mod" -> promql(s"sum by (par) (click @ ${(T0 + 10 * DAY) / 1000})", roundTo = 6),
    "q_subquery" -> promql("max_over_time(sum by (par) (click)[2d:1d])", roundTo = 6)
  )

  // ---- oracles ---------------------------------------------------------

  private def aggOracle(select: String, groupCols: Seq[String], where: String,
                        roundTo: Int = 6, lookback: Long = DAY): String = {
    val userOut = if (groupCols.contains("user")) "\"user\"" else nullUser
    val parOut = if (groupCols.contains("par")) "par" else nullPar
    val grp = (groupCols ++ Seq("step")).map(c => if (c == "user") "\"user\"" else c).mkString(", ")
    withClauses(pSql, stepsSql(), instSql(lookback, where)) +
      s"""
         |SELECT $nullName, $userOut, $parOut,
         |       round($select, $roundTo) AS value, step AS t
         |FROM inst GROUP BY $grp""".stripMargin
  }

  private def overTimeOracle(select: String, r: Long, name: String,
                             roundTo: Int = -1, keepName: Boolean = false): String = {
    val v = if (roundTo >= 0) s"round($select, $roundTo)" else select
    val nameOut = if (keepName) "name" else nullName
    withClauses(pSql, stepsSql(), rngSql(r, s"p.name = '$name'")) +
      s"""
         |SELECT $nameOut, "user", par, $v AS value, step AS t
         |FROM rng GROUP BY name, "user", par, step""".stripMargin
  }

  /** Least-squares oracle with the kernel's EXACT float fold: samples in
    * time order, x = (t - base)/1000, sums accumulated sequentially as a
    * DOUBLE[7] list_reduce state [cnt, sumX, sumY, sumXY, sumX2, constY,
    * initY], and the slope/intercept formulas in the kernel's association
    * order (Kernels/SeriesAgg.regression) — bit-identical at any scale,
    * where DuckDB's regr_slope sums in ITS OWN order and drifts by an ulp
    * on ~0.1% of rows at sf0.1. `valueExpr` may use slope / intercept. */
  private def regressionOracle(r: Long, name: String, baseExpr: String,
                               valueExpr: String, roundTo: Int): String =
    withClauses(pSql, stepsSql(), rngSql(r, s"p.name = '$name'")) +
      s"""
         |, lists AS (
         |  SELECT "user", par, step, list(value ORDER BY t) AS vs, list(t ORDER BY t) AS ts
         |  FROM rng GROUP BY 1, 2, 3 HAVING count(*) >= 2),
         |folded AS (
         |  SELECT "user", par, step,
         |    list_reduce(list_transform(generate_series(1, len(vs)),
         |      i -> [CAST(1 AS DOUBLE), (ts[i] - $baseExpr) / 1000.0, vs[i],
         |            ((ts[i] - $baseExpr) / 1000.0) * vs[i],
         |            ((ts[i] - $baseExpr) / 1000.0) * ((ts[i] - $baseExpr) / 1000.0),
         |            CAST(1 AS DOUBLE), vs[i]]),
         |      (acc, e) -> [acc[1] + 1, acc[2] + e[2], acc[3] + e[3],
         |                   acc[4] + e[4], acc[5] + e[5],
         |                   CASE WHEN acc[6] = 1 AND e[7] = acc[7]
         |                        THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END,
         |                   acc[7]]) AS st
         |  FROM lists),
         |calc AS (
         |  SELECT "user", par, step, st,
         |    (st[4] - st[2] * st[3] / st[1]) / (st[5] - st[2] * st[2] / st[1]) AS rawslope
         |  FROM folded),
         |fin AS (
         |  SELECT "user", par, step,
         |    CASE WHEN st[6] = 1 THEN 0 ELSE rawslope END AS slope,
         |    CASE WHEN st[6] = 1 THEN st[7]
         |         ELSE st[3] / st[1] - rawslope * st[2] / st[1] END AS intercept
         |  FROM calc)
         |SELECT $nullName, "user", par, step AS t, round($valueExpr, $roundTo) AS value
         |FROM fin""".stripMargin

  private def instProj(valueExpr: String, where: String, roundTo: Int = -1,
                       keepName: Boolean = true, extraCols: String = ""): String = {
    val v = if (roundTo >= 0) s"round($valueExpr, $roundTo)" else valueExpr
    val nameOut = if (keepName) "name" else nullName
    withClauses(pSql, stepsSql(), instSql(DAY, where)) +
      s"""
         |SELECT $nameOut, "user", par$extraCols, $v AS value, step AS t FROM inst""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_agg_sum_by" -> aggOracle("sum(value)", Seq("user"), "p.name = 'click'"),
    "q_agg_avg_without" -> aggOracle("sum(value / n)", Nil, "p.name = 'purchase'")
      .replace("FROM inst GROUP BY",
        "FROM (SELECT *, count(*) OVER (PARTITION BY step) AS n FROM inst) GROUP BY"),
    "q_agg_min" -> aggOracle("min(value)", Nil, "p.name = 'error'"),
    "q_agg_max" -> aggOracle("max(value)", Nil, "p.name = 'error'"),
    "q_agg_count" -> aggOracle("CAST(count(*) AS DOUBLE)", Seq("par"), "p.name = 'view'"),
    "q_agg_group" -> aggOracle("1.0", Seq("user"), "p.name = 'signup'"),
    "q_agg_stddev" -> aggOracle("stddev_pop(value)", Nil, "p.name = 'view'"),
    "q_agg_stdvar" -> aggOracle("var_pop(value)", Seq("par"), "p.name = 'view'"),
    "q_agg_quantile" -> aggOracle("quantile_cont(value, 0.9)", Nil, "p.name = 'click'"),
    "q_agg_topk" ->
      (withClauses(pSql, stepsSql(), instSql(DAY, "p.name = 'click'")) +
        """
          |SELECT name, "user", par, step AS t, round(value, 6) AS value FROM (
          |  SELECT *, row_number() OVER (
          |    PARTITION BY step ORDER BY value DESC, name, "user") AS rk
          |  FROM inst)
          |WHERE rk <= 2""".stripMargin),
    "q_agg_bottomk" ->
      (withClauses(pSql, stepsSql(), instSql(DAY, "p.name = 'click'")) +
        """
          |SELECT name, "user", par, step AS t, round(value, 6) AS value FROM (
          |  SELECT *, row_number() OVER (
          |    PARTITION BY par, step ORDER BY value ASC, name, "user") AS rk
          |  FROM inst)
          |WHERE rk <= 1""".stripMargin),
    "q_agg_count_values" ->
      (withClauses(pSql, stepsSql(), instSql(DAY, "p.name = 'signup'")) +
        """
          |SELECT CASE WHEN value = floor(value) THEN CAST(CAST(value AS BIGINT) AS VARCHAR)
          |            ELSE CAST(value AS VARCHAR) END AS uv,
          |       step AS t, CAST(count(*) AS DOUBLE) AS value
          |FROM inst GROUP BY 1, 2""".stripMargin),

    "q_binop_arith" ->
      // IEEE division like the engine (and Go): x/0 is +-Inf for x != 0 and
      // NaN for 0/0 — DuckDB's / returns NULL on a zero divisor
      (withClauses(pSql, stepsSql(), instSql(DAY, "p.name IN ('purchase','click')")) +
        s"""
           |SELECT $nullName, l."user", $nullPar, l.step AS t,
           |       round(CASE WHEN r.value = 0 THEN
           |               CASE WHEN l.value > 0 THEN CAST('infinity' AS DOUBLE)
           |                    WHEN l.value < 0 THEN CAST('-infinity' AS DOUBLE)
           |                    ELSE CAST('nan' AS DOUBLE) END
           |             ELSE l.value / r.value END, 6) AS value
           |FROM inst l JOIN inst r ON l."user" = r."user" AND l.step = r.step
           |WHERE l.name = 'purchase' AND r.name = 'click'""".stripMargin),
    "q_binop_pow_mod" -> instProj("pow(fmod(value, 7), 2)", "p.name = 'click'",
      roundTo = 6, keepName = false),
    "q_binop_cmp_filter" -> (instProj("value", "p.name = 'click'") + " WHERE value > 100"),
    "q_binop_cmp_bool" -> instProj(
      "CASE WHEN value >= 100 THEN 1.0 ELSE 0.0 END", "p.name = 'click'", keepName = false),
    "q_binop_vector_scalar" -> instProj("value * 2 + 1", "p.name = 'click'",
      roundTo = 6, keepName = false),
    "q_binop_group_left" ->
      (withClauses(pSql, stepsSql(), instSql(DAY, "p.name IN ('purchase','click')"),
        """one AS (SELECT par, step, max(value) AS av FROM inst WHERE name = 'click' GROUP BY par, step)""") +
        s"""
           |SELECT $nullName, m."user", m.par, m.step AS t,
           |       round(m.value * one.av, 6) AS value
           |FROM inst m JOIN one ON m.par = one.par AND m.step = one.step
           |WHERE m.name = 'purchase'""".stripMargin),
    "q_set_and" ->
      (withClauses(pSql, stepsSql(), instSql(DAY, "p.name IN ('click','purchase')")) +
        """
          |SELECT name, "user", par, step AS t, value FROM inst l
          |WHERE l.name = 'click' AND EXISTS (
          |  SELECT 1 FROM inst r WHERE r.name = 'purchase'
          |    AND r."user" = l."user" AND r.step = l.step)""".stripMargin),
    "q_set_or" ->
      (withClauses(pSql, stepsSql(), instSql(DAY, "p.name IN ('click','purchase')")) +
        """
          |SELECT name, "user", par, step AS t, value FROM inst l
          |WHERE l.name = 'click'
          |UNION ALL
          |SELECT name, "user", par, step AS t, value FROM inst r
          |WHERE r.name = 'purchase' AND NOT EXISTS (
          |  SELECT 1 FROM inst l2 WHERE l2.name = 'click'
          |    AND l2."user" = r."user" AND l2.step = r.step)""".stripMargin),
    "q_set_unless" ->
      (withClauses(pSql, stepsSql(), instSql(DAY, "p.name IN ('click','purchase')")) +
        """
          |SELECT name, "user", par, step AS t, value FROM inst l
          |WHERE l.name = 'click' AND NOT EXISTS (
          |  SELECT 1 FROM inst r WHERE r.name = 'purchase'
          |    AND r."user" = l."user" AND r.step = l.step)""".stripMargin),
    "q_unary_neg" -> instProj("-value", "p.name = 'click'", roundTo = 6, keepName = false),

    "q_fn_rate" -> extrapolatedSql(2 * DAY, "click", isCounter = true, isRate = true, roundTo = 7),
    "q_fn_increase" -> extrapolatedSql(2 * DAY, "click", isCounter = true, isRate = false, roundTo = 6),
    "q_fn_delta" -> extrapolatedSql(2 * DAY, "purchase", isCounter = false, isRate = false, roundTo = 6),
    "q_fn_irate" ->
      (withClauses(pSql, stepsSql(), rngSql(2 * DAY, "p.name = 'click'"),
        """l2 AS (SELECT *, row_number() OVER (PARTITION BY "user", step ORDER BY t DESC) AS rn FROM rng)""",
        """pair AS (
          |  SELECT "user", par, step,
          |         max(CASE WHEN rn = 1 THEN value END) AS lv,
          |         max(CASE WHEN rn = 1 THEN t END) AS lt,
          |         max(CASE WHEN rn = 2 THEN value END) AS pv,
          |         max(CASE WHEN rn = 2 THEN t END) AS pt
          |  FROM l2 WHERE rn <= 2 GROUP BY 1, 2, 3 HAVING count(*) = 2)""".stripMargin) +
        s"""
           |SELECT $nullName, "user", par, step AS t,
           |       round((CASE WHEN lv < pv THEN lv ELSE lv - pv END) / ((lt - pt) / 1000.0), 9) AS value
           |FROM pair WHERE lt <> pt""".stripMargin),
    "q_fn_idelta" ->
      (withClauses(pSql, stepsSql(), rngSql(2 * DAY, "p.name = 'purchase'"),
        """l2 AS (SELECT *, row_number() OVER (PARTITION BY "user", step ORDER BY t DESC) AS rn FROM rng)""",
        """pair AS (
          |  SELECT "user", par, step,
          |         max(CASE WHEN rn = 1 THEN value END) AS lv,
          |         max(CASE WHEN rn = 2 THEN value END) AS pv,
          |         max(CASE WHEN rn = 1 THEN t END) AS lt,
          |         max(CASE WHEN rn = 2 THEN t END) AS pt
          |  FROM l2 WHERE rn <= 2 GROUP BY 1, 2, 3 HAVING count(*) = 2)""".stripMargin) +
        s"""
           |SELECT $nullName, "user", par, step AS t, round(lv - pv, 6) AS value
           |FROM pair WHERE lt <> pt""".stripMargin),
    "q_fn_resets" ->
      (withClauses(pSql, stepsSql(), rngSql(2 * DAY, "p.name = 'click'"),
        """w AS (SELECT *, lag(value) OVER (PARTITION BY "user", step ORDER BY t) AS pv FROM rng)""") +
        s"""
           |SELECT $nullName, "user", par, step AS t,
           |       CAST(sum(CASE WHEN value < pv THEN 1 ELSE 0 END) AS DOUBLE) AS value
           |FROM w GROUP BY "user", par, step""".stripMargin),
    "q_fn_changes" ->
      (withClauses(pSql, stepsSql(), rngSql(2 * DAY, "p.name = 'click'"),
        """w AS (SELECT *, lag(value) OVER (PARTITION BY "user", step ORDER BY t) AS pv FROM rng)""") +
        s"""
           |SELECT $nullName, "user", par, step AS t,
           |       CAST(sum(CASE WHEN pv IS NOT NULL AND value <> pv THEN 1 ELSE 0 END) AS DOUBLE) AS value
           |FROM w GROUP BY "user", par, step""".stripMargin),
    // deriv anchors x at the window's first sample time (ts[1] after the
    // time-order sort); predict_linear at the window end (= step here)
    "q_fn_deriv" -> regressionOracle(2 * DAY, "click", "ts[1]", "slope", 9),
    "q_fn_predict_linear" ->
      regressionOracle(2 * DAY, "click", "step", "slope * 3600 + intercept", 4),
    "q_fn_predict_linear_step" ->
      regressionOracle(2 * DAY, "click", "step",
        "slope * ((step / 1000.0) / 1000) + intercept", 2),

    // the double-exponential-smoothing recurrence as a DuckDB lambda fold:
    // state rides as DOUBLE[4] = [i, s0, s1, b] (struct_pack fields shadow
    // inside DuckDB lambdas); (1 - 0.3) stays a SUBTRACTION so the float
    // matches the kernel's (1 - tf) bit-for-bit
    "q_fn_holt_winters" ->
      (withClauses(pSql, stepsSql(), rngSql(5 * DAY, "p.name = 'click'")) +
        s"""
           |, lists AS (
           |  SELECT "user", par, step, list(value ORDER BY t) AS vs
           |  FROM rng GROUP BY 1, 2, 3 HAVING count(*) >= 2)
           |SELECT $nullName, "user", par, step AS t,
           |  floor(list_reduce(
           |    list_transform(vs, v -> [CAST(1 AS DOUBLE), CAST(0 AS DOUBLE), v, CAST(0 AS DOUBLE)]),
           |    (acc, x) -> CASE WHEN acc[1] = 1
           |      THEN [CAST(2 AS DOUBLE), acc[3],
           |            0.5 * x[3] + (1 - 0.5) * (acc[3] + (x[3] - acc[3])),
           |            x[3] - acc[3]]
           |      ELSE [acc[1] + 1, acc[3],
           |            0.5 * x[3] + (1 - 0.5) * (acc[3] + (0.3 * (acc[3] - acc[2]) + (1 - 0.3) * acc[4])),
           |            0.3 * (acc[3] - acc[2]) + (1 - 0.3) * acc[4]]
           |      END)[3] * 1e5) / 1e5 AS value
           |FROM lists""".stripMargin),

    "q_fn_sum_over_time" -> overTimeOracle("round(sum(value), 6)", 2 * DAY, "click"),
    "q_fn_avg_over_time" -> overTimeOracle("round(sum(value / n), 6)", 2 * DAY, "click")
      .replace("FROM rng GROUP BY",
        "FROM (SELECT *, count(*) OVER (PARTITION BY \"user\", step) AS n FROM rng) GROUP BY"),
    "q_fn_count_over_time" -> overTimeOracle("CAST(count(*) AS DOUBLE)", 2 * DAY, "click"),
    "q_fn_min_over_time" -> overTimeOracle("min(value)", 2 * DAY, "click"),
    "q_fn_max_over_time" -> overTimeOracle("max(value)", 2 * DAY, "click"),
    "q_fn_last_over_time" -> overTimeOracle("arg_max(value, t)", 2 * DAY, "click", keepName = true),
    "q_fn_stddev_over_time" -> overTimeOracle("round(stddev_pop(value), 6)", 2 * DAY, "click"),
    "q_fn_quantile_over_time" -> overTimeOracle("round(quantile_cont(value, 0.5), 6)", 2 * DAY, "click"),
    "q_fn_present_over_time" -> overTimeOracle("1.0", 2 * DAY, "click"),

    "q_fn_math_chain" -> instProj("ceil(sqrt(abs(value - 100)))", "p.name = 'purchase'", keepName = false),
    "q_fn_clamp" -> instProj("round(least(greatest(value, 50), 150), 6)", "p.name = 'click'", keepName = false),
    "q_fn_round" -> instProj("floor(value * 0.1 + 0.5) / 0.1", "p.name = 'click'", keepName = false),
    // Go log semantics (engine goLog): ln(0) = -Inf so exp(ln(0)) = 0,
    // ln(<0) = NaN — DuckDB's ln raises on zero
    "q_fn_exp_ln" -> instProj(
      "round(CASE WHEN value = 0 THEN 0 WHEN value < 0 THEN CAST('nan' AS DOUBLE) ELSE exp(ln(value)) END, 6)",
      "p.name = 'click'", keepName = false),
    "q_fn_sgn_floor" -> instProj(
      "sign(value - 100) * floor(value)", "p.name = 'purchase'", keepName = false),
    "q_fn_label_replace" -> instProj("value", "p.name = 'click'",
      extraCols = ", 'u' || \"user\" AS grp"),
    "q_fn_label_join" -> instProj("value", "p.name = 'click'",
      extraCols = ", \"user\" || '-' || par AS upar"),
    "q_fn_timestamp" -> instProj("round(inst.t / 1000.0, 6)", "p.name = 'click'", keepName = false),
    "q_fn_day_of_week" -> instProj(
      "CAST(dayofweek(make_timestamp(inst.t * 1000)) AS DOUBLE)",
      "p.name = 'click'", keepName = false),
    "q_fn_hour_month" -> instProj(
      "CAST(hour(make_timestamp(inst.t * 1000)) + month(make_timestamp(inst.t * 1000)) * 100 AS DOUBLE)",
      "p.name = 'click'", keepName = false),
    "q_fn_absent" ->
      (withClauses(stepsSql()) +
        s"""
           |SELECT $nullName, '42' AS "user", $nullPar, step AS t, 1.0 AS value FROM steps""".stripMargin),
    "q_fn_scalar" ->
      (withClauses(pSql, stepsSql(), instSql(DAY, "p.name = 'click'")) +
        """
          |SELECT s.step AS t,
          |       round(coalesce(x.v * 2, CAST('NaN' AS DOUBLE)), 6) AS value
          |FROM steps s LEFT JOIN (
          |  SELECT step, sum(value) AS v FROM inst GROUP BY step) x ON x.step = s.step""".stripMargin),
    "q_fn_vector" ->
      (withClauses(pSql, stepsSql(), instSql(DAY, "p.name = 'purchase'")) +
        s"""
           |SELECT $nullName, $nullUser, $nullPar,
           |       round(coalesce(x.v, CAST('NaN' AS DOUBLE)), 6) AS value, s.step AS t
           |FROM steps s LEFT JOIN (
           |  SELECT step, sum(value) AS v FROM inst GROUP BY step) x ON x.step = s.step""".stripMargin),
    "q_fn_sort" -> instProj("value", "p.name = 'click'"),

    "q_sel_offset_mod" ->
      (withClauses(pSql,
        stepsSql(START - DAY, T_END - DAY, DAY),
        instSql(DAY, "p.name = 'click'")) +
        s"""
           |SELECT $nullName, $nullUser, par, step + $DAY AS t, round(sum(value), 6) AS value
           |FROM inst GROUP BY par, step""".stripMargin),
    "q_sel_at_mod" -> {
      val at = T0 + 10 * DAY
      withClauses(pSql, stepsSql(at, at, DAY), instSql(DAY, "p.name = 'click'"),
        s"pinned AS (SELECT par, sum(value) AS v FROM inst GROUP BY par)",
        stepsSql().replace("steps AS", "outsteps AS")) +
        s"""
           |SELECT $nullName, $nullUser, par, outsteps.step AS t, round(v, 6) AS value
           |FROM pinned CROSS JOIN outsteps""".stripMargin
    },
    "q_subquery" ->
      (withClauses(pSql,
        stepsSql(START - 2 * DAY, T_END, DAY).replace("steps AS", "isteps AS") +
          ", steps AS (SELECT * FROM isteps)",
        instSql(DAY, "p.name = 'click'"),
        "inner_agg AS (SELECT par, step, sum(value) AS v FROM inst GROUP BY par, step)",
        stepsSql().replace("steps AS", "outsteps AS")) +
        s"""
           |SELECT $nullName, $nullUser, i.par, o.step AS t, round(max(i.v), 6) AS value
           |FROM outsteps o JOIN inner_agg i
           |  ON i.step >= o.step - ${2 * DAY} AND i.step <= o.step
           |GROUP BY i.par, o.step""".stripMargin)
  )
}
