package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Engine
import graft.model.Points

/** Shared plumbing for the driver's correctness gate: run a PromQL query
  * over the events-as-points view on a testdata dir, flatten the result for
  * the column-name-sensitive DuckDB compare, and build the matching SQL
  * prelude (points / step grid / instant-vector / range-sample CTEs) so
  * every oracle derives from one audited skeleton.
  */
object QueryKit {

  val T0: Long = 1704067200000L // 2024-01-01T00:00:00Z — events span Jan 2024
  val DAY: Long = 86400000L
  val T_END: Long = T0 + 30 * DAY
  val START: Long = T0 + DAY // default grid: daily steps Jan 2 .. Jan 31

  /** Run `promql` on the default daily grid and flatten to
    * (name, user, par, t, value[, rounded]). */
  def promql(
      q: String,
      roundTo: Int = -1,
      startMs: Long = START,
      endMs: Long = T_END,
      stepMs: Long = DAY,
      lookbackMs: Long = DAY): (SparkSession, String) => DataFrame =
    (s: SparkSession, dir: String) => {
      val out = Engine.rangeQuery(s, Points.eventsPoints(s, dir), q,
        startMs, endMs, stepMs, lookbackMs)
      flatten(out, roundTo)
    }

  /** Scalar-result PromQL (returns (t, value)). */
  def promqlScalar(
      q: String,
      roundTo: Int = -1,
      startMs: Long = START,
      endMs: Long = T_END,
      stepMs: Long = DAY,
      lookbackMs: Long = DAY): (SparkSession, String) => DataFrame =
    (s: SparkSession, dir: String) => {
      val out = Engine.rangeQuery(s, Points.eventsPoints(s, dir), q,
        startMs, endMs, stepMs, lookbackMs)
      if (roundTo >= 0) out.withColumn("value", round(col("value"), roundTo)) else out
    }

  def flatten(vector: DataFrame, roundTo: Int = -1, extraLabels: Seq[String] = Nil): DataFrame = {
    val v = if (roundTo >= 0) round(col("value"), roundTo) else col("value")
    val extras = extraLabels.map(k => col("labels").getItem(k).as(k))
    vector.select(Seq(col("name"),
      col("labels").getItem("user").as("user"),
      col("labels").getItem("par").as("par")) ++ extras ++
      Seq(col("t"), v.as("value")): _*)
  }

  // ---- DuckDB oracle prelude ------------------------------------------

  /** Points CTE: the events table in the engine's shape. */
  val pSql: String =
    """p AS (
      |  SELECT event_type AS name, CAST(user_id AS VARCHAR) AS "user",
      |         CAST(user_id % 3 AS VARCHAR) AS par,
      |         epoch_us(ts) // 1000 AS t, value
      |  FROM events)""".stripMargin

  def stepsSql(start: Long = START, end: Long = T_END, step: Long = DAY): String =
    s"steps AS (SELECT unnest(generate_series($start, $end, $step)) AS step)"

  /** Instant-vector CTE `inst`: newest sample per (series, step) within the
    * CLOSED lookback window [step-lb, step]. */
  def instSql(lookback: Long = DAY, where: String = "TRUE"): String =
    s"""inst AS (
       |  SELECT name, "user", par, step, t, value FROM (
       |    SELECT p.*, s.step,
       |           row_number() OVER (PARTITION BY p.name, p."user", s.step ORDER BY p.t DESC) AS rn
       |    FROM steps s JOIN p ON p.t >= s.step - $lookback AND p.t <= s.step
       |    WHERE $where)
       |  WHERE rn = 1)""".stripMargin

  /** Range-sample CTE `rng`: all samples per (series, step) in the closed
    * window [step-r, step]. */
  def rngSql(r: Long, where: String = "TRUE"): String =
    s"""rng AS (
       |  SELECT p.name, p."user", p.par, s.step, p.t, p.value
       |  FROM steps s JOIN p ON p.t >= s.step - $r AND p.t <= s.step
       |  WHERE $where)""".stripMargin

  def withClauses(clauses: String*): String =
    "WITH " + clauses.mkString(",\n")

  /** The extrapolated rate/increase/delta oracle, mirroring
    * Kernels.extrapolated (reference functions.go:63-169). The counter
    * reset correction folds over the TIME-ORDERED values exactly like the
    * kernel's sequential loop (state [prev, corr]) — an unordered
    * sum(CASE...) drifts by an ulp on occasional rows at 10x scale. */
  def extrapolatedSql(r: Long, nameFilter: String, isCounter: Boolean,
                      isRate: Boolean, roundTo: Int): String = {
    val rSec = r / 1000.0
    val resetsExpr =
      if (isCounter)
        """list_reduce(list_transform(vs, v -> [v, CAST(0 AS DOUBLE)]),
          |            (acc, e) -> [e[1], CASE WHEN e[1] < acc[1]
          |                                    THEN acc[2] + acc[1] ELSE acc[2] END])[2]""".stripMargin
      else "0"
    // parenthesization matters: the kernel computes sampled * (v0 / result0)
    // and the oracle must produce the bit-identical double
    val zeroCut =
      if (isCounter)
        """CASE WHEN result0 > 0 AND v0 >= 0 AND sampled * (v0 / result0) < dstart0
          |     THEN sampled * (v0 / result0) ELSE dstart0 END""".stripMargin
      else "dstart0"
    val rateDiv = if (isRate) s" / $rSec" else ""
    withClauses(pSql, stepsSql(), rngSql(r, s"p.name = '$nameFilter'"),
      s"""agg AS (
         |  SELECT name, "user", par, step, count(*) AS n,
         |         min(t) AS t0, max(t) AS t1,
         |         arg_min(value, t) AS v0, arg_max(value, t) AS v1,
         |         list(value ORDER BY t) AS vs
         |  FROM rng GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2)""".stripMargin,
      s"""corr AS (
         |  SELECT *, ($resetsExpr) AS rcorr FROM agg)""".stripMargin,
      s"""ext AS (
         |  SELECT *, (v1 - v0 + rcorr) AS result0,
         |         (t0 - (step - $r)) / 1000.0 AS dstart0,
         |         (step - t1) / 1000.0 AS dend,
         |         (t1 - t0) / 1000.0 AS sampled,
         |         (t1 - t0) / 1000.0 / (n - 1) AS avgspace
         |  FROM corr)""".stripMargin,
      s"""fin AS (
         |  SELECT *, ($zeroCut) AS dstart,
         |         1.1 * avgspace AS thresh
         |  FROM ext)""".stripMargin) +
      s"""
         |SELECT CAST(NULL AS VARCHAR) AS name, "user", par, step AS t,
         |       floor(result0 * (
         |         (sampled
         |          + CASE WHEN dstart < thresh THEN dstart ELSE avgspace / 2 END
         |          + CASE WHEN dend < thresh THEN dend ELSE avgspace / 2 END)
         |         / sampled$rateDiv) * 1e$roundTo) / 1e$roundTo AS value
         |FROM fin""".stripMargin
  }

  /** Floor-truncate instead of round: both engines compute the identical
    * double, and floor of the identical double always agrees, while
    * round() at a tie boundary does not (Spark rounds the shortest
    * decimal repr, DuckDB the binary value). */
  def truncated(df: org.apache.spark.sql.DataFrame, digits: Int): org.apache.spark.sql.DataFrame = {
    val scale = math.pow(10, digits)
    df.withColumn("value",
      when(isnan(col("value")), col("value"))
        .otherwise(floor(col("value") * scale) / scale))
  }
}
