package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Points

/** PromQL instant vectors must not contain two samples with the same
  * labelset ("vector cannot contain metrics with the same labelset") — the
  * reference errors at EVERY vector materialization
  * (vendor/.../promql/engine.go:1930-1934). The Spark answer to a per-row
  * runtime check: prove it away at plan time for structurally
  * collision-free shapes ([[Engine.mayCollide]]/[[Engine.producesCollision]]
  * — a selector keyed by (name, labels), an aggregation keyed by its
  * grouping, a binop behind its duplicate-match guards cannot collide), and
  * guard each node that CAN first produce a collision at its own
  * materialization — a name-dropping transform over a multi-name input, or
  * a label-rewriting call. Guarding at the PRODUCER gives the reference's
  * per-materialization semantics (an inner collision raises even when a
  * later aggregation would re-unify it) and makes every enclosing
  * operator's input provably clean, so no root-level re-check is needed
  * and clean plans carry zero extra Exchange.
  */
object Collision {

  /** One guarded re-key on the internal vector schema: input and output are
    * (sig, name, labels, step, t, value). Shape: ONE hash aggregation
    * keyed by (name, canonical labels, step); in the no-collision case
    * every group has exactly one row, so the aggregation is a pass-through
    * doubling as the check, with the error embedded in the value column
    * (Catalyst cannot prune it). The canonical string is computed once per
    * row and feeds BOTH the group key and the refreshed sig — for
    * label-rewriting functions this replaces their own re-sig projection,
    * so the guard costs one aggregation, not an aggregation plus a
    * second per-row canonicalization. */
  def guard(df: DataFrame): DataFrame =
    df.withColumn("_gl", Points.canonical(col("labels")))
      .groupBy(col("name"), col("_gl"), col("step"))
      .agg(count(lit(1)).as("_cnt"), first(col("t")).as("t"),
        first(col("value")).as("_v"))
      .select(xxhash64(col("name"), col("_gl")).as("sig"), col("name"),
        Labels.fromCanonical(col("_gl")).as("labels"), col("step"), col("t"),
        when(col("_cnt") > 1,
          raise_error(lit("vector cannot contain metrics with the same labelset")).cast("double"))
          .otherwise(col("_v")).as("value"))
}
