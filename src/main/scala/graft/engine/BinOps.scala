package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Points
import graft.promql._
import graft.promql.Cardinality._

/** PromQL binary operators: arithmetic / comparison (with `bool`) via an
  * equi-join on the vector-matching label signature, set ops via
  * semi/anti/union joins (reference: vendor/.../promql/engine.go:2126-2526).
  * Catalyst picks broadcast vs shuffled hash join; both sides are
  * result-sized vectors, usually small after aggregation.
  */
object BinOps {

  private val arithOps = Set("+", "-", "*", "/", "%", "^", "atan2")
  private val cmpOps = Set("==", "!=", ">", "<", ">=", "<=")
  private val setOps = Set("and", "or", "unless")

  def eval(be: BinaryExpr, ctx: EvalContext): Value = {
    (Compiler.eval(be.lhs, ctx), Compiler.eval(be.rhs, ctx)) match {
      case (l: ScalarVal, r: ScalarVal) => scalarScalar(be, l, r, ctx)
      case (l: VectorVal, r: ScalarVal) => vectorScalar(be, l, r, scalarOnRight = true)
      case (l: ScalarVal, r: VectorVal) => vectorScalar(be, r, l, scalarOnRight = false)
      case (l: VectorVal, r: VectorVal) if setOps(be.op) => setOp(be, l, r)
      case (l: VectorVal, r: VectorVal) => vectorVector(be, l, r)
      case (l, r) => throw new IllegalArgumentException(
        s"binary op ${be.op} unsupported between ${l.getClass.getSimpleName} and ${r.getClass.getSimpleName}")
    }
  }

  /** The arithmetic kernel — semantics of vectorElemBinop
    * (engine.go:2456-2526): `%` is float remainder (Go math.Mod), `^` is
    * math.Pow, `/` by zero follows IEEE (±Inf/NaN). */
  private def arith(op: String, l: Column, r: Column): Column = op match {
    case "+" => l + r
    case "-" => l - r
    case "*" => l * r
    // Spark SQL yields NULL on ÷0 and %0 even for doubles; PromQL needs IEEE
    // (±Inf / NaN). (Sign of a zero divisor is lost — SQL comparisons do not
    // distinguish -0.0 — which PromQL itself doesn't exercise.)
    case "/" =>
      when(r =!= 0.0, l / r).otherwise(
        when(isnan(l) || l === 0.0, lit(Double.NaN))
          .when(l > 0, lit(Double.PositiveInfinity))
          .otherwise(lit(Double.NegativeInfinity)))
    case "%" => when(r =!= 0.0, l % r).otherwise(lit(Double.NaN))
    case "^" => pow(l, r)
    case "atan2" => atan2(l, r)
  }

  private def cmp(op: String, l: Column, r: Column): Column = op match {
    case "==" => l === r
    case "!=" => l =!= r
    case ">" => l > r
    case "<" => l < r
    case ">=" => l >= r
    case "<=" => l <= r
  }

  private def scalarScalar(be: BinaryExpr, l: ScalarVal, r: ScalarVal, ctx: EvalContext): ScalarVal = {
    // constant-fold literal arithmetic so const propagates (quantile φ etc.)
    (l.const, r.const) match {
      case (Some(a), Some(b)) =>
        val v = constEval(be.op, a, b, be.returnBool)
        ScalarVal(ctx.grid.df(ctx.spark).withColumn("value", lit(v)), const = Some(v))
      case _ =>
        val rr = r.df.withColumnRenamed("value", "_rv")
        val df = l.df.join(rr, "step")
        val out =
          if (arithOps(be.op)) df.withColumn("value", arith(be.op, col("value"), col("_rv")))
          else df.withColumn("value",
            when(cmp(be.op, col("value"), col("_rv")), lit(1.0)).otherwise(lit(0.0)))
        ScalarVal(out.drop("_rv"))
    }
  }

  private def constEval(op: String, a: Double, b: Double, bool: Boolean): Double = op match {
    case "+" => a + b
    case "-" => a - b
    case "*" => a * b
    case "/" => a / b
    case "%" => a % b
    case "^" => math.pow(a, b)
    case "atan2" => math.atan2(a, b)
    case _ =>
      val t = op match {
        case "==" => a == b
        case "!=" => a != b
        case ">" => a > b
        case "<" => a < b
        case ">=" => a >= b
        case "<=" => a <= b
      }
      if (t) 1.0 else 0.0
  }

  /** vector ∘ scalar (either side): elementwise; comparisons filter the
    * vector side unless `bool` (engine.go:2380-2421).
    *
    * A filtering comparison preserves series identity, so a SLIM operand
    * (dictionary path) stays slim: the predicate runs on the primitive
    * rows and the dict rides along unrestored. Arithmetic and `bool`
    * drop the metric name (an identity re-key), so those restore first. */
  private def vectorScalar(be: BinaryExpr, v: VectorVal, s: ScalarVal,
                           scalarOnRight: Boolean): VectorVal = {
    def lr(vc: Column, sc: Column): (Column, Column) =
      if (scalarOnRight) (vc, sc) else (sc, vc)
    val filtering = !arithOps(be.op) && !be.returnBool
    val base = if (filtering) v.raw else v.df
    val withS = s.const match {
      case Some(c) => base.withColumn("_sv", lit(c))
      case None => base.join(broadcast(s.df.withColumnRenamed("value", "_sv")), "step")
    }
    val (lc, rc) = lr(col("value"), col("_sv"))
    if (filtering) // keep original sample value + labels (series unchanged)
      VectorVal(withS.where(cmp(be.op, lc, rc)).drop("_sv"), v.dict)
    else if (arithOps(be.op))
      VectorVal(Labels.dropName(withS.withColumn("value", arith(be.op, lc, rc))).drop("_sv"))
    else
      VectorVal(Labels.dropName(withS.withColumn("value",
        when(cmp(be.op, lc, rc), lit(1.0)).otherwise(lit(0.0)))).drop("_sv"))
  }

  /** Matching signature: hash of the `on` subset or of all labels minus
    * the `ignoring` subset. The metric name participates ONLY when
    * `on(...)` lists `__name__` explicitly — the reference keys
    * BytesWithLabels(on-names) for `on` (so a listed __name__ counts) and
    * always appends MetricName to the dropped set for `ignoring`
    * (engine.go signatureFunc). The name lives in its own column here, so
    * it is hashed alongside the canonical subset rather than through the
    * map. The keep/drop filter is fused into the native canonical
    * expression — no map_filter HOF, so the join stays codegen'd. */
  private def msig(m: VectorMatching): Column =
    if (m.on) {
      val mapKeys = m.labels.filterNot(_ == "__name__")
      val base = CanonicalLabels.keepColumn(col("labels"), mapKeys)
      if (m.labels.contains("__name__"))
        xxhash64(coalesce(col("name"), lit("")), base)
      else xxhash64(base)
    } else xxhash64(CanonicalLabels.dropColumn(col("labels"), m.labels))

  /** [[msig]] evaluated on a series-DICTIONARY row (name, _lc) instead of
    * a sample row: the stored canonical string is subset-filtered
    * directly ([[CanonicalSubset]] — one byte scan, no map round trip),
    * hashing identically to the per-row path. Runs once per SERIES, not
    * once per (series, step). */
  private def msigOnDict(m: VectorMatching): Column =
    if (m.on) {
      val mapKeys = m.labels.filterNot(_ == "__name__")
      val base = CanonicalLabels.keepOnCanonical(col("_lc"), mapKeys)
      if (m.labels.contains("__name__"))
        xxhash64(coalesce(col("name"), lit("")), base)
      else xxhash64(base)
    } else xxhash64(CanonicalLabels.dropOnCanonical(col("_lc"), m.labels))

  /** Attach the matching signature to an operand's rows. FULL operands
    * compute it per row (a pure projection). SLIM operands (dictionary
    * path) compute it per series on the dictionary and join the
    * (sig → _msig) mapping in — a primitive, series-sized build side —
    * so the per-(series, step) rows entering the binop exchange stay
    * string-free. */
  private def withMsig(v: VectorVal, m: VectorMatching): DataFrame = v.dict match {
    case Some(d) => v.raw.join(d.select(col("sig"), msigOnDict(m).as("_msig")), Seq("sig"))
    case None => v.df.withColumn("_msig", msig(m))
  }

  /** Join (name, labels) back from a slim operand's dictionary onto a
    * RESULT-sized frame keyed by `sigCol`; identity on full operands. */
  private def restoreSeries(df: DataFrame, v: VectorVal, sigCol: String = "sig"): DataFrame =
    v.dict match {
      case Some(d) =>
        val dd = d.select(col("sig").as(sigCol), col("name"),
          Labels.fromCanonical(col("_lc")).as("labels"))
        df.join(dd, Seq(sigCol))
      case None => df
    }

  /** Result labels for one-to-one matching (engine.go:2336-2377):
    * `on` → only the on labels; otherwise lhs labels minus ignored. */
  private def oneToOneLabels(m: VectorMatching): Column =
    if (m.on) Labels.keep(col("labels"), m.labels)
    else Labels.drop(col("labels"), m.labels)

  private def vectorVector(be: BinaryExpr, l: VectorVal, r: VectorVal): VectorVal = {
    val m = be.matching
    val dropsName = arithOps(be.op) || be.returnBool
    m.card match {
      case OneToOne =>
        val lhs = withMsig(l, m)
        val rhsPre = withMsig(r, m)
        // a slim RHS contributes only primitives to the join; a full RHS
        // keeps its labels rider (unused downstream, kept for parity)
        val rhs = r.dict match {
          case Some(_) => rhsPre.select(col("_msig"), col("step"), col("value").as("_rv"))
          case None => rhsPre.select(col("_msig"), col("step"), col("value").as("_rv"),
            col("labels").as("_rlabels"))
        }
        // a duplicate signature on the RHS of a 1:1 match errors during the
        // reference's hash-map build, unconditionally (engine.go:2226-2243)
        val joined = lhs.join(
          dupGuard(rhs, "_rv", if (r.dict.isDefined) Nil else Seq("_rlabels"),
            "many-to-many matching not allowed: matching labels must be unique on one side"),
          Seq("_msig", "step"))
        val out =
          if (arithOps(be.op))
            joined.withColumn("value", arith(be.op, col("value"), col("_rv")))
          else if (be.returnBool)
            joined.withColumn("value",
              when(cmp(be.op, col("value"), col("_rv")), lit(1.0)).otherwise(lit(0.0)))
          else
            joined.where(cmp(be.op, col("value"), col("_rv")))
        // duplicate LHS matches error only when they actually MATCH — and,
        // for filtering comparisons, only among samples that survive the
        // predicate (the reference checks matchedSigs after the keep test,
        // engine.go:2283-2295) — so the guard counts the FINAL output rows
        val dups = out.groupBy(col("_msig"), col("step"))
          .agg(count(lit(1)).as("_lcnt")).where(col("_lcnt") > 1)
        val guarded = out.join(broadcast(dups), Seq("_msig", "step"), "left")
          .withColumn("value", when(col("_lcnt").isNotNull,
            raise_error(lit("multiple matches for labels: many-to-one matching must be explicit (group_left/group_right)")).cast("double"))
            .otherwise(col("value")))
          .drop("_lcnt")
        // a slim LHS restores (name, labels) from the dictionary HERE —
        // after the join, on result-sized rows
        val withSeries = restoreSeries(guarded, l)
        // resultMetric applies Keep(on)/Del(ignoring) to EVERY one-to-one
        // result, filtering comparisons included (engine.go:2336-2377);
        // __name__ goes when the op drops it or when `on` keeps it out
        val relabeled = withSeries.withColumn("labels", oneToOneLabels(m))
        val named =
          if (dropsName || (m.on && !m.labels.contains("__name__")))
            relabeled.withColumn("name", lit(null).cast("string"))
          else relabeled
        VectorVal(Labels.resig(named).select(
          col("sig"), col("name"), col("labels"), col("step"), col("step").as("t"), col("value")))

      case ManyToOne | OneToMany =>
        val (many, one, manyIsLeft) =
          if (m.card == ManyToOne) (l, r, true) else (r, l, false)
        // a slim one-side rides its sig through the guard instead of its
        // labels map; the include labels are joined back from the
        // dictionary on the result-sized output below
        val onePre = withMsig(one, m)
        val oneSide = one.dict match {
          case Some(_) => dupGuard(
            onePre.select(col("_msig"), col("step"), col("value").as("_ov"),
              col("sig").as("_osig")),
            "_ov", Seq("_osig"),
            "multiple matches for labels: grouping labels must ensure unique matches")
          case None => dupGuard(
            onePre.select(col("_msig"), col("step"), col("value").as("_ov"),
              col("labels").as("_olabels")),
            "_ov", Seq("_olabels"),
            "multiple matches for labels: grouping labels must ensure unique matches")
        }
        val joined = withMsig(many, m).join(oneSide, Seq("_msig", "step"))
        val (lc, rc) =
          if (manyIsLeft) (col("value"), col("_ov")) else (col("_ov"), col("value"))
        val valued =
          if (arithOps(be.op)) joined.withColumn("value", arith(be.op, lc, rc))
          else if (be.returnBool) joined.withColumn("value",
            when(cmp(be.op, lc, rc), lit(1.0)).otherwise(lit(0.0)))
          else joined.where(cmp(be.op, lc, rc))
        // restore the many side's (name, labels) and — when the one side is
        // slim and `group_x(include)` asks for its labels — its map too,
        // both joins at result size
        val manyRestored = restoreSeries(valued, many)
        val withOlabels = one.dict match {
          case Some(d) if m.include.nonEmpty =>
            manyRestored.join(
              d.select(col("sig").as("_osig"),
                Labels.fromCanonical(col("_lc")).as("_olabels")),
              Seq("_osig"))
          case _ => manyRestored
        }
        // include labels copied from the "one" side overwrite the many side
        val withIncl = m.include.foldLeft(withOlabels) { (df, k) =>
          df.withColumn("labels", Labels.set(col("labels"), k, element_at(col("_olabels"), k)))
        }
        val named =
          if (dropsName) withIncl.withColumn("name", lit(null).cast("string"))
          else withIncl
        VectorVal(Labels.resig(named).select(
          col("sig"), col("name"), col("labels"), col("step"), col("step").as("t"), col("value")))

      case ManyToMany =>
        throw new IllegalStateException("set operations are handled by setOp")
    }
  }

  /** Embed a runtime uniqueness assertion into the value column itself: any
    * (_msig, step) with >1 row makes the query fail in the executor,
    * mirroring the reference's duplicate-match errors — no separate
    * driver-side action, and Catalyst cannot prune it because the guarded
    * column IS the output value.
    *
    * Shape: a hash aggregation (partial+final, no sort) rather than a
    * window — at scale this also DEDUPLICATES the join side, so the join
    * probe stream stays result-sized even on pathological inputs. */
  private def dupGuard(df: DataFrame, valueCol: String, otherCols: Seq[String],
                       msg: String): DataFrame = {
    val keep = otherCols.map(c => first(col(c)).as(c)) :+ count(lit(1)).as("_cnt")
    df.groupBy(col("_msig"), col("step"))
      .agg(first(col(valueCol)).as(valueCol), keep: _*)
      .withColumn(valueCol,
        when(col("_cnt") > 1, raise_error(lit(msg)).cast("double")).otherwise(col(valueCol)))
      .drop("_cnt")
  }

  /** and / or / unless on the matching signature (engine.go:2126-2200).
    *
    * Set ops preserve each surviving row's series identity, so slim
    * operands STAY slim: `and`/`unless` emit lhs rows (the rhs contributes
    * only its primitive (_msig, step) key set), and `or` unions two slim
    * sides when they share one dictionary. The output VectorVal carries
    * the dict onward — a chain of set ops never materializes a label. */
  private def setOp(be: BinaryExpr, l: VectorVal, r: VectorVal): VectorVal = {
    val m = be.matching
    be.op match {
      case "and" =>
        VectorVal(withMsig(l, m).join(withMsig(r, m).select("_msig", "step"),
          Seq("_msig", "step"), "left_semi").drop("_msig"), l.dict)
      case "unless" =>
        VectorVal(withMsig(l, m).join(withMsig(r, m).select("_msig", "step"),
          Seq("_msig", "step"), "left_anti").drop("_msig"), l.dict)
      case "or" =>
        // union needs one common schema: slim ∪ slim over the SAME dict
        // stays slim; anything mixed restores both sides first
        val sameDict = (l.dict, r.dict) match {
          case (Some(a), Some(b)) => a eq b
          case (None, None) => true
          case _ => false
        }
        val (lv, rv, outDict) =
          if (sameDict) (l, r, l.dict)
          else (VectorVal(l.df), VectorVal(r.df), None)
        val lhs = withMsig(lv, m)
        val rOnly = withMsig(rv, m)
          .join(lhs.select("_msig", "step"), Seq("_msig", "step"), "left_anti")
        VectorVal(lhs.unionByName(rOnly).drop("_msig"), outDict)
    }
  }
}
