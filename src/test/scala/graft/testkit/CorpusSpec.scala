package graft.testkit

import java.nio.file.{Files, Paths}

import scala.collection.mutable
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine
import graft.model.Points
import graft.testkit.PromTestDsl._

/** Runs the reference's golden PromQL corpus (read from the read-only
  * checkout at test time) against our engine. Primary correctness oracle
  * per SURVEY §5. Each file is one test; a failure prints every
  * mismatching eval with its file line for triage.
  */
class CorpusSpec extends AnyFunSuite {

  private val corpusDir =
    "/root/reference/vendor/github.com/prometheus/prometheus/promql/testdata"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("corpus")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    .config("spark.sql.ansi.enabled", "false") // PromQL needs IEEE ÷0 → ±Inf/NaN
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("name", StringType), StructField("labels", MapType(StringType, StringType)),
    StructField("t", LongType), StructField("value", DoubleType),
    StructField("stale", BooleanType)))

  private def pointsDf(series: Seq[Series]): DataFrame = {
    // storage is last-write-wins per (series, ts) — a later `load` line for
    // the same series+timestamp overwrites (reference: TSM upsert semantics)
    val dedup = scala.collection.mutable.LinkedHashMap
      .empty[(String, Map[String, String], Long), Row]
    series.foreach { s =>
      s.samples.foreach { p =>
        dedup((s.name, s.labels, p.tMs)) = Row(s.name, s.labels, p.tMs, p.value, p.stale)
      }
    }
    Points.withSig(spark.createDataFrame(
      spark.sparkContext.parallelize(dedup.values.toSeq, 2), schema))
  }

  private val eps = 1e-6

  private def close(a: Double, b: Double): Boolean = {
    if (a == b) true
    else if (a.isNaN && b.isNaN) true
    else if (a.isInfinite || b.isInfinite) false
    else if (math.abs(a) + math.abs(b) == 0) math.abs(a - b) < 1e-12
    else math.abs(a - b) / (math.abs(a) + math.abs(b)) < eps
  }

  /** Run one corpus file; returns (evalCount, failures as line->message).
    *
    * `storeBacked = true` runs the SAME evals over the engine's actual
    * 100 TB read path instead of an in-memory relation: every load
    * generation is written through [[graft.sources.PointsStore.append]]
    * (persisted `_lc`, `_seq`/`_sub` write stamps, `_dict` sidecar) and
    * every eval reads via `PointsStore.read` (live-file manifest view +
    * LWW read guard — the 2-partition test writes always produce the
    * multi-file layout that arms it) with `readDict` feeding the series-
    * dictionary SLIM selector path (sig-only exchanges, labels joined
    * back from the sidecar). Any divergence between the in-memory and
    * store paths — a matcher-on-`_lc` rewrite bug, label-restore
    * ordering, stale-marker handling across the sidecar — fails here
    * with the same per-line triage as the primary mode. */
  private def runFile(file: String, storeBacked: Boolean): (Int, Seq[(Int, String)]) = {
    val text = new String(Files.readAllBytes(Paths.get(s"$corpusDir/$file")))
    val cmds = PromTestDsl.parseFile(text)
    val loaded = mutable.ArrayBuffer[Series]()
    var df: DataFrame = null
    var dict: Option[DataFrame] = None
    var dirty = true
    var gen = 0
    val failures = mutable.ArrayBuffer[(Int, String)]()
    var n = 0
    val storeRoot =
      if (storeBacked) Some(Files.createTempDirectory(s"corpus-store-")) else None
    def refresh(): Unit = {
      val mem = pointsDf(loaded.toSeq)
      storeRoot match {
        case Some(root) if loaded.nonEmpty =>
          // fresh store per load generation: the corpus's `clear`/`load`
          // blocks are independent worlds, and a shared dir would leak
          // one block's series into the next through the dict sidecar
          gen += 1
          val dir = root.resolve(s"gen-$gen").toString
          graft.sources.PointsStore.append(mem, dir)
          df = graft.sources.PointsStore.read(
            spark, dir, Long.MinValue, Long.MaxValue)
          dict = graft.sources.PointsStore.readDict(spark, dir)
        case _ =>
          // empty load set (literals.test): nothing to store — an empty
          // parquet dir has no inferable schema; the engine sees the
          // same empty relation either way
          df = mem
          dict = None
      }
      dirty = false
    }
    try {
      cmds.foreach {
        case Clear => loaded.clear(); dirty = true
        case Load(series) => loaded ++= series; dirty = true
        case ev: Eval =>
          n += 1
          if (dirty) refresh()
          runEval(ev, df, dict) match {
            case Some(err) => failures += ((ev.line, s"${ev.expr} -- $err"))
            case None => ()
          }
      }
    } finally storeRoot.foreach { root =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(root.toFile)
    }
    (n, failures.toSeq)
  }

  private def fmtLabels(m: Map[String, String]): String =
    m.toSeq.sorted.map { case (k, v) => s"""$k="$v"""" }.mkString("{", ",", "}")

  /** None = pass; Some(message) = failure description. */
  private def runEval(ev: Eval, points: DataFrame,
                      dict: Option[DataFrame]): Option[String] =
    runEvalOnce(ev, points, dict, asRange = false).orElse {
      // every instant eval ALSO runs as the last step of a 3-step range
      // query — the per-step results of a range grid must agree with the
      // corresponding instant evaluation (set-oriented grid regression net)
      if (ev.mode == "instant") runEvalOnce(ev, points, dict, asRange = true)
        .map(m => s"[range-mode] $m")
      else None
    }

  private def runEvalOnce(ev: Eval, points: DataFrame,
                          dict: Option[DataFrame], asRange: Boolean): Option[String] = {
    val attempt = Try {
      val out =
        if (asRange) {
          val step = 300000L
          Engine.rangeQuery(spark, points, ev.expr,
            ev.atMs - 2 * step, ev.atMs, step, strictCollision = true,
            seriesDict = dict)
        } else {
          Engine.instantQuery(spark, points, ev.expr, ev.atMs,
            strictCollision = true, seriesDict = dict)
        }
      val rows = out.collect()
      if (asRange) {
        // keep only the final-step slice: vector/scalar rows have t ==
        // eval ts; bare-matrix rows carry their window's `step`
        rows.filter { r =>
          val f = r.schema.fieldNames
          if (f.contains("step")) r.getAs[Long]("step") == ev.atMs
          else r.getAs[Long]("t") == ev.atMs
        }
      } else rows
    }
    (ev.mode, attempt) match {
      case ("fail", Failure(_)) => None
      case ("fail", Success(_)) => Some("expected failure but query succeeded")
      case (_, Failure(e)) => Some(s"query error: ${rootMsg(e)}")
      case (_, Success(rows)) =>
        val isScalar = rows.headOption.forall(_.schema.fieldNames.length == 2) &&
          ev.expected.isEmpty && ev.scalarExpected.isDefined
        if (ev.scalarExpected.isDefined) {
          val exp = ev.scalarExpected.get
          if (rows.length != 1) Some(s"expected scalar $exp, got ${rows.length} rows")
          else {
            val v = rows.head.getDouble(rows.head.schema.fieldNames.indexOf("value"))
            if (close(v, exp)) None else Some(s"scalar: got $v, want $exp")
          }
        } else {
          compareVector(ev, rows)
        }
    }
  }

  private def rootMsg(e: Throwable): String = {
    var c = e
    while (c.getCause != null && c.getCause != c) c = c.getCause
    val m = Option(c.getMessage).getOrElse(c.toString)
    m.split("\n").head.take(200)
  }

  private def compareVector(ev: Eval, rows: Array[Row]): Option[String] = {
    if (rows.isEmpty && ev.expected.isEmpty) return None
    if (rows.nonEmpty && rows.head.schema.fieldNames.length == 2) {
      // scalar-typed result but expectations were series
      return Some(s"got scalar result, expected ${ev.expected.size} series")
    }
    val isMatrix = rows.nonEmpty && rows.head.schema.fieldNames.contains("step")
    // group result rows by full labelset (incl __name__)
    val got: Map[Map[String, String], Seq[(Long, Double)]] = rows.toSeq.map { r =>
      val f = r.schema.fieldNames
      val name = Option(r.getAs[String]("name"))
      val labels = Option(r.getAs[Map[String, String]]("labels")).getOrElse(Map.empty)
      val full = name.filter(_.nonEmpty).map(n => labels + ("__name__" -> n)).getOrElse(labels)
      val t = r.getAs[Long]("t")
      (full, (t, r.getAs[Double]("value")))
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sortBy(_._1) }

    val expMap = ev.expected.toMap
    if (ev.mode == "ordered") {
      // order of distinct labelsets in collected row order must match
      val gotOrder = rows.toSeq.map { r =>
        val labels = Option(r.getAs[Map[String, String]]("labels")).getOrElse(Map.empty)
        Option(r.getAs[String]("name")).filter(_.nonEmpty)
          .map(n => labels + ("__name__" -> n)).getOrElse(labels)
      }.distinct
      if (gotOrder != ev.expected.map(_._1))
        return Some(s"order mismatch: got ${gotOrder.map(fmtLabels)}, want ${ev.expected.map(e => fmtLabels(e._1))}")
    }
    if (got.keySet != expMap.keySet) {
      val missing = expMap.keySet -- got.keySet
      val extra = got.keySet -- expMap.keySet
      return Some(s"series mismatch: missing=${missing.map(fmtLabels)} extra=${extra.map(fmtLabels)}")
    }
    expMap.iterator.flatMap { case (ls, expVals) =>
      val gotVals = got(ls).map(_._2)
      if (gotVals.length != expVals.length)
        Some(s"${fmtLabels(ls)}: got ${gotVals.length} values ${gotVals.take(5)}, want ${expVals.length} $expVals")
      else gotVals.zip(expVals).collectFirst {
        case (g, e) if !close(g, e) => s"${fmtLabels(ls)}: got $gotVals, want $expVals"
      }
    }.to(LazyList).headOption
  }

  /** Known-unsupported eval lines per file (engine gaps, tracked openly). */
  private val knownFailures: Map[String, Set[Int]] = Map(
  ).withDefaultValue(Set.empty)

  private val files = Seq(
    "literals.test", "selectors.test", "aggregators.test", "operators.test",
    "functions.test", "trig_functions.test", "staleness.test",
    "subquery.test", "at_modifier.test", "collision.test",
    "histograms.test") // conventional le-bucket sections (native-histogram
                       // files stay excluded: the store rejects them)

  for (f <- files; store <- Seq(false, true)) {
    val label = if (store) s"corpus-store: $f" else s"corpus: $f"
    test(label) {
      assume(Files.exists(Paths.get(s"$corpusDir/$f")), "reference corpus not present")
      val (n, failures) = runFile(f, storeBacked = store)
      val unexpected = failures.filterNot { case (line, _) => knownFailures(f)(line) }
      val msg = unexpected.map { case (line, m) => s"  $f:$line $m" }.mkString("\n")
      info(s"$label: $n evals, ${failures.length} failures (${unexpected.length} unexpected)")
      assert(unexpected.isEmpty, s"\nunexpected failures:\n$msg")
    }
  }
}
