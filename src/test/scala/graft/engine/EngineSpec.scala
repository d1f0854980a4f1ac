package graft.engine

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.promql.Parser

class EngineSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("name", StringType), StructField("labels", MapType(StringType, StringType)),
    StructField("t", LongType), StructField("value", DoubleType)))

  private def pts(rows: Seq[Row]) = graft.model.Points.withSig(
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema))

  test("repeated subexpressions evaluate once per query (memoized)") {
    val p = pts(Seq(Row("up", Map("job" -> "a"), 1000L, 1.0)))
    val ctx = EvalContext(spark, p, StepGrid(1000L, 1000L, 1000L))
    val a = Compiler.eval(Parser.parse("up"), ctx)
    val b = Compiler.eval(Parser.parse("up"), ctx)
    assert(a eq b) // same Value instance -> same DataFrame -> ReusedExchange
    // a structurally different selector misses the memo
    val c = Compiler.eval(Parser.parse("""up{job="a"}"""), ctx)
    assert(!(a eq c))
  }

  test("default 5m lookback: sample visible at +5m, gone at +5m1ms") {
    val p = pts(Seq(Row("m", Map.empty[String, String], 0L, 7.0)))
    assert(Engine.instantQuery(spark, p, "m", 300000L).count() == 1)
    assert(Engine.instantQuery(spark, p, "m", 300001L).count() == 0)
  }

  test("subquery default resolution follows the engine knob") {
    // samples every 30s; sum_over_time over [2m:] at default 1m resolution
    // picks 2 inner steps -> different result than a 30s resolution would
    val rows = (0 to 4).map(i => Row("m", Map.empty[String, String], i * 30000L, 1.0))
    val p = pts(rows)
    val out = Engine.instantQuery(spark, p, "sum_over_time(m[2m:])", 120000L,
      defaultSubqueryStepMs = 60000L)
    assert(out.collect().head.getAs[Double]("value") == 3.0) // steps 0,60s,120s
    val fine = Engine.instantQuery(spark, p, "sum_over_time(m[2m:])", 120000L,
      defaultSubqueryStepMs = 30000L)
    assert(fine.collect().head.getAs[Double]("value") == 5.0)
  }
}
