package graft.engine

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Guards.{QueryLimits, QueryTimeoutException, TooManySamplesException}

class GuardsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("name", StringType), StructField("labels", MapType(StringType, StringType)),
    StructField("t", LongType), StructField("value", DoubleType)))

  private def pts(n: Int) = graft.model.Points.withSig(spark.createDataFrame(
    spark.sparkContext.parallelize((0 until n).map(i =>
      Row("m", Map("i" -> (i % 3).toString), i * 1000L, i.toDouble)), 2), schema))

  test("over-budget query fails fast with the reference's MaxSamples error") {
    val p = pts(100)
    val grid = StepGrid(0L, 99000L, 1000L)
    // all 100 samples fall inside the selector window; budget 50 -> abort
    val e = intercept[TooManySamplesException] {
      Guards.checkSampleBudget(p, "sum(m)", grid, QueryLimits(maxSamples = 50),
        lookbackMs = 300000L)
    }
    assert(e.getMessage.contains("too many samples"))
    // a selective matcher stays under budget
    Guards.checkSampleBudget(p, """sum(m{i="0"})""", grid,
      QueryLimits(maxSamples = 50), lookbackMs = 300000L)
    // range selectors count their window; both selectors of a binop count
    intercept[TooManySamplesException] {
      Guards.checkSampleBudget(p, "rate(m[5m]) + rate(m[5m])", grid,
        QueryLimits(maxSamples = 150), lookbackMs = 300000L)
    }
    // subqueries widen the inner window
    Guards.checkSampleBudget(p, "max_over_time(sum(m)[2m:1m])", grid,
      QueryLimits(maxSamples = 101), lookbackMs = 300000L)
  }

  test("offset and @ shift the counted window") {
    val p = pts(100) // samples at t = 0s..99s
    // grid far in the future; without offset nothing is in window
    val farGrid = StepGrid(10_000_000L, 10_000_000L, 1000L)
    Guards.checkSampleBudget(p, "m", farGrid, QueryLimits(maxSamples = 1), lookbackMs = 1000L)
    // @ pins into the data: 5m lookback at t=99s covers all 100 samples
    intercept[TooManySamplesException] {
      Guards.checkSampleBudget(p, "m @ 99", farGrid, QueryLimits(maxSamples = 50),
        lookbackMs = 300000L)
    }
  }

  test("a query past its deadline is cancelled with the timeout error") {
    val slow = udf((x: Long) => { Thread.sleep(200); x })
    val df = spark.range(200).select(slow(col("id")).as("v"))
    val e = intercept[QueryTimeoutException] {
      Guards.run(spark, QueryLimits(timeoutMs = 500)) { df.agg(sum("v")).collect() }
    }
    assert(e.getMessage.contains("timed out"))
  }

  test("fast queries pass through the guard and release their slot") {
    val out = Guards.run(spark, QueryLimits(timeoutMs = 30000, maxConcurrent = 1)) {
      spark.range(10).count()
    }
    assert(out == 10)
    // the slot was released: a second run under the same 1-slot limit works
    val again = Guards.run(spark, QueryLimits(timeoutMs = 30000, maxConcurrent = 1)) {
      spark.range(5).count()
    }
    assert(again == 5)
  }
}
