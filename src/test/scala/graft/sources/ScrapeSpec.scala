package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ScrapeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val body =
    """# HELP http_requests_total Total requests.
      |# TYPE http_requests_total counter
      |http_requests_total{method="post",code="200"} 1027 1395066363000
      |http_requests_total{method="post",code="400"}    3 1395066363000
      |msg_count{text="hello \"quoted\", world\n"} 7
      |metric_without_labels 12.47
      |something_weird{problem="division by zero"} +Inf
      |""".stripMargin

  test("text exposition parsing: labels, escapes, timestamps, specials") {
    val pts = Scrape.parseExposition(body, defaultTsMs = 1000L)
    assert(pts.length == 5)
    val first = pts.head
    assert(first.name == "http_requests_total")
    assert(first.labels == Map("method" -> "post", "code" -> "200"))
    assert(first.value == 1027.0 && first.t == 1395066363000L)
    val msg = pts.find(_.name == "msg_count").get
    assert(msg.labels("text") == "hello \"quoted\", world\n")
    assert(msg.t == 1000L) // default timestamp
    val bare = pts.find(_.name == "metric_without_labels").get
    assert(bare.labels.isEmpty && bare.value == 12.47)
    assert(pts.find(_.name == "something_weird").get.value.isPosInfinity)
  }

  test("scrapeTargets: fetch plug, instance label, non-finite rejection") {
    val df = Scrape.scrapeTargets(spark, Seq("host:9090"), _ => body, tsMs = 5000L)
    val rows = df.collect()
    assert(rows.length == 4) // +Inf sample rejected at ingest
    assert(rows.forall(_.getAs[Map[String, String]]("labels")("instance") == "host:9090"))
  }
}
