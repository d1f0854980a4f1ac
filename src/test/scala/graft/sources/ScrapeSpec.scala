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

  private val config =
    """scrape_configs:
      |  - job_name: node
      |    scrape_interval: 15s
      |    static_configs:
      |      - targets: ['host1:9100', 'host2:9100']
      |    relabel_configs:
      |      - source_labels: [__address__]
      |        regex: '([^:]+):.*'
      |        target_label: host
      |        replacement: '$1'
      |      - action: drop
      |        source_labels: [__address__]
      |        regex: 'host2:.*'
      |  - job_name: app
      |    static_configs:
      |      - targets: [svc:8080]
      |""".stripMargin

  test("scrape_configs subset: jobs, intervals, targets, relabel rules") {
    val jobs = Scrape.parseScrapeConfigs(config)
    assert(jobs.map(_.jobName) == Seq("node", "app"))
    assert(jobs.head.intervalMs == 15000L)
    assert(jobs.head.targets == Seq("host1:9100", "host2:9100"))
    assert(jobs.head.relabel.length == 2)
    assert(jobs.head.relabel.head.targetLabel == "host")
    assert(jobs(1).intervalMs == 60000L) // default
    assert(jobs(1).targets == Seq("svc:8080"))
  }

  test("relabelling: replace extracts captures, drop filters the target") {
    val jobs = Scrape.parseScrapeConfigs(config)
    val df = Scrape.scrapeJob(spark, jobs.head, _ => "up 1\n", tsMs = 1000L)
    val rows = df.collect()
    // host2 dropped by the relabel rule; host1 gains host=host1
    assert(rows.length == 1)
    val labels = rows.head.getAs[Map[String, String]]("labels")
    assert(labels("instance") == "host1:9100")
    assert(labels("host") == "host1")
    assert(labels("job") == "node")
    assert(!labels.contains("__address__")) // meta labels stripped
  }

  test("relabel: replacement referencing an undefined group expands empty") {
    // Prometheus (Go regexp.ExpandString) substitutes "" for missing
    // groups; an exception here would kill the whole scrape batch
    val out = Scrape.relabel(Map("__address__" -> "h:1"), Seq(
      Scrape.RelabelRule(sourceLabels = Seq("__address__"),
        regex = "(.*)", targetLabel = "x", replacement = "$2")))
    assert(out.get.get("x").isEmpty) // empty expansion deletes the label
  }

  test("interval scheduling: a target is scraped only when its interval elapses") {
    val jobs = Scrape.parseScrapeConfigs(config) // node 15s, app 60s
    var fetches = scala.collection.mutable.ArrayBuffer.empty[String]
    def fetch(t: String): String = { fetches += t; "up 1\n" }
    val t0 = 1704067200000L
    // first tick: every never-scraped target is due (host2 is relabel-
    // dropped BEFORE any fetch happens — Prometheus drops at relabel time)
    val (p1, s1) = Scrape.scrapeTick(spark, jobs, fetch, t0)
    p1.count()
    assert(fetches.toSet == Set("host1:9100", "svc:8080"))
    // +20s: only the 15s job re-scrapes
    fetches.clear()
    val (p2, s2) = Scrape.scrapeTick(spark, jobs, fetch, t0 + 20000L, s1)
    p2.count()
    assert(fetches.toSet == Set("host1:9100"))
    // +70s: both jobs due again
    fetches.clear()
    val (p3, _) = Scrape.scrapeTick(spark, jobs, fetch, t0 + 70000L, s2)
    p3.count()
    assert(fetches.toSet == Set("host1:9100", "svc:8080"))
  }

  test("streaming scrape: trigger stream drives interval scheduling into the store") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("scrape_store").toString
    val jobs = Scrape.parseScrapeConfigs(config) // node 15s (host2 dropped), app 60s
    var n = 0
    def fetch(t: String): String = { n += 1; s"up $n\n" }
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("t").writeStream.outputMode("append")
      .foreachBatch(Scrape.scrapeSink(jobs, fetch, dir)).start()
    val t0 = 1704067200000L
    mem.addData(t0)           // both jobs due
    q.processAllAvailable()
    mem.addData(t0 + 20000L)  // only the 15s job
    q.processAllAvailable()
    q.stop()
    val stored = spark.read.parquet(dir)
    // 2 scrapes of host1 (t0, t0+20s) + 1 of svc (t0) = 3 samples
    assert(stored.count() == 3)
    val insts = stored.select(org.apache.spark.sql.functions.element_at(
      org.apache.spark.sql.functions.col("labels"), "instance")).collect().map(_.getString(0))
    assert(insts.count(_ == "host1:9100") == 2)
    assert(insts.count(_ == "svc:8080") == 1)
  }

  test("scheme and scrape_timeout knobs parse per job") {
    val cfg =
      """scrape_configs:
        |  - job_name: secure
        |    scheme: https
        |    scrape_timeout: 5s
        |    static_configs:
        |      - targets: [tls-host:443]
        |  - job_name: plain
        |    static_configs:
        |      - targets: [h:80]
        |""".stripMargin
    val jobs = Scrape.parseScrapeConfigs(cfg)
    assert(jobs.head.scheme == "https" && jobs.head.timeoutMs == 5000L)
    assert(jobs(1).scheme == "http" && jobs(1).timeoutMs == 10000L) // defaults
  }

  test("distributed scrapeJob matches the driver-side job (relabel included)") {
    val jobs = Scrape.parseScrapeConfigs(config)
    val fetch: String => String = _ => "up 1\n" // serializable: captures nothing
    val dist = Scrape.scrapeJob(spark, jobs.head, fetch, tsMs = 1000L, distributed = true)
      .collect().map(_.toString).sorted.toSeq
    val local = Scrape.scrapeJob(spark, jobs.head, fetch, tsMs = 1000L)
      .collect().map(_.toString).sorted.toSeq
    assert(dist == local && dist.nonEmpty)
    // relabel-dropped host2 was never fetched on the executors either
    assert(dist.length == 1)
  }

  test("scrapeSink deployment path: executor-side fetch through the sink") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("scrape_dist").toString
    val jobs = Scrape.parseScrapeConfigs(config)
    val fetch: String => String = t => s"""up{src="$t"} 1\n""" // serializable
    val mem = MemoryStream[Long]
    // distributed = true is the default deployment shape
    val q = mem.toDF().toDF("t").writeStream.outputMode("append")
      .foreachBatch(Scrape.scrapeSink(jobs, fetch, dir)).start()
    mem.addData(1704067200000L)
    q.processAllAvailable()
    q.stop()
    val stored = spark.read.parquet(dir)
    assert(stored.count() == 2) // host1 (host2 relabel-dropped) + svc
    val srcs = stored.select(org.apache.spark.sql.functions.element_at(
      org.apache.spark.sql.functions.col("labels"), "src")).collect().map(_.getString(0)).toSet
    assert(srcs == Set("host1:9100", "svc:8080"))
  }

  test("distributed scrape matches the driver-side variant") {
    // bind the body to a local so the executor-shipped closure captures a
    // String, not the (non-serializable) spec instance
    val b = body
    val fetch: String => String = _ => b
    val dist = Scrape.scrapeTargetsDistributed(spark, Seq("host:9090"), fetch, tsMs = 5000L)
      .collect().map(_.toString).sorted.toSeq
    val local = Scrape.scrapeTargets(spark, Seq("host:9090"), fetch, tsMs = 5000L)
      .collect().map(_.toString).sorted.toSeq
    assert(dist == local && dist.nonEmpty)
  }
}
