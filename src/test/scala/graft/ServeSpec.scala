package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PointsStore

/** The runnable server glue: a live store served end-to-end — and the
  * FRESHNESS property that distinguishes a server from a notebook
  * snapshot: appends (direct or via remote-write ingest) are queryable
  * on the very next request, because the points relation and series
  * dictionary re-resolve per request. */
class ServeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("name", StringType), StructField("labels", MapType(StringType, StringType)),
    StructField("t", LongType), StructField("value", DoubleType)))

  private def pts(rows: (String, Map[String, String], Long, Double)*) =
    graft.model.Points.withSig(spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3, r._4)), 1), schema))

  private def get(port: Int, path: String): String = {
    val enc = path.replace(" ", "%20").replace("[", "%5B").replace("]", "%5D")
    HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$enc")).GET().build(),
      HttpResponse.BodyHandlers.ofString()).body()
  }

  test("serve: live store end-to-end — queries see appends and ingested writes immediately") {
    val dir = java.nio.file.Files.createTempDirectory("serve_store").toString
    PointsStore.append(pts(("up", Map("job" -> "a"), 60000L, 1.0)), dir)
    val handle = Serve.start(spark, Serve.Config(storeDir = dir, port = 0,
      maintenanceMs = 3600000L))
    try {
      // the pre-existing data serves
      assert(get(handle.port, "/api/v1/query?query=up&time=60")
        .contains("\"value\":[60,\"1\"]"))
      // a DIRECT append lands in the next query (provider re-resolves the
      // store; a captured DataFrame would still show the old listing)
      PointsStore.append(pts(("up", Map("job" -> "b"), 60000L, 2.0)), dir)
      assert(get(handle.port, "/api/v1/query?query=sum(up)&time=60")
        .contains("\"value\":[60,\"3\"]"))
      // remote-write ingest through the served receiver, same freshness
      api.RemoteWrite.push(pts(("pushed_total", Map("job" -> "c"), 60000L, 7.0)),
        s"http://127.0.0.1:${handle.port}/api/v1/write")
      assert(get(handle.port, "/api/v1/query?query=pushed_total&time=60")
        .contains("\"value\":[60,\"7\"]"))
      // label surface over the live store
      assert(get(handle.port, "/api/v1/labels").contains("\"job\""))
      // the query guards are wired (an unparsable query 422s, not 500s)
      assert(get(handle.port, "/api/v1/query?query=!!bad&time=60").contains("error"))
    } finally handle.stop()
  }

  test("serve: crash evidence from a previous process is surfaced and cleared") {
    val dir = java.nio.file.Files.createTempDirectory("serve_store2").toString
    PointsStore.append(pts(("up", Map("job" -> "a"), 60000L, 1.0)), dir)
    // plant a leftover admission entry, as a killed process would leave
    val qlog = java.nio.file.Paths.get(dir, "_querylog")
    java.nio.file.Files.createDirectories(qlog)
    java.nio.file.Files.writeString(qlog.resolve("graft-query-9.json"),
      """{"group":"graft-query-9","description":"sum(up)","startedMs":5}""")
    val handle = Serve.start(spark, Serve.Config(storeDir = dir, port = 0,
      maintenanceMs = 3600000L))
    try {
      // cleared on startup (surfaced to stderr), queries run normally
      assert(graft.engine.Guards.readQueryLog(qlog).isEmpty)
      assert(get(handle.port, "/api/v1/query?query=up&time=60").contains("success"))
    } finally { handle.stop(); graft.engine.Guards.disableQueryLog() }
  }
}
