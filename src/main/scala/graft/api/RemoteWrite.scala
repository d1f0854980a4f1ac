package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prometheus remote-write PUSH: forward a points relation to any
  * `remote_write` endpoint — another instance of this engine
  * (`/api/v1/write`), a real Prometheus with the receiver enabled, or a
  * long-term store speaking the protocol.
  *
  * Scale shape: the push runs ON THE EXECUTORS (`foreachPartition`),
  * mirroring the distributed scrape fetch — the driver never materializes
  * a sample. Each partition slices its rows into `maxSamplesPerRequest`
  * chunks, groups each chunk per series, encodes one snappy+protobuf
  * WriteRequest, and POSTs it; N partitions push N streams in parallel,
  * so egress bandwidth scales with the cluster, not the driver NIC. A
  * failed POST throws, letting Spark's task retry re-send the partition —
  * at-least-once delivery that the receiving engine's last-write-wins
  * (sig, t) store semantics make idempotent (the same guarantee its own
  * alerting sink relies on).
  *
  * The reference pushes points to peer nodes over its private gob TCP
  * framing (src/pkg/ingressclient/ingressclient.go:64-82, ≤32 KiB
  * batches); remote write is the public-protocol equivalent of that
  * egress path.
  */
object RemoteWrite {

  /** POST one encoded WriteRequest. Kept in the companion (not a closure)
    * so the executor-side lambda captures only config strings. */
  private def post(url: String, body: Array[Byte], timeoutMs: Int,
                   authHeader: Option[String],
                   tls: Option[graft.sources.Scrape.TlsConfig],
                   contentType: String = "application/x-protobuf",
                   version: String = "0.1.0"): Unit = {
    val conn = new java.net.URL(url).openConnection()
    conn match {
      case https: javax.net.ssl.HttpsURLConnection =>
        tls.map(graft.sources.Scrape.buildSslContext)
          .foreach(c => https.setSSLSocketFactory(c.getSocketFactory))
        if (tls.exists(_.insecureSkipVerify))
          https.setHostnameVerifier((_, _) => true)
      case _ => ()
    }
    val http = conn.asInstanceOf[java.net.HttpURLConnection]
    http.setRequestMethod("POST")
    http.setDoOutput(true)
    http.setConnectTimeout(timeoutMs)
    http.setReadTimeout(timeoutMs)
    http.setRequestProperty("Content-Type", contentType)
    http.setRequestProperty("Content-Encoding", "snappy")
    http.setRequestProperty("X-Prometheus-Remote-Write-Version", version)
    authHeader.foreach(http.setRequestProperty("Authorization", _))
    try {
      val os = http.getOutputStream
      try os.write(body) finally os.close()
      val code = http.getResponseCode
      if (code < 200 || code >= 300) {
        val err = Option(http.getErrorStream)
          .map(s => try new String(s.readAllBytes(), "UTF-8") finally s.close())
          .getOrElse("")
        throw new java.io.IOException(s"remote write failed: HTTP $code $err")
      }
      Option(http.getInputStream).foreach(_.close())
    } finally http.disconnect()
  }

  /** Push `points` (name, labels, t, value — the canonical relation) to
    * `url`. Returns the number of samples pushed (accumulator-counted
    * across executors). */
  def push(points: DataFrame, url: String,
           maxSamplesPerRequest: Int = 10000,
           timeoutMs: Int = 30000,
           auth: Option[graft.sources.Scrape.AuthConfig] = None,
           tls: Option[graft.sources.Scrape.TlsConfig] = None,
           /** "1.0" (prompb.WriteRequest) or "2.0" — the symbol-table
             * io.prometheus.write.v2.Request, negotiated by content
             * type per the remote-write 2.0 spec. Same at-least-once
             * semantics; v2 interns label strings once per request, the
             * wire win at fleet label cardinality. */
           protocol: String = "1.0"): Long = {
    require(protocol == "1.0" || protocol == "2.0", s"protocol $protocol")
    val v2 = protocol == "2.0"
    val sent = points.sparkSession.sparkContext.longAccumulator("remoteWriteSamples")
    val authHeader = auth.flatMap(_.header)
    points
      .select(col("name"), col("labels"), col("t"), col("value"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.grouped(maxSamplesPerRequest).foreach { chunk =>
          val series = chunk
            .map { r =>
              val labels = Option(r.getAs[Map[String, String]]("labels"))
                .getOrElse(Map.empty)
              val full = Option(r.getAs[String]("name"))
                .filter(_.nonEmpty).map(n => labels + ("__name__" -> n))
                .getOrElse(labels)
              (full, r.getAs[Long]("t"), r.getAs[Double]("value"))
            }
            .groupBy(_._1)
            .toSeq
            .map { case (labels, ss) =>
              (labels.toSeq.sortBy(_._1),
                ss.sortBy(_._2).map { case (_, t, v) => (v, t) })
            }
          if (v2)
            post(url, RemoteRead.encodeWriteRequestV2(series), timeoutMs,
              authHeader, tls, RemoteRead.WriteV2ContentType, "2.0.0")
          else
            post(url, RemoteRead.encodeWriteRequest(series), timeoutMs,
              authHeader, tls)
          sent.add(chunk.length)
        }
      }
    sent.value
  }

  /** Streaming egress: a `foreachBatch` sink that remote-writes every
    * micro-batch — plug a rollup or scrape stream's output into another
    * engine/Prometheus (`ds.writeStream.foreachBatch(RemoteWrite.sink(
    * url))`). foreachBatch is at-least-once; a replayed batch re-sends
    * the same (series, t, value) samples, which the receiving engine's
    * last-write-wins store collapses — the same idempotence contract its
    * own alerting sink relies on. */
  def sink(url: String,
           maxSamplesPerRequest: Int = 10000,
           timeoutMs: Int = 30000,
           auth: Option[graft.sources.Scrape.AuthConfig] = None,
           tls: Option[graft.sources.Scrape.TlsConfig] = None)
      : (DataFrame, Long) => Unit =
    (df, _) => { push(df, url, maxSamplesPerRequest, timeoutMs, auth, tls); () }
}
