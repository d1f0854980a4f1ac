package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.promql.{LabelMatcher, MatchOp}

/** Prometheus remote-read endpoint: POST /api/v1/read with a
  * snappy-compressed protobuf ReadRequest, answered with a
  * snappy-compressed ReadResponse in SAMPLES mode — the server half of
  * the protocol the reference both serves (vendored web/api/v1/api.go:392)
  * and consumes for cross-node queries
  * (src/internal/storage/remote_querier.go:82-93). A real Prometheus can
  * federate from this engine with a `remote_read` block.
  *
  * The prompb subset (public protocol, prometheus/prompb/{remote,types}
  * .proto) is hand-encoded — the zero-egress build has no protoc or
  * protobuf-java dependency, and the five message shapes involved are
  * stable varint/length-delimited layouts:
  *
  *   ReadRequest  { repeated Query queries = 1 }
  *   Query        { int64 start_timestamp_ms = 1; int64 end_timestamp_ms = 2;
  *                  repeated LabelMatcher matchers = 3 }
  *   LabelMatcher { Type type = 1 (EQ NEQ RE NRE); string name = 2; string value = 3 }
  *   ReadResponse { repeated QueryResult results = 1 }
  *   QueryResult  { repeated TimeSeries timeseries = 1 }
  *   TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2 }
  *   Label        { string name = 1; string value = 2 }
  *   Sample       { double value = 1; int64 timestamp = 2 }
  *
  * Samples are raw stored points (no PromQL evaluation — the remote
  * CLIENT's engine evaluates), capped at the reference's remote-read
  * sample limit (src/internal/api/prom_api.go:20).
  */
object RemoteRead {

  /** Reference: api/prom_api.go:20 (remote read sample limit). */
  val SampleLimit: Long = 20000000L

  /** Cap on a snappy frame's CLAIMED uncompressed length: the header is
    * attacker-controlled on the unauthenticated write/read endpoints, and
    * `Snappy.uncompress` allocates whatever it claims — a 100-byte crafted
    * body could otherwise force a multi-GB allocation (the reference
    * bounds ingress frames; HttpApi bounds the compressed body the same
    * way). 256 MiB = 4x the 64 MiB compressed cap, beyond any legitimate
    * sender's chunking. */
  val MaxUncompressedBytes: Int = 256 * 1024 * 1024

  /** Snappy decode that validates the claimed uncompressed length BEFORE
    * allocating. Every wire-facing decode path goes through this. */
  private[api] def boundedUncompress(body: Array[Byte]): Array[Byte] = {
    val n = org.xerial.snappy.Snappy.uncompressedLength(body)
    if (n > MaxUncompressedBytes)
      throw new IllegalArgumentException(
        s"snappy frame claims $n uncompressed bytes (cap $MaxUncompressedBytes)")
    org.xerial.snappy.Snappy.uncompress(body)
  }

  final case class Query(startMs: Long, endMs: Long, matchers: Seq[LabelMatcher])

  // ---- serving ----------------------------------------------------------

  /** Decode a snappy+proto ReadRequest body, run each query against the
    * points relation, and return the snappy+proto ReadResponse bytes.
    *
    * The sample limit is enforced BEFORE any driver materialization: a
    * distributed `count()` over the (pushdown-filtered) matching set
    * rejects over-limit reads while the driver has held zero sample rows —
    * the reference enforces the same limit while streaming
    * (src/internal/api/prom_api.go:20). Only an under-limit set (bounded
    * at `sampleLimit` rows) is ever collected for encoding. */
  def handle(spark: SparkSession, points: DataFrame, body: Array[Byte],
             sampleLimit: Long = SampleLimit): Array[Byte] =
    handleRaw(spark, points, boundedUncompress(body), sampleLimit)

  /** [[handle]] over an already-uncompressed body. */
  def handleRaw(spark: SparkSession, points: DataFrame, raw: Array[Byte],
                sampleLimit: Long = SampleLimit): Array[Byte] = {
    val queries = decodeRequest(raw)
    val results = queries.map { q =>
      val filtered = points
        .where(col("t") >= q.startMs && col("t") <= q.endMs)
        .where(graft.engine.Compiler.matcherFilter(q.matchers))
      // name-equality matchers additionally push down on the name column
      val named = q.matchers.collectFirst {
        case LabelMatcher("__name__", MatchOp.Eq, v) => v
      } match {
        case Some(n) => filtered.where(col("name") === n)
        case None => filtered
      }
      // persisted across the limit count and the collect: ONE scan of the
      // matching set per query, not two — the count materializes the
      // (pushdown-filtered) blocks into executor storage and the collect
      // reads them back, so the reject path still holds zero sample rows
      // on the driver while the accept path pays the scan once
      val slim = named.select(col("name"), col("labels"), col("t"), col("value"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rows = try {
        // executor-side count: no sample reaches the driver on the reject path
        if (slim.count() > sampleLimit)
          throw new IllegalStateException("remote read exceeds sample limit")
        slim.collect()
      } finally slim.unpersist(blocking = false)
      // one TimeSeries per (name, labels), samples time-ordered
      rows.groupBy(r => (Option(r.getAs[String]("name")),
          r.getAs[Map[String, String]]("labels")))
        .toSeq.sortBy(_._1.toString)
        .map { case ((name, labels), rs) =>
          val full = name.filter(_.nonEmpty).map(n => Map("__name__" -> n))
            .getOrElse(Map.empty) ++ Option(labels).getOrElse(Map.empty)
          (full.toSeq.sortBy(_._1),
            rs.sortBy(_.getAs[Long]("t"))
              .map(r => (r.getAs[Double]("value"), r.getAs[Long]("t"))).toSeq)
        }
    }
    org.xerial.snappy.Snappy.compress(encodeResponse(results))
  }

  // ---- streamed serving (STREAMED_XOR_CHUNKS) ---------------------------

  /** prompb ReadRequest.ResponseType values. */
  val ResponseTypeSamples: Int = 0
  val ResponseTypeStreamedXorChunks: Int = 1

  /** The ResponseTypes a ReadRequest accepts (prompb field 3; handles both
    * packed — the proto3 default — and unpacked encodings). */
  private[api] def acceptedTypes(raw: Array[Byte]): Set[Long] = {
    val r = new Reader(raw, 0, raw.length)
    val types = Set.newBuilder[Long]
    while (r.hasNext) {
      val (field, wire) = r.tag()
      (field, wire) match {
        case (3, 0) => types += r.varint()
        case (3, 2) =>
          val (s, e) = r.lenDelimited()
          val pr = new Reader(raw, s, e)
          while (pr.hasNext) types += pr.varint()
        case _ => r.skip(wire)
      }
    }
    types.result()
  }

  /** True when the (snappy-compressed) ReadRequest negotiates the
    * streamed-chunks response — throws on a malformed body, so callers can
    * still answer 4xx before committing response headers. */
  def wantsStreamed(body: Array[Byte]): Boolean =
    wantsStreamedRaw(boundedUncompress(body))

  /** [[wantsStreamed]] over an ALREADY-uncompressed body — lets the HTTP
    * handler decompress once instead of once per question asked. */
  def wantsStreamedRaw(raw: Array[Byte]): Boolean =
    acceptedTypes(raw).contains(ResponseTypeStreamedXorChunks.toLong)

  /** Public bounded decompression (claimed-length-capped) for callers
    * that coordinate several passes over one request body. */
  def uncompress(body: Array[Byte]): Array[Byte] = boundedUncompress(body)

  /** Serve a remote read in STREAMED_XOR_CHUNKS mode — the protocol's
    * paged response (prompb.ChunkedReadResponse frames, each a
    * uvarint-length + CRC32C + message record; Prometheus
    * storage/remote/chunked.go) with samples Gorilla-XOR-encoded per
    * chunk ([[XorChunk]]).
    *
    * Scale shape: this path never materializes a result set. The matching
    * points are globally sorted (sig, t) executor-side and consumed with
    * `toLocalIterator` — the driver holds one partition fetch, the
    * current chunk (≤ samplesPerChunk samples) and one frame buffer
    * (≤ maxFrameBytes) at a time, so a federated bulk read is bounded by
    * the frame budget instead of the SAMPLES-mode sample limit. A series
    * larger than the frame budget is split across frames (allowed by the
    * protocol; clients concatenate by label set). */
  def handleStreamed(spark: SparkSession, points: DataFrame, body: Array[Byte],
                     out: java.io.OutputStream,
                     maxFrameBytes: Int = 1 << 20,
                     samplesPerChunk: Int = XorChunk.SamplesPerChunk): Unit =
    handleStreamedRaw(spark, points, boundedUncompress(body), out,
      maxFrameBytes, samplesPerChunk)

  /** [[handleStreamed]] over an already-uncompressed body. */
  def handleStreamedRaw(spark: SparkSession, points: DataFrame, raw: Array[Byte],
                        out: java.io.OutputStream,
                        maxFrameBytes: Int = 1 << 20,
                        samplesPerChunk: Int = XorChunk.SamplesPerChunk,
                        onReady: () => Unit = () => ()): Unit = {
    val queries = decodeRequest(raw)
    // build and ANALYZE every query's plan before `onReady` (which the
    // HTTP handler uses to commit the 200): a matcher/compile error after
    // headers would otherwise end the chunked stream cleanly at a frame
    // boundary — indistinguishable from "no matching series"
    val planned = queries.zipWithIndex.map { case (q, qi) =>
      val filtered = points
        .where(col("t") >= q.startMs && col("t") <= q.endMs)
        .where(graft.engine.Compiler.matcherFilter(q.matchers))
      val named = q.matchers.collectFirst {
        case LabelMatcher("__name__", MatchOp.Eq, v) => v
      } match {
        case Some(n) => filtered.where(col("name") === n)
        case None => filtered
      }
      val sorted = graft.model.Points
        .withSig(named.select(col("name"), col("labels"), col("t"), col("value")))
        .select(col("sig"), col("name"), col("labels"), col("t"), col("value"))
        .sort(col("sig"), col("t"))
      sorted.queryExecution.executedPlan // force analysis + physical planning
      (sorted, qi)
    }
    onReady()
    planned.foreach { case (sorted, qi) =>
      val frame = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var frameBytes = 0
      def flushFrame(): Unit = if (frame.nonEmpty) {
        val w = new Writer
        frame.foreach(cs => w.bytesField(1, cs))
        w.int64(2, qi.toLong)
        XorChunk.writeFrame(out, w.bytes)
        out.flush()
        frame.clear(); frameBytes = 0
      }

      var curSig = 0L
      var curHas = false
      var curLabels: Seq[(String, String)] = Nil
      val samples = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      val chunks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Array[Byte])]
      var chunkBytes = 0

      def emitSeries(): Unit = if (chunks.nonEmpty) {
        val cs = encodeChunkedSeries(curLabels, chunks.toSeq)
        frame += cs; frameBytes += cs.length
        chunks.clear(); chunkBytes = 0
        if (frameBytes >= maxFrameBytes) flushFrame()
      }
      def sealChunk(): Unit = if (samples.nonEmpty) {
        val data = XorChunk.encode(samples.toSeq)
        chunks += ((samples.head._1, samples.last._1, data))
        chunkBytes += data.length
        samples.clear()
        if (chunkBytes >= maxFrameBytes) emitSeries() // split long series
      }

      val it = sorted.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        val sig = r.getAs[Long]("sig")
        if (!curHas || sig != curSig) {
          sealChunk(); emitSeries()
          curSig = sig; curHas = true
          val name = Option(r.getAs[String]("name")).filter(_.nonEmpty)
          val rest = Option(r.getAs[Map[String, String]]("labels"))
            .getOrElse(Map.empty[String, String])
          curLabels = (name.map(n => Map("__name__" -> n)).getOrElse(Map.empty) ++ rest)
            .toSeq.sortBy(_._1)
        }
        samples += ((r.getAs[Long]("t"), r.getAs[Double]("value")))
        if (samples.length >= samplesPerChunk) sealChunk()
      }
      sealChunk(); emitSeries(); flushFrame()
    }
  }

  /** prompb.ChunkedSeries body: labels (field 1) + XOR chunks (field 2,
    * each Chunk{min_time,max_time,type=XOR(1),data}). */
  private def encodeChunkedSeries(labels: Seq[(String, String)],
                                  chunks: Seq[(Long, Long, Array[Byte])]): Array[Byte] = {
    val w = new Writer
    labels.foreach { case (k, v) =>
      w.message(1) { l => l.str(1, k); l.str(2, v) }
    }
    chunks.foreach { case (minT, maxT, data) =>
      w.message(2) { c =>
        c.int64(1, minT)
        c.int64(2, maxT)
        c.int64(3, 1L) // Chunk.Encoding XOR
        c.bytesField(4, data)
      }
    }
    w.bytes
  }

  /** Client-side decode of a full streamed response body: per query index,
    * series in first-appearance order with chunk samples concatenated
    * (a series split across frames/entries is merged by label set). */
  def decodeChunkedResponse(in: java.io.InputStream)
      : Map[Long, Seq[(Map[String, String], Seq[(Double, Long)])]] = {
    import scala.collection.mutable
    val perQuery = mutable.LinkedHashMap
      .empty[Long, mutable.LinkedHashMap[Map[String, String], mutable.ArrayBuffer[(Double, Long)]]]
    XorChunk.readFrames(in).foreach { payload =>
      val r = new Reader(payload, 0, payload.length)
      var qi = 0L
      val series = mutable.ArrayBuffer.empty[(Map[String, String], Seq[(Double, Long)])]
      while (r.hasNext) {
        val (field, wire) = r.tag()
        (field, wire) match {
          case (1, 2) =>
            val (s, e) = r.lenDelimited()
            series += decodeChunkedSeriesMsg(payload, s, e)
          case (2, 0) => qi = r.varint()
          case _ => r.skip(wire)
        }
      }
      val bucket = perQuery.getOrElseUpdate(qi, mutable.LinkedHashMap.empty)
      series.foreach { case (labels, samples) =>
        bucket.getOrElseUpdate(labels, mutable.ArrayBuffer.empty) ++= samples
      }
    }
    perQuery.map { case (qi, m) =>
      qi -> m.map { case (l, s) => (l, s.toSeq) }.toSeq
    }.toMap
  }

  private def decodeChunkedSeriesMsg(buf: Array[Byte], from: Int, to: Int)
      : (Map[String, String], Seq[(Double, Long)]) = {
    val r = new Reader(buf, from, to)
    val labels = Map.newBuilder[String, String]
    val samples = Seq.newBuilder[(Double, Long)]
    while (r.hasNext) {
      val (field, wire) = r.tag()
      (field, wire) match {
        case (1, 2) =>
          val (s, e) = r.lenDelimited()
          val lr = new Reader(buf, s, e)
          var k = ""; var v = ""
          while (lr.hasNext) {
            val (f2, w2) = lr.tag()
            (f2, w2) match {
              case (1, 2) => k = lr.str()
              case (2, 2) => v = lr.str()
              case _ => lr.skip(w2)
            }
          }
          labels += (k -> v)
        case (2, 2) =>
          val (s, e) = r.lenDelimited()
          val cr = new Reader(buf, s, e)
          var enc = 0L
          var data: Array[Byte] = Array.emptyByteArray
          while (cr.hasNext) {
            val (f2, w2) = cr.tag()
            (f2, w2) match {
              case (3, 0) => enc = cr.varint()
              case (4, 2) =>
                val (ds, de) = cr.lenDelimited()
                data = java.util.Arrays.copyOfRange(buf, ds, de)
              case _ => cr.skip(w2)
            }
          }
          if (enc != 1L)
            throw new IllegalArgumentException(s"unsupported chunk encoding $enc")
          XorChunk.decode(data).foreach { case (t, v) => samples += ((v, t)) }
        case _ => r.skip(wire)
      }
    }
    (labels.result(), samples.result())
  }

  // ---- protobuf wire helpers --------------------------------------------

  private[api] final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def bytes: Array[Byte] = out.toByteArray
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def int64(field: Int, v: Long): Unit =
      if (v != 0) { tag(field, 0); varint(v) } // proto3 default elision
    def double(field: Int, v: Double): Unit =
      fixed64(field, java.lang.Double.doubleToRawLongBits(v))
    def fixed64(field: Int, bits: Long): Unit = {
      tag(field, 1)
      var i = 0
      while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    /** Raw little-endian fixed64 payload bytes (for packed repeated). */
    def rawFixed64(bits: Long): Unit = {
      var i = 0
      while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def str(field: Int, s: String): Unit = {
      val b = s.getBytes("UTF-8")
      tag(field, 2); varint(b.length); out.write(b, 0, b.length)
    }
    def message(field: Int)(body: Writer => Unit): Unit = {
      val w = new Writer
      body(w)
      val b = w.bytes
      tag(field, 2); varint(b.length); out.write(b, 0, b.length)
    }
    /** Pre-encoded submessage / bytes field. */
    def bytesField(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length); out.write(b, 0, b.length)
    }
    /** doubles must always be written (field presence carries the sample),
      * including 0.0/NaN. */
    def sampleMsg(field: Int, value: Double, tMs: Long): Unit =
      message(field) { w => w.double(1, value); w.int64(2, tMs) }
  }

  private[api] final class Reader(buf: Array[Byte], from: Int, to: Int) {
    private var pos = from
    def hasNext: Boolean = pos < to
    def varint(): Long = {
      var shift = 0; var res = 0L
      var b = 0
      do {
        b = buf(pos) & 0xff; pos += 1
        res |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      res
    }
    def fixed64(): Long = {
      var res = 0L
      var i = 0
      while (i < 8) { res |= (buf(pos) & 0xffL) << (8 * i); pos += 1; i += 1 }
      res
    }
    def double(): Double = java.lang.Double.longBitsToDouble(fixed64())
    /** Returns (field, wire). */
    def tag(): (Int, Int) = { val t = varint(); ((t >>> 3).toInt, (t & 7).toInt) }
    def lenDelimited(): (Int, Int) = {
      val len = varint().toInt
      val start = pos
      pos += len
      (start, start + len)
    }
    def str(): String = { val (s, e) = lenDelimited(); new String(buf, s, e - s, "UTF-8") }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => lenDelimited()
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"unsupported wire type $other")
    }
  }

  // ---- prompb decode (request) ------------------------------------------

  private[api] def decodeRequest(raw: Array[Byte]): Seq[Query] = {
    val r = new Reader(raw, 0, raw.length)
    val queries = Seq.newBuilder[Query]
    while (r.hasNext) {
      val (field, wire) = r.tag()
      if (field == 1 && wire == 2) {
        val (s, e) = r.lenDelimited()
        queries += decodeQuery(raw, s, e)
      } else r.skip(wire)
    }
    queries.result()
  }

  private def decodeQuery(buf: Array[Byte], from: Int, to: Int): Query = {
    val r = new Reader(buf, from, to)
    var start = 0L
    var end = 0L
    val ms = Seq.newBuilder[LabelMatcher]
    while (r.hasNext) {
      val (field, wire) = r.tag()
      (field, wire) match {
        case (1, 0) => start = r.varint()
        case (2, 0) => end = r.varint()
        case (3, 2) =>
          val (s, e) = r.lenDelimited()
          ms += decodeMatcher(buf, s, e)
        case _ => r.skip(wire)
      }
    }
    Query(start, end, ms.result())
  }

  private def decodeMatcher(buf: Array[Byte], from: Int, to: Int): LabelMatcher = {
    val r = new Reader(buf, from, to)
    var tpe = 0L
    var name = ""
    var value = ""
    while (r.hasNext) {
      val (field, wire) = r.tag()
      (field, wire) match {
        case (1, 0) => tpe = r.varint()
        case (2, 2) => name = r.str()
        case (3, 2) => value = r.str()
        case _ => r.skip(wire)
      }
    }
    val op = tpe match {
      case 0 => MatchOp.Eq
      case 1 => MatchOp.NotEq
      case 2 => MatchOp.Re
      case 3 => MatchOp.NotRe
      case other => throw new IllegalArgumentException(s"unknown matcher type $other")
    }
    LabelMatcher(name, op, value)
  }

  // ---- prompb encode (response + client-side request) -------------------

  private def encodeResponse(
      results: Seq[Seq[(Seq[(String, String)], Seq[(Double, Long)])]]): Array[Byte] = {
    val w = new Writer
    results.foreach { series =>
      w.message(1) { qr => // QueryResult
        series.foreach { case (labels, samples) =>
          qr.message(1) { ts => // TimeSeries
            labels.foreach { case (k, v) =>
              ts.message(1) { l => l.str(1, k); l.str(2, v) }
            }
            samples.foreach { case (v, t) => ts.sampleMsg(2, v, t) }
          }
        }
      }
    }
    w.bytes
  }

  /** Client-side encoder (and the spec's request builder): a ReadRequest
    * for one query. `accepted` lists the ResponseTypes the caller can
    * consume (prompb field 3, packed varints) — empty means the proto3
    * default, SAMPLES only. */
  def encodeRequest(q: Query, accepted: Seq[Int] = Nil): Array[Byte] = {
    val w = new Writer
    w.message(1) { qw =>
      qw.int64(1, q.startMs)
      qw.int64(2, q.endMs)
      q.matchers.foreach { m =>
        qw.message(3) { mw =>
          mw.int64(1, m.op match {
            case MatchOp.Eq => 0L
            case MatchOp.NotEq => 1L
            case MatchOp.Re => 2L
            case MatchOp.NotRe => 3L
          })
          mw.str(2, m.name)
          mw.str(3, m.value)
        }
      }
    }
    if (accepted.nonEmpty) {
      val pw = new Writer
      accepted.foreach(t => pw.varint(t.toLong))
      w.bytesField(3, pw.bytes) // packed repeated enum (proto3 default)
    }
    org.xerial.snappy.Snappy.compress(w.bytes)
  }

  // ---- consuming client -------------------------------------------------

  /** Remote-read CLIENT — the reference's consuming side
    * (src/internal/storage/remote_querier.go:82-93): POST a query to a
    * Prometheus-compatible `remote_read` endpoint and surface the
    * returned series as a points relation (`name, labels, t, value` +
    * sig) that [[graft.engine.Engine]] evaluates over like any stored
    * relation — this engine can federate FROM a real Prometheus, or
    * from another instance of itself (loopback-tested in HttpApiSpec).
    * TLS and auth reuse the scrape connector's config machinery.
    *
    * Scale shape: the response is one HTTP stream bounded by the
    * server's sample limit (the reference's 20e6), materialized on the
    * driver and parallelized — remote read is a federation/backfill
    * path, not a bulk-scan path, exactly as in the reference (its
    * querier also materializes the remote response per query). */
  final case class Client(
      url: String,
      timeoutMs: Long = 30000L,
      auth: Option[graft.sources.Scrape.AuthConfig] = None,
      tls: Option[graft.sources.Scrape.TlsConfig] = None) {

    /** Raw protocol round-trip: one Query, decoded series. With
      * `streamed`, negotiates STREAMED_XOR_CHUNKS and decodes the chunked
      * frames directly off the response stream (falling back to SAMPLES
      * decode when the server answers in SAMPLES mode — negotiation is
      * advisory, exactly as in the Prometheus client). */
    def fetch(q: Query, streamed: Boolean = false)
        : Seq[(Map[String, String], Seq[(Double, Long)])] = {
      val body =
        if (streamed)
          encodeRequest(q, Seq(ResponseTypeStreamedXorChunks, ResponseTypeSamples))
        else encodeRequest(q)
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
      http.setConnectTimeout(timeoutMs.toInt)
      http.setReadTimeout(timeoutMs.toInt)
      http.setRequestProperty("Content-Type", "application/x-protobuf")
      http.setRequestProperty("Content-Encoding", "snappy")
      http.setRequestProperty("Accept-Encoding", "snappy")
      http.setRequestProperty("X-Prometheus-Remote-Read-Version", "0.1.0")
      auth.flatMap(_.header).foreach(http.setRequestProperty("Authorization", _))
      val os = http.getOutputStream
      try os.write(body) finally os.close()
      if (http.getResponseCode != 200) {
        val err = Option(http.getErrorStream)
          .map(s => try new String(s.readAllBytes(), "UTF-8") finally s.close())
          .getOrElse("")
        throw new java.io.IOException(
          s"remote read failed: HTTP ${http.getResponseCode} $err")
      }
      val in = http.getInputStream
      try {
        val ctype = Option(http.getContentType).getOrElse("")
        if (ctype.contains("x-streamed-protobuf"))
          decodeChunkedResponse(in).getOrElse(0L, Nil)
        else decodeResponse(in.readAllBytes()).headOption.getOrElse(Nil)
      } finally { in.close(); http.disconnect() }
    }

    /** The remote series as a canonical points relation — feed to
      * [[graft.engine.Engine]] or append to a [[graft.sources
      * .PointsStore]]. `__name__` becomes the name column; remaining
      * labels the map. */
    def read(spark: SparkSession, startMs: Long, endMs: Long,
             matchers: Seq[LabelMatcher], streamed: Boolean = false): DataFrame = {
      import spark.implicits._
      val rows = fetch(Query(startMs, endMs, matchers), streamed).flatMap {
        case (labels, samples) =>
          val name = labels.getOrElse("__name__", null)
          val rest = labels - "__name__"
          samples.map { case (v, t) => (name, rest, t, v) }
      }
      graft.model.Points.withSig(rows.toDF("name", "labels", "t", "value"))
    }
  }

  // ---- remote WRITE (receiving side) ------------------------------------

  /** Decode a snappy+protobuf prompb WriteRequest (field 1: repeated
    * TimeSeries — the same TimeSeries message the read response carries)
    * into (labels, samples) series. This is the RECEIVING half of
    * Prometheus `remote_write`: a real Prometheus (or another instance of
    * this engine) can push samples into the store over the standard wire
    * protocol — the Spark-first equivalent of the reference's TCP ingress
    * listener (src/internal/metric-store/metric_store.go:441-508), whose
    * gob framing is private to its Go peers. */
  def decodeWriteRequest(body: Array[Byte])
      : Seq[(Map[String, String], Seq[(Double, Long)])] =
    decodeWriteRequestEx(body).map { case (l, s, _) => (l, s) }

  /** One remote-write exemplar on the wire: (exemplar labels, value,
    * timestamp ms) — prompb.Exemplar (labels=1, value=2, timestamp=3). */
  type WireExemplar = (Seq[(String, String)], Double, Long)

  /** [[decodeWriteRequest]] keeping each series' exemplars — RW 1.0/2.0
    * payloads carry them (prompb.TimeSeries.exemplars; Prometheus sends
    * them when `send_exemplars` is on), and the receiver feeds
    * /api/v1/query_exemplars' ring so remote-written series are not
    * blind there. */
  def decodeWriteRequestEx(body: Array[Byte])
      : Seq[(Map[String, String], Seq[(Double, Long)], Seq[WireExemplar])] =
    decodeWriteRequestFull(body)._1

  /** ONE decompression + ONE pass over a v1 WriteRequest: the series
    * (field 1, with exemplars) and the request-level metadata entries
    * (field 3) together — the receiver's hot path must not inflate a
    * 64 MB body twice. */
  def decodeWriteRequestFull(body: Array[Byte])
      : (Seq[(Map[String, String], Seq[(Double, Long)], Seq[WireExemplar])],
         Seq[(String, (String, String, String))]) = {
    val raw = boundedUncompress(body)
    val r = new Reader(raw, 0, raw.length)
    val series = Seq.newBuilder[(Map[String, String], Seq[(Double, Long)], Seq[WireExemplar])]
    val meta = Seq.newBuilder[(String, (String, String, String))]
    while (r.hasNext) {
      val (field, wire) = r.tag()
      (field, wire) match {
        case (1, 2) =>
          val (s, e) = r.lenDelimited()
          series += decodeTimeSeriesEx(raw, s, e)
        case (3, 2) =>
          val (s, e) = r.lenDelimited()
          decodeMetricMetadata(raw, s, e).foreach(meta += _)
        case _ => r.skip(wire)
      }
    }
    (series.result(), meta.result())
  }

  private def decodeMetricMetadata(buf: Array[Byte], from: Int, to: Int)
      : Option[(String, (String, String, String))] = {
    val mr = new Reader(buf, from, to)
    var typ = 0; var metric = ""; var help = ""; var unit = ""
    while (mr.hasNext) {
      val (f2, w2) = mr.tag()
      (f2, w2) match {
        case (1, 0) => typ = mr.varint().toInt
        case (2, 2) => metric = mr.str()
        case (4, 2) => help = mr.str()
        case (5, 2) => unit = mr.str()
        case _ => mr.skip(w2)
      }
    }
    if (metric.isEmpty) None
    else Some(metric -> ((metricTypeName(typ), help, unit)))
  }

  /** Sending-side WriteRequest encoder (and the spec's request builder):
    * the engine can also PUSH to any remote-write endpoint. */
  def encodeWriteRequest(
      series: Seq[(Seq[(String, String)], Seq[(Double, Long)])]): Array[Byte] =
    encodeWriteRequestEx(series.map { case (l, s) => (l, s, Nil) })

  /** prompb MetricMetadata.MetricType names, enum-ordered
    * (types.proto:23-32). */
  private val MetricTypeNames = Array("unknown", "counter", "gauge",
    "histogram", "gaugehistogram", "summary", "info", "stateset")
  private def metricTypeName(i: Int): String =
    if (i >= 0 && i < MetricTypeNames.length) MetricTypeNames(i) else "unknown"
  private def metricTypeEnum(name: String): Int =
    math.max(MetricTypeNames.indexOf(name), 0)

  /** The request-level metadata entries of a prompb WriteRequest
    * (remote.proto:27 — field 3, MetricMetadata { type=1,
    * metric_family_name=2, help=4, unit=5 }): (metric, (type, help,
    * unit)). Prometheus sends these with `send_metadata`; the receiver
    * feeds /api/v1/metadata so remote-written metrics answer there like
    * scraped ones. */
  def decodeWriteRequestMetadata(body: Array[Byte])
      : Seq[(String, (String, String, String))] =
    decodeWriteRequestFull(body)._2

  /** Sending-side metadata encoder (appends WriteRequest.metadata
    * entries to an encoded-and-snappy'd request is not possible, so this
    * builds the whole request): series plus (metric, type, help, unit)
    * family metadata. */
  def encodeWriteRequestWithMetadata(
      series: Seq[(Seq[(String, String)], Seq[(Double, Long)], Seq[WireExemplar])],
      metadata: Seq[(String, String, String, String)]): Array[Byte] = {
    val raw = org.xerial.snappy.Snappy.uncompress(encodeWriteRequestEx(series))
    val w = new Writer
    // append metadata fields after the timeseries bytes (proto decoders
    // accept any field order; reuse the series encoding verbatim)
    metadata.foreach { case (metric, typ, help, unit) =>
      w.message(3) { m =>
        m.int64(1, metricTypeEnum(typ).toLong)
        m.str(2, metric)
        if (help.nonEmpty) m.str(4, help)
        if (unit.nonEmpty) m.str(5, unit)
      }
    }
    org.xerial.snappy.Snappy.compress(raw ++ w.bytes)
  }

  /** [[encodeWriteRequest]] carrying exemplars per series (prompb
    * TimeSeries.exemplars = 3) — what Prometheus sends with
    * `send_exemplars: true`. */
  def encodeWriteRequestEx(
      series: Seq[(Seq[(String, String)], Seq[(Double, Long)], Seq[WireExemplar])])
      : Array[Byte] = {
    val w = new Writer
    series.foreach { case (labels, samples, exemplars) =>
      w.message(1) { ts =>
        labels.foreach { case (k, v) =>
          ts.message(1) { l => l.str(1, k); l.str(2, v) }
        }
        samples.foreach { case (v, t) => ts.sampleMsg(2, v, t) }
        exemplars.foreach { case (exLabels, v, t) =>
          ts.message(3) { e =>
            exLabels.foreach { case (k, lv) =>
              e.message(1) { l => l.str(1, k); l.str(2, lv) }
            }
            e.double(2, v)
            e.int64(3, t)
          }
        }
      }
    }
    org.xerial.snappy.Snappy.compress(w.bytes)
  }

  // ---- Remote-Write 2.0 (io.prometheus.write.v2.Request) ---------------
  // the symbol-table revision of the push protocol (Prometheus
  // remote-write 2.0 spec): label strings are interned once in
  // `symbols` (field 4, symbols[0] REQUIRED empty) and every series
  // carries packed uint32 ref PAIRS (field 1) into it — on a fleet the
  // wire savings are the point, label keys/values repeat massively.
  // Histograms/exemplars/metadata fields are skipped on decode (the
  // store is float-samples, matching the reference's appender).

  /** Decode a snappy+protobuf v2 Request into (labels, samples) series —
    * the same shape the v1 decoder yields, so the sink path is shared. */
  def decodeWriteRequestV2(body: Array[Byte])
      : Seq[(Map[String, String], Seq[(Double, Long)])] =
    decodeWriteRequestV2Ex(body).map { case (l, s, _) => (l, s) }

  /** [[decodeWriteRequestV2]] keeping each series' exemplars (v2
    * TimeSeries.exemplars = 4; exemplar labels are symbol refs like the
    * series labels). */
  def decodeWriteRequestV2Ex(body: Array[Byte])
      : Seq[(Map[String, String], Seq[(Double, Long)], Seq[WireExemplar])] =
    decodeWriteRequestV2Full(body).map(s => (s.labels, s.samples, s.exemplars))

  /** One fully-decoded v2 series: labels, samples, exemplars, and the
    * per-series family metadata (type, help, unit) when present. */
  final case class WriteSeriesV2(labels: Map[String, String],
                                 samples: Seq[(Double, Long)],
                                 exemplars: Seq[WireExemplar],
                                 metadata: Option[(String, String, String)])

  /** Full v2 decode including TimeSeries.metadata (field 5 — Metadata
    * { type=1 enum, help_ref=3, unit_ref=4 }, refs into the request's
    * symbol table; the RW 2.0 spec makes metadata per-series rather
    * than v1's request-level list). */
  def decodeWriteRequestV2Full(body: Array[Byte]): Seq[WriteSeriesV2] = {
    val raw = boundedUncompress(body)
    val r = new Reader(raw, 0, raw.length)
    val symbols = Seq.newBuilder[String]
    val tsSpans = Seq.newBuilder[(Int, Int)]
    while (r.hasNext) {
      val (field, wire) = r.tag()
      (field, wire) match {
        case (4, 2) => symbols += r.str()
        case (5, 2) => tsSpans += r.lenDelimited()
        case _ => r.skip(wire)
      }
    }
    val sym = symbols.result().toIndexedSeq
    require(sym.nonEmpty && sym.head.isEmpty,
      "remote write 2.0: symbols[0] must be the empty string")
    def refPairs(rs: Seq[Int], what: String): Seq[(String, String)] = {
      require(rs.length % 2 == 0, s"remote write 2.0: odd $what count")
      rs.grouped(2).map { case Seq(k, v) => sym(k) -> sym(v) }.toSeq
    }
    tsSpans.result().map { case (s, e) =>
      val tr = new Reader(raw, s, e)
      val refs = Seq.newBuilder[Int]
      val samples = Seq.newBuilder[(Double, Long)]
      val exemplars = Seq.newBuilder[WireExemplar]
      var metadata: Option[(String, String, String)] = None
      while (tr.hasNext) {
        val (f, w) = tr.tag()
        (f, w) match {
          case (5, 2) => // Metadata { type=1, help_ref=3, unit_ref=4 }
            val (ms, me) = tr.lenDelimited()
            val mr = new Reader(raw, ms, me)
            var typ = 0; var helpRef = 0; var unitRef = 0
            while (mr.hasNext) {
              val (mf, mw) = mr.tag()
              (mf, mw) match {
                case (1, 0) => typ = mr.varint().toInt
                case (3, 0) => helpRef = mr.varint().toInt
                case (4, 0) => unitRef = mr.varint().toInt
                case _ => mr.skip(mw)
              }
            }
            metadata = Some((metricTypeName(typ), sym(helpRef), sym(unitRef)))
          case (1, 2) => // packed label refs
            val (ps, pe) = tr.lenDelimited()
            val pr = new Reader(raw, ps, pe)
            while (pr.hasNext) refs += pr.varint().toInt
          case (1, 0) => refs += tr.varint().toInt // unpacked tolerance
          case (2, 2) =>
            val (ss, se) = tr.lenDelimited()
            val sr = new Reader(raw, ss, se)
            var v = 0.0; var t = 0L
            while (sr.hasNext) {
              val (sf, sw) = sr.tag()
              (sf, sw) match {
                case (1, 1) => v = java.lang.Double.longBitsToDouble(sr.fixed64())
                case (2, 0) => t = sr.varint()
                case _ => sr.skip(sw)
              }
            }
            samples += ((v, t))
          case (4, 2) => // v2 Exemplar { labels_refs=1 packed, value=2, timestamp=3 }
            val (es, ee) = tr.lenDelimited()
            val er = new Reader(raw, es, ee)
            val exRefs = Seq.newBuilder[Int]
            var v = 0.0; var t = 0L
            while (er.hasNext) {
              val (ef, ew) = er.tag()
              (ef, ew) match {
                case (1, 2) =>
                  val (ps, pe) = er.lenDelimited()
                  val pr = new Reader(raw, ps, pe)
                  while (pr.hasNext) exRefs += pr.varint().toInt
                case (1, 0) => exRefs += er.varint().toInt
                case (2, 1) => v = java.lang.Double.longBitsToDouble(er.fixed64())
                case (3, 0) => t = er.varint()
                case _ => er.skip(ew)
              }
            }
            exemplars += ((refPairs(exRefs.result(), "exemplar labels_refs"), v, t))
          case _ => tr.skip(w)
        }
      }
      val labels = refPairs(refs.result(), "labels_refs").toMap
      WriteSeriesV2(labels, samples.result(), exemplars.result(), metadata)
    }
  }

  /** Sending-side v2 encoder: builds the symbol table (deterministic
    * first-use order, symbols[0] = ""), packs label refs. */
  def encodeWriteRequestV2(
      series: Seq[(Seq[(String, String)], Seq[(Double, Long)])]): Array[Byte] =
    encodeWriteRequestV2Ex(series.map { case (l, s) => (l, s, Nil) })

  /** [[encodeWriteRequestV2]] carrying exemplars per series (exemplar
    * labels interned in the same symbol table). */
  def encodeWriteRequestV2Ex(
      series: Seq[(Seq[(String, String)], Seq[(Double, Long)], Seq[WireExemplar])])
      : Array[Byte] =
    encodeWriteRequestV2Full(series.map { case (l, s, x) => (l, s, x, None) })

  /** Full v2 encoder: exemplars plus optional per-series (type, help,
    * unit) metadata, help/unit interned in the shared symbol table. */
  def encodeWriteRequestV2Full(
      series: Seq[(Seq[(String, String)], Seq[(Double, Long)], Seq[WireExemplar],
        Option[(String, String, String)])]): Array[Byte] = {
    val index = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def ref(s: String): Int = index.getOrElseUpdate(s, index.size)
    // intern in order BEFORE writing (symbols field precedes timeseries
    // in our layout; proto decoders accept any field order)
    val refd = series.map { case (labels, samples, exemplars, meta) =>
      (labels.flatMap { case (k, v) => Seq(ref(k), ref(v)) }, samples,
        exemplars.map { case (exLabels, v, t) =>
          (exLabels.flatMap { case (k, lv) => Seq(ref(k), ref(lv)) }, v, t)
        },
        meta.map { case (typ, help, unit) =>
          (metricTypeEnum(typ), ref(help), ref(unit))
        })
    }
    val w = new Writer
    // Writer.str writes unconditionally (length-0 payload), so the
    // required empty symbols[0] lands on the wire
    index.keys.foreach(w.str(4, _))
    refd.foreach { case (refs, samples, exemplars, meta) =>
      w.message(5) { ts =>
        val pw = new Writer
        refs.foreach(r0 => pw.varint(r0.toLong))
        ts.bytesField(1, pw.bytes)
        samples.foreach { case (v, t) => ts.sampleMsg(2, v, t) }
        exemplars.foreach { case (exRefs, v, t) =>
          ts.message(4) { e =>
            val epw = new Writer
            exRefs.foreach(r0 => epw.varint(r0.toLong))
            e.bytesField(1, epw.bytes)
            e.double(2, v)
            e.int64(3, t)
          }
        }
        meta.foreach { case (typ, helpRef, unitRef) =>
          ts.message(5) { m =>
            m.int64(1, typ.toLong)
            m.int64(3, helpRef.toLong)
            m.int64(4, unitRef.toLong)
          }
        }
      }
    }
    org.xerial.snappy.Snappy.compress(w.bytes)
  }

  /** The v2 content type (the spec's negotiation key). */
  val WriteV2ContentType = "application/x-protobuf;proto=io.prometheus.write.v2.Request"

  /** Decoded write series → the canonical points relation (`__name__`
    * becomes the name column, remaining labels the map, sig computed) —
    * ready for `PointsStore.append`. */
  def writeRequestToPoints(spark: SparkSession,
      series: Seq[(Map[String, String], Seq[(Double, Long)])]): DataFrame = {
    import spark.implicits._
    val rows = series.flatMap { case (labels, samples) =>
      val name = labels.getOrElse("__name__", null)
      val rest = labels - "__name__"
      samples.map { case (v, t) => (name, rest, t, v) }
    }
    graft.model.Points.withSig(rows.toDF("name", "labels", "t", "value"))
  }

  /** Client-side response decode (spec oracle): series → samples. */
  def decodeResponse(body: Array[Byte]): Seq[Seq[(Map[String, String], Seq[(Double, Long)])]] = {
    val raw = boundedUncompress(body)
    val r = new Reader(raw, 0, raw.length)
    val results = Seq.newBuilder[Seq[(Map[String, String], Seq[(Double, Long)])]]
    while (r.hasNext) {
      val (field, wire) = r.tag()
      if (field == 1 && wire == 2) {
        val (s, e) = r.lenDelimited()
        results += decodeQueryResult(raw, s, e)
      } else r.skip(wire)
    }
    results.result()
  }

  private def decodeQueryResult(buf: Array[Byte], from: Int, to: Int)
      : Seq[(Map[String, String], Seq[(Double, Long)])] = {
    val r = new Reader(buf, from, to)
    val series = Seq.newBuilder[(Map[String, String], Seq[(Double, Long)])]
    while (r.hasNext) {
      val (field, wire) = r.tag()
      if (field == 1 && wire == 2) {
        val (s, e) = r.lenDelimited()
        series += decodeTimeSeries(buf, s, e)
      } else r.skip(wire)
    }
    series.result()
  }

  private def decodeTimeSeries(buf: Array[Byte], from: Int, to: Int)
      : (Map[String, String], Seq[(Double, Long)]) = {
    val (l, s, _) = decodeTimeSeriesEx(buf, from, to)
    (l, s)
  }

  private def decodeTimeSeriesEx(buf: Array[Byte], from: Int, to: Int)
      : (Map[String, String], Seq[(Double, Long)], Seq[WireExemplar]) = {
    val r = new Reader(buf, from, to)
    val labels = Map.newBuilder[String, String]
    val samples = Seq.newBuilder[(Double, Long)]
    val exemplars = Seq.newBuilder[WireExemplar]
    while (r.hasNext) {
      val (field, wire) = r.tag()
      (field, wire) match {
        case (1, 2) =>
          val (s, e) = r.lenDelimited()
          val lr = new Reader(buf, s, e)
          var k = ""
          var v = ""
          while (lr.hasNext) {
            val (f2, w2) = lr.tag()
            (f2, w2) match {
              case (1, 2) => k = lr.str()
              case (2, 2) => v = lr.str()
              case _ => lr.skip(w2)
            }
          }
          labels += (k -> v)
        case (2, 2) =>
          val (s, e) = r.lenDelimited()
          val sr = new Reader(buf, s, e)
          var value = 0.0
          var t = 0L
          while (sr.hasNext) {
            val (f2, w2) = sr.tag()
            (f2, w2) match {
              case (1, 1) => value = java.lang.Double.longBitsToDouble(sr.fixed64())
              case (2, 0) => t = sr.varint()
              case _ => sr.skip(w2)
            }
          }
          samples += ((value, t))
        case (3, 2) => // prompb.Exemplar { labels=1, value=2, timestamp=3 }
          val (s, e) = r.lenDelimited()
          val er = new Reader(buf, s, e)
          val exLabels = Seq.newBuilder[(String, String)]
          var value = 0.0
          var t = 0L
          while (er.hasNext) {
            val (f2, w2) = er.tag()
            (f2, w2) match {
              case (1, 2) =>
                val (ls, le) = er.lenDelimited()
                val lr = new Reader(buf, ls, le)
                var k = ""; var v = ""
                while (lr.hasNext) {
                  val (f3, w3) = lr.tag()
                  (f3, w3) match {
                    case (1, 2) => k = lr.str()
                    case (2, 2) => v = lr.str()
                    case _ => lr.skip(w3)
                  }
                }
                exLabels += (k -> v)
              case (2, 1) => value = java.lang.Double.longBitsToDouble(er.fixed64())
              case (3, 0) => t = er.varint()
              case _ => er.skip(w2)
            }
          }
          exemplars += ((exLabels.result(), value, t))
        case _ => r.skip(wire)
      }
    }
    (labels.result(), samples.result(), exemplars.result())
  }
}
