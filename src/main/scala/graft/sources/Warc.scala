package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 / WARC/1.0) — the Web ARChive format Common Crawl
  * ships and every web-scale curation pipeline starts from (C4,
  * RefinedWeb, Gopher all open with a WARC read). Pure-JDK reader and
  * fixture writer:
  *
  *  - a record is `WARC/1.0\r\n` + CRLF headers + empty line +
  *    `Content-Length` payload bytes + CRLF CRLF;
  *  - `.warc.gz` files are CONCATENATED gzip members (one per record) —
  *    the JDK GZIPInputStream consumes multi-member streams natively, so
  *    the same byte walk covers both forms;
  *  - `response` records carry an HTTP/1.1 message as payload; the body
  *    extractor strips the status line + headers at the first blank line.
  *
  * Scale shape mirrors [[TarShards]]: a WARC file is one blob, parsing is
  * a NARROW per-row flatMap (no shuffle), and a 100 TB crawl reads as one
  * task per archive — the Common Crawl segment layout. A malformed
  * archive contributes no rows rather than killing the read; a truncated
  * record aborts that archive's walk (None), never silent partial
  * content. */
object Warc {

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Serialize one record (version line, headers + computed
    * Content-Length, payload, record separator). */
  def writeRecord(headers: Seq[(String, String)], payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("WARC/1.0\r\n".getBytes("US-ASCII"))
    (headers :+ ("Content-Length" -> payload.length.toString)).foreach { case (k, v) =>
      out.write(s"$k: $v\r\n".getBytes("US-ASCII"))
    }
    out.write(Crlf)
    out.write(payload)
    out.write(Crlf); out.write(Crlf)
    out.toByteArray
  }

  /** A fixture archive from records; `gzipPerRecord` emits the
    * Common-Crawl-style concatenated-member `.warc.gz` form. */
  def writeWarc(records: Seq[(Seq[(String, String)], Array[Byte])],
                gzipPerRecord: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (h, p) =>
      val rec = writeRecord(h, p)
      if (gzipPerRecord) {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(rec); gz.finish() // finish, NOT close: keep appending members
      } else out.write(rec)
    }
    out.toByteArray
  }

  private def gunzipAll(b: Array[Byte]): Array[Byte] =
    if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b) {
      // multi-member: the JDK stream continues across member boundaries
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
      try in.readAllBytes() finally in.close()
    } else b

  /** Parse an archive (gzip-transparent) into (headers, payload) records.
    * Header names are lower-cased (WARC headers are case-insensitive). */
  def readWarc(raw: Array[Byte]): Option[Seq[(Map[String, String], Array[Byte])]] = {
    val b = try gunzipAll(raw) catch { case _: java.io.IOException => return None }
    val out = Seq.newBuilder[(Map[String, String], Array[Byte])]
    var off = 0
    def line(from: Int): Option[(String, Int)] = {
      var i = from
      while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
      if (i + 1 >= b.length) None
      else Some((new String(b, from, i - from, "UTF-8"), i + 2))
    }
    while (off < b.length) {
      // tolerate extra record separators / trailing CRLFs between records
      if (off + 1 < b.length && b(off) == '\r' && b(off + 1) == '\n') off += 2
      else {
        val (version, afterVersion) = line(off).getOrElse(return None)
        if (!version.startsWith("WARC/")) return None
        var p = afterVersion
        val headers = Map.newBuilder[String, String]
        var contentLength = -1L
        var headerDone = false
        while (!headerDone) {
          val (l, next) = line(p).getOrElse(return None)
          p = next
          if (l.isEmpty) headerDone = true
          else {
            val i = l.indexOf(':')
            if (i < 0) return None
            val k = l.substring(0, i).trim.toLowerCase
            val v = l.substring(i + 1).trim
            headers += k -> v
            if (k == "content-length") contentLength = v.toLong
          }
        }
        if (contentLength < 0 || p + contentLength > b.length) return None
        out += headers.result() ->
          java.util.Arrays.copyOfRange(b, p, (p + contentLength).toInt)
        off = (p + contentLength).toInt
      }
    }
    Some(out.result())
  }

  /** Strip an HTTP/1.1 message's status line + headers: returns
    * (status code, body bytes); None if the payload is not HTTP. */
  def httpBody(payload: Array[Byte]): Option[(Int, Array[Byte])] = {
    val headEnd = {
      var i = 0
      while (i + 3 < payload.length && !(payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n')) i += 1
      if (i + 3 >= payload.length) return None
      i + 4
    }
    val statusLine = new String(payload, 0,
      math.min(headEnd, payload.indexOf('\r'.toByte)), "US-ASCII")
    val parts = statusLine.split(" ")
    if (parts.length < 2 || !parts(0).startsWith("HTTP/")) return None
    parts(1).toIntOption.map(code =>
      (code, java.util.Arrays.copyOfRange(payload, headEnd, payload.length)))
  }

  /** Explode archives into one row per record: (warc_id, record_idx,
    * warc_type, target_uri, content_type, payload). Narrow flatMap. */
  def records(warcs: DataFrame): DataFrame = {
    val spark = warcs.sparkSession
    import spark.implicits._
    warcs.select(col("warc_id").cast("long"), col("warc")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        readWarc(bytes).getOrElse(Nil).zipWithIndex.map { case ((h, p), i) =>
          (id, i, h.getOrElse("warc-type", ""), h.getOrElse("warc-target-uri", ""),
            h.getOrElse("content-type", ""), p)
        }
      }.toDF("warc_id", "record_idx", "warc_type", "target_uri", "content_type", "payload")
  }

  /** The crawl-pipeline entry point: `response` records' HTTP bodies as
    * (warc_id, target_uri, status, body) — the relation the curation
    * pipeline's markup strip consumes. */
  def httpResponseBodies(warcs: DataFrame): DataFrame = {
    val spark = warcs.sparkSession
    import spark.implicits._
    warcs.select(col("warc_id").cast("long"), col("warc")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        readWarc(bytes).getOrElse(Nil).flatMap { case (h, p) =>
          if (h.getOrElse("warc-type", "") != "response") None
          else httpBody(p).map { case (status, body) =>
            (id, h.getOrElse("warc-target-uri", ""), status, body)
          }
        }
      }.toDF("warc_id", "target_uri", "status", "body")
  }
}
