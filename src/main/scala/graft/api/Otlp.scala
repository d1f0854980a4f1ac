package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** OTLP/HTTP metrics ingest — the OpenTelemetry push path
  * (`POST /api/v1/otlp/v1/metrics`, protobuf
  * `ExportMetricsServiceRequest`), translated to Prometheus series and
  * fed to the same sink as remote write.
  *
  * The vendored API registers the route at
  * vendor/.../web/api/v1/api.go:394 but the reference wires it DISABLED
  * (`otlpEnabled=false` — api.go:299 never fires); this engine serves it
  * for real, like the admin API. The OTLP→Prometheus translation rules
  * below re-state the vendored otlptranslator's published behavior
  * (storage/remote/otlptranslator/prometheus/normalize_name.go,
  * normalize_label.go; prometheusremotewrite/helper.go,
  * metrics_to_prw.go) — hand-decoded protobuf, zero dependencies, the
  * same craft as the prompb codec in [[RemoteRead]]:
  *
  *  - metric names are rebuilt from alphanumeric tokens joined by `_`,
  *    with the UCUM unit mapped to a Prometheus suffix (`s`→`seconds`,
  *    `By`→`bytes`, rate denominators → `per_<unit>`), `_total` appended
  *    to monotonic sums, `_ratio` to unit-"1" gauges, and a `_` prefix
  *    when the name would start with a digit;
  *  - label keys sanitize to `[a-zA-Z0-9_]` with a `key_` prefix when
  *    they would start with a digit;
  *  - resource attributes `service.namespace`/`service.name` →
  *    `job` (`namespace/name`), `service.instance.id` → `instance`;
  *    remaining resource attributes become ONE `target_info` sample per
  *    resource (value 1, newest datapoint timestamp) — skipped when
  *    there are none;
  *  - histograms emit cumulative `_bucket{le=…}` counts (OTLP buckets
  *    are per-bucket), `+Inf` = the point's total count, plus `_sum`
  *    (when present) and `_count`; summaries emit `{quantile=…}` series
  *    plus `_sum`/`_count`;
  *  - delta-temporality sums/histograms and exponential histograms are
  *    rejected per metric (the store is cumulative float samples — the
  *    same parity that keeps native-histogram functions empty);
  *  - `NO_RECORDED_VALUE` points become staleness markers (`stale=true`,
  *    value NaN) — the engine's column analog of Prometheus's StaleNaN;
  *  - timestamps convert ns → ms.
  */
object Otlp {

  // opentelemetry.proto.metrics.v1.AggregationTemporality
  val TemporalityDelta = 1
  val TemporalityCumulative = 2

  /** DataPointFlags bit 0: FLAG_NO_RECORDED_VALUE. */
  private val NoRecordedValueFlag = 1

  final case class NumberPoint(attrs: Seq[(String, String)], tNanos: Long,
                               value: Double, flags: Int = 0) {
    def noRecorded: Boolean = (flags & NoRecordedValueFlag) != 0
  }
  final case class HistogramPoint(attrs: Seq[(String, String)], tNanos: Long,
                                  count: Long, sum: Option[Double],
                                  bucketCounts: Seq[Long], bounds: Seq[Double],
                                  flags: Int = 0) {
    def noRecorded: Boolean = (flags & NoRecordedValueFlag) != 0
  }
  final case class SummaryPoint(attrs: Seq[(String, String)], tNanos: Long,
                                count: Long, sum: Double,
                                quantiles: Seq[(Double, Double)],
                                flags: Int = 0) {
    def noRecorded: Boolean = (flags & NoRecordedValueFlag) != 0
  }

  sealed trait Data
  final case class Gauge(points: Seq[NumberPoint]) extends Data
  final case class Sum(points: Seq[NumberPoint],
                       temporality: Int = TemporalityCumulative,
                       monotonic: Boolean = true) extends Data
  final case class Histogram(points: Seq[HistogramPoint],
                             temporality: Int = TemporalityCumulative) extends Data
  final case class Summary(points: Seq[SummaryPoint]) extends Data
  /** Decoded only as far as its datapoint timestamps — translation
    * rejects the metric (the store is float samples) but the timestamps
    * still advance target_info, like every other rejected metric. */
  final case class ExpHistogram(tsNanos: Seq[Long] = Nil) extends Data

  final case class Metric(name: String, unit: String, data: Data)
  final case class ResourceMetrics(attrs: Seq[(String, String)],
                                   metrics: Seq[Metric])

  /** One translated sample row: (metric name, labels sans __name__,
    * epoch-ms, value, stale). */
  final case class Row(name: String, labels: Map[String, String], t: Long,
                       value: Double, stale: Boolean)

  final case class Translated(rows: Seq[Row], errors: Seq[String],
                              /** DATA POINTS dropped by the rejections in
                                * `errors` — the partial_success field's
                                * unit per the OTLP spec (not a metric
                                * count). */
                              rejectedPoints: Long = 0L,
                              /** OTLP DATA POINTS accepted — the ingress
                                * counter's unit, matching the remote-write
                                * route's per-sample semantics. One
                                * histogram/summary point fans out to many
                                * translated rows; `rows.length` would
                                * inflate the counter. */
                              acceptedPoints: Long = 0L) {
    def samples: Int = rows.length
  }

  // ---- protobuf decode ----------------------------------------------------

  /** Decode an ExportMetricsServiceRequest (optionally gzip'd — OTLP/HTTP's
    * only standard content encoding). Structure (opentelemetry-proto):
    * request.resource_metrics=1 { resource=1 { attributes=1 KeyValue },
    * scope_metrics=2 { metrics=2 Metric } }. */
  def decode(body: Array[Byte], gzipped: Boolean = false): Seq[ResourceMetrics] = {
    val raw =
      if (!gzipped) body
      else {
        // bounded inflate — same cap as the snappy paths
        // (RemoteRead.boundedUncompress): a gzip bomb must not allocate
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(body), 65536)
        try {
          val out = in.readNBytes(RemoteRead.MaxUncompressedBytes + 1)
          if (out.length > RemoteRead.MaxUncompressedBytes)
            throw new IllegalArgumentException(
              s"gzip body exceeds ${RemoteRead.MaxUncompressedBytes} uncompressed bytes")
          out
        } finally in.close()
      }
    val r = new RemoteRead.Reader(raw, 0, raw.length)
    val rms = Seq.newBuilder[ResourceMetrics]
    while (r.hasNext) {
      val (f, w) = r.tag()
      if (f == 1 && w == 2) { val (s, e) = r.lenDelimited(); rms += decodeResourceMetrics(raw, s, e) }
      else r.skip(w)
    }
    rms.result()
  }

  private def decodeResourceMetrics(buf: Array[Byte], from: Int, to: Int): ResourceMetrics = {
    val r = new RemoteRead.Reader(buf, from, to)
    val attrs = Seq.newBuilder[(String, String)]
    val metrics = Seq.newBuilder[Metric]
    while (r.hasNext) {
      val (f, w) = r.tag()
      (f, w) match {
        case (1, 2) => // Resource { repeated KeyValue attributes = 1 }
          val (s, e) = r.lenDelimited()
          val rr = new RemoteRead.Reader(buf, s, e)
          while (rr.hasNext) {
            val (rf, rw) = rr.tag()
            if (rf == 1 && rw == 2) { val (ks, ke) = rr.lenDelimited(); attrs += decodeKeyValue(buf, ks, ke) }
            else rr.skip(rw)
          }
        case (2, 2) => // ScopeMetrics { repeated Metric metrics = 2 }
          val (s, e) = r.lenDelimited()
          val sr = new RemoteRead.Reader(buf, s, e)
          while (sr.hasNext) {
            val (sf, sw) = sr.tag()
            if (sf == 2 && sw == 2) { val (ms, me) = sr.lenDelimited(); metrics += decodeMetric(buf, ms, me) }
            else sr.skip(sw)
          }
        case _ => r.skip(w)
      }
    }
    ResourceMetrics(attrs.result(), metrics.result())
  }

  private def decodeMetric(buf: Array[Byte], from: Int, to: Int): Metric = {
    val r = new RemoteRead.Reader(buf, from, to)
    var name = ""; var unit = ""
    var data: Data = Gauge(Nil)
    while (r.hasNext) {
      val (f, w) = r.tag()
      (f, w) match {
        case (1, 2) => name = r.str()
        case (3, 2) => unit = r.str()
        case (5, 2) => // Gauge { repeated NumberDataPoint data_points = 1 }
          val (s, e) = r.lenDelimited()
          data = Gauge(decodeNumberPoints(buf, s, e))
        case (7, 2) => // Sum { points=1, temporality=2, is_monotonic=3 }
          val (s, e) = r.lenDelimited()
          val sr = new RemoteRead.Reader(buf, s, e)
          var pts = Seq.empty[NumberPoint]; var temp = 0; var mono = false
          while (sr.hasNext) {
            val (sf, sw) = sr.tag()
            (sf, sw) match {
              case (1, 2) => val (ps, pe) = sr.lenDelimited(); pts = pts ++ decodeNumberPoints0(buf, ps, pe)
              case (2, 0) => temp = sr.varint().toInt
              case (3, 0) => mono = sr.varint() != 0
              case _ => sr.skip(sw)
            }
          }
          data = Sum(pts, temp, mono)
        case (9, 2) => // Histogram { points=1, temporality=2 }
          val (s, e) = r.lenDelimited()
          val sr = new RemoteRead.Reader(buf, s, e)
          var pts = Seq.empty[HistogramPoint]; var temp = 0
          while (sr.hasNext) {
            val (sf, sw) = sr.tag()
            (sf, sw) match {
              case (1, 2) => val (ps, pe) = sr.lenDelimited(); pts = pts :+ decodeHistogramPoint(buf, ps, pe)
              case (2, 0) => temp = sr.varint().toInt
              case _ => sr.skip(sw)
            }
          }
          data = Histogram(pts, temp)
        case (10, 2) => // ExponentialHistogram { data_points=1 { time=3 } }
          val (s, e) = r.lenDelimited()
          val hr = new RemoteRead.Reader(buf, s, e)
          val ts = Seq.newBuilder[Long]
          while (hr.hasNext) {
            val (hf, hw) = hr.tag()
            if (hf == 1 && hw == 2) {
              val (ps, pe) = hr.lenDelimited()
              val pr = new RemoteRead.Reader(buf, ps, pe)
              while (pr.hasNext) {
                val (pf, pw) = pr.tag()
                if (pf == 3 && pw == 1) ts += pr.fixed64() else pr.skip(pw)
              }
            } else hr.skip(hw)
          }
          data = ExpHistogram(ts.result())
        case (11, 2) => // Summary { repeated SummaryDataPoint data_points = 1 }
          val (s, e) = r.lenDelimited()
          val sr = new RemoteRead.Reader(buf, s, e)
          var pts = Seq.empty[SummaryPoint]
          while (sr.hasNext) {
            val (sf, sw) = sr.tag()
            if (sf == 1 && sw == 2) { val (ps, pe) = sr.lenDelimited(); pts = pts :+ decodeSummaryPoint(buf, ps, pe) }
            else sr.skip(sw)
          }
          data = Summary(pts)
        case _ => r.skip(w)
      }
    }
    Metric(name, unit, data)
  }

  private def decodeNumberPoints(buf: Array[Byte], from: Int, to: Int): Seq[NumberPoint] = {
    val r = new RemoteRead.Reader(buf, from, to)
    val pts = Seq.newBuilder[NumberPoint]
    while (r.hasNext) {
      val (f, w) = r.tag()
      if (f == 1 && w == 2) { val (s, e) = r.lenDelimited(); pts ++= decodeNumberPoints0(buf, s, e) }
      else r.skip(w)
    }
    pts.result()
  }

  /** One NumberDataPoint span: attributes=7, time_unix_nano=3 (fixed64),
    * as_double=4, as_int=6 (sfixed64), flags=8. */
  private def decodeNumberPoints0(buf: Array[Byte], from: Int, to: Int): Seq[NumberPoint] = {
    val r = new RemoteRead.Reader(buf, from, to)
    val attrs = Seq.newBuilder[(String, String)]
    var t = 0L; var v = 0.0; var flags = 0
    while (r.hasNext) {
      val (f, w) = r.tag()
      (f, w) match {
        case (7, 2) => val (s, e) = r.lenDelimited(); attrs += decodeKeyValue(buf, s, e)
        case (3, 1) => t = r.fixed64()
        case (4, 1) => v = r.double()
        case (6, 1) => v = r.fixed64().toDouble
        case (8, 0) => flags = r.varint().toInt
        case _ => r.skip(w)
      }
    }
    Seq(NumberPoint(attrs.result(), t, v, flags))
  }

  /** HistogramDataPoint: attributes=9, time_unix_nano=3, count=4 (fixed64),
    * sum=5 (double, optional), bucket_counts=6 (packed fixed64),
    * explicit_bounds=7 (packed double), flags=10. */
  private def decodeHistogramPoint(buf: Array[Byte], from: Int, to: Int): HistogramPoint = {
    val r = new RemoteRead.Reader(buf, from, to)
    val attrs = Seq.newBuilder[(String, String)]
    var t = 0L; var count = 0L; var sum = Option.empty[Double]; var flags = 0
    val counts = Seq.newBuilder[Long]; val bounds = Seq.newBuilder[Double]
    while (r.hasNext) {
      val (f, w) = r.tag()
      (f, w) match {
        case (9, 2) => val (s, e) = r.lenDelimited(); attrs += decodeKeyValue(buf, s, e)
        case (3, 1) => t = r.fixed64()
        case (4, 1) => count = r.fixed64()
        case (5, 1) => sum = Some(r.double())
        case (6, 2) =>
          val (s, e) = r.lenDelimited()
          val pr = new RemoteRead.Reader(buf, s, e)
          while (pr.hasNext) counts += pr.fixed64()
        case (6, 1) => counts += r.fixed64() // unpacked tolerance
        case (7, 2) =>
          val (s, e) = r.lenDelimited()
          val pr = new RemoteRead.Reader(buf, s, e)
          while (pr.hasNext) bounds += pr.double()
        case (7, 1) => bounds += r.double()
        case (10, 0) => flags = r.varint().toInt
        case _ => r.skip(w)
      }
    }
    HistogramPoint(attrs.result(), t, count, sum, counts.result(), bounds.result(), flags)
  }

  /** SummaryDataPoint: attributes=7, time_unix_nano=3, count=4 (fixed64),
    * sum=5, quantile_values=6 { quantile=1, value=2 }, flags=8. */
  private def decodeSummaryPoint(buf: Array[Byte], from: Int, to: Int): SummaryPoint = {
    val r = new RemoteRead.Reader(buf, from, to)
    val attrs = Seq.newBuilder[(String, String)]
    var t = 0L; var count = 0L; var sum = 0.0; var flags = 0
    val qs = Seq.newBuilder[(Double, Double)]
    while (r.hasNext) {
      val (f, w) = r.tag()
      (f, w) match {
        case (7, 2) => val (s, e) = r.lenDelimited(); attrs += decodeKeyValue(buf, s, e)
        case (3, 1) => t = r.fixed64()
        case (4, 1) => count = r.fixed64()
        case (5, 1) => sum = r.double()
        case (6, 2) =>
          val (s, e) = r.lenDelimited()
          val qr = new RemoteRead.Reader(buf, s, e)
          var q = 0.0; var v = 0.0
          while (qr.hasNext) {
            val (qf, qw) = qr.tag()
            (qf, qw) match {
              case (1, 1) => q = qr.double()
              case (2, 1) => v = qr.double()
              case _ => qr.skip(qw)
            }
          }
          qs += ((q, v))
        case (8, 0) => flags = r.varint().toInt
        case _ => r.skip(w)
      }
    }
    SummaryPoint(attrs.result(), t, count, sum, qs.result(), flags)
  }

  /** KeyValue { key=1, AnyValue value=2 } — AnyValue flattens to its
    * string form (pdata's AsString): string verbatim, bool/int/double via
    * toString, arrays/kvlists as JSON. */
  private def decodeKeyValue(buf: Array[Byte], from: Int, to: Int): (String, String) = {
    val r = new RemoteRead.Reader(buf, from, to)
    var key = ""; var value = ""
    while (r.hasNext) {
      val (f, w) = r.tag()
      (f, w) match {
        case (1, 2) => key = r.str()
        case (2, 2) => val (s, e) = r.lenDelimited(); value = anyValueStr(buf, s, e)
        case _ => r.skip(w)
      }
    }
    (key, value)
  }

  private def anyValueStr(buf: Array[Byte], from: Int, to: Int): String = {
    val r = new RemoteRead.Reader(buf, from, to)
    var out = ""
    while (r.hasNext) {
      val (f, w) = r.tag()
      (f, w) match {
        case (1, 2) => out = r.str()
        case (2, 0) => out = (r.varint() != 0).toString
        case (3, 0) => out = r.varint().toString
        case (4, 1) => out = r.double().toString
        case (5, 2) => // ArrayValue { repeated AnyValue values = 1 }
          val (s, e) = r.lenDelimited()
          val ar = new RemoteRead.Reader(buf, s, e)
          val items = Seq.newBuilder[String]
          while (ar.hasNext) {
            val (af, aw) = ar.tag()
            if (af == 1 && aw == 2) { val (is, ie) = ar.lenDelimited(); items += MiniJson.str(anyValueStr(buf, is, ie)) }
            else ar.skip(aw)
          }
          out = items.result().mkString("[", ",", "]")
        case (6, 2) => // KeyValueList { repeated KeyValue values = 1 }
          val (s, e) = r.lenDelimited()
          val kr = new RemoteRead.Reader(buf, s, e)
          val items = Seq.newBuilder[String]
          while (kr.hasNext) {
            val (kf, kw) = kr.tag()
            if (kf == 1 && kw == 2) {
              val (is, ie) = kr.lenDelimited()
              val (k, v) = decodeKeyValue(buf, is, ie)
              items += s"${MiniJson.str(k)}:${MiniJson.str(v)}"
            } else kr.skip(kw)
          }
          out = items.result().mkString("{", ",", "}")
        case (7, 2) => // bytes → base64 (pdata's AsString)
          val (s, e) = r.lenDelimited()
          out = java.util.Base64.getEncoder.encodeToString(
            java.util.Arrays.copyOfRange(buf, s, e))
        case _ => r.skip(w)
      }
    }
    out
  }

  // ---- protobuf encode (push client + test/gate fixture builder) ---------

  def encode(req: Seq[ResourceMetrics]): Array[Byte] = {
    val w = new RemoteRead.Writer
    req.foreach { rm =>
      w.message(1) { rw =>
        rw.message(1) { res => rm.attrs.foreach(kv => keyValue(res, 1, kv)) }
        rw.message(2) { sm =>
          rm.metrics.foreach { m =>
            sm.message(2) { mw =>
              mw.str(1, m.name)
              if (m.unit.nonEmpty) mw.str(3, m.unit)
              m.data match {
                case Gauge(pts) =>
                  mw.message(5)(g => pts.foreach(numberPoint(g, _)))
                case Sum(pts, temp, mono) =>
                  mw.message(7) { sw =>
                    pts.foreach(numberPoint(sw, _))
                    sw.int64(2, temp.toLong)
                    if (mono) { sw.tag(3, 0); sw.varint(1) }
                  }
                case Histogram(pts, temp) =>
                  mw.message(9) { hw =>
                    pts.foreach(histogramPoint(hw, _))
                    hw.int64(2, temp.toLong)
                  }
                case Summary(pts) =>
                  mw.message(11)(sw => pts.foreach(summaryPoint(sw, _)))
                case ExpHistogram(ts) =>
                  mw.message(10) { hw =>
                    ts.foreach(t => hw.message(1)(_.fixed64(3, t)))
                  }
              }
            }
          }
        }
      }
    }
    w.bytes
  }

  private def keyValue(w: RemoteRead.Writer, field: Int, kv: (String, String)): Unit =
    w.message(field) { k =>
      k.str(1, kv._1)
      k.message(2)(_.str(1, kv._2)) // AnyValue.string_value
    }

  private def numberPoint(w: RemoteRead.Writer, p: NumberPoint): Unit =
    w.message(1) { pw =>
      p.attrs.foreach(kv => keyValue(pw, 7, kv))
      pw.fixed64(3, p.tNanos)
      pw.double(4, p.value)
      if (p.flags != 0) { pw.tag(8, 0); pw.varint(p.flags.toLong) }
    }

  private def histogramPoint(w: RemoteRead.Writer, p: HistogramPoint): Unit =
    w.message(1) { pw =>
      p.attrs.foreach(kv => keyValue(pw, 9, kv))
      pw.fixed64(3, p.tNanos)
      pw.fixed64(4, p.count)
      p.sum.foreach(pw.double(5, _))
      if (p.bucketCounts.nonEmpty) {
        val packed = new RemoteRead.Writer
        p.bucketCounts.foreach(packed.rawFixed64)
        pw.bytesField(6, packed.bytes)
      }
      if (p.bounds.nonEmpty) {
        val packed = new RemoteRead.Writer
        p.bounds.foreach(b => packed.rawFixed64(java.lang.Double.doubleToRawLongBits(b)))
        pw.bytesField(7, packed.bytes)
      }
      if (p.flags != 0) { pw.tag(10, 0); pw.varint(p.flags.toLong) }
    }

  private def summaryPoint(w: RemoteRead.Writer, p: SummaryPoint): Unit =
    w.message(1) { pw =>
      p.attrs.foreach(kv => keyValue(pw, 7, kv))
      pw.fixed64(3, p.tNanos)
      pw.fixed64(4, p.count)
      pw.double(5, p.sum)
      p.quantiles.foreach { case (q, v) =>
        pw.message(6) { qw => qw.double(1, q); qw.double(2, v) }
      }
      if (p.flags != 0) { pw.tag(8, 0); pw.varint(p.flags.toLong) }
    }

  /** ExportMetricsServiceResponse: empty on full success; partial_success=1
    * { rejected_data_points=1, error_message=2 } when some metrics dropped. */
  def encodeResponse(rejected: Long, errorMessage: String): Array[Byte] = {
    val w = new RemoteRead.Writer
    if (rejected > 0 || errorMessage.nonEmpty)
      w.message(1) { ps => ps.int64(1, rejected); if (errorMessage.nonEmpty) ps.str(2, errorMessage) }
    w.bytes
  }

  /** google.rpc.Status { code=1, message=2 } — the OTLP/HTTP failure body. */
  def encodeStatus(code: Int, message: String): Array[Byte] = {
    val w = new RemoteRead.Writer
    w.int64(1, code.toLong)
    w.str(2, message)
    w.bytes
  }

  // ---- Prometheus translation ---------------------------------------------

  /** UCUM → Prometheus unit suffix (otlptranslator normalize_name.go's
    * unitMap, a published table). */
  private val UnitMap = Map(
    "d" -> "days", "h" -> "hours", "min" -> "minutes", "s" -> "seconds",
    "ms" -> "milliseconds", "us" -> "microseconds", "ns" -> "nanoseconds",
    "By" -> "bytes", "KiBy" -> "kibibytes", "MiBy" -> "mebibytes",
    "GiBy" -> "gibibytes", "TiBy" -> "tibibytes", "KBy" -> "kilobytes",
    "MBy" -> "megabytes", "GBy" -> "gigabytes", "TBy" -> "terabytes",
    "B" -> "bytes", "KB" -> "kilobytes", "MB" -> "megabytes",
    "GB" -> "gigabytes", "TB" -> "terabytes",
    "m" -> "meters", "V" -> "volts", "A" -> "amperes", "J" -> "joules",
    "W" -> "watts", "g" -> "grams",
    "Cel" -> "celsius", "Hz" -> "hertz", "1" -> "", "%" -> "percent",
    "$" -> "dollars")

  private val PerUnitMap = Map(
    "s" -> "second", "m" -> "minute", "h" -> "hour", "d" -> "day",
    "w" -> "week", "mo" -> "month", "y" -> "year")

  private def alnumTokens(s: String): Vector[String] =
    s.split("[^a-zA-Z0-9]+").filter(_.nonEmpty).toVector

  /** Prometheus-compliant metric name (BuildPromCompliantName). */
  def buildName(name: String, unit: String, isGauge: Boolean,
                isMonotonicSum: Boolean): String = {
    var tokens = alnumTokens(name)
    val unitTokens = unit.split("/", 2)
    val main = unitTokens(0).trim
    if (main.nonEmpty && !main.exists(c => c == '{' || c == '}')) {
      val mu = alnumTokens(UnitMap.getOrElse(main, main)).mkString("_")
      if (mu.nonEmpty && !tokens.contains(mu)) tokens :+= mu
    }
    if (unitTokens.length > 1) {
      val per = unitTokens(1).trim
      if (per.nonEmpty && !per.exists(c => c == '{' || c == '}')) {
        val pu = alnumTokens(PerUnitMap.getOrElse(per, per)).mkString("_")
        if (pu.nonEmpty && !tokens.contains(pu)) tokens = tokens ++ Vector("per", pu)
      }
    }
    if (isMonotonicSum) tokens = tokens.filterNot(_ == "total") :+ "total"
    if (unit == "1" && isGauge) tokens = tokens.filterNot(_ == "ratio") :+ "ratio"
    val n = tokens.mkString("_")
    if (n.nonEmpty && n.head.isDigit) "_" + n else n
  }

  /** Prometheus-compliant label key (NormalizeLabel). */
  def sanitizeLabel(key: String): String = {
    if (key.isEmpty) return key
    val s = key.map(c => if (c.isLetterOrDigit) c else '_')
    if (s.head.isDigit) "key_" + s else s
  }

  /** Go strconv.FormatFloat(v, 'f', -1, 64): shortest round-trip decimal
    * in plain (never exponential) notation — the `le`/`quantile` label
    * format the translator uses. */
  def goFmtF(v: Double): String = {
    if (v.isPosInfinity) return "+Inf"
    if (v.isNegInfinity) return "-Inf"
    if (v.isNaN) return "NaN"
    if (v == v.toLong) return v.toLong.toString
    val s = java.lang.Double.toString(v)
    if (s.indexOf('E') >= 0 || s.indexOf('e') >= 0)
      new java.math.BigDecimal(s).stripTrailingZeros.toPlainString
    else s
  }

  private val StaleNaN = Double.NaN

  /** Translate a decoded export request to Prometheus sample rows plus
    * per-metric rejection messages (the partial-success report). */
  def toRows(req: Seq[ResourceMetrics]): Translated = {
    val rows = Seq.newBuilder[Row]
    val errors = Seq.newBuilder[String]
    var rejectedPoints = 0L
    var acceptedPoints = 0L
    req.foreach { rm =>
      val res = rm.attrs.toMap
      val job = res.get("service.name").map { n =>
        res.get("service.namespace").map(ns => s"$ns/$n").getOrElse(n)
      }
      val instance = res.get("service.instance.id")
      // job/instance override any datapoint attribute of the same name
      def labelsOf(attrs: Seq[(String, String)]): Map[String, String] = {
        val base = attrs.map { case (k, v) => sanitizeLabel(k) -> v }.toMap
        val j = job.map(v => Map("job" -> v)).getOrElse(Map.empty)
        val i = instance.map(v => Map("instance" -> v)).getOrElse(Map.empty)
        base ++ j ++ i
      }
      var mostRecent = 0L
      def ms(tNanos: Long): Long = { if (tNanos > mostRecent) mostRecent = tNanos; tNanos / 1000000L }

      rm.metrics.foreach { m =>
        def emptyErr(): Unit = errors += s"empty data points. ${m.name} is dropped"
        m.data match {
          case Gauge(pts) =>
            if (pts.isEmpty) emptyErr()
            acceptedPoints += pts.length
            val name = buildName(m.name, m.unit, isGauge = true, isMonotonicSum = false)
            pts.foreach { p =>
              rows += Row(name, labelsOf(p.attrs), ms(p.tNanos),
                if (p.noRecorded) StaleNaN else p.value, p.noRecorded)
            }
          case Sum(pts, temp, mono) =>
            if (temp != TemporalityCumulative) {
              // rejected metrics still advance the target_info timestamp
              // (metrics_to_prw.go takes mostRecentTimestampInMetric
              // BEFORE the temporality check)
              pts.foreach(p => ms(p.tNanos))
              rejectedPoints += pts.length
              errors += s"invalid temporality and type combination for metric \"${m.name}\""
            } else {
              if (pts.isEmpty) emptyErr()
              acceptedPoints += pts.length
              val name = buildName(m.name, m.unit, isGauge = false, isMonotonicSum = mono)
              pts.foreach { p =>
                rows += Row(name, labelsOf(p.attrs), ms(p.tNanos),
                  if (p.noRecorded) StaleNaN else p.value, p.noRecorded)
              }
            }
          case Histogram(pts, temp) =>
            if (temp != TemporalityCumulative) {
              pts.foreach(p => ms(p.tNanos))
              rejectedPoints += pts.length
              errors += s"invalid temporality and type combination for metric \"${m.name}\""
            } else {
              if (pts.isEmpty) emptyErr()
              acceptedPoints += pts.length
              val name = buildName(m.name, m.unit, isGauge = false, isMonotonicSum = false)
              pts.foreach { p =>
                val base = labelsOf(p.attrs)
                val t = ms(p.tNanos)
                def v(x: Double): Double = if (p.noRecorded) StaleNaN else x
                p.sum.foreach(s0 => rows += Row(name + "_sum", base, t, v(s0), p.noRecorded))
                rows += Row(name + "_count", base, t, v(p.count.toDouble), p.noRecorded)
                var cum = 0L
                p.bounds.zipWithIndex.foreach { case (b, i) =>
                  cum += (if (i < p.bucketCounts.length) p.bucketCounts(i) else 0L)
                  rows += Row(name + "_bucket", base + ("le" -> goFmtF(b)), t,
                    v(cum.toDouble), p.noRecorded)
                }
                rows += Row(name + "_bucket", base + ("le" -> "+Inf"), t,
                  v(p.count.toDouble), p.noRecorded)
              }
            }
          case Summary(pts) =>
            if (pts.isEmpty) emptyErr()
            acceptedPoints += pts.length
            val name = buildName(m.name, m.unit, isGauge = false, isMonotonicSum = false)
            pts.foreach { p =>
              val base = labelsOf(p.attrs)
              val t = ms(p.tNanos)
              def v(x: Double): Double = if (p.noRecorded) StaleNaN else x
              rows += Row(name + "_sum", base, t, v(p.sum), p.noRecorded)
              rows += Row(name + "_count", base, t, v(p.count.toDouble), p.noRecorded)
              p.quantiles.foreach { case (q, qv) =>
                rows += Row(name, base + ("quantile" -> goFmtF(q)), t, v(qv), p.noRecorded)
              }
            }
          case ExpHistogram(ts) =>
            // rejected points still advance target_info's timestamp
            ts.foreach(ms)
            rejectedPoints += ts.length
            errors += s"unsupported metric type for metric \"${m.name}\"" +
              " (exponential histogram: the store is float samples," +
              " matching the reference appender's native-histogram rejection)"
        }
      }
      // target_info from leftover resource attributes (helper.go's
      // addResourceTargetInfo): skipped when only job/instance material
      val extra = rm.attrs.filterNot { case (k, _) =>
        k == "service.name" || k == "service.namespace" || k == "service.instance.id"
      }
      if (extra.nonEmpty && mostRecent > 0L) {
        val lbls = labelsOf(extra)
        rows += Row("target_info", lbls, mostRecent / 1000000L, 1.0, stale = false)
      }
    }
    Translated(rows.result(), errors.result(), rejectedPoints, acceptedPoints)
  }

  /** Translated rows → the canonical points relation (name, labels, t,
    * value, stale, sig) — ready for the same sink as remote write. */
  def toPoints(spark: SparkSession, tr: Translated): DataFrame = {
    import spark.implicits._
    val df = tr.rows.map(r => (r.name, r.labels, r.t, r.value, r.stale))
      .toDF("name", "labels", "t", "value", "stale")
    graft.model.Points.withSig(df)
  }
}
