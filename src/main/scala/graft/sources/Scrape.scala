package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.model.Points

/** Prometheus scrape connector (reference: src/internal/scraping/
  * scraper.go:26,66-100 — periodic pull of /metrics targets, append as
  * points).
  *
  * The text-exposition parser is a pure function `(body, ts) → rows`, so
  * the distributed shape is: a targets DataFrame → fetch per partition →
  * flatMap parse → append to [[PointsStore]]. Fetching needs egress, so
  * [[scrapeTargets]] takes a pluggable fetcher (the test injects literal
  * bodies; production plugs an HTTP client).
  */
// Serializable: executor-side closures (distributed fetch/parse) are
// nested defs of this module, so lambdas formed from them capture the
// module instance — which is stateless, so shipping it is free.
object Scrape extends Serializable {

  final case class ScrapedPoint(name: String, labels: Map[String, String],
                                t: Long, value: Double)

  /** Parse Prometheus text exposition format:
    * `metric{l1="v1",...} value [timestampMs]`, '#' comments, TYPE/HELP
    * ignored, escaped label values, +Inf/-Inf/NaN values. */
  /** Parse a text exposition into sample points. Handles BOTH wire
    * dialects a modern endpoint may speak:
    *
    *  - Prometheus text format 0.0.4: `name{labels} value [timestamp_ms]`,
    *    `#`-comment lines (HELP/TYPE) skipped for the sample stream.
    *  - OpenMetrics 1.0 additions: the `# EOF` terminator (a comment —
    *    already skipped), EXEMPLARS appended after ` # ` on a sample line
    *    (`name{...} 0.67 1234.5 # {trace_id="abc"} 0.5`) — stripped, not
    *    a parse error — and, with `openMetrics = true`, timestamps in
    *    (possibly fractional) SECONDS instead of integer milliseconds.
    *    The flag exists because a bare integer timestamp is ambiguous
    *    between the dialects; callers that negotiated the OpenMetrics
    *    content type pass true (Prometheus resolves it the same way).
    */
  def parseExposition(body: String, defaultTsMs: Long,
                      openMetrics: Boolean = false): Seq[ScrapedPoint] =
    body.split("\n").toSeq.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap(parseLine(_, defaultTsMs, openMetrics))

  /** Per-metric metadata from an exposition's `# HELP` / `# TYPE` comment
    * lines — the lines [[parseExposition]] (correctly) skips for the
    * sample stream, but which real Prometheus retains per target and
    * serves at /api/v1/metadata (the reference exposes that route through
    * the vendored API). HELP text unescapes `\\` and `\n` per the text
    * format spec. */
  final case class MetricMetadata(metric: String, mtype: String, help: String,
                                  unit: String = "")

  def parseMetadata(body: String): Seq[MetricMetadata] = {
    val types = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val helps = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val units = scala.collection.mutable.LinkedHashMap.empty[String, String]
    body.split("\n").map(_.trim).foreach { line =>
      if (line.startsWith("# TYPE ")) {
        val rest = line.drop(7).trim
        val sp = rest.indexWhere(_.isWhitespace)
        if (sp > 0) types(rest.substring(0, sp)) = rest.substring(sp + 1).trim
      } else if (line.startsWith("# UNIT ")) { // OpenMetrics
        val rest = line.drop(7).trim
        val sp = rest.indexWhere(_.isWhitespace)
        if (sp > 0) units(rest.substring(0, sp)) = rest.substring(sp + 1).trim
      } else if (line.startsWith("# HELP ")) {
        val rest = line.drop(7).trim
        val sp = rest.indexWhere(_.isWhitespace)
        val (m, h) = if (sp > 0) (rest.substring(0, sp), rest.substring(sp + 1))
        else (rest, "")
        helps(m) = h.replace("\\n", "\n").replace("\\\\", "\\")
      }
    }
    (types.keys ++ helps.keys ++ units.keys).toSeq.distinct.map(m =>
      MetricMetadata(m, types.getOrElse(m, "unknown"), helps.getOrElse(m, ""),
        units.getOrElse(m, "")))
  }

  /** One OpenMetrics exemplar: the sample it annotates (series name +
    * labels) plus the exemplar's own labelset/value/timestamp. */
  final case class Exemplar(name: String, seriesLabels: Map[String, String],
                            labels: Map[String, String], value: Double,
                            tMs: Long)

  /** Exemplars of an exposition — the ` # {labels} value [ts]` suffixes
    * [[parseLine]] strips from the sample stream. `openMetrics = true`
    * reads the exemplar timestamp in (fractional) seconds, like the
    * samples. Lines whose exemplar is malformed contribute their sample
    * but no exemplar. */
  def parseExemplars(body: String, defaultTsMs: Long,
                     openMetrics: Boolean = true): Seq[Exemplar] =
    body.split("\n").toSeq.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { line =>
        // locate the ` # ` separator AFTER the sample's labelset — a label
        // value containing " # " must not shift the exemplar start into
        // the labelset (mirrors parseLine, which splits labels off at the
        // matching brace before looking for the separator)
        val start = exemplarSeparator(line)
        if (start < 0) Nil
        else for {
          sample <- parseLine(line, defaultTsMs, openMetrics)
          ex = line.substring(start + 3).trim
          parsed <- parseExemplarPart(ex, defaultTsMs, openMetrics)
        } yield Exemplar(sample.name, sample.labels, parsed._1, parsed._2, parsed._3)
      }

  /** Index of the OpenMetrics ` # ` exemplar separator, searched only in
    * the post-labelset tail of the line; -1 when absent/unterminated. */
  private def exemplarSeparator(line: String): Int = {
    val braceIdx = line.indexOf('{')
    val spaceIdx = line.indexWhere(_.isWhitespace)
    val from =
      if (braceIdx >= 0 && (spaceIdx < 0 || braceIdx < spaceIdx)) {
        val close = matchingBrace(line, braceIdx)
        if (close < 0) return -1
        close + 1
      } else 0
    line.indexOf(" # ", from)
  }

  private def parseExemplarPart(ex: String, defaultTsMs: Long, openMetrics: Boolean)
      : Option[(Map[String, String], Double, Long)] =
    try {
      if (!ex.startsWith("{")) return None
      val close = matchingBrace(ex, 0)
      if (close < 0) return None
      val labels = parseLabels(ex.substring(1, close))
      val parts = ex.substring(close + 1).trim.split("\\s+").filter(_.nonEmpty)
      if (parts.isEmpty) return None
      val value = parseValue(parts(0))
      val ts =
        if (parts.length <= 1) defaultTsMs
        else if (openMetrics) math.round(parts(1).toDouble * 1000.0)
        else parts(1).toLong
      Some((labels, value, ts))
    } catch { case _: Throwable => None }

  /** Bounded in-memory exemplar storage — Prometheus's own exemplar
    * store IS an in-memory circular buffer (it never reaches TSDB), so
    * this is semantic parity, not a shortcut: per-series ring of the
    * newest `perSeries` exemplars, series capacity-bounded by
    * `maxSeries` (new series are dropped at the cap, existing ones keep
    * rotating). Feeds /api/v1/query_exemplars. */
  final class ExemplarStore(perSeries: Int = 10, maxSeries: Int = 100000) {
    private val m = new java.util.concurrent.ConcurrentHashMap[
      (String, Map[String, String]), java.util.ArrayDeque[Exemplar]]()
    /** Direct insert — the remote-write receiver's path (its exemplars
      * arrive decoded, not as exposition text). */
    def add(e: Exemplar): Unit = {
      val key = (e.name, e.seriesLabels)
      val ring =
        if (m.size >= maxSeries) m.get(key) // at cap: existing series only
        else m.computeIfAbsent(key, _ => new java.util.ArrayDeque[Exemplar]())
      if (ring != null) ring.synchronized {
        ring.addLast(e)
        while (ring.size > perSeries) ring.removeFirst()
      }
    }
    def record(body: String, defaultTsMs: Long = System.currentTimeMillis(),
               openMetrics: Boolean = true): Unit =
      parseExemplars(body, defaultTsMs, openMetrics).foreach(add)
    def recording(fetch: String => String): String => String =
      target => { val body = fetch(target); record(body); body }
    def all: Seq[Exemplar] = {
      import scala.jdk.CollectionConverters._
      m.values.asScala.toSeq.flatMap(r => r.synchronized(r.asScala.toSeq))
    }
  }

  /** Retained scrape metadata across targets — the store behind
    * /api/v1/metadata. Wrap the scrape fetch with [[MetadataStore.recording]]
    * so every body a (driver-side) scrape pulls feeds the store before
    * its samples are parsed; a later scrape's non-empty HELP/TYPE wins
    * over an earlier blank (targets may disagree, last-writer semantics
    * like Prometheus's per-target metadata cache merged at the API). */
  final class MetadataStore {
    private val m =
      new java.util.concurrent.ConcurrentHashMap[String, (String, String, String)]()
    /** Direct insert — the remote-write receiver's path (RW payloads
      * carry decoded metadata, not exposition text). Same keep-the-
      * informative-value merge as [[record]]. */
    def put(metric: String, mtype: String, help: String, unit: String): Unit =
      m.merge(metric, (mtype, help, unit), (old, nw) =>
        (if (nw._1 != "unknown" && nw._1.nonEmpty) nw._1 else old._1,
          if (nw._2.nonEmpty) nw._2 else old._2,
          if (nw._3.nonEmpty) nw._3 else old._3))
    def record(body: String): Unit = parseMetadata(body).foreach { md =>
      put(md.metric, md.mtype, md.help, md.unit)
    }
    def recording(fetch: String => String): String => String =
      target => { val body = fetch(target); record(body); body }
    def snapshot: Map[String, (String, String, String)] = {
      import scala.jdk.CollectionConverters._
      m.asScala.toMap
    }
  }

  private def parseLine(line: String, defaultTsMs: Long,
                        openMetrics: Boolean = false): Option[ScrapedPoint] = {
    // a labelset exists only when `{` opens BEFORE any whitespace — a
    // later `{` belongs to an OpenMetrics exemplar, not to the sample
    val braceIdx = line.indexOf('{')
    val spaceIdx = line.indexWhere(_.isWhitespace)
    val hasLabels = braceIdx >= 0 && (spaceIdx < 0 || braceIdx < spaceIdx)
    val (name, labels, rest0) =
      if (hasLabels) {
        val open = line.indexOf('{')
        val close = matchingBrace(line, open)
        if (close < 0) return None
        (line.substring(0, open).trim,
          parseLabels(line.substring(open + 1, close)),
          line.substring(close + 1).trim)
      } else {
        val sp = line.indexWhere(_.isWhitespace)
        if (sp < 0) return None
        (line.substring(0, sp), Map.empty[String, String], line.substring(sp + 1).trim)
      }
    if (name.isEmpty) return None
    // OpenMetrics exemplar: everything from ` # ` on is the exemplar
    // labelset+value — metadata about the sample, not the sample. (Label
    // values can't smuggle a ` # ` here: the labels were already split
    // off at the matching brace above.)
    val exem = rest0.indexOf(" # ")
    val rest = if (exem >= 0) rest0.substring(0, exem) else rest0
    val parts = rest.split("\\s+").filter(_.nonEmpty)
    if (parts.isEmpty) return None
    val value = parseValue(parts(0))
    val ts =
      if (parts.length <= 1) defaultTsMs
      else if (openMetrics) math.round(parts(1).toDouble * 1000.0)
      else parts(1).toLong
    Some(ScrapedPoint(name, labels, ts, value))
  }

  private def matchingBrace(s: String, open: Int): Int = {
    var i = open + 1
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else if (c == '"') inStr = true
      else if (c == '}') return i
      i += 1
    }
    -1
  }

  private def parseLabels(s: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    while (i < s.length) {
      val eq = s.indexOf('=', i)
      if (eq < 0) return out.result()
      val key = s.substring(i, eq).trim.stripSuffix(",").trim
      var j = s.indexOf('"', eq) + 1
      val sb = new StringBuilder
      var done = false
      while (j < s.length && !done) {
        val c = s.charAt(j)
        if (c == '\\' && j + 1 < s.length) {
          s.charAt(j + 1) match {
            case 'n' => sb += '\n'
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case other => sb += other
          }
          j += 2
        } else if (c == '"') { done = true; j += 1 }
        else { sb += c; j += 1 }
      }
      if (key.nonEmpty) out += key -> sb.toString
      i = j
      while (i < s.length && (s.charAt(i) == ',' || s.charAt(i) == ' ')) i += 1
    }
    out.result()
  }

  private def parseValue(s: String): Double = s match {
    case "+Inf" | "Inf" => Double.PositiveInfinity
    case "-Inf" => Double.NegativeInfinity
    case "NaN" => Double.NaN
    case other => other.toDouble
  }

  /** Scrape a set of targets with a pluggable fetcher and return appendable
    * points (sanitized through the same ingest rules as the nozzle path). */
  def scrapeTargets(spark: SparkSession, targets: Seq[String],
                    fetch: String => String, tsMs: Long): DataFrame = {
    import spark.implicits._
    val rows = targets.flatMap { target =>
      parseExposition(fetch(target), tsMs)
        .map(p => (p.name, p.labels + ("instance" -> target), p.t, p.value))
    }
    toPoints(spark, rows)
  }

  private def toPoints(spark: SparkSession,
                       rows: Seq[(String, Map[String, String], Long, Double)]): DataFrame = {
    import spark.implicits._
    finitePoints(rows.toDF("name", "labels", "t", "value"))
  }

  private def finitePoints(df: DataFrame): DataFrame =
    Points.withSig(df.where(!col("value").isNaN &&
      col("value") =!= Double.PositiveInfinity && col("value") =!= Double.NegativeInfinity))

  /** Distributed scrape: the target list becomes a Dataset spread across
    * executors and each PARTITION fetches + parses its targets — the
    * fleet-scale shape for thousands of targets, where the driver-side
    * variant would serialize all fetch latency onto one thread. The fetch
    * closure must be serializable (construct the HTTP client inside it,
    * per call or per partition via lazy init). */
  def scrapeTargetsDistributed(spark: SparkSession, targets: Seq[String],
                               fetch: String => String, tsMs: Long): DataFrame = {
    import spark.implicits._
    val parsed = spark.createDataset(targets)
      .mapPartitions(_.flatMap { target =>
        parseExposition(fetch(target), tsMs)
          .map(p => (p.name, p.labels + ("instance" -> target), p.t, p.value))
      })
    finitePoints(parsed.toDF("name", "labels", "t", "value"))
  }

  // ---- scrape_configs subset (reference: scraping/scraper.go:66-100
  // delegates to the Prometheus config/scrape managers; this implements
  // the narrow surface those configs actually exercise here: job_name,
  // scrape_interval, static_configs targets, relabel_configs with
  // replace/keep/drop) -------------------------------------------------

  final case class RelabelRule(
      action: String = "replace",
      sourceLabels: Seq[String] = Nil,
      separator: String = ";",
      regex: String = "(.*)",
      targetLabel: String = "",
      replacement: String = "$1")

  /** `tls_config` subset (reference delegates to the Prometheus scrape
    * manager's config,  scraping/scraper.go:66-100): PEM file paths only —
    * the struct ships to executors as strings and the SSL machinery is
    * built lazily inside the fetch closure. */
  final case class TlsConfig(
      caFile: Option[String] = None,
      certFile: Option[String] = None,
      keyFile: Option[String] = None,
      insecureSkipVerify: Boolean = false)

  /** `authorization`/`basic_auth` subset: bearer token (inline or file)
    * or username/password. */
  final case class AuthConfig(
      bearerToken: Option[String] = None,
      bearerTokenFile: Option[String] = None,
      basicUsername: Option[String] = None,
      basicPassword: Option[String] = None) {
    /** The Authorization header value, if any auth is configured. */
    def header: Option[String] =
      bearerToken.map(t => s"Bearer $t")
        .orElse(bearerTokenFile.map(f => "Bearer " + new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)),
          java.nio.charset.StandardCharsets.UTF_8).trim))
        .orElse(basicUsername.map { u =>
          val cred = s"$u:${basicPassword.getOrElse("")}"
          "Basic " + java.util.Base64.getEncoder.encodeToString(
            cred.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        })
  }

  final case class ScrapeJob(
      jobName: String,
      targets: Seq[String],
      intervalMs: Long = 60000L,
      relabel: Seq[RelabelRule] = Nil,
      scheme: String = "http",
      timeoutMs: Long = 10000L,
      auth: Option[AuthConfig] = None,
      tls: Option[TlsConfig] = None,
      fileSdFiles: Seq[String] = Nil,
      httpSdUrls: Seq[String] = Nil,
      dnsSd: Seq[DnsSdConfig] = Nil,
      consulSd: Seq[ConsulSdConfig] = Nil,
      kubernetesSd: Seq[KubernetesSdConfig] = Nil)

  /** Default HTTP(S) fetcher for a job's knobs: GET
    * `scheme://target/metrics` with connect+read timeouts, an
    * Authorization header when auth is configured, and a custom trust /
    * client-cert SSLContext when `tls` is. Captures only primitives and
    * small case classes, so it serializes to executors for the
    * distributed path; the SSLContext is rebuilt lazily per executor. */
  def httpFetch(scheme: String = "http", timeoutMs: Long = 10000L,
                auth: Option[AuthConfig] = None,
                tls: Option[TlsConfig] = None): String => String = {
    // resolved OUTSIDE the per-target closure body via lazy holder: one
    // SSLContext per JVM per fetcher, not one per request
    lazy val ssl = tls.map(buildSslContext)
    target => {
      val conn = new java.net.URL(s"$scheme://$target/metrics").openConnection()
      conn match {
        case https: javax.net.ssl.HttpsURLConnection =>
          ssl.foreach(ctx => https.setSSLSocketFactory(ctx.getSocketFactory))
          if (tls.exists(_.insecureSkipVerify))
            https.setHostnameVerifier((_, _) => true)
        case _ => ()
      }
      val http = conn.asInstanceOf[java.net.HttpURLConnection]
      http.setConnectTimeout(timeoutMs.toInt)
      http.setReadTimeout(timeoutMs.toInt)
      auth.flatMap(_.header).foreach(http.setRequestProperty("Authorization", _))
      val in = http.getInputStream
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally { in.close(); http.disconnect() }
    }
  }

  /** The fetcher a job's own knobs imply — plug into [[scrapeTick]] /
    * [[scrapeSink]] when no custom fetch is injected. */
  def jobFetch(job: ScrapeJob): String => String =
    httpFetch(job.scheme, job.timeoutMs, job.auth, job.tls)

  /** Build an SSLContext from PEM files: `ca_file` replaces the default
    * trust anchors, `cert_file`+`key_file` (PKCS#8 key) configure a
    * client certificate (mutual TLS), `insecure_skip_verify` trusts
    * everything. Pure JDK — CertificateFactory + KeyFactory — no
    * dependencies. */
  def buildSslContext(tls: TlsConfig): javax.net.ssl.SSLContext = {
    import java.security.KeyStore
    import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory, X509TrustManager}
    val trustManagers: Array[javax.net.ssl.TrustManager] =
      if (tls.insecureSkipVerify) Array(new X509TrustManager {
        def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
      })
      else tls.caFile match {
        case Some(ca) =>
          val cf = java.security.cert.CertificateFactory.getInstance("X.509")
          val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(ca))
          val certs = try cf.generateCertificates(in) finally in.close()
          val ks = KeyStore.getInstance(KeyStore.getDefaultType)
          ks.load(null, null)
          val it = certs.iterator()
          var i = 0
          while (it.hasNext) { ks.setCertificateEntry(s"ca$i", it.next()); i += 1 }
          val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
          tmf.init(ks)
          tmf.getTrustManagers
        case None => null // JDK default trust anchors
      }
    val keyManagers: Array[javax.net.ssl.KeyManager] =
      (tls.certFile, tls.keyFile) match {
        case (Some(cert), Some(key)) =>
          val cf = java.security.cert.CertificateFactory.getInstance("X.509")
          val cin = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(cert))
          val chain = try cf.generateCertificates(cin).toArray(
            Array.empty[java.security.cert.Certificate]) finally cin.close()
          val pem = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(key)), java.nio.charset.StandardCharsets.US_ASCII)
          val der = java.util.Base64.getMimeDecoder.decode(
            pem.replaceAll("-----[A-Z ]+-----", "").trim)
          val spec = new java.security.spec.PKCS8EncodedKeySpec(der)
          val pk = Seq("RSA", "EC", "DSA").view.flatMap { alg =>
            try Some(java.security.KeyFactory.getInstance(alg).generatePrivate(spec))
            catch { case _: java.security.spec.InvalidKeySpecException => None }
          }.headOption.getOrElse(throw new IllegalArgumentException(
            s"unsupported private key in $key (PKCS#8 RSA/EC/DSA expected)"))
          val ks = KeyStore.getInstance(KeyStore.getDefaultType)
          ks.load(null, null)
          ks.setKeyEntry("client", pk, Array.empty[Char], chain)
          val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
          kmf.init(ks, Array.empty[Char])
          kmf.getKeyManagers
        case _ => null
      }
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(keyManagers, trustManagers, null)
    ctx
  }

  // ---- file-based service discovery (file_sd_configs) -------------------

  /** One target group from a file_sd JSON file:
    * `[{"targets": ["h:p", ...], "labels": {"k": "v", ...}}, ...]`. */
  final case class FileSdGroup(targets: Seq[String], labels: Map[String, String])

  /** Read a file_sd file NOW — [[resolveTargets]] re-reads on every tick,
    * which IS Prometheus' reload semantics for file SD (change the file,
    * the next scrape sees the new target set; no restart). A missing or
    * malformed file contributes no targets (a broken SD file must not
    * take down the whole job). */
  def readFileSd(path: String): Seq[FileSdGroup] =
    try {
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
      parseSdGroups(text)
    } catch { case scala.util.control.NonFatal(_) => Nil }

  /** Parse the target-group JSON both file SD and HTTP SD speak. */
  private def parseSdGroups(text: String): Seq[FileSdGroup] =
    try {
      graft.api.MiniJson.parse(text) match {
        case groups: List[_] => groups.flatMap {
          case g: Map[_, _] =>
            val m = g.asInstanceOf[Map[String, Any]]
            val targets = m.get("targets") match {
              case Some(ts: List[_]) => ts.collect { case s: String => s }
              case _ => Nil
            }
            val labels = m.get("labels") match {
              case Some(ls: Map[_, _]) => ls.asInstanceOf[Map[String, Any]]
                .collect { case (k, v: String) => (k, v) }
              case _ => Map.empty[String, String]
            }
            if (targets.isEmpty) Nil else Seq(FileSdGroup(targets, labels))
          case _ => Nil
        }
        case _ => Nil
      }
    } catch { case scala.util.control.NonFatal(_) => Nil }

  /** HTTP-based service discovery (`http_sd_configs`, the generic
    * Prometheus HTTP SD that vendor integrations are built on): GET the
    * url, parse the SAME target-group JSON file SD uses. Re-fetched per
    * tick like file SD; the job's auth/TLS knobs apply to the SD request
    * too. A failing or malformed endpoint contributes no targets — SD
    * outages must not take down the job. */
  def readHttpSd(url: String, timeoutMs: Long = 10000L,
                 auth: Option[AuthConfig] = None,
                 tls: Option[TlsConfig] = None): Seq[FileSdGroup] =
    try {
      val conn = new java.net.URL(url).openConnection()
      conn match {
        case https: javax.net.ssl.HttpsURLConnection =>
          tls.map(buildSslContext)
            .foreach(c => https.setSSLSocketFactory(c.getSocketFactory))
          if (tls.exists(_.insecureSkipVerify))
            https.setHostnameVerifier((_, _) => true)
        case _ => ()
      }
      val http = conn.asInstanceOf[java.net.HttpURLConnection]
      http.setConnectTimeout(timeoutMs.toInt)
      http.setReadTimeout(timeoutMs.toInt)
      auth.flatMap(_.header).foreach(http.setRequestProperty("Authorization", _))
      val in = http.getInputStream
      // bounded read: a misbehaving SD endpoint must not OOM the driver
      val bytes = try in.readNBytes(8 * 1024 * 1024)
        finally { in.close(); http.disconnect() }
      parseSdGroups(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    } catch { case scala.util.control.NonFatal(_) => Nil }

  // ---- DNS service discovery (dns_sd_configs) ---------------------------

  /** `dns_sd_configs` entry: SRV records carry their own host+port; A /
    * AAAA records need the configured `port`. */
  final case class DnsSdConfig(names: Seq[String], recordType: String = "SRV",
                               port: Int = 0)

  /** One DNS lookup: (name, recordType) → (host, port) records, port 0
    * for address records. Injectable so SD behavior is testable without
    * a live resolver; [[jdkDnsLookup]] is the production default. */
  type DnsLookup = (String, String) => Seq[(String, Int)]

  /** Production resolver, pure JDK: SRV via the JNDI DNS provider
    * (`com.sun.jndi.dns`), A/AAAA via `InetAddress.getAllByName`
    * filtered to the requested family. */
  val jdkDnsLookup: DnsLookup = (name, recordType) => recordType match {
    case "SRV" =>
      val env = new java.util.Hashtable[String, String]()
      env.put(javax.naming.Context.INITIAL_CONTEXT_FACTORY,
        "com.sun.jndi.dns.DnsContextFactory")
      env.put(javax.naming.Context.PROVIDER_URL, "dns:")
      val ctx = new javax.naming.directory.InitialDirContext(env)
      try {
        val attr = ctx.getAttributes(name, Array("SRV")).get("SRV")
        if (attr == null) Nil
        else (0 until attr.size()).flatMap { i =>
          // RDATA text: "priority weight port target"
          attr.get(i).toString.trim.split("\\s+") match {
            case Array(_, _, p, t) =>
              scala.util.Try((t.stripSuffix("."), p.toInt)).toOption
            case _ => None
          }
        }
      } finally ctx.close()
    case rt =>
      java.net.InetAddress.getAllByName(name).toSeq.filter {
        case _: java.net.Inet4Address => rt == "A"
        case _: java.net.Inet6Address => rt == "AAAA"
        case _ => false
      }.map(a => (a.getHostAddress, 0))
  }

  /** Resolve one `dns_sd_configs` entry NOW (per tick, like every other
    * SD source). SRV targets use the record's host:port and carry
    * `__meta_dns_srv_record_target`/`__meta_dns_srv_record_port`;
    * A/AAAA targets use the configured port. Every target carries
    * `__meta_dns_name`. A failing lookup contributes no targets. */
  def readDnsSd(cfg: DnsSdConfig,
                lookup: DnsLookup = jdkDnsLookup): Seq[FileSdGroup] =
    cfg.names.flatMap { name =>
      val records = try lookup(name, cfg.recordType)
        catch { case scala.util.control.NonFatal(_) => Nil }
      records.flatMap { case (host, port) =>
        if (cfg.recordType == "SRV")
          Some(FileSdGroup(Seq(s"$host:$port"), Map(
            "__meta_dns_name" -> name,
            "__meta_dns_srv_record_target" -> host,
            "__meta_dns_srv_record_port" -> port.toString)))
        else if (cfg.port > 0)
          Some(FileSdGroup(Seq(s"$host:${cfg.port}"),
            Map("__meta_dns_name" -> name)))
        else None // address records without a configured port are unusable
      }
    }

  // ---- Consul service discovery (consul_sd_configs) ---------------------

  /** `consul_sd_configs` entry: catalog server, service names to watch,
    * optional ACL token and datacenter. */
  final case class ConsulSdConfig(server: String, services: Seq[String],
                                  scheme: String = "http",
                                  token: Option[String] = None,
                                  datacenter: Option[String] = None)

  /** Resolve one `consul_sd_configs` entry NOW against the Consul
    * catalog HTTP API (`GET /v1/catalog/service/<name>`; the public,
    * stable discovery surface every Consul version speaks). Targets are
    * `ServiceAddress:ServicePort` (falling back to the node `Address`),
    * with `__meta_consul_service`/`__meta_consul_node`/
    * `__meta_consul_dc`/`__meta_consul_tags` labels (tags
    * comma-wrapped, as Prometheus exposes them for regex matching).
    * Failing or malformed catalog responses contribute no targets. */
  def readConsulSd(cfg: ConsulSdConfig, timeoutMs: Long = 10000L,
                   tls: Option[TlsConfig] = None): Seq[FileSdGroup] =
    cfg.services.flatMap { svc =>
      try {
        val dc = cfg.datacenter.map(d => s"?dc=$d").getOrElse("")
        val url = s"${cfg.scheme}://${cfg.server}/v1/catalog/service/$svc$dc"
        val body = sdHttpGet(url, timeoutMs,
          cfg.token.map("X-Consul-Token" -> _).toMap, tls,
          maxBytes = 8 * 1024 * 1024)
        body.map(graft.api.MiniJson.parse).getOrElse(Nil) match {
          case entries: List[_] => entries.flatMap {
            case e: Map[_, _] =>
              val m = e.asInstanceOf[Map[String, Any]]
              def str(k: String) = m.get(k).collect { case s: String => s }
              val port = m.get("ServicePort") match {
                case Some(d: Double) => d.toInt
                case Some(i: Int) => i
                case _ => 0
              }
              val host = str("ServiceAddress").filter(_.nonEmpty)
                .orElse(str("Address")).getOrElse("")
              if (host.isEmpty || port <= 0) Nil
              else {
                val tags = m.get("ServiceTags") match {
                  case Some(ts: List[_]) => ts.collect { case s: String => s }
                  case _ => Nil
                }
                Seq(FileSdGroup(Seq(s"$host:$port"),
                  Map("__meta_consul_service" -> svc) ++
                    str("Node").map("__meta_consul_node" -> _) ++
                    str("Datacenter").map("__meta_consul_dc" -> _) ++
                    (if (tags.isEmpty) Map.empty[String, String]
                     else Map("__meta_consul_tags" ->
                       tags.mkString(",", ",", ",")))))
              }
            case _ => Nil
          }
          case _ => Nil
        }
      } catch { case scala.util.control.NonFatal(_) => Nil }
    }

  // ---- Kubernetes service discovery (kubernetes_sd_configs) -------------

  /** `kubernetes_sd_configs` entry: API-server address, discovery role
    * (`pod` | `endpoints` | `service` | `node`), optional namespace pin
    * (empty = all namespaces) and bearer token (inline or file — the
    * in-cluster serviceaccount path is the usual file). */
  final case class KubernetesSdConfig(
      apiServer: String,
      role: String = "pod",
      namespaces: Seq[String] = Nil,
      scheme: String = "https",
      token: Option[String] = None,
      tokenFile: Option[String] = None)

  /** Prometheus label-name sanitization for k8s label/annotation keys. */
  private def k8sLabelKey(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == '_') c else '_')

  /** One bounded GET against an SD HTTP API; None on any failure (a dead
    * SD source contributes no targets, like every other SD here).
    * `headers` is BY NAME so header construction that itself touches the
    * world (e.g. reading a bearer_token_file) fails inside the same
    * boundary. `maxBytes` defaults generously — a k8s LIST of a few
    * thousand pods easily passes 16 MB, and a silent truncation would
    * read as an empty cluster. */
  private def sdHttpGet(url: String, timeoutMs: Long,
                        headers: => Map[String, String],
                        tls: Option[TlsConfig],
                        maxBytes: Int = 64 * 1024 * 1024): Option[String] =
    try {
      val hdrs = headers
      val conn = new java.net.URL(url).openConnection()
      conn match {
        case https: javax.net.ssl.HttpsURLConnection =>
          tls.map(buildSslContext)
            .foreach(c => https.setSSLSocketFactory(c.getSocketFactory))
          if (tls.exists(_.insecureSkipVerify))
            https.setHostnameVerifier((_, _) => true)
        case _ => ()
      }
      val http = conn.asInstanceOf[java.net.HttpURLConnection]
      http.setConnectTimeout(timeoutMs.toInt)
      http.setReadTimeout(timeoutMs.toInt)
      hdrs.foreach { case (k, v) => http.setRequestProperty(k, v) }
      val in = http.getInputStream
      val bytes = try in.readNBytes(maxBytes)
        finally { in.close(); http.disconnect() }
      Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    } catch { case scala.util.control.NonFatal(_) => None }

  // MiniJson accessors for the k8s object walks
  private def jMap(a: Any): Map[String, Any] = a match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case _ => Map.empty
  }
  private def jList(a: Any): List[Any] = a match {
    case l: List[_] => l
    case _ => Nil
  }
  private def jStr(m: Map[String, Any], k: String): Option[String] =
    m.get(k).collect { case s: String => s }
  private def jInt(m: Map[String, Any], k: String): Option[Int] =
    m.get(k).collect { case d: Double => d.toInt; case i: Int => i }
  /** metadata.labels / metadata.annotations → `__meta_kubernetes_<kind>_label_x`. */
  private def k8sMetaLabels(meta: Map[String, Any], kind: String): Map[String, String] =
    jMap(meta.getOrElse("labels", Map.empty)).collect { case (k, v: String) =>
      s"__meta_kubernetes_${kind}_label_${k8sLabelKey(k)}" -> v
    } ++
      jMap(meta.getOrElse("annotations", Map.empty)).collect { case (k, v: String) =>
        s"__meta_kubernetes_${kind}_annotation_${k8sLabelKey(k)}" -> v
      }

  /** Resolve one `kubernetes_sd_configs` entry NOW against the public
    * Kubernetes REST API (`GET /api/v1/[namespaces/<ns>/]pods|endpoints|
    * services`, `/api/v1/nodes`) and project targets + `__meta_kubernetes_*`
    * labels per the documented Prometheus role semantics:
    *
    *  - `pod`: one target per declared container port (`podIP:port`; a pod
    *    with no declared ports contributes the bare pod IP for relabelling
    *    to fix up), with namespace/name/IP/phase/ready/node and pod
    *    label/annotation meta labels.
    *  - `endpoints`: one target per subset address × port, ready and
    *    not-ready (`__meta_kubernetes_endpoint_ready`), with the backing
    *    pod's name when the address targetRef is a Pod.
    *  - `service`: one target per service port on the cluster IP.
    *  - `node`: one target per node at the kubelet daemon port (InternalIP
    *    preferred, first address otherwise), with node meta labels.
    *
    * Failing or malformed API responses contribute no targets; the watch
    * API is deliberately not used — per-tick LIST is the same
    * convergence model as every other SD source here. */
  def readKubernetesSd(cfg: KubernetesSdConfig, timeoutMs: Long = 10000L,
                       tls: Option[TlsConfig] = None): Seq[FileSdGroup] = {
    val auth = AuthConfig(bearerToken = cfg.token, bearerTokenFile = cfg.tokenFile)
    // by-name into sdHttpGet: a missing bearer_token_file fails INSIDE
    // the no-targets boundary instead of crashing the whole scrape tick
    def headers = auth.header.map("Authorization" -> _).toMap
    def fetch(path: String): List[Any] =
      sdHttpGet(s"${cfg.scheme}://${cfg.apiServer}$path", timeoutMs, headers, tls)
        .map(s => jList(jMap(graft.api.MiniJson.parse(s)).getOrElse("items", Nil)))
        .getOrElse(Nil)
    def listNamespaced(kind: String): List[Any] =
      if (cfg.namespaces.isEmpty) fetch(s"/api/v1/$kind")
      else cfg.namespaces.toList.flatMap(ns => fetch(s"/api/v1/namespaces/$ns/$kind"))

    cfg.role match {
      case "pod" =>
        listNamespaced("pods").flatMap { p =>
          val pod = jMap(p)
          val meta = jMap(pod.getOrElse("metadata", Map.empty))
          val spec = jMap(pod.getOrElse("spec", Map.empty))
          val status = jMap(pod.getOrElse("status", Map.empty))
          jStr(status, "podIP").toSeq.flatMap { ip =>
            val ready = jList(status.getOrElse("conditions", Nil)).exists { c =>
              jStr(jMap(c), "type").contains("Ready") &&
                jStr(jMap(c), "status").contains("True")
            }
            val base = Map(
              "__meta_kubernetes_namespace" -> jStr(meta, "namespace").getOrElse(""),
              "__meta_kubernetes_pod_name" -> jStr(meta, "name").getOrElse(""),
              "__meta_kubernetes_pod_ip" -> ip,
              "__meta_kubernetes_pod_ready" -> (if (ready) "true" else "false"),
              "__meta_kubernetes_pod_phase" -> jStr(status, "phase").getOrElse("")) ++
              jStr(spec, "nodeName").map("__meta_kubernetes_pod_node_name" -> _) ++
              k8sMetaLabels(meta, "pod")
            val ports = for {
              c <- jList(spec.getOrElse("containers", Nil))
              cm = jMap(c)
              port <- jList(cm.getOrElse("ports", Nil))
              pm = jMap(port)
              num <- jInt(pm, "containerPort")
            } yield FileSdGroup(Seq(s"$ip:$num"), base ++
              jStr(cm, "name").map("__meta_kubernetes_pod_container_name" -> _) ++
              jStr(pm, "name").map("__meta_kubernetes_pod_container_port_name" -> _) +
              ("__meta_kubernetes_pod_container_port_number" -> num.toString))
            if (ports.nonEmpty) ports else Seq(FileSdGroup(Seq(ip), base))
          }
        }
      case "endpoints" =>
        listNamespaced("endpoints").flatMap { e =>
          val ep = jMap(e)
          val meta = jMap(ep.getOrElse("metadata", Map.empty))
          val base = Map(
            "__meta_kubernetes_namespace" -> jStr(meta, "namespace").getOrElse(""),
            "__meta_kubernetes_endpoints_name" -> jStr(meta, "name").getOrElse(""))
          for {
            subset <- jList(ep.getOrElse("subsets", Nil))
            sm = jMap(subset)
            (addrKey, ready) <- Seq("addresses" -> "true", "notReadyAddresses" -> "false")
            addr <- jList(sm.getOrElse(addrKey, Nil))
            am = jMap(addr)
            ip <- jStr(am, "ip").toSeq
            port <- jList(sm.getOrElse("ports", Nil))
            pm = jMap(port)
            num <- jInt(pm, "port").toSeq
          } yield {
            val ref = jMap(am.getOrElse("targetRef", Map.empty))
            FileSdGroup(Seq(s"$ip:$num"), base ++
              jStr(pm, "name").map("__meta_kubernetes_endpoint_port_name" -> _) ++
              jStr(pm, "protocol").map("__meta_kubernetes_endpoint_port_protocol" -> _) ++
              (if (jStr(ref, "kind").contains("Pod"))
                jStr(ref, "name").map("__meta_kubernetes_pod_name" -> _)
              else None) +
              ("__meta_kubernetes_endpoint_ready" -> ready))
          }
        }
      case "service" =>
        listNamespaced("services").flatMap { s =>
          val svc = jMap(s)
          val meta = jMap(svc.getOrElse("metadata", Map.empty))
          val spec = jMap(svc.getOrElse("spec", Map.empty))
          jStr(spec, "clusterIP").filter(ip => ip.nonEmpty && ip != "None").toSeq
            .flatMap { ip =>
              val base = Map(
                "__meta_kubernetes_namespace" -> jStr(meta, "namespace").getOrElse(""),
                "__meta_kubernetes_service_name" -> jStr(meta, "name").getOrElse(""),
                "__meta_kubernetes_service_cluster_ip" -> ip) ++
                k8sMetaLabels(meta, "service")
              jList(spec.getOrElse("ports", Nil)).flatMap { port =>
                val pm = jMap(port)
                jInt(pm, "port").map { num =>
                  FileSdGroup(Seq(s"$ip:$num"), base ++
                    jStr(pm, "name").map("__meta_kubernetes_service_port_name" -> _) ++
                    jStr(pm, "protocol").map("__meta_kubernetes_service_port_protocol" -> _))
                }
              }
            }
        }
      case "node" =>
        fetch("/api/v1/nodes").flatMap { n =>
          val node = jMap(n)
          val meta = jMap(node.getOrElse("metadata", Map.empty))
          val status = jMap(node.getOrElse("status", Map.empty))
          val addrs = jList(status.getOrElse("addresses", Nil)).map(jMap)
          val addr = addrs.find(a => jStr(a, "type").contains("InternalIP"))
            .orElse(addrs.headOption).flatMap(jStr(_, "address"))
          val port = jInt(jMap(jMap(status.getOrElse("daemonEndpoints", Map.empty))
            .getOrElse("kubeletEndpoint", Map.empty)), "Port").getOrElse(10250)
          addr.map { ip =>
            FileSdGroup(Seq(s"$ip:$port"),
              Map("__meta_kubernetes_node_name" -> jStr(meta, "name").getOrElse("")) ++
                k8sMetaLabels(meta, "node"))
          }
        }
      case _ => Nil
    }
  }

  /** A job's target set at THIS instant: static_configs targets (no extra
    * labels) plus every file_sd / http_sd / dns_sd / consul_sd /
    * kubernetes_sd group's targets with the group's labels — SD sources
    * re-read per call, so changes are picked up on the next tick. */
  def resolveTargets(job: ScrapeJob,
                     dnsLookup: DnsLookup = jdkDnsLookup): Seq[(String, Map[String, String])] =
    job.targets.map((_, Map.empty[String, String])) ++
      (job.fileSdFiles.flatMap(readFileSd) ++
        job.httpSdUrls.flatMap(readHttpSd(_, job.timeoutMs, job.auth, job.tls)) ++
        job.dnsSd.flatMap(readDnsSd(_, dnsLookup)) ++
        job.consulSd.flatMap(readConsulSd(_, job.timeoutMs, job.tls)) ++
        job.kubernetesSd.flatMap(readKubernetesSd(_, job.timeoutMs, job.tls)))
        .flatMap(g => g.targets.map((_, g.labels)))

  /** Prometheus relabelling subset over a target's labelset. Regexes are
    * fully anchored (as in prometheus/relabel); `replace` expands $1..$9
    * into target_label (an empty result deletes the label), `keep`/`drop`
    * filter the whole target. Returns None when the target is dropped. */
  def relabel(labels: Map[String, String],
              rules: Seq[RelabelRule]): Option[Map[String, String]] =
    rules.foldLeft(Option(labels)) {
      case (None, _) => None
      case (Some(ls), r) =>
        val src = r.sourceLabels.map(ls.getOrElse(_, "")).mkString(r.separator)
        val m = java.util.regex.Pattern.compile(r.regex).matcher(src)
        r.action match {
          case "keep" => if (m.matches()) Some(ls) else None
          case "drop" => if (m.matches()) None else Some(ls)
          case "replace" =>
            if (!m.matches() || r.targetLabel.isEmpty) Some(ls)
            else {
              // a reference to a group the regex does not define expands to
              // "" (Go regexp.ExpandString semantics), not an exception
              val value = "\\$(\\d)".r.replaceAllIn(r.replacement, g => {
                val idx = g.group(1).toInt
                scala.util.matching.Regex.quoteReplacement(
                  if (idx > m.groupCount()) ""
                  else Option(m.group(idx)).getOrElse(""))
              })
              if (value.isEmpty) Some(ls - r.targetLabel)
              else Some(ls + (r.targetLabel -> value))
            }
          case other =>
            throw new IllegalArgumentException(s"unsupported relabel action $other")
        }
    }

  /** Scrape one configured job NOW: apply relabelling to each target's
    * initial labelset (job, __address__) on the driver (cheap, per-target),
    * drop filtered targets BEFORE any fetch (Prometheus drops at relabel
    * time), default `instance` from the (possibly rewritten) address,
    * strip `__` meta labels, and merge the target labels over each
    * sample's own.
    *
    * `distributed = true` runs fetch + parse on EXECUTORS (the surviving
    * target list becomes a Dataset, one fetch per row inside
    * mapPartitions) — the fleet-scale shape, where the driver-side
    * variant serializes every target's HTTP latency onto one thread. The
    * fetch closure must then be executor-serializable ([[httpFetch]] is). */
  def scrapeJob(spark: SparkSession, job: ScrapeJob,
                fetch: String => String, tsMs: Long,
                distributed: Boolean = false): DataFrame =
    scrapeResolved(spark, job, resolveTargets(job), fetch, tsMs, distributed)

  /** Execute a scrape over an explicit (target, sd-labels) set — the
    * scheduler filters the resolved set by interval before calling this. */
  private def scrapeResolved(spark: SparkSession, job: ScrapeJob,
                             targets: Seq[(String, Map[String, String])],
                             fetch: String => String, tsMs: Long,
                             distributed: Boolean): DataFrame = {
    val resolved: Seq[(String, Map[String, String])] =
      targets.flatMap { case (target, sdLabels) =>
        // file-SD group labels join the initial labelset BEFORE relabelling
        // (so rules can route on them), like the Prometheus SD pipeline
        relabel(sdLabels ++ Map("job" -> job.jobName, "__address__" -> target),
          job.relabel) match {
          case None => Nil
          case Some(ls0) =>
            val instance = ls0.getOrElse("instance", ls0.getOrElse("__address__", target))
            Seq((target, ls0.filterNot(_._1.startsWith("__")) + ("instance" -> instance)))
        }
      }
    if (!distributed) {
      toPoints(spark, resolved.flatMap { case (target, targetLabels) =>
        parseExposition(fetch(target), tsMs)
          .map(p => (p.name, p.labels ++ targetLabels, p.t, p.value))
      })
    } else if (resolved.isEmpty) toPoints(spark, Nil)
    else {
      import spark.implicits._
      val slots = math.max(1,
        math.min(resolved.size, spark.sparkContext.defaultParallelism))
      val parsed = spark.createDataset(resolved)
        .repartition(slots) // spread fetch latency across executor slots
        .mapPartitions(_.flatMap { case (target, targetLabels) =>
          parseExposition(fetch(target), tsMs)
            .map(p => (p.name, p.labels ++ targetLabels, p.t, p.value))
        })
      finitePoints(parsed.toDF("name", "labels", "t", "value"))
    }
  }

  /** One interval-scheduler tick over `jobs`: scrape exactly the targets
    * whose `scrape_interval` has elapsed since `lastRun` (keyed
    * "job/target"; never-scraped targets are due immediately), returning
    * the appended points and the advanced schedule state. Pure — the
    * caller owns the loop (cron, or foreachBatch on a trigger stream),
    * matching the reference where the Prometheus scrape manager owns
    * per-target timers. */
  def scrapeTick(spark: SparkSession, jobs: Seq[ScrapeJob],
                 fetch: String => String, nowMs: Long,
                 lastRun: Map[String, Long] = Map.empty,
                 distributed: Boolean = false)
      : (DataFrame, Map[String, Long]) = {
    // file-SD files are re-read here, every tick — target-set changes land
    // on the next interval with no restart (Prometheus file SD semantics)
    val due = jobs.map { job =>
      (job, resolveTargets(job).filter { case (t, _) =>
        lastRun.get(s"${job.jobName}/$t").forall(nowMs - _ >= job.intervalMs)
      })
    }.filter(_._2.nonEmpty)
    val dfs = due.map { case (job, targets) =>
      scrapeResolved(spark, job, targets, fetch, nowMs, distributed)
    }
    val points =
      if (dfs.isEmpty) toPoints(spark, Nil)
      else dfs.reduce(_ unionByName _)
    val advanced = lastRun ++ due.flatMap { case (job, targets) =>
      targets.map { case (t, _) => s"${job.jobName}/$t" -> nowMs }
    }
    (points, advanced)
  }

  /** Scheduler state for [[scrapeTickStale]]: the last-run schedule plus
    * each target's last-successful-scrape series set — the driver-side
    * analog of the Prometheus scrape cache, which is exactly what
    * staleness tracking needs (engine.go:1910-1916 consumes the markers
    * the scrape loop's cache emits). Sized by (due targets × their
    * series), the same order as Prometheus's own per-target cache. */
  final case class TickState(
      lastRun: Map[String, Long] = Map.empty,
      lastSeries: Map[String, Seq[(String, Map[String, String])]] = Map.empty)

  /** [[scrapeTick]] with Prometheus staleness-marker semantics: when a
    * series present at a target's previous scrape is absent at this one —
    * the target stopped exposing it, the fetch FAILED, or the target left
    * service discovery — a stale marker row (`stale = true`, value NaN)
    * is appended at this tick's timestamp, so instant selectors knock the
    * series out immediately instead of serving its last sample for a full
    * lookback window. The engine already consumes the markers
    * (Selectors.instant; corpus staleness suite) — this is the producer
    * side the reference gets from the vendored Prometheus scrape loop.
    *
    * The returned points carry a `stale` boolean column (false on real
    * samples): sinks deploying this tick write stores whose schema is
    * stale-aware from the first batch. A failed fetch no longer aborts
    * the tick — the target's series go stale and the schedule advances
    * (Prometheus records the failure and keeps scraping). */
  def scrapeTickStale(spark: SparkSession, jobs: Seq[ScrapeJob],
                      fetch: String => String, nowMs: Long,
                      state: TickState = TickState(),
                      distributed: Boolean = false)
      : (DataFrame, TickState) = {
    import spark.implicits._
    val resolvedAll = jobs.map(j => (j, resolveTargets(j)))
    val due = resolvedAll.map { case (job, ts) =>
      (job, ts.filter { case (t, _) =>
        state.lastRun.get(s"${job.jobName}/$t").forall(nowMs - _ >= job.intervalMs)
      })
    }.filter(_._2.nonEmpty)
    val tracked = due.map { case (job, targets) =>
      scrapeResolvedTracked(spark, job, targets, fetch, nowMs, distributed)
    }
    // one materialization of the fetched batch (localCheckpoint truncates
    // lineage into executor storage), so the series-cache collect below and
    // the caller's append do NOT each re-fetch every target
    val fetched =
      if (tracked.isEmpty)
        Seq.empty[(String, String, Map[String, String], Long, Double, Boolean)]
          .toDF("__key", "name", "labels", "t", "value", "__ok")
      else tracked.reduce(_ unionByName _).localCheckpoint(true)
    // refresh the per-target series cache: distinct (key, series) of this
    // tick's successful scrapes — series-count-sized, the Prometheus
    // scrape-cache analog (NOT sample-sized; samples stay distributed)
    val okRows = fetched.where(col("__ok") && col("name").isNotNull)
    // the cache must see exactly what the STORE sees: a series whose
    // samples this tick are all NaN/Inf is dropped by finitePoints below,
    // so caching it would (a) suppress the stale marker a series that
    // flipped to NaN-only deserves and (b) later emit markers for series
    // that never reached the store
    val finiteOk = okRows.where(!col("value").isNaN &&
      col("value") =!= Double.PositiveInfinity &&
      col("value") =!= Double.NegativeInfinity)
    // dedup per series via the canonical label string (set ops/distinct
    // are unsupported on MapType columns)
    val seriesNow: Map[String, Seq[(String, Map[String, String])]] =
      Points.withCanonical(finiteOk.select(col("__key"), col("name"), col("labels")))
        .dropDuplicates("__key", "name", "_lc")
        .select(col("__key"), col("name"), col("labels"))
        .collect()
        .map(r => (r.getString(0),
          (r.getString(1), r.getMap[String, String](2).toMap)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val okKeys: Set[String] = fetched.where(col("__ok"))
      .select(col("__key")).distinct().collect().map(_.getString(0)).toSet
    val dueKeys: Set[String] = due.flatMap { case (job, ts) =>
      ts.map { case (t, _) => s"${job.jobName}/$t" }
    }.toSet
    // keys whose previous series need the absent-series diff this tick:
    //  - failed fetches (due but not ok): ALL previous series go stale
    //  - successful scrapes: series missing from this exposition go stale
    //  - targets gone from SD entirely (config/SD change): all go stale
    val currentKeys: Set[String] = resolvedAll.flatMap { case (job, ts) =>
      ts.map { case (t, _) => s"${job.jobName}/$t" }
    }.toSet
    val goneKeys = state.lastSeries.keySet -- currentKeys
    val staleSeries: Seq[(String, Map[String, String])] =
      ((dueKeys -- okKeys) ++ goneKeys).toSeq.sorted
        .flatMap(k => state.lastSeries.getOrElse(k, Nil)) ++
        okKeys.toSeq.sorted.flatMap { k =>
          val now = seriesNow.getOrElse(k, Nil).toSet
          state.lastSeries.getOrElse(k, Nil).filterNot(now.contains)
        }
    val points = finitePoints(
      okRows.select(col("name"), col("labels"), col("t"), col("value")))
      .withColumn("stale", lit(false))
    val markers = Points.withSig(
      staleSeries.map { case (n, ls) => (n, ls, nowMs, Double.NaN) }
        .toDF("name", "labels", "t", "value"))
      .withColumn("stale", lit(true))
    val advanced = state.lastRun ++ dueKeys.map(_ -> nowMs)
    // cache update: ok targets take this tick's series; failed DUE targets
    // are cleared (their series were just marked stale — a later recovery
    // re-adds them); gone targets drop out of the cache
    val newSeries = (state.lastSeries -- goneKeys -- (dueKeys -- okKeys)) ++
      okKeys.map(k => k -> seriesNow.getOrElse(k, Nil))
    (points.unionByName(markers), TickState(advanced, newSeries))
  }

  /** Per-target tracked scrape for [[scrapeTickStale]]: same relabel +
    * fetch + parse as [[scrapeResolved]], but each row carries its target
    * key and fetch outcome, and a fetch failure yields a sentinel row
    * instead of aborting the job (an empty-but-successful exposition
    * yields an ok sentinel, so the series cache correctly empties). */
  private def scrapeResolvedTracked(spark: SparkSession, job: ScrapeJob,
                                    targets: Seq[(String, Map[String, String])],
                                    fetch: String => String, tsMs: Long,
                                    distributed: Boolean): DataFrame = {
    import spark.implicits._
    val jobName = job.jobName
    val resolved: Seq[(String, Map[String, String])] =
      targets.flatMap { case (target, sdLabels) =>
        relabel(sdLabels ++ Map("job" -> jobName, "__address__" -> target),
          job.relabel) match {
          case None => Nil
          case Some(ls0) =>
            val instance = ls0.getOrElse("instance", ls0.getOrElse("__address__", target))
            Seq((target, ls0.filterNot(_._1.startsWith("__")) + ("instance" -> instance)))
        }
      }
    def rows(target: String, targetLabels: Map[String, String])
        : Seq[(String, String, Map[String, String], Long, Double, Boolean)] = {
      val key = s"$jobName/$target"
      try {
        val ps = parseExposition(fetch(target), tsMs)
          .map(p => (key, p.name, p.labels ++ targetLabels, p.t, p.value, true))
        if (ps.isEmpty) Seq((key, null, null, tsMs, 0.0, true)) else ps
      } catch {
        case scala.util.control.NonFatal(_) =>
          Seq((key, null, null, tsMs, 0.0, false))
      }
    }
    val cols = Seq("__key", "name", "labels", "t", "value", "__ok")
    if (!distributed || resolved.isEmpty)
      resolved.flatMap((rows _).tupled).toDF(cols: _*)
    else {
      val slots = math.max(1,
        math.min(resolved.size, spark.sparkContext.defaultParallelism))
      spark.createDataset(resolved)
        .repartition(slots)
        .mapPartitions(_.flatMap((rows _).tupled))
        .toDF(cols: _*)
    }
  }

  /** `writeStream.foreachBatch` deployment of the interval scheduler: feed
    * it a trigger stream carrying a `t` epoch-ms column (a rate source in
    * production, a MemoryStream in tests); each micro-batch ticks the
    * scheduler at the batch's max trigger time and appends due scrapes to
    * the store. The `lastRun` schedule state lives in the returned sink's
    * closure — one scheduler per stream, like the reference's scrape
    * manager owning per-target timers; the target fan-out and the parse
    * happen inside the tick's Spark job.
    *
    * The deployment default is the EXECUTOR-SIDE fetch (`distributed =
    * true`): the due-target list fans out across the cluster and each
    * partition fetches + parses its targets, so a fleet of thousands of
    * targets is limited by executor slots, not one driver thread. Pass a
    * serializable fetch ([[httpFetch]] honors each job's scheme/timeout
    * knobs when partially applied per job) or set `distributed = false`
    * for a driver-side fetch closure. */
  def scrapeSink(jobs: Seq[ScrapeJob], fetch: String => String,
                 storeDir: String,
                 distributed: Boolean = true): (DataFrame, Long) => Unit = {
    // the stale-aware tick: a dead or vanished target's series get their
    // stale markers on the next tick (Prometheus scrape-loop semantics)
    // instead of lingering for a lookback window; the store's schema is
    // stale-aware from the first batch
    var state = TickState()
    (batch, _) => {
      val maxT = batch.agg(org.apache.spark.sql.functions.max(col("t"))).head.getAs[Any](0)
      if (maxT != null) {
        val nowMs = maxT.asInstanceOf[Long]
        val (points, advanced) =
          scrapeTickStale(batch.sparkSession, jobs, fetch, nowMs, state, distributed)
        state = advanced
        if (!points.isEmpty) PointsStore.append(points, storeDir)
      }
    }
  }

  /** Parse the scrape_configs YAML subset (same hand-rolled narrow parser
    * approach as [[graft.rules.RuleFiles]] — zero-egress build, no YAML
    * dependency): job_name, scrape_interval, static_configs flow-list
    * targets, relabel_configs entries. */
  def parseScrapeConfigs(text: String): Seq[ScrapeJob] = {
    val lines = text.split("\n").toIndexedSeq
      .map(stripComment).filter(_.trim.nonEmpty)
    val jobs = scala.collection.mutable.ArrayBuffer[ScrapeJob]()
    var jName = ""; var jInterval = 60000L
    var jScheme = "http"; var jTimeout = 10000L
    var jTargets = scala.collection.mutable.ArrayBuffer[String]()
    var jRules = scala.collection.mutable.ArrayBuffer[RelabelRule]()
    var jFileSd = scala.collection.mutable.ArrayBuffer[String]()
    var jHttpSd = scala.collection.mutable.ArrayBuffer[String]()
    var jDns = scala.collection.mutable.ArrayBuffer[DnsSdConfig]()
    var jConsul = scala.collection.mutable.ArrayBuffer[ConsulSdConfig]()
    var jK8s = scala.collection.mutable.ArrayBuffer[KubernetesSdConfig]()
    // which *_sd_configs section subsequent scalar keys belong to — the
    // flat (indentation-free) parser's stand-in for YAML nesting
    var sdMode = ""
    var jBearer: Option[String] = None; var jBearerFile: Option[String] = None
    var jUser: Option[String] = None; var jPass: Option[String] = None
    var jCa: Option[String] = None; var jCert: Option[String] = None
    var jKey: Option[String] = None; var jSkipVerify = false
    var inJob = false
    var rFields = scala.collection.mutable.Map[String, String]()
    var inRule = false

    def flushRule(): Unit = if (inRule) {
      jRules += RelabelRule(
        action = rFields.getOrElse("action", "replace"),
        sourceLabels = rFields.get("source_labels").map(parseFlowList).getOrElse(Nil),
        separator = rFields.getOrElse("separator", ";"),
        regex = rFields.getOrElse("regex", "(.*)"),
        targetLabel = rFields.getOrElse("target_label", ""),
        replacement = rFields.getOrElse("replacement", "$1"))
      rFields = scala.collection.mutable.Map(); inRule = false
    }
    def flushJob(): Unit = if (inJob) {
      val auth =
        if (jBearer.isEmpty && jBearerFile.isEmpty && jUser.isEmpty) None
        else Some(AuthConfig(jBearer, jBearerFile, jUser, jPass))
      val tls =
        if (jCa.isEmpty && jCert.isEmpty && jKey.isEmpty && !jSkipVerify) None
        else Some(TlsConfig(jCa, jCert, jKey, jSkipVerify))
      jobs += ScrapeJob(jName, jTargets.toSeq, jInterval, jRules.toSeq,
        scheme = jScheme, timeoutMs = jTimeout, auth = auth, tls = tls,
        fileSdFiles = jFileSd.toSeq, httpSdUrls = jHttpSd.toSeq,
        dnsSd = jDns.toSeq, consulSd = jConsul.toSeq,
        kubernetesSd = jK8s.toSeq)
      jTargets = scala.collection.mutable.ArrayBuffer()
      jRules = scala.collection.mutable.ArrayBuffer()
      jFileSd = scala.collection.mutable.ArrayBuffer()
      jHttpSd = scala.collection.mutable.ArrayBuffer()
      jDns = scala.collection.mutable.ArrayBuffer()
      jConsul = scala.collection.mutable.ArrayBuffer()
      jK8s = scala.collection.mutable.ArrayBuffer()
      sdMode = ""
      jBearer = None; jBearerFile = None; jUser = None; jPass = None
      jCa = None; jCert = None; jKey = None; jSkipVerify = false
      jInterval = 60000L; jScheme = "http"; jTimeout = 10000L; inJob = false
    }

    val relabelKeys = Set("action", "source_labels", "separator", "regex",
      "target_label", "replacement")
    var sdIndent = -1
    lines.foreach { line =>
      val t = line.trim
      // an SD block ends when indentation returns to (or above) its
      // header's level — without this, a job-level scalar placed AFTER
      // the SD block (maps are unordered in YAML) would be misread as an
      // SD-entry key (e.g. `scheme:` binding to the consul entry instead
      // of the job)
      if (sdMode.nonEmpty && t.nonEmpty &&
        line.takeWhile(_ == ' ').length <= sdIndent) sdMode = ""
      if (t == "scrape_configs:" || t == "static_configs:" || t == "relabel_configs:" ||
        t == "tls_config:" || t == "basic_auth:" || t == "file_sd_configs:" ||
        t == "http_sd_configs:") sdMode = ""
      else if (t == "dns_sd_configs:") { sdMode = "dns"; sdIndent = line.takeWhile(_ == ' ').length }
      else if (t == "consul_sd_configs:") { sdMode = "consul"; sdIndent = line.takeWhile(_ == ' ').length }
      else if (t == "kubernetes_sd_configs:") { sdMode = "k8s"; sdIndent = line.takeWhile(_ == ' ').length }
      else if (t.startsWith("- job_name:")) {
        flushRule(); flushJob()
        inJob = true
        jName = unquote(t.stripPrefix("- job_name:").trim)
      } else if (t.startsWith("- targets:")) {
        flushRule()
        jTargets ++= parseFlowList(t.stripPrefix("- targets:").trim)
      } else if (t.startsWith("- files:")) {
        flushRule()
        jFileSd ++= parseFlowList(t.stripPrefix("- files:").trim)
      } else if (t.startsWith("- url:")) {
        flushRule()
        jHttpSd += unquote(t.stripPrefix("- url:").trim)
      } else if (t.startsWith("- names:") && sdMode == "dns") {
        flushRule()
        jDns += DnsSdConfig(parseFlowList(t.stripPrefix("- names:").trim))
      } else if (t.startsWith("type:") && sdMode == "dns" && jDns.nonEmpty) {
        jDns(jDns.length - 1) =
          jDns.last.copy(recordType = unquote(t.stripPrefix("type:").trim))
      } else if (t.startsWith("port:") && sdMode == "dns" && jDns.nonEmpty) {
        jDns(jDns.length - 1) =
          jDns.last.copy(port = unquote(t.stripPrefix("port:").trim).toInt)
      } else if (t.startsWith("- api_server:") && sdMode == "k8s") {
        flushRule()
        jK8s += KubernetesSdConfig(unquote(t.stripPrefix("- api_server:").trim))
      } else if (t.startsWith("role:") && sdMode == "k8s" && jK8s.nonEmpty) {
        jK8s(jK8s.length - 1) =
          jK8s.last.copy(role = unquote(t.stripPrefix("role:").trim))
      } else if (t.startsWith("namespaces:") && sdMode == "k8s" && jK8s.nonEmpty) {
        jK8s(jK8s.length - 1) = jK8s.last.copy(
          namespaces = parseFlowList(t.stripPrefix("namespaces:").trim))
      } else if (t.startsWith("scheme:") && sdMode == "k8s" && jK8s.nonEmpty) {
        jK8s(jK8s.length - 1) =
          jK8s.last.copy(scheme = unquote(t.stripPrefix("scheme:").trim))
      } else if (t.startsWith("bearer_token_file:") && sdMode == "k8s" && jK8s.nonEmpty) {
        jK8s(jK8s.length - 1) = jK8s.last.copy(
          tokenFile = Some(unquote(t.stripPrefix("bearer_token_file:").trim)))
      } else if (t.startsWith("bearer_token:") && sdMode == "k8s" && jK8s.nonEmpty) {
        jK8s(jK8s.length - 1) = jK8s.last.copy(
          token = Some(unquote(t.stripPrefix("bearer_token:").trim)))
      } else if (t.startsWith("- server:") && sdMode == "consul") {
        flushRule()
        jConsul += ConsulSdConfig(unquote(t.stripPrefix("- server:").trim), Nil)
      } else if (t.startsWith("services:") && sdMode == "consul" && jConsul.nonEmpty) {
        jConsul(jConsul.length - 1) = jConsul.last.copy(
          services = parseFlowList(t.stripPrefix("services:").trim))
      } else if (t.startsWith("token:") && sdMode == "consul" && jConsul.nonEmpty) {
        jConsul(jConsul.length - 1) = jConsul.last.copy(
          token = Some(unquote(t.stripPrefix("token:").trim)))
      } else if (t.startsWith("datacenter:") && sdMode == "consul" && jConsul.nonEmpty) {
        jConsul(jConsul.length - 1) = jConsul.last.copy(
          datacenter = Some(unquote(t.stripPrefix("datacenter:").trim)))
      } else if (t.startsWith("scheme:") && sdMode == "consul" && jConsul.nonEmpty) {
        jConsul(jConsul.length - 1) = jConsul.last.copy(
          scheme = unquote(t.stripPrefix("scheme:").trim))
      } else if (t.startsWith("bearer_token_file:") && inJob) {
        flushRule(); jBearerFile = Some(unquote(t.stripPrefix("bearer_token_file:").trim))
      } else if (t.startsWith("bearer_token:") && inJob) {
        flushRule(); jBearer = Some(unquote(t.stripPrefix("bearer_token:").trim))
      } else if (t.startsWith("username:") && inJob && !inRule) {
        jUser = Some(unquote(t.stripPrefix("username:").trim))
      } else if (t.startsWith("password:") && inJob && !inRule) {
        jPass = Some(unquote(t.stripPrefix("password:").trim))
      } else if (t.startsWith("ca_file:") && inJob) {
        flushRule(); jCa = Some(unquote(t.stripPrefix("ca_file:").trim))
      } else if (t.startsWith("cert_file:") && inJob) {
        flushRule(); jCert = Some(unquote(t.stripPrefix("cert_file:").trim))
      } else if (t.startsWith("key_file:") && inJob) {
        flushRule(); jKey = Some(unquote(t.stripPrefix("key_file:").trim))
      } else if (t.startsWith("insecure_skip_verify:") && inJob) {
        flushRule(); jSkipVerify = t.stripPrefix("insecure_skip_verify:").trim == "true"
      } else if (t.startsWith("- ") &&
        relabelKeys.contains(t.drop(2).split(":", 2).head.trim)) {
        flushRule(); inRule = true
        val Array(k, v) = t.drop(2).split(":", 2)
        rFields(k.trim) = unquote(v.trim)
      } else if (t.startsWith("scrape_interval:") && inJob) {
        flushRule()
        jInterval = graft.promql.Parser.parseDuration(t.stripPrefix("scrape_interval:").trim)
      } else if (t.startsWith("scrape_timeout:") && inJob) {
        flushRule()
        jTimeout = graft.promql.Parser.parseDuration(t.stripPrefix("scrape_timeout:").trim)
      } else if (t.startsWith("scheme:") && inJob) {
        flushRule()
        jScheme = unquote(t.stripPrefix("scheme:").trim)
      } else if (inRule && t.contains(":")) {
        val Array(k, v) = t.split(":", 2)
        if (relabelKeys.contains(k.trim)) rFields(k.trim) = unquote(v.trim)
      }
    }
    flushRule(); flushJob()
    jobs.toSeq
  }

  private def parseFlowList(s: String): Seq[String] =
    s.stripPrefix("[").stripSuffix("]").split(",").toSeq
      .map(x => unquote(x.trim)).filter(_.nonEmpty)

  private def stripComment(s: String): String = {
    var inQ = false; var q = ' '
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == q) inQ = false }
      else if (c == '"' || c == '\'') { inQ = true; q = c }
      else if (c == '#') return s.substring(0, i)
      i += 1
    }
    s
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
}
