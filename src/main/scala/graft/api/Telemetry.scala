package graft.api

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{DoubleAdder, LongAdder}

/** Self-telemetry registrar + Prometheus text-exposition renderer — the
  * engine's own operational metrics, served at `/metrics` so the engine
  * can be scraped like any other target (including by ITSELF via
  * [[graft.sources.Scrape]] — the dogfood loop ServeSpec pins).
  *
  * Reference: the metrics server + registrar the store wires through
  * every component (src/internal/metrics/server.go — promhttp over a
  * registrar; src/internal/metrics/registrar.go — named counters,
  * gauges, histograms; src/internal/metrics/metrics.go — the
  * `metric_store_*` name constants). Names that share semantics reuse
  * the reference's constants (`metric_store_ingress_points_total`,
  * `metric_store_dropped_points_total`, `metric_store_expired_shards_total`,
  * `metric_store_storage_days`, `metric_store_series_count`,
  * `metric_store_measurements_count`); Spark-side concepts with no
  * reference analog get `graft_*` names.
  *
  * A process-global object, like [[graft.engine.Guards]]: the serving
  * path (HttpApi), the store (PointsStore) and maintenance (Serve) all
  * record into the same registry without threading a handle through
  * every call. Counters are LongAdder/DoubleAdder (contention-free);
  * gauges may be SUPPLIERS so values that are cheap listings (day-dir
  * count) or cached Spark jobs (series count) are computed at scrape
  * time, the reference's collector pattern.
  */
object Telemetry {

  sealed trait Metric { def name: String; def help: String; def mtype: String }

  final class Counter(val name: String, val help: String,
                      val labels: Map[String, String] = Map.empty) extends Metric {
    private[Telemetry] val longs = new LongAdder
    private[Telemetry] val doubles = new DoubleAdder
    def mtype = "counter"
    def inc(): Unit = longs.increment()
    def add(n: Long): Unit = longs.add(n)
    def add(v: Double): Unit = doubles.add(v)
    def value: Double = longs.sum.toDouble + doubles.sum
  }

  final class Gauge(val name: String, val help: String,
                    supplier: () => Double) extends Metric {
    def mtype = "gauge"
    def value: Double = supplier()
  }

  /** Counter whose value is READ from elsewhere at scrape time — the
    * shape for counts that accumulate in Spark accumulators on the
    * executors (PointsStore's written/dropped row counts): the
    * accumulator is the source of truth, the registry just exposes it. */
  final class FnCounter(val name: String, val help: String,
                        supplier: () => Double) extends Metric {
    def mtype = "counter"
    def value: Double = supplier()
  }

  /** Fixed-bucket histogram (cumulative le buckets + sum + count), the
    * classic Prometheus shape. */
  final class Histogram(val name: String, val help: String,
                        val buckets: Seq[Double]) extends Metric {
    def mtype = "histogram"
    private[Telemetry] val counts = Array.fill(buckets.length + 1)(new LongAdder)
    private[Telemetry] val sum = new DoubleAdder
    def observe(v: Double): Unit = {
      var i = 0
      while (i < buckets.length && v > buckets(i)) i += 1
      counts(i).increment()
      sum.add(v)
    }
  }

  val DefaultBuckets: Seq[Double] =
    Seq(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1, 2.5, 5, 10)

  private val metrics = new ConcurrentHashMap[String, Metric]()

  /** Register-or-get: all call sites share one instance per (name,
    * labelset) key, the registrar contract of the reference. */
  def counter(name: String, help: String,
              labels: Map[String, String] = Map.empty): Counter = {
    val key = name + renderLabels(labels)
    metrics.computeIfAbsent(key, _ => new Counter(name, help, labels))
      .asInstanceOf[Counter]
  }

  def gauge(name: String, help: String)(supplier: () => Double): Gauge =
    metrics.compute(name, (_, _) => new Gauge(name, help, supplier))
      .asInstanceOf[Gauge]

  def counterSupplier(name: String, help: String)(supplier: () => Double): Unit =
    metrics.compute(name, (_, _) => new FnCounter(name, help, supplier))

  def histogram(name: String, help: String,
                buckets: Seq[Double] = DefaultBuckets): Histogram =
    metrics.computeIfAbsent(name, _ => new Histogram(name, help, buckets))
      .asInstanceOf[Histogram]

  /** Memoizing gauge supplier for values that cost a Spark job (series
    * count): recomputed at most every `ttlMs`, scrape-driven — the
    * reference's periodic registrar Set() calls, inverted. */
  def cached(ttlMs: Long)(f: () => Double): () => Double = {
    // MinValue/2, not MinValue: `now - MinValue` overflows negative and
    // would make the never-computed sentinel read as freshly cached
    val last = new java.util.concurrent.atomic.AtomicReference[(Long, Double)]((Long.MinValue / 2, 0.0))
    () => {
      val now = System.currentTimeMillis()
      val (t, v) = last.get()
      if (now - t < ttlMs) v
      else { val nv = f(); last.set((now, nv)); nv }
    }
  }

  private def escape(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case c => c.toString
    }

  private def renderLabels(labels: Map[String, String]): String =
    if (labels.isEmpty) ""
    else labels.toSeq.sortBy(_._1)
      .map { case (k, v) => s"""$k="${escape(v)}"""" }
      .mkString("{", ",", "}")

  private def fmt(v: Double): String =
    if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString
    else if (v.isPosInfinity) "+Inf"
    else String.format(java.util.Locale.ROOT, "%s", v.toString)

  /** Prometheus text exposition format 0.0.4 — one HELP/TYPE block per
    * metric family, families sorted by name for a stable dogfood
    * round-trip. */
  def render(): String = {
    import scala.jdk.CollectionConverters._
    val sb = new StringBuilder
    val byFamily = metrics.values.asScala.toSeq.groupBy(_.name).toSeq.sortBy(_._1)
    for ((fam, ms) <- byFamily) {
      sb.append(s"# HELP $fam ${escape(ms.head.help)}\n")
      sb.append(s"# TYPE $fam ${ms.head.mtype}\n")
      for (m <- ms.sortBy {
        case c: Counter => renderLabels(c.labels)
        case _ => ""
      }) m match {
        case c: Counter =>
          sb.append(s"$fam${renderLabels(c.labels)} ${fmt(c.value)}\n")
        case g: Gauge =>
          sb.append(s"$fam ${fmt(g.value)}\n")
        case f: FnCounter =>
          sb.append(s"$fam ${fmt(f.value)}\n")
        case h: Histogram =>
          var cum = 0L
          for ((b, i) <- h.buckets.zipWithIndex) {
            cum += h.counts(i).sum
            sb.append(s"""${fam}_bucket{le="${fmt(b)}"} $cum""").append('\n')
          }
          cum += h.counts(h.buckets.length).sum
          sb.append(s"""${fam}_bucket{le="+Inf"} $cum""").append('\n')
          sb.append(s"${fam}_sum ${h.sum.sum}\n")
          sb.append(s"${fam}_count $cum\n")
      }
    }
    sb.toString
  }

  /** Test hook: a clean registry (process-global state otherwise leaks
    * across suites). */
  def reset(): Unit = metrics.clear()
}
