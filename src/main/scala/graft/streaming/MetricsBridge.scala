package graft.streaming

import com.codahale.metrics.{Gauge, MetricRegistry}
import org.apache.spark.metrics.source.{GraftMetricsAccess, GraftSource}

/**
 * Bridge the engine's exported counters into Spark's own metrics system
 * — the reference's metrics reporter surface
 * (`uReplicator-Common/src/main/java/com/uber/stream/kafka/mirrormaker/
 * common/utils/KafkaUReplicatorMetricsReporter.java:40`, which wires
 * controller/worker counters into a graphite-backed registry). Here the
 * counter set of [[ValidationService.countersJson]] registers as a
 * custom metrics `Source` on the driver's `MetricsSystem`, so every
 * sink configured via `spark.metrics.conf` (JMX, Graphite, CSV,
 * Prometheus servlet) exports them with zero extra plumbing —
 * observability rides Spark's existing channel instead of a parallel
 * pipeline. (The `Source` trait is `private[spark]`; the two-line
 * registration shim lives in
 * [[org.apache.spark.metrics.source.GraftMetricsAccess]].)
 *
 * Gauges read [[ValidationService.countersJson]] lazily at scrape time:
 * the validation loop already refreshes the JSON on its 60-s cadence,
 * so a scrape is a driver-local string parse — no Spark jobs, no
 * blocking. A non-leader's zeroed export surfaces as zero-valued
 * gauges, exactly like the reference's `cleanupMetrics()`.
 */
object MetricsBridge {

  /** The counter names exported by a validation pass. */
  val CounterNames: Seq[String] = Seq(
    "numServingTopics", "numTopicPartitions", "numOnlineTopicPartitions",
    "numOfflineTopicPartitions", "numErrorTopicPartitions",
    "numErrorTopics", "numMismatchedAssignments")

  private def buildRegistry(service: ValidationService,
      expiry: Option[GroupExpiryService]): MetricRegistry = {
    val registry = new MetricRegistry()
    CounterNames.foreach { name =>
      registry.register(MetricRegistry.name("validation", name),
        new Gauge[Long] {
          override def getValue: Long = counterValue(service.countersJson, name)
        })
    }
    // 1 while this process holds the controller lease, else 0 — the
    // "am I the leader" gauge every reference dashboard keys on
    registry.register(MetricRegistry.name("validation", "isLeader"),
      new Gauge[Long] {
        override def getValue: Long =
          if (counterFlag(service.countersJson, "isLeader")) 1L else 0L
      })
    // lifetime count of consumer groups the expiry policy loop released
    // — a sudden jump flags a TTL misconfiguration before data loss
    expiry.foreach { e =>
      registry.register(MetricRegistry.name("groups", "expiredTotal"),
        new Gauge[Long] { override def getValue: Long = e.expiredCount })
    }
    registry
  }

  private[streaming] def counterValue(json: String, name: String): Long = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val v = node.get(name)
    if (v == null || !v.isNumber) 0L else v.asLong()
  }

  private[streaming] def counterFlag(json: String, name: String): Boolean = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val v = node.get(name)
    v != null && v.asBoolean(false)
  }

  /** Register `service`'s counters with the current SparkEnv's metrics
    * system (driver-side). Returns the source for later [[unregister]].
    * Idempotent per source name: an existing source under the same name
    * is replaced, so a pipeline restart cannot double-register. */
  def register(service: ValidationService,
      sourceName: String = "graft",
      expiry: Option[GroupExpiryService] = None): GraftSource = {
    val src = new GraftSource(sourceName, buildRegistry(service, expiry))
    GraftMetricsAccess.replace(src)
    src
  }

  def unregister(src: GraftSource): Unit = GraftMetricsAccess.remove(src)

  /** Metric registries currently registered under `sourceName` — the
    * spec's (and a dashboard smoke test's) read path. */
  def registries(sourceName: String = "graft"): Seq[MetricRegistry] =
    GraftMetricsAccess.registriesOf(sourceName)
}
