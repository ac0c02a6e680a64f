package org.apache.spark.metrics.source

import com.codahale.metrics.MetricRegistry
import org.apache.spark.SparkEnv

/**
 * Minimal public adapter over Spark's `private[spark]` metrics Source
 * API. Spark deliberately keeps `Source`/`MetricsSystem.registerSource`
 * internal, but registering a custom source is the documented way for
 * libraries to ride `spark.metrics.conf` sinks (JMX/Graphite/CSV/
 * Prometheus); the conventional bridge is a shim compiled into the
 * `org.apache.spark` namespace — nothing here touches Spark internals
 * beyond the two registration calls.
 */
class GraftSource(override val sourceName: String,
    override val metricRegistry: MetricRegistry) extends Source

object GraftMetricsAccess {

  /** SparkEnv.get is null before a SparkSession exists and after stop()
    * (e.g. a shutdown hook) — surface that as a named precondition, not
    * an opaque NPE from inside the metrics system. */
  private def env: SparkEnv =
    Option(SparkEnv.get).getOrElse(throw new IllegalStateException(
      "no active SparkEnv — start a SparkSession before registering graft metrics " +
        "(or the session was already stopped)"))

  /** Register `src`, replacing any existing source of the same name
    * (idempotent across pipeline restarts). */
  def replace(src: GraftSource): Unit = {
    val ms = env.metricsSystem
    ms.getSourcesByName(src.sourceName).foreach(ms.removeSource)
    ms.registerSource(src)
  }

  def remove(src: GraftSource): Unit =
    env.metricsSystem.removeSource(src)

  /** Registries of the sources currently registered under `name`. */
  def registriesOf(name: String): Seq[MetricRegistry] =
    env.metricsSystem.getSourcesByName(name).map(_.metricRegistry)
}
