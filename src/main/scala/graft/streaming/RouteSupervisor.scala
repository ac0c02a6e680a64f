package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}
import java.util.concurrent.{Executors, TimeUnit}
import scala.collection.concurrent.TrieMap

/**
 * K4 — abort-on-failure / restart policy.
 *
 * The reference aborts the producer and exits the worker process when an
 * async send fails (`worker/DefaultProducer.java:119-135`,
 * `worker/ProducerThread.java:138-142`), relying on Helix to bring the
 * route back up. Spark's analog: a [[StreamingQueryListener]] that sees
 * the failed query's termination event and restarts the route through
 * [[PipelineManager]] — the checkpoint resumes offsets, so no data is
 * lost or duplicated beyond the at-least-once contract.
 *
 * Retries are bounded per pipeline and each restart backs off
 * exponentially (`backoffMs · 2^used`), so a route that fails fast never
 * enters a tight crash loop. The budget is restored only after
 * `healthyBatches` CONSECUTIVE completed batches — one lucky batch
 * between crashes no longer refills the budget and restarts a
 * crash-looping route forever. Stale query-id mappings are evicted by
 * [[PipelineManager.stop]]/restart, so terminations of replaced query
 * incarnations can't trigger spurious restarts.
 *
 * Register with `spark.streams.addListener(supervisor)`.
 */
final class RouteSupervisor(manager: PipelineManager, maxRetries: Int = 3,
    backoffMs: Long = 1000, healthyBatches: Int = 3)
    extends StreamingQueryListener {

  private val retries = TrieMap.empty[String, Int]
  private val healthy = TrieMap.empty[String, Int]
  private val exec = Executors.newSingleThreadScheduledExecutor { r =>
    val t = new Thread(r, "graft-route-supervisor")
    t.setDaemon(true)
    t
  }

  /** Restart attempts consumed for `name` since its last healthy streak. */
  def retryCount(name: String): Int = retries.getOrElse(name, 0)

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    // idle triggers (no input) say nothing about route health: a query
    // that only crashes when data arrives must not refill its budget by
    // ticking over an empty source
    if (event.progress.numInputRows <= 0) return
    manager.nameOf(event.progress.id).foreach { name =>
      val streak = healthy.getOrElse(name, 0) + 1
      if (streak >= healthyBatches) {
        // a sustained healthy streak means the failure was transient
        retries.remove(name)
        healthy.remove(name)
      } else healthy.put(name, streak)
    }
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = {
    if (event.exception.isEmpty) return // clean stop — not a failure
    manager.nameOf(event.id).foreach { name =>
      healthy.remove(name) // the streak ended in a crash
      val used = retries.getOrElse(name, 0)
      if (used < maxRetries) {
        retries.put(name, used + 1)
        val delay = backoffMs << used // 1x, 2x, 4x, ...
        exec.schedule(new Runnable {
          def run(): Unit =
            try manager.restart(name)
            catch { case scala.util.control.NonFatal(e) =>
              // surfaced, not fatal: the next termination event retries
              System.err.println(s"[route-supervisor] restart of $name failed: $e")
            }
        }, delay, TimeUnit.MILLISECONDS)
      }
    }
  }
}
