package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}
import java.util.concurrent.Executors
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
 * Retries are bounded per pipeline; a query that makes progress gets its
 * retry budget back (the failure was transient). Restarts run on a
 * dedicated daemon thread — the listener bus must never block on query
 * startup.
 *
 * Register with `spark.streams.addListener(supervisor)`.
 */
final class RouteSupervisor(manager: PipelineManager, maxRetries: Int = 3)
    extends StreamingQueryListener {

  private val retries = TrieMap.empty[String, Int]
  private val exec = Executors.newSingleThreadExecutor { r =>
    val t = new Thread(r, "graft-route-supervisor")
    t.setDaemon(true)
    t
  }

  /** Restart attempts consumed for `name` since its last progress. */
  def retryCount(name: String): Int = retries.getOrElse(name, 0)

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit =
    // a completed batch means the route is healthy again
    manager.nameOf(event.progress.id).foreach(retries.remove)

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = {
    if (event.exception.isEmpty) return // clean stop — not a failure
    manager.nameOf(event.id).foreach { name =>
      val used = retries.getOrElse(name, 0)
      if (used < maxRetries) {
        retries.put(name, used + 1)
        exec.submit(new Runnable {
          def run(): Unit =
            try manager.restart(name)
            catch { case scala.util.control.NonFatal(e) =>
              // surfaced, not fatal: the next termination event retries
              System.err.println(s"[route-supervisor] restart of $name failed: $e")
            }
        })
      }
    }
  }
}
