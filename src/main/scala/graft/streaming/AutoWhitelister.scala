package graft.streaming

import graft.operators.TopicSetOps
import graft.sources.TopicCatalogObserver
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

/**
 * F1/F3 — the auto-whitelisting service loop: periodically observe both
 * clusters, compute candidate topics with the F3 set algebra, and add
 * them to the route's pipeline spec (restarting the query if running —
 * Spark's substitute for in-flight assignment mutation).
 *
 * Reference: `controller/core/AutoTopicWhitelistingManager.java:116-203`
 * (scheduled refresh → `getCandidateTopicsToWhitelist` → whitelist), with
 * the candidate computation delegated to
 * [[TopicSetOps.autoWhitelistCandidates]] so the service and the oracle
 * gate share one implementation.
 */
final class AutoWhitelister(
    manager: PipelineManager,
    srcObserver: TopicCatalogObserver,
    dstObserver: TopicCatalogObserver,
    blacklist: () => Set[String],
    excludeRegex: String = "^__.*",
    // when the pipeline reads the dynamic source, its log root: adds are
    // then applied IN FLIGHT (whitelist control file, next micro-batch)
    // instead of via restart — the reference's actual S2/F1 composition
    topicLogRoot: Option[String] = None) {

  @volatile private var sched: Option[ScheduledExecutorService] = None

  /** One pass for `pipelineName`; returns the topics it added.
    *
    * The candidate computation runs a Spark job on a SNAPSHOT of the
    * spec, so the write is compare-and-swap
    * ([[PipelineManager.updateIfCurrent]]): if an admin add/delete
    * interleaved with the slow pass, the stale snapshot is NOT written
    * back (which would resurrect a deleted topic or drop an added one) —
    * the pass re-reads the new spec and recomputes, bounded attempts. */
  def runOnce(pipelineName: String, maxAttempts: Int = 3): Seq[String] = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val spec = manager.spec(pipelineName).getOrElse(return Nil)
      srcObserver.refresh()
      dstObserver.refresh()
      val spark = srcObserver.catalog.sparkSession
      import spark.implicits._
      val serving = spec.topics.toDF("topic")
      val bl = blacklist().toSeq.toDF("topic")
      val candidates = TopicSetOps.autoWhitelistCandidates(
          srcObserver.catalog.select("topic"),
          dstObserver.catalog.select("topic"),
          serving, bl, excludeRegex)
        .collect().map(_.getString(0)).toSeq.sorted
      if (candidates.isEmpty) return Nil
      val next = spec.copy(topics = spec.topics ++ candidates)
      val applied = topicLogRoot match {
        case Some(root) => manager.updateIfCurrentInFlight(spec, next, root)
        case None => manager.updateIfCurrent(spec, next)
      }
      if (applied) return candidates
      attempt += 1 // spec moved under us — recompute from the new one
    }
    Nil
  }

  /** Reference cadence: periodic refresh (default 600 s there). */
  def start(pipelineName: String, periodSeconds: Long): Unit = synchronized {
    require(sched.isEmpty, "auto-whitelister already running")
    val s = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-auto-whitelister")
      t.setDaemon(true)
      t
    }
    s.scheduleAtFixedRate(
      () => try runOnce(pipelineName)
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[auto-whitelister] $pipelineName pass failed: $e")
        },
      periodSeconds, periodSeconds, TimeUnit.SECONDS)
    sched = Some(s)
  }

  def stop(): Unit = synchronized {
    sched.foreach(_.shutdownNow())
    sched = None
  }
}
