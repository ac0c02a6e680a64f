package graft.streaming

import graft.sources.FileTopicLog
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

/**
 * The consumer-group expiry policy loop — the last mile of the
 * retention-governance story: a registered group pins retention
 * ([[FileTopicLog.retentionCut]]), so an ABANDONED group (checkpoint
 * deleted, job retired, operator forgot `unregisterGroup`) would pin
 * the log forever. This loop is the `offsets.retention.minutes` analog:
 * a group whose last registration/commit is older than the TTL is
 * expired, releasing its pin so the next truncating commit can advance.
 * The reference tears down retired per-topic state the same way when
 * its observer notices a topic no longer qualifies
 * (`C/core/AutoTopicWhitelistingManager.java:252-260`).
 *
 * Expiring a group IS a data-loss policy decision (records below the
 * remaining min become reclaimable), so the loop is deliberately
 * conservative:
 *  - liveness is the group file's mtime, which EVERY commit bumps —
 *    even a commit that does not advance positions (a slow group
 *    re-committing the same offset is alive, not idle);
 *  - the check-then-delete is [[FileTopicLog.unregisterGroupIfIdle]],
 *    atomic under the group lock — a commit landing mid-check can
 *    never be expired;
 *  - the loop is leader-gated (same shape as [[ValidationService]] /
 *    [[StateBackupManager]]): in an HA deployment only the lease
 *    holder expires, so two controllers cannot double-apply policy.
 */
final class GroupExpiryService(
    root: String,
    ttlMillis: Long,
    isLeader: () => Boolean = () => true) {
  require(ttlMillis > 0, "ttl must be positive")

  @volatile private var sched: Option[ScheduledExecutorService] = None
  @volatile private var expiredTotal: Long = 0L

  /** Groups expired over this service's lifetime (metrics surface). */
  def expiredCount: Long = expiredTotal

  /** One policy pass: expire every group idle longer than the TTL.
    * Returns the groups expired this pass (empty on a non-leader). */
  def expireOnce(): Seq[String] = {
    if (!isLeader()) return Seq.empty
    val cutoff = System.currentTimeMillis() - ttlMillis
    val expired = FileTopicLog.groups(root)
      .filter(FileTopicLog.unregisterGroupIfIdle(root, _, cutoff))
    expiredTotal += expired.size
    expired
  }

  /** Start the periodic loop (idempotent). Check cadence defaults to
    * ttl/4 bounded to [1 s, 60 s] — fine-grained enough that a pin is
    * released within ~1.25 × ttl, coarse enough to cost nothing. */
  def start(periodMillis: Long = 0L): Unit = synchronized {
    if (sched.nonEmpty) return
    val period =
      if (periodMillis > 0) periodMillis
      else math.min(60000L, math.max(1000L, ttlMillis / 4))
    val ex = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-group-expiry"); t.setDaemon(true); t
    })
    ex.scheduleAtFixedRate(() => {
      try expireOnce(): Unit
      catch { case t: Throwable =>
        System.err.println(s"[group-expiry] pass failed: ${t.getMessage}")
      }
    }, period, period, TimeUnit.MILLISECONDS)
    sched = Some(ex)
  }

  def stop(): Unit = synchronized {
    sched.foreach(_.shutdownNow())
    sched = None
  }
}
