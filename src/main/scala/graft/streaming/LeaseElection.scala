package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

/**
 * Lease-based leader election over a shared directory — the reference
 * elects exactly one active controller through Helix leadership wiring
 * (`controller/ControllerInstance.java:163-218`); on Spark there is no
 * ZK, so the equivalent single-writer guarantee comes from an atomic
 * filesystem lease: one lease file under `leaseDir`, holder identity +
 * expiry inside, renewed at `renewPeriodMs` and stolen only after it
 * expires (`ttlMs` without a renewal — a crashed leader loses the lease
 * passively, no cleanup required).
 *
 * Atomicity: all lease transitions happen inside a mkdir-mutex
 * (`Files.createDirectory` is atomic on POSIX — exactly one contender
 * wins; a mutex left behind by a crash is itself stolen after `ttlMs`).
 * The lease write is temp-file + ATOMIC_MOVE, so readers never observe a
 * torn lease. On a shared mount (NFS/EFS-style) the same code gives
 * cross-host election; the spec drives the two-contender case in one
 * JVM, which exercises every transition the protocol has.
 *
 * Use: `new LeaseElection(dir, "controller-1").start()` and pass
 * [[isLeader]] as the `GraftController` thunk — the thunk stays the
 * injection point, this class is one provider of it (a ZK/Helix-backed
 * thunk would be another, deployment permitting).
 */
final class LeaseElection(
    leaseDir: String,
    val instanceId: String,
    ttlMs: Long = 10000,
    renewPeriodMs: Long = 2000) {

  require(renewPeriodMs > 0 && ttlMs > 2 * renewPeriodMs,
    s"ttl ($ttlMs ms) must exceed twice the renew period ($renewPeriodMs ms)")

  private val lease: Path = Paths.get(leaseDir, "leader.lease")
  private val mutex: Path = Paths.get(leaseDir, ".lease_mutex")
  @volatile private var leader = false
  @volatile private var sched: Option[ScheduledExecutorService] = None

  /** Thunk-compatible leadership check: true only while this instance
    * holds an unexpired lease it keeps renewing. */
  val isLeader: () => Boolean = () => leader

  /** Current lease holder as (instanceId, expiryEpochMs), if readable. */
  def holder(): Option[(String, Long)] =
    try {
      val lines = Files.readString(lease).split('\n')
      if (lines.length >= 2) Some((lines(0), lines(1).toLong)) else None
    } catch { case _: Exception => None }

  /** One election round: acquire if the lease is free, expired, or ours
    * (renewal). Returns the post-round leadership state. Public so specs
    * and single-shot callers can drive the protocol without the thread. */
  def tryAcquire(): Boolean = {
    val now = System.currentTimeMillis()
    if (!withMutex(now) {
      val h = holder()
      val ours = h.exists(_._1 == instanceId)
      val free = h.isEmpty || h.exists(_._2 < now)
      if (ours || free) {
        val tmp = Files.createTempFile(lease.getParent, ".lease_", ".tmp")
        Files.writeString(tmp, s"$instanceId\n${now + ttlMs}")
        Files.move(tmp, lease, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        leader = true
      } else leader = false
    }) {
      // mutex contended this round: keep the previous state unless our
      // own lease has visibly expired (never claim staleness as power)
      if (leader && holder().forall(_._2 < now)) leader = false
    }
    leader
  }

  /** Release: give the lease up immediately (graceful shutdown) so a
    * peer can take over without waiting out the TTL. */
  def release(): Unit = {
    val now = System.currentTimeMillis()
    withMutex(now) {
      if (holder().exists(_._1 == instanceId)) Files.deleteIfExists(lease)
      leader = false
    }
    leader = false
  }

  /** Run `body` holding the mkdir-mutex; false if the mutex was busy.
    * A mutex directory older than the TTL belonged to a crashed peer and
    * is broken + retaken in the same round. */
  private def withMutex(now: Long)(body: => Unit): Boolean = {
    Files.createDirectories(lease.getParent)
    val acquired =
      try { Files.createDirectory(mutex); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val stale =
            try Files.getLastModifiedTime(mutex).toMillis < now - ttlMs
            catch { case _: Exception => false }
          stale && {
            try { Files.delete(mutex); Files.createDirectory(mutex); true }
            catch { case _: Exception => false }
          }
      }
    if (acquired)
      try { body; true } finally Files.deleteIfExists(mutex)
    else false
  }

  /** Start the renewal loop (daemon thread). Safe to call once. */
  def start(): Unit = synchronized {
    require(sched.isEmpty, "election already running")
    val s = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, s"graft-lease-$instanceId")
      t.setDaemon(true)
      t
    }
    s.scheduleAtFixedRate(
      () => try tryAcquire()
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[lease:$instanceId] round failed: $e")
        },
      0, renewPeriodMs, TimeUnit.MILLISECONDS)
    sched = Some(s)
  }

  /** Stop renewing AND release — the graceful-shutdown path. A crash is
    * the other path: no release, peers steal after the TTL. */
  def stop(): Unit = synchronized {
    sched.foreach(_.shutdownNow())
    sched = None
    release()
  }

  /** Test hook for the crash path: stop renewing WITHOUT releasing, so
    * the lease must expire before a peer can take over. */
  private[streaming] def abandon(): Unit = synchronized {
    sched.foreach(_.shutdownNow())
    sched = None
  }
}
