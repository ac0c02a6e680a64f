package graft.streaming

import java.nio.file.{AtomicMoveNotSupportedException, Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

/**
 * Lease-based leader election over a shared directory — the reference
 * elects exactly one active controller through Helix leadership wiring
 * (`controller/ControllerInstance.java:163-218`); on Spark there is no
 * ZK, so the equivalent single-writer guarantee comes from an atomic
 * filesystem lease: one lease file under `leaseDir`, holder identity +
 * expiry + fencing epoch inside, renewed at `renewPeriodMs` and stolen
 * only after it expires (`ttlMs` without a renewal — a crashed leader
 * loses the lease passively, no cleanup required).
 *
 * Atomicity: all lease transitions happen inside a mkdir-mutex
 * (`Files.createDirectory` is atomic on POSIX — exactly one contender
 * wins). A mutex left behind by a crashed peer is broken ATOMICALLY:
 * the breaker renames the stale mutex directory to a unique trash name,
 * and only the single contender whose rename succeeds may retry the
 * create — a check-then-delete break would let two contenders both
 * "win" (A re-creates, B deletes A's fresh mutex and creates its own).
 * The lease write is temp-file + ATOMIC_MOVE, so readers never observe
 * a torn lease.
 *
 * FILESYSTEM CONTRACT (checked at construction): `leaseDir` must live
 * on a filesystem with atomic `rename` and atomic exclusive `mkdir` —
 * POSIX local disks and NFS/EFS-style shared mounts qualify. S3-style
 * object stores do NOT (rename = copy+delete, no exclusive create);
 * the constructor probes ATOMIC_MOVE and fails fast rather than
 * silently electing two leaders. On object stores use a different
 * provider for the same `isLeader` thunk (DynamoDB/ZK/etc.).
 *
 * FENCING: the lease carries a monotonically-increasing epoch that
 * bumps on every ownership change (graceful release keeps the epoch on
 * file by writing an already-expired lease instead of deleting it, so
 * epochs never regress). Writers gated by the election should stamp
 * [[fencingToken]] into what they write (see [[StateBackupManager]]):
 * a leader paused past its TTL reads `isLeader()==false` on resume
 * (expiry is re-checked on every call), and even a write already in
 * flight when the lease was stolen carries the OLD epoch, so it can
 * never clobber the new leader's output.
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
  @volatile private var heldExpiry = 0L
  @volatile private var heldEpoch = -1L
  @volatile private var sched: Option[ScheduledExecutorService] = None

  probeAtomicMove()

  /** Thunk-compatible leadership check: true only while this instance
    * holds an UNEXPIRED lease — re-checked against the wall clock on
    * every call, so a leader paused past its TTL answers false the
    * moment it resumes (modulo clock skew across hosts; the fencing
    * token covers writes already in flight). */
  val isLeader: () => Boolean =
    () => leader && System.currentTimeMillis() < heldExpiry

  /** Thunk for fenced writers: the held lease's epoch while leading,
    * -1 otherwise. Strictly increases across ownership changes. */
  val fencingToken: () => Long =
    () => if (isLeader()) heldEpoch else -1L

  /** Current lease holder as (instanceId, expiryEpochMs), if readable. */
  def holder(): Option[(String, Long)] = read().map(h => (h._1, h._2))

  /** (instanceId, expiryEpochMs, epoch); epoch 0 for pre-fencing files */
  private def read(): Option[(String, Long, Long)] =
    try {
      val lines = Files.readString(lease).split('\n')
      if (lines.length >= 2)
        Some((lines(0), lines(1).toLong,
          if (lines.length >= 3) lines(2).toLong else 0L))
      else None
    } catch { case _: Exception => None }

  /** One election round: acquire if the lease is free, expired, or ours
    * (renewal). Returns the post-round leadership state. Public so specs
    * and single-shot callers can drive the protocol without the thread. */
  def tryAcquire(): Boolean = {
    val now = System.currentTimeMillis()
    if (!withMutex(now) {
      val h = read()
      val expired = h.forall(_._2 < now)
      val ours = h.exists(_._1 == instanceId)
      if ((ours && !expired) || expired) {
        // epoch: unchanged on a live renewal; bumped whenever the lease
        // is (re-)taken from a free/expired state — ownership changed,
        // or at least COULD have while we were not a live holder
        val curEpoch = h.map(_._3).getOrElse(0L)
        val epoch = if (ours && !expired) curEpoch else curEpoch + 1
        val tmp = Files.createTempFile(lease.getParent, ".lease_", ".tmp")
        Files.writeString(tmp, s"$instanceId\n${now + ttlMs}\n$epoch")
        Files.move(tmp, lease, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        heldExpiry = now + ttlMs
        heldEpoch = epoch
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
    * peer can take over without waiting out the TTL. The lease file is
    * rewritten already-expired rather than deleted, preserving the
    * fencing epoch for the next holder. */
  def release(): Unit = {
    val now = System.currentTimeMillis()
    withMutex(now) {
      read().foreach { case (id, _, epoch) =>
        if (id == instanceId) {
          val tmp = Files.createTempFile(lease.getParent, ".lease_", ".tmp")
          Files.writeString(tmp, s"$instanceId\n0\n$epoch")
          Files.move(tmp, lease, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
        }
      }
      leader = false
    }
    leader = false
  }

  /** Run `body` holding the mkdir-mutex; false if the mutex was busy.
    * A mutex directory older than the TTL belonged to a crashed peer;
    * it is broken by an ATOMIC rename to a unique trash name — exactly
    * one contender's rename can succeed, and only that one retries the
    * create (it may still lose the create race to a third contender,
    * which is ordinary contention, not a safety hole). */
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
            val trash = mutex.resolveSibling(
              s".lease_mutex_broken_${instanceId}_${System.nanoTime()}")
            try {
              Files.move(mutex, trash, StandardCopyOption.ATOMIC_MOVE)
              // Re-verify on the now-stable trash path: the dir we
              // actually renamed may be a FRESH mutex a faster breaker
              // re-created between our staleness check and our rename —
              // its holder is inside the critical section right now.
              val wasStale =
                Files.getLastModifiedTime(trash).toMillis < now - ttlMs
              if (!wasStale) {
                // stole a live holder's mutex: put it back and report
                // busy — never proceed on a freshly-created mutex
                try Files.move(trash, mutex, StandardCopyOption.ATOMIC_MOVE)
                catch { case _: Exception => Files.deleteIfExists(trash) }
                false
              } else {
                Files.deleteIfExists(trash)
                try { Files.createDirectory(mutex); true }
                catch { case _: Exception => false }
              }
            } catch { case _: Exception => false }
          }
      }
    if (acquired)
      try { body; true } finally Files.deleteIfExists(mutex)
    else false
  }

  /** Fail fast on filesystems without atomic rename (object stores):
    * every safety property above depends on it. */
  private def probeAtomicMove(): Unit = {
    Files.createDirectories(lease.getParent)
    val src = Files.createTempFile(lease.getParent, ".probe_", ".tmp")
    val dst = lease.getParent.resolve(
      s".probe_dst_${instanceId}_${System.nanoTime()}")
    try Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: AtomicMoveNotSupportedException =>
        throw new IllegalStateException(
          s"$leaseDir does not support atomic rename — LeaseElection " +
            "cannot guarantee a single leader here (S3-style object " +
            "stores need a different election provider)", e)
    } finally {
      Files.deleteIfExists(src)
      Files.deleteIfExists(dst)
    }
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
