package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/**
 * V2 — scheduled state backup.
 *
 * The reference dumps ideal state + partition assignment to file (or git)
 * daily (`controller/core/ClusterInfoBackupManager.java:90-143`, git half
 * in `controller/core/GitBackUpHandler.java:34-75`). Here the equivalent
 * catalog is the [[PipelineManager]]'s spec registry plus the live query
 * status view; each dump is one self-contained JSON file. When
 * `gitCommit` is set and `dir` lives inside a git work tree, every dump
 * is also committed (shell-out to the system `git`, no library deps) —
 * the reference's GitBackUpHandler behavior.
 *
 * Driver-side only — state is O(#pipelines), never records.
 */
final class StateBackupManager(manager: PipelineManager, dir: String,
    gitCommit: Boolean = false, isLeader: () => Boolean = () => true,
    fencingToken: () => Long = () => -1L) {

  private val seq = new AtomicLong(0)
  @volatile private var sched: Option[ScheduledExecutorService] = None

  /** Write one snapshot; returns the created file. The sequence resumes
    * past any dumps already in `dir`, so a restarted driver never
    * overwrites the backups written before the crash. When an election
    * provides a fencing token (see [[LeaseElection.fencingToken]]) it is
    * stamped into the FILENAME: a deposed leader's late in-flight dump
    * carries the old epoch and so can never clobber a file the new
    * leader (new epoch) writes, even if both computed the same seq. */
  def dump(): Path = {
    seq.getAndUpdate { cur =>
      if (cur > 0) cur
      else Option(new java.io.File(dir).list()).getOrElse(Array.empty[String])
        .collect { case f if f.startsWith("state-") && f.endsWith(".json") =>
          scala.util.Try(
            f.stripPrefix("state-").takeWhile(_.isDigit).toLong).getOrElse(0L)
        }.foldLeft(0L)(math.max)
    }
    val n = seq.incrementAndGet()
    val tok = fencingToken()
    val body =
      s"""{"seq":$n,"fencingToken":$tok,""" +
        s""""dumpedAtMs":${System.currentTimeMillis()},""" +
        s""""pipelines":${manager.statusJson},"specs":${manager.specsJson}}"""
    Files.createDirectories(Paths.get(dir))
    val p = Paths.get(dir,
      f"state-$n%05d" + (if (tok >= 0) s"-f$tok" else "") + ".json")
    Files.writeString(p, body)
    if (gitCommit) commitToGit(p, n)
    p
  }

  /** GitBackUpHandler analog: stage the dump and commit it. Failures are
    * surfaced but never break the dump itself (the file on disk is the
    * primary artifact, the git history the secondary one). */
  private def commitToGit(p: Path, n: Long): Unit =
    try {
      def run(args: String*): (Int, String) = {
        val pb = new ProcessBuilder(args: _*)
        pb.directory(new java.io.File(dir))
        pb.redirectErrorStream(true)
        val proc = pb.start()
        val out = new String(proc.getInputStream.readAllBytes())
        (proc.waitFor(), out)
      }
      def runOrWarn(args: String*): Boolean = {
        val (code, out) = run(args: _*)
        if (code != 0)
          System.err.println(
            s"[state-backup] '${args.mkString(" ")}' exited $code: ${out.trim}")
        code == 0
      }
      if (run("git", "rev-parse", "--git-dir")._1 == 0) {
        if (runOrWarn("git", "add", p.getFileName.toString))
          runOrWarn("git", "commit", "-m", s"state backup $n", "--no-gpg-sign")
      } else
        System.err.println(s"[state-backup] $dir is not a git work tree; skipping commit")
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[state-backup] git commit failed: $e")
    }

  /** Restorable catalog dump: the spec set written through
    * [[graft.model.PipelineCatalog]], re-loadable with
    * `PipelineCatalog.load` + `manager.update` per spec — the reference
    * backup's restore half. */
  def dumpCatalog(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.model.PipelineCatalog.save(spark, manager.allSpecs, s"$dir/catalog")

  /** Start periodic dumps (reference default: daily; tests use seconds). */
  def start(periodSeconds: Long): Unit = synchronized {
    require(sched.isEmpty, "backup scheduler already running")
    val s = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-state-backup")
      t.setDaemon(true)
      t
    }
    s.scheduleAtFixedRate(
      // leader-gated: two controllers sharing one backup dir must never
      // both write (the reference's Helix leadership guards the same
      // path); a follower's scheduled dump is a no-op until failover
      () => try { if (isLeader()) dump() }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[state-backup] dump failed: $e")
        },
      periodSeconds, periodSeconds, TimeUnit.SECONDS)
    sched = Some(s)
  }

  def stop(): Unit = synchronized {
    sched.foreach(_.shutdownNow())
    sched = None
  }
}
