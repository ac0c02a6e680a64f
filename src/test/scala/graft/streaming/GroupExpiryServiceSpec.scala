package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import graft.sources.FileTopicLog
import graft.sources.FileTopicLog.LogRecord
import org.scalatest.funsuite.AnyFunSuite

class GroupExpiryServiceSpec extends AnyFunSuite {

  private def rec(i: Int): LogRecord =
    LogRecord(null, s"v$i".getBytes(StandardCharsets.UTF_8), 1L)

  private def freshRoot(): String =
    Files.createTempDirectory("graft_expiry_").toString

  /** Liveness is the group file's mtime (every commit bumps it), so
    * "idle for N ms" is simulated by backdating the mtime — no sleeps,
    * and the service's real clock path is what runs. */
  private def backdate(root: String, group: String, byMillis: Long): Unit =
    Files.setLastModifiedTime(Paths.get(root, "_groups", s"$group.json"),
      FileTime.fromMillis(System.currentTimeMillis() - byMillis))

  test("an idle group is expired and retention advances; an active slow group never is") {
    val root = freshRoot()
    FileTopicLog.setWhitelist(root, Seq("t"))
    FileTopicLog.append(root, "t", 0, (0 until 8).map(rec))
    // `slow` keeps re-committing the SAME position — alive but behind;
    // `abandoned` committed once and went silent
    FileTopicLog.registerGroup(root, "slow")
    FileTopicLog.commitGroup(root, "slow", Map("t" -> Map(0 -> 3L)))
    FileTopicLog.registerGroup(root, "abandoned")
    FileTopicLog.commitGroup(root, "abandoned", Map("t" -> Map(0 -> 1L)))
    assert(FileTopicLog.retentionCut(root, "t", 0, 8L) == 1L,
      "the abandoned group pins the cut")

    val svc = new GroupExpiryService(root, ttlMillis = 60000L)
    assert(svc.expireOnce().isEmpty, "nothing is idle yet")

    backdate(root, "abandoned", byMillis = 120000L)
    // a commit that advances nothing still proves liveness
    FileTopicLog.commitGroup(root, "slow", Map("t" -> Map(0 -> 3L)))
    assert(svc.expireOnce() == Seq("abandoned"))
    assert(svc.expiredCount == 1L)
    assert(FileTopicLog.groups(root) == Seq("slow"),
      "the live-but-slow group survives")
    assert(FileTopicLog.retentionCut(root, "t", 0, 8L) == 3L,
      "expiry released the abandoned pin; the cut advances to the live min")

    // the surviving group never expires while it keeps committing
    (1 to 3).foreach { _ =>
      FileTopicLog.commitGroup(root, "slow", Map("t" -> Map(0 -> 3L)))
      assert(svc.expireOnce().isEmpty)
    }
    // ... and does expire once it truly goes silent
    backdate(root, "slow", byMillis = 120000L)
    assert(svc.expireOnce() == Seq("slow"))
    assert(FileTopicLog.retentionCut(root, "t", 0, 8L) == 8L,
      "no groups left → single-consumer retention")
  }

  test("a non-leader pass expires nothing") {
    val root = freshRoot()
    FileTopicLog.registerGroup(root, "g")
    backdate(root, "g", byMillis = 60000L)
    var leader = false
    val svc = new GroupExpiryService(root, ttlMillis = 1000L,
      isLeader = () => leader)
    assert(svc.expireOnce().isEmpty, "non-leader must not apply policy")
    assert(FileTopicLog.groups(root) == Seq("g"))
    leader = true
    assert(svc.expireOnce() == Seq("g"), "leadership gained → policy applies")
  }

  test("the periodic loop releases an abandoned pin end-to-end") {
    val root = freshRoot()
    FileTopicLog.setWhitelist(root, Seq("t"))
    FileTopicLog.append(root, "t", 0, (0 until 4).map(rec))
    FileTopicLog.registerGroup(root, "dead")
    val svc = new GroupExpiryService(root, ttlMillis = 300L)
    svc.start(periodMillis = 100L)
    try {
      val deadline = System.currentTimeMillis() + 15000L
      while (FileTopicLog.groups(root).nonEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50L)
      assert(FileTopicLog.groups(root).isEmpty,
        "the loop expired the abandoned group")
      assert(FileTopicLog.retentionCut(root, "t", 0, 4L) == 4L)
    } finally svc.stop()
  }
}
