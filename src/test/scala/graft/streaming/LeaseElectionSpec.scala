package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The election protocol itself: mutual exclusion, graceful handover,
  * crash takeover after TTL, and mutual exclusion under concurrent
  * renewal threads. (The controller-level failover integration —
  * exactly-one-writer on a shared backup dir — lives in FederationSpec.) */
class LeaseElectionSpec extends AnyFunSuite {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_lease_").toString

  test("two contenders: exactly one wins; loser stays follower on renew") {
    val dir = tmpDir()
    val a = new LeaseElection(dir, "a", ttlMs = 1000, renewPeriodMs = 100)
    val b = new LeaseElection(dir, "b", ttlMs = 1000, renewPeriodMs = 100)
    assert(a.tryAcquire())
    assert(!b.tryAcquire())
    // renewal keeps the holder, repeated attempts keep the follower out
    assert(a.tryAcquire())
    assert(!b.tryAcquire())
    assert(a.isLeader() && !b.isLeader())
  }

  test("graceful release hands over immediately") {
    val dir = tmpDir()
    val a = new LeaseElection(dir, "a", ttlMs = 1000, renewPeriodMs = 100)
    val b = new LeaseElection(dir, "b", ttlMs = 1000, renewPeriodMs = 100)
    assert(a.tryAcquire())
    a.release()
    assert(!a.isLeader())
    assert(b.tryAcquire(), "released lease must be takeable at once")
  }

  test("crashed leader is stolen from only after the TTL") {
    val dir = tmpDir()
    val a = new LeaseElection(dir, "a", ttlMs = 600, renewPeriodMs = 100)
    val b = new LeaseElection(dir, "b", ttlMs = 600, renewPeriodMs = 100)
    assert(a.tryAcquire())
    // a "crashes": no release, no renewal. b must NOT steal early…
    assert(!b.tryAcquire())
    // …and must steal once the lease expires
    val deadline = System.currentTimeMillis() + 5000
    var took = false
    while (!took && System.currentTimeMillis() < deadline) {
      Thread.sleep(100)
      took = b.tryAcquire()
    }
    assert(took, "follower never took over an expired lease")
    assert(b.holder().exists(_._1 == "b"))
  }

  test("concurrent renewal threads never see two leaders") {
    val dir = tmpDir()
    val a = new LeaseElection(dir, "a", ttlMs = 2000, renewPeriodMs = 50)
    val b = new LeaseElection(dir, "b", ttlMs = 2000, renewPeriodMs = 50)
    a.start(); b.start()
    try {
      var both = 0
      var either = 0
      val deadline = System.currentTimeMillis() + 3000
      while (System.currentTimeMillis() < deadline) {
        val (la, lb) = (a.isLeader(), b.isLeader())
        if (la && lb) both += 1
        if (la || lb) either += 1
        Thread.sleep(10)
      }
      assert(both == 0, s"observed dual leadership $both times")
      assert(either > 0, "nobody ever led")
    } finally { a.stop(); b.stop() }
  }
}
