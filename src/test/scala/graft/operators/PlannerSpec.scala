package graft.operators

import graft.model.{Assignment, InstanceWorkload}
import graft.operators.Planner.PartitionWorkload
import org.scalatest.funsuite.AnyFunSuite

/** O1–O7 placement planner (reference
  * controller/core/AutoRebalanceLiveInstanceChangeListener.java). Pure
  * driver-side logic — no SparkSession needed. */
class PlannerSpec extends AnyFunSuite {

  test("O1: leastLoaded picks min by (workload, partitions, name)") {
    val insts = Seq(
      InstanceWorkload("w2", 100.0, 3),
      InstanceWorkload("w1", 100.0, 3),
      InstanceWorkload("w3", 50.0, 9))
    assert(Planner.leastLoaded(insts).get.instance == "w3")
    // tie on workload+partitions → lowest name wins
    assert(Planner.leastLoaded(insts.take(2)).get.instance == "w1")
    assert(Planner.leastLoaded(Nil).isEmpty)
  }

  test("O2: assignPartitions spreads heavy-first onto lightest instance") {
    val pending = Seq(
      PartitionWorkload("t", 0, 100.0),
      PartitionWorkload("t", 1, 80.0),
      PartitionWorkload("t", 2, 60.0),
      PartitionWorkload("t", 3, 10.0))
    val out = Planner.assignPartitions(Seq("a", "b"), pending)
    val byInst = out.groupBy(_.instance)
    // 100 → a; 80 → b; 60 → b(140 vs 100? no: a=100,b=80 → b); 10 → a
    assert(byInst("a").map(_.partition).toSet == Set(0, 3))
    assert(byInst("b").map(_.partition).toSet == Set(1, 2))
  }

  test("O2: assignment is deterministic and total (100 seeded cases)") {
    (1L to 100L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val pending = (0 until 20).map(p =>
        PartitionWorkload("t", p, rnd.nextDouble() * 100))
      val insts = Seq("w1", "w2", "w3")
      val a = Planner.assignPartitions(insts, pending)
      val b = Planner.assignPartitions(insts, pending)
      assert(a == b)
      assert(a.size == 20)
      assert(a.map(_.partition).toSet == (0 until 20).toSet)
    }
  }

  test("O3: shedOverloaded takes load off instances above avg*ratio") {
    val assignment = Seq(
      Assignment("hot", "t", 0, "ONLINE"),
      Assignment("hot", "t", 1, "ONLINE"),
      Assignment("hot", "t", 2, "ONLINE"),
      Assignment("cold", "t", 3, "ONLINE"),
      Assignment("cold", "t", 4, "ONLINE"))
    val workload = Map(
      ("t", 0) -> 50.0, ("t", 1) -> 30.0, ("t", 2) -> 40.0,
      ("t", 3) -> 5.0, ("t", 4) -> 5.0)
    val (shed, kept) = Planner.shedOverloaded(assignment, workload, ratio = 1.2)
    assert(shed.nonEmpty)
    // hot stays above nothing it can't fix, but never sheds everything
    assert(kept.exists(_.instance == "hot"))
    assert(shed.map(p => (p.topic, p.partition)).toSet
      .subsetOf(Set(("t", 0), ("t", 1), ("t", 2))))
  }

  test("O3: balanced cluster sheds nothing") {
    val assignment = Seq(
      Assignment("a", "t", 0, "ONLINE"), Assignment("a", "t", 1, "ONLINE"),
      Assignment("b", "t", 2, "ONLINE"), Assignment("b", "t", 3, "ONLINE"))
    val workload = Map(("t", 0) -> 10.0, ("t", 1) -> 10.0,
      ("t", 2) -> 10.0, ("t", 3) -> 10.0)
    val (shed, kept) = Planner.shedOverloaded(assignment, workload)
    assert(shed.isEmpty)
    assert(kept.toSet == assignment.toSet)
  }

  test("O4: lagWeight = 1 + min(cap, lagMinutes)") {
    assert(Planner.lagWeight(0) == 1.0)
    assert(Planner.lagWeight(60) == 2.0)
    assert(Planner.lagWeight(60 * 500) == 121.0) // capped at 120
  }

  test("O4: splitDedicated reserves at most ratio of instances") {
    val insts = Seq("w1", "w2", "w3", "w4")
    val (ded, rest) = Planner.splitDedicated(insts, laggingPartitions = 3)
    assert(ded.size == 2 && rest.size == 2)
    assert((ded ++ rest).sorted == insts)
    val (none, all) = Planner.splitDedicated(insts, laggingPartitions = 0)
    assert(none.isEmpty && all.size == 4)
  }

  test("O5: moveStuckPartitions moves at most maxMoves to healthy instances") {
    val assignment = Seq(
      Assignment("sick", "t", 0, "ONLINE"),
      Assignment("sick", "t", 1, "ONLINE"),
      Assignment("ok", "t", 2, "ONLINE"))
    val stuck = Set(("t", 0), ("t", 1))
    val out = Planner.moveStuckPartitions(assignment, stuck, maxMoves = 1)
    val moved = out.filter(a => stuck.contains((a.topic, a.partition)))
      .count(_.instance != "sick")
    assert(moved == 1)
    // moved partitions land on a non-stuck instance
    assert(out.filter(_.instance == "ok").nonEmpty)
  }

  test("O6: scaleWorkers = ceil(bytes/8MiB) clamped to [3,5]") {
    val MiB = 1024.0 * 1024
    assert(Planner.scaleWorkers(1 * MiB) == 3)     // below init
    assert(Planner.scaleWorkers(33 * MiB) == 5)    // ceil=5
    assert(Planner.scaleWorkers(400 * MiB) == 5)   // clamped at max
  }

  test("O7: replaceInstance reassigns the dead instance's partitions") {
    val assignment = Seq(
      Assignment("dead", "t", 0, "ONLINE"),
      Assignment("dead", "t", 1, "ONLINE"),
      Assignment("w1", "t", 2, "ONLINE"),
      Assignment("w2", "t", 3, "ONLINE"))
    val workload = Map(("t", 0) -> 50.0, ("t", 1) -> 10.0,
      ("t", 2) -> 30.0, ("t", 3) -> 30.0)
    val out = Planner.replaceInstance(assignment, "dead", workload)
    assert(!out.exists(_.instance == "dead"))
    assert(out.map(p => (p.topic, p.partition)).toSet ==
      assignment.map(p => (p.topic, p.partition)).toSet)
  }
}
