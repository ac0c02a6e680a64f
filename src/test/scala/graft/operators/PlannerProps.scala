package graft.operators

import graft.model.Assignment
import graft.operators.Planner.PartitionWorkload
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Structural invariants of the planner (the reference controller's
  * rebalance core) under random fleets and workloads:
  *
  *  - O2 assignment is a partition-exactly-once cover onto known
  *    instances, preserves existing placements verbatim, and its
  *    greedy balance is within the classic ideal + heaviest-item bound;
  *  - O3 shedding conserves partitions (shed ⊎ keep == input), never
  *    empties an instance, and only takes from instances that were
  *    above the threshold;
  *  - O4 lag weighting is monotone and bounded.
  */
object PlannerProps extends Properties("Planner") {

  private val genInstances: Gen[List[String]] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.const((0 until n).map(i => f"w$i%02d").toList))

  private val genPending: Gen[List[PartitionWorkload]] = for {
    n <- Gen.chooseNum(0, 40)
    ws <- Gen.listOfN(n, Gen.chooseNum(0.0, 1000.0))
  } yield ws.zipWithIndex.map { case (w, i) =>
    PartitionWorkload(f"t${i / 8}%02d", i % 8, w)
  }

  propertyWithSeed("O2: exactly-once cover, valid instances, bounded imbalance", None) =
    forAll(genInstances, genPending) { (instances, pending) =>
      val out = Planner.assignPartitions(instances, pending)
      val outKeys = out.map(a => (a.topic, a.partition))
      val wantKeys = pending.map(p => (p.topic, p.partition))
      val loads = out.groupBy(_.instance).view.mapValues(as =>
        as.map(a => pending.find(p => p.topic == a.topic && p.partition == a.partition)
          .map(_.bytesPerSec).getOrElse(0.0)).sum).toMap
      val total = pending.map(_.bytesPerSec).sum
      val maxItem = pending.map(_.bytesPerSec).maxOption.getOrElse(0.0)
      val ideal = total / instances.size
      outKeys.sorted == wantKeys.sorted &&
        out.forall(a => instances.contains(a.instance)) &&
        (loads.isEmpty || loads.values.max <= ideal + maxItem + 1e-6)
    }

  propertyWithSeed("O2: existing placements are preserved verbatim", None) =
    forAll(genInstances, genPending, genPending) { (instances, pendA, pendB) =>
      // place A first, then re-plan with A existing and B pending
      val first = Planner.assignPartitions(instances, pendA)
      val wl = pendA.map(p => (p.topic, p.partition) -> p.bytesPerSec).toMap
      val second = Planner.assignPartitions(instances,
        pendB.map(p => p.copy(topic = "x" + p.topic)), first, wl)
      first.forall(second.contains)
    }

  propertyWithSeed("O3: shedding conserves partitions and never empties an instance", None) =
    forAll(genInstances, genPending, Gen.chooseNum(1.0, 2.0)) { (instances, pending, ratio) =>
      val assignment = Planner.assignPartitions(instances, pending)
      val wl = pending.map(p => (p.topic, p.partition) -> p.bytesPerSec).toMap
      val (shed, keep) = Planner.shedOverloaded(assignment, wl, ratio)
      val shedKeys = shed.map(p => (p.topic, p.partition))
      val keepKeys = keep.map(a => (a.topic, a.partition))
      val allKeys = assignment.map(a => (a.topic, a.partition))
      val emptied = assignment.groupBy(_.instance).keySet --
        keep.map(_.instance).toSet
      (shedKeys ++ keepKeys).sorted == allKeys.sorted &&
        (shed.isEmpty || emptied.isEmpty) // an instance never sheds its last partition
    }

  propertyWithSeed("O4: lag weight is monotone and bounded", None) =
    forAll(Gen.chooseNum(0L, 100000L), Gen.chooseNum(0L, 100000L)) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val (wl, wh) = (Planner.lagWeight(lo), Planner.lagWeight(hi))
      wl <= wh && wl >= 1.0 && wh <= 121.0
    }
}
