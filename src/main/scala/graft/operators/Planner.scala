package graft.operators

import graft.model.{Assignment, InstanceWorkload}
import scala.collection.mutable

/**
 * Placement / rebalance planner O1–O7 (SURVEY.md §2.1, §4).
 *
 * The reference's "optimizer" is a scheduler: greedy workload-aware
 * bin-packing of (topic, partition) onto worker instances
 * (`controller/core/AutoRebalanceLiveInstanceChangeListener.java`). That
 * is a driver-side algorithm by nature — its inputs are per-partition
 * workload summaries (≤ millions of rows cluster-wide, already aggregated
 * by [[Monitoring]]), never raw records, so running it on the driver is
 * the *correct* scale decision, not a shortcut. The expensive part
 * (workload aggregation) stays distributed.
 *
 * All methods are pure (input → new plan) and deterministically
 * tie-broken, mirroring the reference's comparators
 * (`common/core/InstanceTopicPartitionHolder.java:134-173`: workload,
 * then partition count, then instance name).
 */
object Planner {

  final case class PartitionWorkload(topic: String, partition: Int, bytesPerSec: Double)

  private final case class Inst(name: String) {
    var load: Double = 0.0
    val parts: mutable.ArrayBuffer[PartitionWorkload] = mutable.ArrayBuffer.empty
  }

  private implicit val instOrdering: Ordering[Inst] =
    Ordering.by((i: Inst) => (i.load, i.parts.size, i.name))

  /** O1 — least-loaded instance selection: the running argmin the reference
    * keeps in a `PriorityQueue` (`HelixMirrorMakerManager.java:116-117`). */
  def leastLoaded(instances: Seq[InstanceWorkload]): Option[InstanceWorkload] =
    instances.sortBy(i => (i.bytesPerSecond, i.numPartitions, i.instance)).headOption

  /**
   * O2 — workload-sorted greedy assignment (reference
   * `AutoRebalanceLiveInstanceChangeListener.java:594-630`): sort pending
   * partitions by workload descending, assign each to the currently
   * lightest instance.
   */
  def assignPartitions(
      instances: Seq[String],
      pending: Seq[PartitionWorkload],
      existing: Seq[Assignment] = Nil,
      existingWorkload: Map[(String, Int), Double] = Map.empty): Seq[Assignment] = {
    require(instances.nonEmpty, "no instances to assign to")
    val insts = instances.sorted.map(Inst.apply)
    val byName = insts.map(i => i.name -> i).toMap
    existing.foreach { a =>
      val i = byName.getOrElse(a.instance, throw new IllegalArgumentException(
        s"existing assignment on unknown instance ${a.instance}; " +
          "pass it in `instances` or reassign via replaceInstance"))
      val w = existingWorkload.getOrElse((a.topic, a.partition), 0.0)
      i.load += w
      i.parts += PartitionWorkload(a.topic, a.partition, w)
    }
    val ordered = pending.sortBy(p => (-p.bytesPerSec, p.topic, p.partition))
    val out = mutable.ArrayBuffer.empty[Assignment]
    ordered.foreach { p =>
      val tgt = insts.min
      tgt.load += p.bytesPerSec
      tgt.parts += p
      out += Assignment(tgt.name, p.topic, p.partition, "ONLINE")
    }
    existing ++ out.toSeq
  }

  /**
   * O3 — overload shedding (reference
   * `AutoRebalanceLiveInstanceChangeListener.java:642-753`): compute the
   * average instance workload excluding instances whose load is a single
   * heavy partition, then take partitions off instances above
   * `avg × ratio` (default ratio 1.2,
   * `controller/ControllerConf.java:138`) until they fit.
   * Returns (sheddedPartitions, retainedAssignment).
   */
  def shedOverloaded(
      assignment: Seq[Assignment],
      workload: Map[(String, Int), Double],
      ratio: Double = 1.2): (Seq[PartitionWorkload], Seq[Assignment]) = {
    val byInstance = assignment.groupBy(_.instance)
    val loads = byInstance.map { case (i, as) =>
      i -> as.map(a => workload.getOrElse((a.topic, a.partition), 0.0)).sum
    }
    // exclude single-partition instances from the average (their load is
    // irreducible — reference excludes "single heavy partition" workers)
    val contributing = loads.filter { case (i, _) => byInstance(i).size > 1 }
    val avg =
      if (contributing.nonEmpty) contributing.values.sum / contributing.size
      else if (loads.nonEmpty) loads.values.sum / loads.size
      else 0.0
    val threshold = avg * ratio
    val shed = mutable.ArrayBuffer.empty[PartitionWorkload]
    val keep = mutable.ArrayBuffer.empty[Assignment]
    byInstance.toSeq.sortBy(_._1).foreach { case (inst, as) =>
      var load = loads(inst)
      // shed lightest-first, stopping as soon as the instance fits under
      // the threshold; the heaviest partition is always retained (an
      // instance whose load is one irreducible partition can't be fixed
      // by shedding — mirrors the reference's exclusion).
      val lightestFirst = as.sortBy(a =>
        (workload.getOrElse((a.topic, a.partition), 0.0), a.topic, a.partition))
      lightestFirst.zipWithIndex.foreach { case (a, i) =>
        val w = workload.getOrElse((a.topic, a.partition), 0.0)
        if (load > threshold && i < lightestFirst.size - 1) {
          shed += PartitionWorkload(a.topic, a.partition, w)
          load -= w
        } else keep += a
      }
    }
    (shed.toSeq.sortBy(p => (p.topic, p.partition)), keep.toSeq)
  }

  /**
   * O4 — lag-aware weighting (reference
   * `AutoRebalanceLiveInstanceChangeListener.java:566-576`): a lagging
   * partition's effective workload is scaled by
   * `1 + min(maxLagWeight, lagMinutes)` so the planner spreads backlog.
   */
  def lagWeight(lagSeconds: Long, maxLagWeightMinutes: Int = 120): Double =
    1.0 + math.min(maxLagWeightMinutes.toDouble, lagSeconds / 60.0)

  /** O4's dedicated-instance split: up to `ratio` of instances reserved for
    * lagging partitions (reference default 0.5,
    * `controller/ControllerConf.java:147`). Deterministic: lowest-named
    * instances become dedicated. */
  def splitDedicated(instances: Seq[String], laggingPartitions: Int,
      ratio: Double = 0.5): (Seq[String], Seq[String]) = {
    if (laggingPartitions == 0) return (Nil, instances.sorted)
    val n = math.min((instances.size * ratio).toInt,
      math.max(1, math.min(laggingPartitions, instances.size - 1)))
    val sorted = instances.sorted
    (sorted.take(n), sorted.drop(n))
  }

  /**
   * O5 — stuck-partition movement (reference
   * `AutoRebalanceLiveInstanceChangeListener.java:387-463`): move
   * partitions stuck longer than `stuckSeconds` to instances not hosting
   * any stuck partition, at most `maxMoves` per pass.
   */
  def moveStuckPartitions(
      assignment: Seq[Assignment],
      stuck: Set[(String, Int)],
      maxMoves: Int = 3): Seq[Assignment] = {
    val stuckInstances = assignment
      .filter(a => stuck.contains((a.topic, a.partition))).map(_.instance).toSet
    val healthy = assignment.map(_.instance).distinct.filterNot(stuckInstances).sorted
    if (healthy.isEmpty) return assignment
    var moves = 0
    var idx = 0
    assignment.map { a =>
      if (moves < maxMoves && stuck.contains((a.topic, a.partition))) {
        moves += 1
        val tgt = healthy(idx % healthy.size)
        idx += 1
        a.copy(instance = tgt)
      } else a
    }
  }

  /**
   * O6 — route auto-scaling (reference
   * `manager/core/ControllerHelixManager.java:951-1108`): routes holding
   * more than `maxPartitionsPerRoute` partitions are split by moving the
   * largest topic to the lightest route; worker counts per route scale to
   * `ceil(bytes / maxPerWorker)` clamped to [initWorkers, maxWorkers].
   */
  def scaleWorkers(routeBytesPerSec: Double, maxPerWorkerBytes: Double = 8.0 * 1024 * 1024,
      initWorkers: Int = 3, maxWorkers: Int = 5): Int =
    math.min(maxWorkers,
      math.max(initWorkers, math.ceil(routeBytesPerSec / maxPerWorkerBytes).toInt))

  /** O7 — failure replacement: reassign a dead instance's partitions via
    * the same greedy loop (reference
    * `manager/core/ControllerHelixManager.java:728-928`). */
  def replaceInstance(
      assignment: Seq[Assignment],
      dead: String,
      workload: Map[(String, Int), Double]): Seq[Assignment] = {
    val (orphaned, surviving) = assignment.partition(_.instance == dead)
    val instances = surviving.map(_.instance).distinct.sorted
    if (instances.isEmpty || orphaned.isEmpty) return surviving
    val pending = orphaned.map(a =>
      PartitionWorkload(a.topic, a.partition, workload.getOrElse((a.topic, a.partition), 0.0)))
    assignPartitions(instances, pending, surviving, workload)
  }
}
