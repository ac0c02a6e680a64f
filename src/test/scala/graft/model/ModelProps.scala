package graft.model

import graft.operators.Planner
import graft.operators.Planner.PartitionWorkload
import graft.streaming.PipelineManager
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the pure control-plane functions (SURVEY §5's
  * "ScalaCheck property tests for transform operators are ideal
  * targets" — these are the driver-side pure functions; the column-level
  * transforms are value-checked by the DuckDB oracle). */
object ModelProps extends Properties("graft.model") {

  private val nameGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  property("Route render/parse roundtrip") =
    forAll(nameGen, nameGen, Gen.choose(0, 10000)) { (src, dst, id) =>
      val r = Route(src, dst, id)
      Route.parse(r.render) == r
    }

  property("OffsetRange.contains is [start, end)") =
    forAll(Gen.choose(0L, 1000L), Gen.choose(0L, 1000L), Gen.choose(0L, 2000L)) {
      (start, len, off) =>
        val r = OffsetRange("t", 0, start, Some(start + len))
        r.contains(off) == (off >= start && off < start + len)
    }

  property("unbounded OffsetRange contains everything past start") =
    forAll(Gen.choose(0L, 1000L), Gen.choose(0L, 5000L)) { (start, off) =>
      OffsetRange("t", 0, start, None).contains(off) == (off >= start)
    }

  property("PartitionLag.lag is never negative") =
    forAll(Gen.choose(-100L, 100L), Gen.choose(-100L, 100L)) { (latest, commit) =>
      PartitionLag("t", 0, latest, commit, 0L).lag >= 0
    }

  private val workloadsGen: Gen[List[PartitionWorkload]] =
    Gen.listOfN(12, Gen.choose(0.0, 100.0)).map(_.zipWithIndex.map {
      case (w, i) => PartitionWorkload("t", i, w)
    })

  property("assignPartitions is total, deterministic, and near-balanced") =
    forAll(workloadsGen, Gen.choose(1, 4)) { (pending, nInst) =>
      val instances = (0 until nInst).map(i => s"w$i")
      val a = Planner.assignPartitions(instances, pending)
      val b = Planner.assignPartitions(instances, pending)
      val loads = a.groupBy(_.instance).view.mapValues(
        _.map(x => pending.find(p => p.partition == x.partition).get.bytesPerSec).sum)
      val maxW = if (pending.isEmpty) 0.0 else pending.map(_.bytesPerSec).max
      val spread =
        if (loads.isEmpty) 0.0 else loads.values.max - loads.values.min
      Prop(a == b) :| "deterministic" &&
        Prop(a.size == pending.size) :| "total" &&
        Prop(a.map(_.partition).toSet == pending.map(_.partition).toSet) :| "covers all" &&
        // greedy lightest-first bound: spread never exceeds one partition
        Prop(spread <= maxW + 1e-9) :| s"balanced (spread=$spread, maxW=$maxW)"
    }

  property("shedOverloaded never sheds an instance's last partition") =
    forAll(workloadsGen) { pending =>
      val assignment = pending.map(p =>
        Assignment(s"w${p.partition % 3}", p.topic, p.partition, "ONLINE"))
      val workload = pending.map(p => (p.topic, p.partition) -> p.bytesPerSec).toMap
      val (shed, kept) = Planner.shedOverloaded(assignment, workload)
      val keptInstances = kept.map(_.instance).toSet
      val before = assignment.map(_.instance).toSet
      Prop(shed.size + kept.size == assignment.size) :| "partition conservation" &&
        Prop(before == keptInstances) :| "every instance keeps >= 1"
    }

  property("scaleWorkers stays within [init, max]") =
    forAll(Gen.choose(0.0, 1e12)) { bytes =>
      val w = Planner.scaleWorkers(bytes)
      w >= 3 && w <= 5
    }

  property("parseTopicMapping ignores comments/blanks, reads = and whitespace") =
    forAll(Gen.listOf(Gen.zip(nameGen, nameGen))) { pairs =>
      val distinct = pairs.toMap.toList
      val lines = distinct.zipWithIndex.flatMap { case ((k, v), i) =>
        val sep = if (i % 2 == 0) "=" else " "
        List(s"$k$sep$v", "", s"# comment $i")
      }
      PipelineSpec.parseTopicMapping(lines.iterator) == distinct.toMap
    }

  property("jsonEscape output round-trips as a JSON string body") =
    forAll(Gen.asciiStr) { s =>
      val escaped = PipelineManager.jsonEscape(s)
      escaped.startsWith("\"") && escaped.endsWith("\"") &&
        !escaped.drop(1).dropRight(1)
          .replaceAll("\\\\.", "").exists(c => c == '"' || c < ' ')
    }
}
