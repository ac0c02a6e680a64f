package graft.sources

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Properties of the dynamic source's planning layer:
  *
  *  1. checkpoint offset JSON round-trips exactly (the offset log is
  *     the exactly-once contract — a lossy serialization would replay
  *     or skip records after restart);
  *  2. range packing covers every non-empty (topic, partition) delta
  *     exactly once — no record planned twice, none dropped;
  *  3. the task count is bounded by the packing target, and the
  *     greedy least-loaded assignment's imbalance is bounded by the
  *     classic ideal + largest-single-range bound (one hot TP can
  *     dominate a task, but never two when a spare task exists).
  */
object TopicLogPlanProps extends Properties("TopicLogPlanning") {

  private lazy val spark = graft.SparkTestSession.spark

  private val genPositions: Gen[Map[String, Map[Int, Long]]] = for {
    nt <- Gen.chooseNum(1, 8)
    topics <- Gen.listOfN(nt, Gen.chooseNum(0, 999))
    perTopic <- Gen.listOfN(nt, for {
      np <- Gen.chooseNum(1, 12)
      offs <- Gen.listOfN(np, Gen.chooseNum(0L, 5000L))
    } yield offs)
  } yield topics.map(i => f"t$i%03d")
    .zip(perTopic.map(_.zipWithIndex.map { case (o, p) => p -> o }.toMap))
    .toMap

  propertyWithSeed("offset JSON round-trips exactly", None) =
    forAll(genPositions) { pos =>
      TopicLogOffset.fromJson(TopicLogOffset(pos).json()).positions == pos
    }

  /** end >= start per TP, plus some TPs only in end (new assignment). */
  private val genStartEnd: Gen[(Map[String, Map[Int, Long]], Map[String, Map[Int, Long]])] =
    genPositions.flatMap { end =>
      Gen.listOfN(end.size, Gen.oneOf(true, false)).map { keep =>
        val start = end.zip(keep).collect { case ((t, ps), true) =>
          t -> ps.map { case (p, o) => p -> o / 2 }
        }.toMap
        (start, end)
      }
    }

  propertyWithSeed("packing covers every delta exactly once, bounded", None) =
    forAll(genStartEnd) { case (start, end) =>
      // planInputPartitions resolves SparkSession.active for the packing
      // target — force the shared test session up before the first call
      val target = math.max(1, 2 * spark.sparkContext.defaultParallelism)
      val stream = new DynamicTopicLogStream("/nonexistent", None)
      val parts = stream
        .planInputPartitions(TopicLogOffset(start), TopicLogOffset(end))
        .map(_.asInstanceOf[TopicLogInputPartition])
      val ranges = parts.flatMap(_.ranges)
      val expected = (for {
        (t, ps) <- end.toSeq
        (p, until) <- ps
        from = start.getOrElse(t, Map.empty[Int, Long]).getOrElse(p, 0L)
        if until > from
      } yield TopicLogRange(t, p, from, until)).toSet
      val loads = parts.map(_.ranges.map(r => r.until - r.from).sum)
      val total = loads.sum
      val maxRange = expected.map(r => r.until - r.from).maxOption.getOrElse(0L)
      ranges.toSet == expected &&
        ranges.length == expected.size && // exactly once
        parts.length <= math.max(target, 1) &&
        parts.forall(_.ranges.nonEmpty) &&
        (parts.length <= 1 || expected.size <= target ||
          loads.max <= total / parts.length + maxRange)
    }

  // --- rate budget: deterministic sorted-greedy allocation ---

  private def rec(i: Int): FileTopicLog.LogRecord =
    FileTopicLog.LogRecord(null,
      Array[Byte](i.toByte), 1700000000000L + i)

  private val genLog: Gen[List[(String, Int, Int)]] = for {
    nt <- Gen.chooseNum(1, 4)
    tps <- Gen.listOfN(nt, for {
      np <- Gen.chooseNum(1, 3)
      counts <- Gen.listOfN(np, Gen.chooseNum(1, 20))
    } yield counts)
  } yield tps.zipWithIndex.flatMap { case (cs, t) =>
    cs.zipWithIndex.map { case (c, p) => (f"t$t%02d", p, c) }
  }

  propertyWithSeed("maxRows budget is allocated greedily in sorted TP order", None) =
    forAll(genLog, Gen.chooseNum(0L, 60L)) { (tps, budget) =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_budget_").toString
      tps.foreach { case (t, p, n) =>
        FileTopicLog.append(root, t, p, (0 until n).map(rec))
      }
      FileTopicLog.setWhitelist(root, tps.map(_._1).distinct)
      val stream = new DynamicTopicLogStream(root, None)
      val end = stream.latestOffset(TopicLogOffset(Map.empty),
        org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(budget))
        .asInstanceOf[TopicLogOffset].positions
      // expected: walk (topic, partition) sorted, draining each TP's
      // count until the budget runs out — byte-for-byte what a capped
      // batch must plan so replays are deterministic
      var left = budget
      val want = tps.sortBy(t => (t._1, t._2)).map { case (t, p, n) =>
        val take = math.min(n.toLong, math.max(left, 0L))
        left -= take
        (t, p) -> take
      }.toMap
      tps.forall { case (t, p, _) =>
        end.getOrElse(t, Map.empty[Int, Long]).getOrElse(p, 0L) == want((t, p))
      }
    }
}
