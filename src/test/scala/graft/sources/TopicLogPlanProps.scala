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

  // --- rate budget: deterministic prorated allocation ---

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

  propertyWithSeed("maxRows budget prorates by available rows, min 1/TP", None) =
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
      // expected: the fair-share model — floor(budget * avail / total),
      // clamped to [1, avail] when capped (liveness: every non-empty TP
      // advances), full drain when everything fits. Byte-for-byte what a
      // capped batch must plan so replays are deterministic.
      val total = tps.map(_._3.toLong).sum
      val want = tps.map { case (t, p, n) =>
        val take =
          if (total <= budget) n.toLong
          else if (budget <= 0L) 0L
          else math.min(n.toLong,
            math.max((BigInt(budget) * BigInt(n) / BigInt(total)).toLong, 1L))
        (t, p) -> take
      }.toMap
      tps.forall { case (t, p, _) =>
        end.getOrElse(t, Map.empty[Int, Long]).getOrElse(p, 0L) == want((t, p))
      }
    }

  /** Liveness under a sustained cap: however hot one TP is, every TP
    * with available rows advances every batch, and the overshoot of the
    * cap is bounded by one row per non-empty TP. */
  propertyWithSeed("no TP with data is starved under a sustained cap", None) =
    forAll(genLog, Gen.chooseNum(1L, 30L)) { (tps, budget) =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_starve_").toString
      tps.foreach { case (t, p, n) =>
        FileTopicLog.append(root, t, p, (0 until n).map(rec))
      }
      // make the lexicographically-FIRST TP hot enough to saturate the
      // cap alone — the shape that starved later TPs under sorted drain
      val (ht, hp, _) = tps.minBy(t => (t._1, t._2))
      FileTopicLog.append(root, ht, hp, (0 until 200).map(rec))
      FileTopicLog.setWhitelist(root, tps.map(_._1).distinct)
      val stream = new DynamicTopicLogStream(root, None)
      val limit = org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(budget)
      var pos: Map[String, Map[Int, Long]] = Map.empty
      var ok = true
      (0 until 4).foreach { _ =>
        val next = stream.latestOffset(TopicLogOffset(pos), limit)
          .asInstanceOf[TopicLogOffset].positions
        val counts = FileTopicLog.endOffsets(root)
        var planned = 0L
        tps.map(t => (t._1, t._2)).distinct.foreach { case (t, p) =>
          val before = pos.getOrElse(t, Map.empty[Int, Long]).getOrElse(p, 0L)
          val after = next.getOrElse(t, Map.empty[Int, Long]).getOrElse(p, 0L)
          val avail = counts(t)(p) - before
          planned += after - before
          ok &&= after >= before && after <= counts(t)(p) &&
            (avail == 0L || after > before) // every non-empty TP advances
        }
        val nonEmpty = tps.map(t => (t._1, t._2)).distinct.count { case (t, p) =>
          counts(t)(p) > pos.getOrElse(t, Map.empty[Int, Long]).getOrElse(p, 0L)
        }
        ok &&= planned <= budget + nonEmpty // bounded overshoot
        pos = next
      }
      ok
    }
}
