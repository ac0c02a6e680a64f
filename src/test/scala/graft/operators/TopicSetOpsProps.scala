package graft.operators

import graft.SparkTestSession
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Set-algebra properties of the F-family whitelist operators against a
  * plain-Scala model: for random topic universes the relational forms
  * must compute exactly
  * `(src ∩ dst) − serving − blacklist − regex` (F3), regex exclusion
  * (F4), and the blacklist anti-joins (F2/F5) — the controller semantics
  * a wrong join type or null-handling slip would silently corrupt. */
object TopicSetOpsProps extends Properties("TopicSetOps") {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val genTopics: Gen[List[String]] =
    Gen.chooseNum(0, 15).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 30).map(i => f"topic$i%02d")))
      .map(_.distinct)

  propertyWithSeed("F3 equals the model set algebra", None) =
    forAll(genTopics, genTopics, genTopics, genTopics) { (src, dst, serving, bl) =>
      val got = TopicSetOps.autoWhitelistCandidates(
        src.toDF("topic"), dst.toDF("topic"),
        serving.toDF("topic"), bl.toDF("topic"), "^topic0.*")
        .collect().map(_.getString(0)).toSet
      val want = ((src.toSet intersect dst.toSet) -- serving -- bl)
        .filterNot(_.startsWith("topic0"))
      got == want
    }

  propertyWithSeed("F4 removes exactly the regex matches", None) =
    forAll(genTopics) { topics =>
      val got = TopicSetOps.excludeByRegex(topics.toDF("topic"), "^topic1.*")
        .collect().map(_.getString(0)).toSet
      got == topics.toSet.filterNot(_.startsWith("topic1"))
    }

  propertyWithSeed("F2/F5 anti-joins drop exactly the blacklisted keys", None) =
    forAll(genTopics, genTopics, Gen.chooseNum(1, 4)) { (topics, bl, parts) =>
      val recs = topics.flatMap(t => (0 until parts).map(p => (t, p)))
      val pbl = bl.map(t => (t, 0))
      val gotTopic = TopicSetOps.applyTopicBlacklist(
        recs.toDF("topic", "partition"), bl.toDF("topic"))
        .collect().map(r => (r.getString(0), r.getInt(1))).toSet
      val gotPart = TopicSetOps.applyPartitionBlacklist(
        recs.toDF("topic", "partition"), pbl.toDF("topic", "partition"))
        .collect().map(r => (r.getString(0), r.getInt(1))).toSet
      val wantTopic = recs.toSet.filterNot(r => bl.contains(r._1))
      val wantPart = recs.toSet.filterNot(r => r._2 == 0 && bl.contains(r._1))
      gotTopic == wantTopic && gotPart == wantPart
    }
}
