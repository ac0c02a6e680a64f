package graft.streaming

import graft.model.PipelineSpec
import graft.operators.Monitoring
import graft.streaming.PipelineManager.jsonEscape
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The reference's admin/REST command surface as a library API — each
 * method is one Restlet endpoint's semantics over [[PipelineManager]],
 * returning the JSON the endpoint would serve (mount behind any HTTP
 * layer; none is bundled — zero-dependency build):
 *
 *  - addTopic / deleteTopic — `controller/rest/resources/
 *    TopicManagementRestletResource.java:113-252` (F1/F2; delete also
 *    records the topic in the spec's blacklist, mirroring the ZK
 *    blacklist at `AutoTopicWhitelistingManager.java:252-260`)
 *  - blacklistPartition — `TopicPartitionBlacklistRestletResource` (F5)
 *  - setRateLimit — `worker/RateLimiterResource.java:41-62` (R1) via
 *    [[AdmissionControl]]
 *  - status / topics — `AdminRestletResource.java:82-132` views (V1)
 *  - autobalancing enable/disable/status —
 *    `AdminRestletResource.java:54-88` (`/admin/{opt}`)
 *  - noProgress / offsets / instances — the read-only monitor routes
 *    (`NoProgressTopicPartitionRestletResource`,
 *    `TopicParitionOffsetRestletResource`,
 *    `MirrorMakerManagerRestletResource.java:40-84`), fed by the SAME
 *    A1/A2 operators the oracle gate covers, over live view thunks
 *    ([[AdminApi.MonitorFeeds]]) — bounded cluster metadata collected
 *    driver-side by design
 */
final class AdminApi(
    manager: PipelineManager,
    admission: Option[AdmissionControl] = None,
    feeds: Option[AdminApi.MonitorFeeds] = None,
    groupRoot: Option[String] = None,
    expiry: Option[GroupExpiryService] = None,
    isLeader: () => Boolean = () => true) {

  private def ok(extra: String = ""): String =
    s"""{"status":"ok"$extra}"""
  private def err(msg: String): String =
    s"""{"status":"error","message":${jsonEscape(msg)}}"""

  /** Read-modify-write on the spec as compare-and-swap: the restart
    * inside `update` is slow, so a concurrent command could interleave
    * between our read and write — CAS re-reads and retries instead of
    * silently overwriting the other command's change. */
  @annotation.tailrec
  private def cas(pipeline: String, attempts: Int = 3)(
      f: PipelineSpec => Either[String, PipelineSpec]): Either[String, Unit] =
    manager.spec(pipeline) match {
      case None => Left(s"unknown pipeline $pipeline")
      case Some(sp) => f(sp) match {
        case Left(msg) => Left(msg)
        case Right(next) =>
          if (manager.updateIfCurrent(sp, next)) Right(())
          else if (attempts > 1) cas(pipeline, attempts - 1)(f)
          else Left(s"concurrent modification of $pipeline, retries exhausted")
      }
    }

  /** POST /topics — whitelist a topic on a route (restarts the query). */
  def addTopic(pipeline: String, topic: String): String =
    cas(pipeline) { sp =>
      if (sp.topics.contains(topic)) Left(s"topic $topic already whitelisted")
      else Right(sp.copy(topics = sp.topics :+ topic))
    }.fold(err, _ => ok(s""","topic":${jsonEscape(topic)}"""))

  /** DELETE /topics/{t} — drop from the whitelist AND blacklist it. */
  def deleteTopic(pipeline: String, topic: String): String =
    cas(pipeline) { sp =>
      if (!sp.topics.contains(topic)) Left(s"topic $topic not whitelisted")
      else Right(sp.copy(
        topics = sp.topics.filterNot(_ == topic),
        topicBlacklist = sp.topicBlacklist + topic))
    }.fold(err, _ => ok(s""","topic":${jsonEscape(topic)}"""))

  /** POST /blacklist — force one (topic, partition) out of the route. */
  def blacklistPartition(pipeline: String, topic: String, partition: Int): String =
    cas(pipeline) { sp =>
      Right(sp.copy(
        partitionBlacklist = sp.partitionBlacklist + ((topic, partition))))
    }.fold(err, _ => ok(s""","topic":${jsonEscape(topic)},"partition":$partition"""))

  /** PUT /ratelimiter?messagerate= — runtime rate change, no restart. */
  def setRateLimit(rowsPerSec: Double): String =
    admission match {
      case None => err("no admission control configured")
      case Some(ac) =>
        ac.set(rowsPerSec)
        ok(s""","rowsPerSec":$rowsPerSec""")
    }

  /** GET /admin/workloadinfo — live query status (V1 view). */
  def status: String = manager.statusJson

  /** GET /topics — the serving topic set per pipeline. */
  def topics: String = manager.specsJson

  // ---- autobalancing toggle (`AdminRestletResource.java:54-88`) ----

  private val autoBalancing = new java.util.concurrent.atomic.AtomicBoolean(true)

  /** Planner loops consult this before acting on o6-style moves. */
  def isAutoBalancingEnabled: Boolean = autoBalancing.get

  /** POST /admin/{opt} — enable/disable, echoing the reference's body. */
  def setAutoBalancing(opt: String): String = opt.toLowerCase match {
    case "enable_autobalancing" =>
      autoBalancing.set(true)
      s"""{"opt":"enable_autobalancing","auto_balancing":true}"""
    case "disable_autobalancing" =>
      autoBalancing.set(false)
      s"""{"opt":"disable_autobalancing","auto_balancing":false}"""
    case other => err(s"no valid autobalancing opt: $other")
  }

  /** GET /admin/autobalancing_status */
  def autoBalancingStatus: String =
    s"""{"auto_balancing":${autoBalancing.get}}"""

  // ---- read-only monitor routes over the A1/A2 operators ----

  private def withFeeds(f: AdminApi.MonitorFeeds => String): String =
    feeds.fold(err("no monitor feeds configured"))(f)

  /** GET /noprogress — stuck partitions with their ideal/actual worker
    * (`NoProgressTopicPartitionRestletResource.java:46-76`: empty result
    * is an empty object, otherwise a `topics` array). */
  def noProgress: String = withFeeds { f =>
    val firstWorker = (view: DataFrame, name: String) =>
      view.groupBy(col("topic"), col("partition"))
        .agg(min(col("instance")).as(name))
    val stuck = Monitoring.noProgressPartitions(f.snapshots())
      .groupBy(col("topic"), col("partition"))
      .agg(max(col("snap_ts")).as("last_stuck"))
      .join(firstWorker(f.ideal(), "ideal_worker"), Seq("topic", "partition"), "left")
      .join(firstWorker(f.external(), "actual_worker"), Seq("topic", "partition"), "left")
      .orderBy("topic", "partition")
      .collect()
    if (stuck.isEmpty) "{}"
    else stuck.map { r =>
      val workers =
        Option(r.getAs[String]("ideal_worker"))
          .map(w => s""","idealWorker":${jsonEscape(w)}""").getOrElse("") +
          Option(r.getAs[String]("actual_worker"))
            .map(w => s""","actualWorker":${jsonEscape(w)}""").getOrElse("")
      s"""{"topic":${jsonEscape(r.getAs[String]("topic"))},""" +
        s""""partition":${r.getAs[Int]("partition")}$workers}"""
    }.mkString("""{"topics":[""", ",", "]}")
  }

  /** GET /offset[/{topic}/{partition}] — per-TP latest/commit/lag from
    * the A1 relation (`TopicParitionOffsetRestletResource.java:30-50`). */
  def offsets(topic: Option[String] = None, partition: Option[Int] = None): String =
    withFeeds { f =>
      var lagDf = Monitoring.partitionLag(f.latest(), f.committed())
      topic.foreach(t => lagDf = lagDf.filter(col("topic") === t))
      partition.foreach(p => lagDf = lagDf.filter(col("partition") === p))
      val rows = lagDf.orderBy("topic", "partition").collect()
      if (rows.isEmpty && topic.isDefined)
        err(s"unknown topic partition ${topic.get}" +
          partition.fold("")(p => s":$p"))
      else rows.map { r =>
        s"""{"topic":${jsonEscape(r.getAs[String]("topic"))},""" +
          s""""partition":${r.getAs[Int]("partition")},""" +
          s""""latestOffset":${r.getAs[Long]("latest_offset")},""" +
          s""""commitOffset":${r.getAs[Long]("commit_offset")},""" +
          s""""lag":${r.getAs[Long]("lag")}}"""
      }.mkString("""{"offsets":[""", ",", "]}")
    }

  /** GET /instances[/{name}] — per-instance serving set with per-topic
    * workload and a TOTALWORKLOAD tail entry, mirroring
    * `MirrorMakerManagerRestletResource.java:40-76`'s shape. */
  def instances(instance: Option[String] = None): String = withFeeds { f =>
    val byTopic = f.workload()
      .groupBy(col("topic")).agg(avg(col("bytes_per_sec")).as("bps"))
    val rows = f.external()
      .select(col("instance"), col("topic"), col("partition"))
      .join(byTopic, Seq("topic"), "left")
      .withColumn("bps", coalesce(col("bps"), lit(0.0)))
      .filter(instance.map(i => col("instance") === i).getOrElse(lit(true)))
      .orderBy("instance", "topic", "partition")
      .collect()
    val perInstance = rows.groupBy(_.getAs[String]("instance")).toSeq.sortBy(_._1)
      .map { case (name, tps) =>
        val entries = tps.map { r =>
          s""""${r.getAs[String]("topic")}.${r.getAs[Int]("partition")}:${
            math.round(r.getAs[Double]("bps"))}""""
        } :+ s""""TOTALWORKLOAD.${tps.length}:${
          math.round(tps.map(_.getAs[Double]("bps")).sum)}""""
        s"""${jsonEscape(name)}:${entries.mkString("[", ",", "]")}"""
      }.mkString("{", ",", "}")
    val all = rows.map(_.getAs[String]("instance")).distinct.sorted
      .map(jsonEscape).mkString("[", ",", "]")
    s"""{"instances":$perInstance,"blacklisted":[],"allInstances":$all}"""
  }

  // ---- consumer-group governance over the topic-log (K3 surface) ----

  private def withGroups(f: String => String): String =
    groupRoot.fold(err("no group root configured"))(f)

  /** GET /groups — registered consumer groups with last-commit epoch,
    * idle age and pinned-topic count, plus the expiry loop's lifetime
    * counter — the group-offset admin view of the reference's
    * `AdminRestletResource` state dumps, over
    * [[graft.sources.FileTopicLog.groups]]. */
  def groupsJson: String = withGroups { root =>
    val now = System.currentTimeMillis()
    val rows = graft.sources.FileTopicLog.groups(root).map { g =>
      val last = graft.sources.FileTopicLog.groupLastCommitMillis(root, g)
      val nTopics = graft.sources.FileTopicLog.groupPositions(root, g).size
      s"""{"group":${jsonEscape(g)},""" +
        s""""lastCommitMs":${last.getOrElse(-1L)},""" +
        s""""ageMs":${last.map(now - _).getOrElse(-1L)},""" +
        s""""nTopics":$nTopics}"""
    }
    s"""{"groups":${rows.mkString("[", ",", "]")},""" +
      s""""expiredTotal":${expiry.map(_.expiredCount).getOrElse(0L)}}"""
  }

  /** DELETE /groups/{g} — release a group's retention pin
    * ([[graft.sources.FileTopicLog.unregisterGroup]]). A data-loss
    * policy action, so leader-gated like validation/backup/expiry: a
    * non-leader refuses instead of double-applying policy. */
  def deleteGroup(group: String): String = withGroups { root =>
    if (!isLeader()) err("not leader")
    else if (!graft.sources.FileTopicLog.groups(root).contains(group))
      err(s"unknown group $group")
    else {
      graft.sources.FileTopicLog.unregisterGroup(root, group)
      ok(s""","group":${jsonEscape(group)}""")
    }
  }

  private[streaming] def currentSpec(pipeline: String): Option[PipelineSpec] =
    manager.spec(pipeline)
}

object AdminApi {
  /** Live views backing the read-only monitor routes; every thunk
    * returns bounded cluster metadata (instances × topics × partitions),
    * never data-plane rows.
    *
    *  - `snapshots`: (topic, partition, snap_ts, commit_offset,
    *    latest_offset) — the A2 feed
    *  - `latest` / `committed`: the A1 offset relations
    *  - `ideal` / `external`: (instance, topic, partition, state) views
    *  - `workload`: (topic, partition, bytes_per_sec) — A3/A4 output
    */
  final case class MonitorFeeds(
      snapshots: () => DataFrame,
      latest: () => DataFrame,
      committed: () => DataFrame,
      ideal: () => DataFrame,
      external: () => DataFrame,
      workload: () => DataFrame)
}
