package graft.streaming

import graft.model.PipelineSpec
import graft.streaming.PipelineManager.jsonEscape

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
 */
final class AdminApi(
    manager: PipelineManager,
    admission: Option[AdmissionControl] = None) {

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

  private[streaming] def currentSpec(pipeline: String): Option[PipelineSpec] =
    manager.spec(pipeline)
}
