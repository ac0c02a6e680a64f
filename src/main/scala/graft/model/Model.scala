package graft.model

/**
 * Core control-plane model for the graft replication/analytics engine.
 *
 * Re-expresses the reference's catalog entities (see SURVEY.md §1.3) as
 * plain case classes instead of the overloaded string-encoded forms the
 * reference uses:
 *  - reference `TopicPartition` overloads topic/partition to also encode
 *    routes ("@src@dst", routeId) — uReplicator-Common
 *    `common/core/TopicPartition.java:26-45`. We split that into
 *    [[TopicMeta]] and [[Route]].
 *  - reference `PartitionOffsetInfo` (uReplicator-Worker
 *    `worker/PartitionOffsetInfo.java:21-36`) → [[OffsetRange]].
 *  - reference `TopicWorkload` (`common/core/TopicWorkload.java:22-61`)
 *    → [[TopicWorkload]].
 *
 * All entities are small, driver-side values; the per-record data plane is
 * an untyped DataFrame with the Kafka-source schema (see
 * [[graft.sources.Records]]).
 */
final case class TopicMeta(topic: String, numPartitions: Int)

/** A replication route: src cluster → dst cluster, with a numeric id. */
final case class Route(srcCluster: String, dstCluster: String, routeId: Int) {
  /** String form only at the API edge (reference `worker/WorkerUtils.java:67-78`). */
  def render: String = s"@$srcCluster@$dstCluster@$routeId"
}

object Route {
  /** Parse "@src@dst@id". */
  def parse(s: String): Route = s.split("@").filter(_.nonEmpty) match {
    case Array(src, dst, id) => Route(src, dst, id.toInt)
    case other => throw new IllegalArgumentException(s"bad route: $s (${other.mkString(",")})")
  }
}

/** Bounded-consumption range for one (topic, partition).
  * `endingOffset = None` means unbounded (streaming). Reference:
  * `worker/PartitionOffsetInfo.java:29-78`. */
final case class OffsetRange(
    topic: String,
    partition: Int,
    startingOffset: Long,
    endingOffset: Option[Long]) {
  def bounded: Boolean = endingOffset.isDefined
  def contains(offset: Long): Boolean =
    offset >= startingOffset && endingOffset.forall(offset < _)
}

/** Per-topic observed workload (reference `common/core/TopicWorkload.java`). */
final case class TopicWorkload(
    topic: String,
    bytesPerSecond: Double,
    msgsPerSecond: Double,
    partitions: Int) {
  def bytesPerSecondPerPartition: Double =
    if (partitions <= 0) bytesPerSecond else bytesPerSecond / partitions
}

/** Per-(topic,partition) lag snapshot (reference
  * `common/modules/TopicPartitionLag.java:23-39`). */
final case class PartitionLag(
    topic: String,
    partition: Int,
    latestOffset: Long,
    commitOffset: Long,
    tsMillis: Long) {
  def lag: Long = math.max(0L, latestOffset - commitOffset)
}

/**
 * Full specification of one replication pipeline ("route" in the
 * reference). One PipelineSpec = one Structured Streaming query.
 *
 * Collapses the reference's Helix IdealState + properties files
 * (`worker/WorkerInstance.java:385-397`, `config/topicmapping.properties`)
 * into a single immutable config value.
 */
final case class PipelineSpec(
    name: String,
    route: Route,
    topics: Seq[String],
    topicMapping: Map[String, String] = Map.empty,
    dstPartitionCounts: Map[String, Int] = Map.empty,
    topicBlacklist: Set[String] = Set.empty,
    partitionBlacklist: Set[(String, Int)] = Set.empty,
    excludeTopicRegex: Option[String] = Some("^__.*"),
    offsetRanges: Seq[OffsetRange] = Nil,
    maxOffsetsPerTrigger: Option[Long] = None,
    checkpointLocation: Option[String] = None)

object PipelineSpec {

  /** Load a `src=dst` per-line topic mapping (reference
    * `worker/WorkerInstance.java:385-397` loads the same shape from a
    * properties file; whitespace- and `=`-separated both accepted). */
  def parseTopicMapping(lines: Iterator[String]): Map[String, String] =
    lines
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        l.split("[=\\s]+", 2) match {
          case Array(src, dst) => Some(src.trim -> dst.trim)
          case _               => None
        }
      }
      .toMap

  def loadTopicMapping(path: String): Map[String, String] = {
    val src = scala.io.Source.fromFile(path)
    try parseTopicMapping(src.getLines()) finally src.close()
  }
}

/** Worker/instance workload summary used by the placement planner
  * (reference `common/modules/WorkerWorkloadInfo.java`). */
final case class InstanceWorkload(
    instance: String,
    bytesPerSecond: Double,
    numPartitions: Int)

/** One partition assignment row: which instance serves which
  * (topic, partition), in which lifecycle state. */
final case class Assignment(
    instance: String,
    topic: String,
    partition: Int,
    state: String)
