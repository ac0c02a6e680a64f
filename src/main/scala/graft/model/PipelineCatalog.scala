package graft.model

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}

/** Flat, encoder-friendly form of [[PipelineSpec]] (Maps/Sets/tuples
  * become Seqs of named pairs so Spark's JSON encoders handle them). */
final case class PipelineSpecDto(
    name: String,
    srcCluster: String,
    dstCluster: String,
    routeId: Int,
    topics: Seq[String],
    topicMapping: Seq[TopicPair],
    dstPartitionCounts: Seq[TopicCount],
    topicBlacklist: Seq[String],
    partitionBlacklist: Seq[TopicPartitionRef],
    excludeTopicRegex: Option[String],
    offsetRanges: Seq[OffsetRangeDto],
    maxOffsetsPerTrigger: Option[Long],
    checkpointLocation: Option[String])

final case class TopicPair(src: String, dst: String)
final case class TopicCount(topic: String, count: Int)
final case class TopicPartitionRef(topic: String, partition: Int)
final case class OffsetRangeDto(
    topic: String, partition: Int, startingOffset: Long,
    endingOffset: Option[Long])

/**
 * The pipeline configuration catalog (SURVEY §1.4: the reference's
 * Helix IdealState + properties files collapse into "a small
 * JSON/parquet catalog for pipeline/topic-set configuration"). Persists
 * and restores full [[PipelineSpec]]s as JSON through Spark's own
 * encoders — no hand-rolled parsing — giving V2 its RESTORE half
 * (reference `ClusterInfoBackupManager` dumps are re-loadable state,
 * not just audit files).
 */
object PipelineCatalog {

  private implicit val dtoEncoder: Encoder[PipelineSpecDto] =
    Encoders.product[PipelineSpecDto]

  def toDto(sp: PipelineSpec): PipelineSpecDto = PipelineSpecDto(
    sp.name, sp.route.srcCluster, sp.route.dstCluster, sp.route.routeId,
    sp.topics,
    sp.topicMapping.toSeq.sorted.map { case (s, d) => TopicPair(s, d) },
    sp.dstPartitionCounts.toSeq.sorted.map { case (t, c) => TopicCount(t, c) },
    sp.topicBlacklist.toSeq.sorted,
    sp.partitionBlacklist.toSeq.sorted.map { case (t, p) => TopicPartitionRef(t, p) },
    sp.excludeTopicRegex,
    sp.offsetRanges.map(r =>
      OffsetRangeDto(r.topic, r.partition, r.startingOffset, r.endingOffset)),
    sp.maxOffsetsPerTrigger,
    sp.checkpointLocation)

  def fromDto(d: PipelineSpecDto): PipelineSpec = PipelineSpec(
    d.name, Route(d.srcCluster, d.dstCluster, d.routeId),
    d.topics,
    d.topicMapping.map(p => p.src -> p.dst).toMap,
    d.dstPartitionCounts.map(c => c.topic -> c.count).toMap,
    d.topicBlacklist.toSet,
    d.partitionBlacklist.map(r => (r.topic, r.partition)).toSet,
    d.excludeTopicRegex,
    d.offsetRanges.map(r =>
      OffsetRange(r.topic, r.partition, r.startingOffset, r.endingOffset)),
    d.maxOffsetsPerTrigger,
    d.checkpointLocation)

  /** Persist the spec set as a JSON catalog directory. */
  def save(spark: SparkSession, specs: Seq[PipelineSpec], path: String): Unit =
    spark.createDataset(specs.map(toDto))(dtoEncoder)
      .coalesce(1).write.mode("overwrite").json(path)

  /** Restore the spec set (the restart-from-backup path). An explicit
    * schema is used so empty optional fields round-trip. */
  def load(spark: SparkSession, path: String): Seq[PipelineSpec] =
    spark.read.schema(dtoEncoder.schema).json(path)
      .as[PipelineSpecDto](dtoEncoder)
      .collect().toSeq.map(fromDto)
      .sortBy(_.name)
}
