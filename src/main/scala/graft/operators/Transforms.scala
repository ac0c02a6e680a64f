package graft.operators

import graft.model.PipelineSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Record-level transform operators T1–T5 (SURVEY.md §2.1).
 *
 * The reference applies these one record at a time in
 * `worker/DefaultMessageTransformer.java:44-57`; here each is a pure
 * column expression so the whole chain stays inside whole-stage codegen
 * and runs identically in batch and Structured Streaming.
 *
 * Scale: the topic mapping and dst-partition-count maps are small control
 * tables (≤ thousands of topics); they are embedded as literal `MapType`
 * expressions (→ codegen constants, zero shuffle). For very large mappings
 * use [[renameTopicsViaJoin]] which broadcast-joins instead.
 */
object Transforms {

  /** T1 — topic rename: `topic' = mapping.getOrElse(topic, topic)`
    * (reference `worker/DefaultMessageTransformer.java:44-46`). */
  def renameTopics(df: DataFrame, mapping: Map[String, String]): DataFrame =
    if (mapping.isEmpty) df
    else {
      val m = map(mapping.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*)
      df.withColumn("topic", coalesce(element_at(m, col("topic")), col("topic")))
    }

  /** T1 at catalog scale: broadcast-join against a (src_topic, dst_topic)
    * DataFrame instead of a literal map. */
  def renameTopicsViaJoin(df: DataFrame, mapping: DataFrame): DataFrame = {
    // dedupe the mapping key — a duplicate src_topic row would otherwise
    // DUPLICATE every matching record through the join (silent data-plane
    // duplication, far worse than an arbitrary rename choice)
    val m = broadcast(mapping.select(
      col("src_topic"), col("dst_topic")).dropDuplicates("src_topic"))
    df.join(m, df("topic") === m("src_topic"), "left")
      .withColumn("topic", coalesce(col("dst_topic"), col("topic")))
      .drop("src_topic", "dst_topic")
  }

  /** T2 — partition remap: `partition' = pmod(srcPartition, dstCount)` when
    * the destination partition count is known, else null (Kafka round-robin)
    * (reference `worker/DefaultMessageTransformer.java:47-51`; counts from
    * the observer `common/core/TopicPartitionCountObserver.java:96-134`). */
  def remapPartitions(df: DataFrame, dstCounts: Map[String, Int]): DataFrame = {
    if (dstCounts.isEmpty) return df.withColumn("partition", lit(null).cast("int"))
    val m = map(dstCounts.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*)
    df.withColumn("partition",
      when(element_at(m, col("topic")).isNotNull,
        pmod(col("partition"), element_at(m, col("topic"))).cast("int"))
        .otherwise(lit(null).cast("int")))
  }

  /** T2 driven by an observed catalog (B2): broadcast-join against the
    * observer's (topic, num_partitions) relation instead of a literal
    * map — the form that follows partition-count changes on `refresh()`
    * (reference `common/core/TopicPartitionCountObserver.java:96-134`). */
  def remapPartitionsViaCatalog(df: DataFrame, catalog: DataFrame): DataFrame = {
    // dedupe on topic: a duplicated catalog row would duplicate records
    val m = broadcast(catalog.select(
      col("topic").as("cat_topic"), col("num_partitions"))
      .dropDuplicates("cat_topic"))
    df.join(m, df("topic") === m("cat_topic"), "left")
      .withColumn("partition",
        when(col("num_partitions").isNotNull,
          pmod(col("partition"), col("num_partitions")).cast("int"))
          .otherwise(lit(null).cast("int")))
      .drop("cat_topic", "num_partitions")
  }

  /** T2 fidelity mode for KEYED records: partition' = Kafka's default
    * partitioner hash `(murmur2(key) & 0x7fffffff) % dstCount` — the
    * byte-identical routing a plain Kafka producer would pick, via the
    * codegen'd [[graft.functions.KafkaMurmur2Partition]] expression
    * (registered as `kafka_partition` by [[graft.GraftExtensions]]).
    * Null keys and unobserved topics get a null partition (sink
    * round-robin), matching the producer's unkeyed behavior. */
  def remapPartitionsByKey(df: DataFrame, dstCounts: Map[String, Int]): DataFrame = {
    if (dstCounts.isEmpty) return df.withColumn("partition", lit(null).cast("int"))
    // the count map is built from lit() Columns (NOT a hand-quoted SQL
    // string — topic names may contain quotes/backslashes)
    val m = map(dstCounts.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*)
    df.withColumn("dst_n", element_at(m, col("topic")))
      .withColumn("partition",
        when(col("key").isNotNull && col("dst_n").isNotNull,
          expr("kafka_partition(key, dst_n)"))
          .otherwise(lit(null).cast("int")))
      .drop("dst_n")
  }

  /** T3 — timestamp normalize: non-positive source timestamps become null
    * (reference `worker/DefaultMessageTransformer.java:52`). `rawMillis`
    * is the pre-conversion epoch-millis column when available. */
  def normalizeTimestamp(df: DataFrame, rawMillis: Column): DataFrame =
    df.withColumn("timestamp",
      when(rawMillis <= 0L, lit(null).cast("timestamp"))
        .otherwise(col("timestamp")))

  /** T4 — header passthrough is structural (headers column carried
    * verbatim); exposed for completeness / API symmetry. */
  def passthroughHeaders(df: DataFrame): DataFrame = df

  /** T5 — drop-on-null filter: records whose value was nulled by a
    * transform are dropped (and countable via `observe`) — reference
    * `worker/ProducerThread.java:152-155`. */
  def dropNullValues(df: DataFrame): DataFrame =
    df.filter(col("value").isNotNull)

  /** T5 with an `observe` metric so the dropped count surfaces in
    * QueryProgress without a second pass. */
  def dropNullValuesObserved(df: DataFrame, metricName: String): DataFrame =
    df.observe(metricName, sum(when(col("value").isNull, 1L).otherwise(0L))
        .as("numDroppedMessages"))
      .filter(col("value").isNotNull)

  /** The engine's record-transformer plug point (reference
    * `worker/interfaces/IMessageTransformer.java`, override hook
    * `worker/WorkerInstance.java:141-143`): a transformer is any pure
    * `DataFrame => DataFrame`, so custom logic composes with the built-in
    * chain and runs identically on batch and streaming frames. */
  type MessageTransformer = DataFrame => DataFrame

  /** Compose transformers in order (reference applies exactly one
    * `process` per record; here the chain fuses into one projection). */
  def chain(transformers: MessageTransformer*): MessageTransformer =
    df => transformers.foldLeft(df)((d, t) => t(d))

  /** The built-in chain for a spec, as a pluggable transformer value. */
  def defaultTransformer(spec: PipelineSpec): MessageTransformer =
    defaultChain(_, spec)

  /** The full default transformer chain, mirroring
    * `DefaultMessageTransformer.process` order: rename → remap → (T3 is
    * applied by sources that know raw millis) → null-filter. With no
    * observed destination partition counts the partition becomes null so
    * the sink falls back to the default partitioner — the reference sets
    * partition=null in exactly that case
    * (`worker/DefaultMessageTransformer.java:47-51`); passing the source
    * partition through could target a nonexistent destination partition. */
  def defaultChain(df: DataFrame, spec: PipelineSpec): DataFrame = {
    val renamed = renameTopics(df, spec.topicMapping)
    dropNullValues(remapPartitions(renamed, spec.dstPartitionCounts))
  }
}
