package graft.operators

import graft.SparkTestSession
import graft.model.{PipelineSpec, Route}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** T1–T5 record transforms (reference
  * worker/DefaultMessageTransformer.java:44-57). */
class TransformsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def records = Seq(
    ("k1", "v1", "click", 5, 0L, 1000L),
    ("k2", "v2", "view", 3, 1L, -1L),
    ("k3", "v3", "unknown", 9, 2L, 0L))
    .toDF("k", "v", "topic", "partition", "offset", "raw_ms")
    .select(col("k").cast("binary").as("key"),
      col("v").cast("binary").as("value"),
      col("topic"), col("partition"), col("offset"),
      expr("timestamp_millis(raw_ms)").as("timestamp"), col("raw_ms"))

  test("T1: renameTopics maps known topics, passes through unknown") {
    val out = Transforms.renameTopics(records, Map("click" -> "click2"))
      .select("topic").as[String].collect().sorted
    assert(out.toSeq == Seq("click2", "unknown", "view"))
  }

  test("T1: empty mapping is identity") {
    assert(Transforms.renameTopics(records, Map.empty)
      .select("topic").as[String].collect().sorted.toSeq ==
      Seq("click", "unknown", "view"))
  }

  test("T1: renameTopicsViaJoin matches the literal-map variant") {
    val mapping = Seq(("click", "click2")).toDF("src_topic", "dst_topic")
    val viaJoin = Transforms.renameTopicsViaJoin(records, mapping)
      .select("topic").as[String].collect().sorted
    val viaMap = Transforms.renameTopics(records, Map("click" -> "click2"))
      .select("topic").as[String].collect().sorted
    assert(viaJoin.toSeq == viaMap.toSeq)
  }

  test("T2: remapPartitions pmods known topics, nulls unknown") {
    val out = Transforms.remapPartitions(records, Map("click" -> 4, "view" -> 2))
      .select("topic", "partition").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(out("click") == 1)   // 5 % 4
    assert(out("view") == 1)    // 3 % 2
    assert(out("unknown") == -1) // null → round-robin
  }

  test("T3: non-positive raw timestamps become null") {
    val out = Transforms.normalizeTimestamp(records, col("raw_ms"))
      .select("topic", "timestamp").collect()
      .map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(!out("click")) // 1000 > 0 kept
    assert(out("view"))   // -1 → null
    assert(out("unknown")) // 0 → null
  }

  test("T5: dropNullValues removes nulled payloads") {
    val nulled = records.withColumn("value",
      when(col("topic") === "view", lit(null).cast("binary"))
        .otherwise(col("value")))
    assert(Transforms.dropNullValues(nulled).count() == 2)
  }

  test("T5 observed: drop count surfaces as an observe metric") {
    val nulled = records.withColumn("value",
      when(col("topic") =!= "click", lit(null).cast("binary"))
        .otherwise(col("value")))
    val observed = Transforms.dropNullValuesObserved(nulled, "t5_metrics")
    val rows = observed.collect()
    assert(rows.length == 1)
  }

  test("custom transformer composes with the default chain (UDF surface)") {
    val spec = PipelineSpec(
      name = "p2", route = Route("a", "b", 0), topics = Seq("click"),
      topicMapping = Map("click" -> "click2"),
      dstPartitionCounts = Map("CLICK2" -> 2))
    val upcase: Transforms.MessageTransformer =
      df => df.withColumn("topic", upper(col("topic")))
    val composed = Transforms.chain(
      Transforms.renameTopics(_, spec.topicMapping),
      upcase,
      Transforms.remapPartitionsByKey(_, spec.dstPartitionCounts),
      Transforms.dropNullValues)
    val out = composed(records).filter(col("topic") === "CLICK2").collect()
    assert(out.length == 1)
    assert(!out.head.isNullAt(out.head.fieldIndex("partition")))
  }

  test("default chain: rename → remap → null-filter, streaming-safe exprs") {
    val spec = PipelineSpec(
      name = "p1", route = Route("a", "b", 0), topics = Seq("click"),
      topicMapping = Map("click" -> "click2"),
      dstPartitionCounts = Map("click2" -> 2))
    val out = Transforms.defaultChain(records, spec)
    val clicks = out.filter(col("topic") === "click2").collect()
    assert(clicks.length == 1)
    assert(clicks.head.getAs[Int]("partition") == 1) // 5 % 2
  }
}
