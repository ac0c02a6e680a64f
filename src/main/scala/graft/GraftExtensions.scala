package graft

import graft.functions.KafkaMurmur2Partition
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * Session extensions for the graft engine — the registration point for
 * custom Catalyst surfaces. Install with
 * `SparkSession.builder.withExtensions(new GraftExtensions)` or
 * `spark.sql.extensions=graft.GraftExtensions`.
 *
 * Currently injects `kafka_partition(key BINARY, n INT)` — the
 * murmur2-exact Kafka default-partitioner hash (see
 * [[graft.functions.Murmur2]]); everything else the engine needs is
 * expressible with stock Catalyst (SURVEY §4).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("kafka_partition"),
      new ExpressionInfo(classOf[KafkaMurmur2Partition].getName, "kafka_partition"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2,
          "kafka_partition(key, numPartitions) takes exactly 2 arguments")
        KafkaMurmur2Partition(children.head, children(1))
      }))
  }
}
