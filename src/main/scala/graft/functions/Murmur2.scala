package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/**
 * MurmurHash2 (32-bit) as Kafka's default partitioner uses it:
 * `toPositive(murmur2(keyBytes)) % numPartitions`. The algorithm is the
 * public MurmurHash2 with Kafka's seed 0x9747b28c — having it native
 * gives byte-identical partition routing for keyed records, so a record
 * produced by this engine lands on the same destination partition a
 * plain Kafka producer would pick.
 *
 * Kept as a plain JVM function so the generated Java from
 * [[KafkaMurmur2Partition.doGenCode]] can call it via the static
 * forwarder (`graft.functions.Murmur2.hash`).
 */
object Murmur2 {

  def hash(data: Array[Byte]): Int = {
    val length = data.length
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ length
    val length4 = length / 4
    var i = 0
    while (i < length4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) + ((data(i4 + 1) & 0xff) << 8) +
        ((data(i4 + 2) & 0xff) << 16) + ((data(i4 + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 1
    }
    val tail = length & ~3
    if ((length % 4) >= 3) h ^= (data(tail + 2) & 0xff) << 16
    if ((length % 4) >= 2) h ^= (data(tail + 1) & 0xff) << 8
    if ((length % 4) >= 1) { h ^= data(tail) & 0xff; h *= m }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  /** Kafka partition for a key: `(murmur2(key) & 0x7fffffff) % n`. */
  def partition(key: Array[Byte], numPartitions: Int): Int =
    (hash(key) & 0x7fffffff) % numPartitions
}

/**
 * Native Catalyst expression `kafka_partition(key, numPartitions)` with
 * whole-stage codegen (`doGenCode` emits a direct static call — no UDF
 * boxing, stays inside the generated loop). Registered as a SQL function
 * by [[graft.GraftExtensions]].
 */
case class KafkaMurmur2Partition(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "kafka_partition"

  override protected def nullSafeEval(key: Any, n: Any): Any =
    Murmur2.partition(key.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, n) =>
      s"graft.functions.Murmur2.partition($k, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KafkaMurmur2Partition =
    copy(left = newLeft, right = newRight)
}
