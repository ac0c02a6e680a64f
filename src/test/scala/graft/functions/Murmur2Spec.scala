package graft.functions

import graft.SparkTestSession
import graft.operators.Transforms
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** kafka_partition: the native codegen'd murmur2 partitioner expression
  * and its keyed-remap transform. */
class Murmur2Spec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("codegen path agrees with the JVM implementation for every key") {
    val keys = (0 until 500).map(i => s"key-$i")
    val viaExpr = keys.toDF("k")
      .select(col("k"), expr("kafka_partition(cast(k as binary), 16)").as("p"))
      .as[(String, Int)].collect().toMap
    keys.foreach { k =>
      assert(viaExpr(k) == Murmur2.partition(k.getBytes("UTF-8"), 16))
    }
  }

  test("partitions are in range and all partitions get hit") {
    val ps = (0 until 1000)
      .map(i => Murmur2.partition(s"k$i".getBytes("UTF-8"), 8))
    assert(ps.forall(p => p >= 0 && p < 8))
    assert(ps.distinct.sorted == (0 until 8))
  }

  test("registered SQL function works in plain SQL") {
    val p = spark.sql("SELECT kafka_partition(cast('hello' as binary), 4) AS p")
      .head.getInt(0)
    assert(p == Murmur2.partition("hello".getBytes("UTF-8"), 4))
  }

  test("remapPartitionsByKey: keyed fidelity, null key/unknown topic -> null") {
    val df = Seq(
      ("a", "click", 5), ("b", "click", 6), (null, "click", 7),
      ("c", "mystery", 8))
      .toDF("k", "topic", "partition")
      .withColumn("key", col("k").cast("binary"))
    val out = Transforms.remapPartitionsByKey(df, Map("click" -> 4))
      .select("k", "partition").collect()
      .map(r => Option(r.getString(0)).getOrElse("null") ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(out("a") == Murmur2.partition("a".getBytes("UTF-8"), 4))
    assert(out("b") == Murmur2.partition("b".getBytes("UTF-8"), 4))
    assert(out("null") == -1)  // unkeyed → default partitioner downstream
    assert(out("c") == -1)     // no observed destination count
  }

  test("known boundary inputs (empty and 1..5-byte tails)") {
    // exercises every tail-length branch of the hash
    Seq("", "a", "ab", "abc", "abcd", "abcde").foreach { s =>
      val p = Murmur2.partition(s.getBytes("UTF-8"), 1024)
      assert(p >= 0 && p < 1024)
      assert(p == Murmur2.partition(s.getBytes("UTF-8"), 1024)) // stable
    }
  }
}
