package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew salting: identical results to the unsalted plan while the hot
  * key's rows spread across salt buckets. */
class SaltingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // 90% of rows share one key — the skew shape that floods a partition
  private def skewed = (0 until 2000).map { i =>
    val k = if (i % 10 == 0) s"cold-${i % 97}" else "hot"
    (k, i.toLong, i % 7)
  }.toDF("key", "id", "v")

  test("saltedAgg(sum,count,min,max) matches the unsalted aggregation") {
    import Salting.SaltedAgg
    val salted = Salting.saltedAgg(skewed, Seq("key"), col("id"), 8)(
      SaltedAgg("total", sum("v"), c => sum(c)),
      SaltedAgg("n", count(lit(1)), c => sum(c)),
      SaltedAgg("mn", min("v"), c => min(c)),
      SaltedAgg("mx", max("v"), c => max(c)))
    val plain = skewed.groupBy("key")
      .agg(sum("v").as("total"), count(lit(1)).as("n"),
        min("v").as("mn"), max("v").as("mx"))
    val a = salted.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4))).toSet
    val b = plain.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4))).toSet
    assert(a == b)
  }

  test("the hot key spreads across multiple salt buckets") {
    val spread = skewed
      .withColumn("_salt", pmod(hash(col("id")), lit(8)))
      .filter(col("key") === "hot")
      .select("_salt").distinct().count()
    assert(spread == 8)
  }

  test("saltedJoin matches the plain join exactly") {
    val dim = (0 until 97).map(i => (s"cold-$i", s"c$i")).toDF("key", "label")
      .unionAll(Seq(("hot", "H")).toDF("key", "label"))
    val plain = skewed.join(dim, "key")
      .select("key", "id", "label").as[(String, Long, String)].collect().toSet
    val salted = Salting.saltedJoin(skewed, dim, "key", 8, col("id"))
      .select("key", "id", "label").as[(String, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == "hot") == 1800)
  }
}
