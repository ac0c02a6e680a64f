package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[BottomKDistinct]]: dedup, cap, ascending order, null skipping, and
  * exact agreement with the sort-based formulation when partials are
  * forced through many partitions (update → serialize → merge path). */
class BottomKSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("k-capped distinct minima, many-partition merge, nulls skipped") {
    val vals: Seq[java.lang.Long] = Seq[java.lang.Long](
      5L, 3L, 3L, 9L, -7L, -7L, 0L, null, 12L, 1L, 1L, -2L, null, 8L)
    val df = vals.zipWithIndex
      .map { case (v, i) => (i % 4, v) }.toDF("g", "v")
      .repartition(8) // force per-partition partials + merges
    val got = df.groupBy("g").agg(expr("bottom_k_distinct(v, 3)").as("ks"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap
    val expected = vals.zipWithIndex
      .collect { case (v, i) if v != null => (i % 4, v.longValue) }
      .groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted.take(3).toList).toMap
    assert(got === expected)
  }

  test("agrees with the window formulation on the fixture") {
    val hs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
      .select(col("source"), explode(expr("word_ngrams(text, 3)")).as("w"))
      .select(col("source"),
        expr("cast(conv(substring(md5(w), 1, 15), 16, 10) as long)").as("h"))
    val viaAgg = hs.groupBy("source")
      .agg(expr("bottom_k_distinct(h, 64)").as("ks"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    val viaSort = hs.distinct().collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).distinct.sorted.take(64).toList).toMap
    assert(viaAgg.nonEmpty && viaAgg === viaSort)
  }
}
