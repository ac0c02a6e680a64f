package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions._

  private def corpus(n: Int, strata: Seq[String]) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, strata(i % strata.size)))
      .toDF("doc_id", "lang")
  }

  test("samples are reproducible and incremental-safe (hash-of-id, not rand)") {
    val thrOf = (t: org.apache.spark.sql.Column,
      c: org.apache.spark.sql.Column) => floor(lit(1000000.0) * t / c)
    val small = corpus(300, Seq("en", "en", "de")) // en 2x over-represented
    val keptSmall = Sampling
      .sampleByStratum(small, "lang", "doc_id", "s", thrOf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptSmall ==
      Sampling.sampleByStratum(small.repartition(7), "lang", "doc_id", "s", thrOf)
        .select("doc_id").collect().map(_.getLong(0)).toSet,
      "partitioning must not change the sample")
    // growing the corpus WITHOUT changing stratum ratios keeps every
    // previously-kept id kept (thresholds unchanged, gate is per-id)
    val big = corpus(600, Seq("en", "en", "de"))
    val keptBig = Sampling.sampleByStratum(big, "lang", "doc_id", "s", thrOf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptSmall.subsetOf(keptBig),
      "same-ratio growth must never evict a previously sampled id")
  }

  test("stratum thresholds balance toward the smallest stratum") {
    val thrOf = (t: org.apache.spark.sql.Column,
      c: org.apache.spark.sql.Column) => floor(lit(1000000.0) * t / c)
    val thr = Sampling
      .stratumThresholds(corpus(300, Seq("en", "en", "de")), "lang", thrOf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(thr("de") == 1000000L, "the smallest stratum keeps everything")
    assert(thr("en") == 500000L, "a 2x stratum keeps half")
  }

  test("splitLabel is stable per id and validates percentages") {
    import spark.implicits._
    val d = (0L until 1000L).toDF("id")
      .select(col("id"), Sampling.splitLabel(col("id")).as("split"))
    val byLabel = d.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 90/5/5 in expectation; the md5 gate is uniform enough at n=1000
    assert(byLabel("train") > 800 && byLabel("val") > 20 && byLabel("test") > 20,
      s"unexpected split distribution: $byLabel")
    // re-evaluation yields identical labels (pure function of id)
    assert(d.except(
      (0L until 1000L).toDF("id")
        .select(col("id"), Sampling.splitLabel(col("id")).as("split"))).isEmpty)
    intercept[IllegalArgumentException] {
      Sampling.splitLabel(col("id"), trainPct = 98, valPct = 5)
    }
  }
}
