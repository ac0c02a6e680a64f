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

  test("prioritySample favors heavy rows, is layout-independent, honors k") {
    import spark.implicits._
    // two weight classes: heavy rows should dominate the kept set
    val d = (1L to 400L).map(i => (i, if (i <= 200L) 1000L else 1L))
      .toDF("doc_id", "w")
    val kept = Sampling.prioritySample(d, k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(kept.length == 50)
    assert(kept.count(_._2 == 1000L) > 40,
      s"heavy rows dominate, got ${kept.count(_._2 == 1000L)}")
    // deterministic under repartitioning
    val again = Sampling.prioritySample(d.repartition(7), k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(kept.toSeq == again.toSeq)
    // a different salt draws a different sample
    val other = Sampling.prioritySample(d, k = 50, salt = "other")
      .collect().map(_.getLong(0))
    assert(kept.map(_._1).toSeq != other.toSeq)
    // k larger than the relation returns everything
    assert(Sampling.prioritySample(d, k = 1000).count() == 400)
  }

  test("mixtureWeights clamps downsampling at 1 and exposes epochs > 1") {
    import spark.implicits._
    val per = Seq(("big", 10L, 900L), ("small", 2L, 100L))
      .toDF("source", "n_docs", "tokens")
    val out = Sampling.mixtureWeights(per)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("weight"), r.getAs[Double]("epochs"))).toMap
    // equal share = 500 tokens: big downsamples to 500/900, small
    // upsamples 5 epochs but its weight clamps at 1
    assert(out("big") == ((0.5556, 0.5556)))
    assert(out("small") == ((1.0, 5.0)))
    // mass column is parameterizable
    val byDocs = Sampling.mixtureWeights(per, massCol = "n_docs")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("epochs")).toMap
    assert(byDocs("small") == 3.0)
  }
}
