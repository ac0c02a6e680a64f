package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The index lifecycle around [[Retrieval]]: corpus-scaled bucket
  * counts, fingerprint-guarded reuse (a regenerated fixture must force
  * a rebuild, never silently serve stale top-k), and crash-safe
  * commit (no marker ⇒ rebuild). */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions._

  private def corpus(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("adaptiveBuckets scales with corpus size, floored at 16") {
    assert(Retrieval.adaptiveBuckets(0) == 16L)
    assert(Retrieval.adaptiveBuckets(500) == 16L)
    assert(Retrieval.adaptiveBuckets(50000) == 25L)
    assert(Retrieval.adaptiveBuckets(500000) == 250L)
    // monotone: more docs never means fewer buckets
    val pts = Seq(1L, 1000L, 10000L, 100000L, 1000000L)
      .map(Retrieval.adaptiveBuckets(_))
    assert(pts == pts.sorted)
    // bucket "file size" (docs per bucket) stays bounded by the target
    for (n <- Seq(10000L, 123456L, 9999999L))
      assert(n / Retrieval.adaptiveBuckets(n) <= 2000L)
  }

  test("ensureIndex reuses a matching fingerprint, rebuilds a stale one") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_retr_life_").toString
    val c1 = corpus(Seq("spark join", "fast query", "hash scan"))
    val nb1 = Retrieval.ensureIndex(c1, idx, "fp-v1")
    // sentinel survives a reuse (no rebuild), dies with a rebuild
    // (mode=overwrite replaces the postings dir)
    val sentinel = java.nio.file.Paths.get(idx, "postings", "_sentinel")
    java.nio.file.Files.write(sentinel, Array.empty[Byte])
    assert(Retrieval.ensureIndex(c1, idx, "fp-v1") == nb1)
    assert(java.nio.file.Files.exists(sentinel), "matching fp must reuse")
    // "regenerated fixture": same dir, new fingerprint — must rebuild
    // from the NEW corpus, and the probe must reflect it
    val c2 = corpus(Seq("window merge", "slow window"))
    Retrieval.ensureIndex(c2, idx, "fp-v2")
    assert(!java.nio.file.Files.exists(sentinel), "stale fp must rebuild")
    val got = Retrieval
      .probeIndex(spark, idx, Seq(4L -> "window"), 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq((4L, 0L), (4L, 1L)),
      s"probe after rebuild must score the NEW corpus: $got")
  }

  test("a half-written index (no marker) is rebuilt; probe without any index fails loudly") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_retr_crash_").toString
    // simulate a crash mid-build: postings exist, marker never written
    corpus(Seq("spark")).select(col("doc_id"), col("doc_id").as("dl"),
        lit("spark").as("token"), lit(1L).as("tf"), lit(0L).as("bucket"))
      .write.partitionBy("bucket").parquet(s"$idx/postings")
    intercept[IllegalStateException] {
      Retrieval.probeIndex(spark, idx, Seq(1L -> "spark"), 5)
    }
    Retrieval.ensureIndex(corpus(Seq("spark stream")), idx, "fp")
    val got = Retrieval.probeIndex(spark, idx, Seq(1L -> "spark"), 5)
      .count()
    assert(got == 1L)
  }

  test("an all-empty-document corpus builds a zero-posting index that probes cleanly") {
    // zero postings rows means the bucket-partitioned write produces no
    // part files — reads are schema-pinned so this degenerate corpus
    // still builds, and a probe returns an empty top-k, not an
    // inference error
    val idx = java.nio.file.Files
      .createTempDirectory("graft_retr_empty_").toString
    Retrieval.buildPostingsIndex(corpus(Seq("", "")), idx, "fp-empty")
    assert(Retrieval.probeIndex(spark, idx, Seq(1L -> "spark"), 5)
      .count() == 0L)
    val st = spark.read.parquet(s"$idx/stats").collect()(0)
    assert((st.getLong(0), st.getLong(1)) == (2L, 0L),
      "stats must record n=2 docs, sum dl=0")
  }

  test("pathFingerprint tracks file content changes and is order-stable") {
    val d = java.nio.file.Files.createTempDirectory("graft_retr_fp_")
    java.nio.file.Files.write(d.resolve("a.parquet"), "aaaa".getBytes)
    java.nio.file.Files.write(d.resolve("b.parquet"), "bb".getBytes)
    val fp1 = Retrieval.pathFingerprint(d.toString)
    assert(fp1 == Retrieval.pathFingerprint(d.toString), "deterministic")
    // a rewrite that changes size must change the fingerprint
    java.nio.file.Files.write(d.resolve("a.parquet"), "aaaaaaaa".getBytes)
    assert(Retrieval.pathFingerprint(d.toString) != fp1)
    assert(Retrieval.pathFingerprint(d.toString + "/nope") == "absent")
  }
}
