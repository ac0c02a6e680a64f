package graft.operators

import graft.SparkTestSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property: the postings-index probe form equals the scan form at ANY
  * bucket count — the two physical strategies of one relational
  * contract. Bm25Props pins the scan form against a plain-Scala BM25
  * model (op-for-op arithmetic); this property closes the triangle:
  * model ≡ scan (Bm25Props) ∧ scan ≡ probe (here, swept over nBuckets
  * including degenerate 1 and non-power-of-two counts) ⇒ the indexed
  * path inherits the model pin at every geometry. */
object RetrievalProps extends Properties("Retrieval") {
  private lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions._

  // fewer, heavier iterations: each one runs a full index build + probe
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val queryTerms: Seq[(Long, String)] = Seq(
    1L -> "spark", 1L -> "stream", 1L -> "join",
    2L -> "fast", 2L -> "query",
    3L -> "hash", 3L -> "table", 3L -> "scan",
    4L -> "slow", 4L -> "window", 4L -> "merge")
  private val qVocab = queryTerms.map(_._2).distinct
  private val noise = Seq("alpha", "beta", "gamma", "delta")

  private val docGen: Gen[String] = for {
    n <- Gen.frequency(1 -> Gen.const(0), 9 -> Gen.choose(1, 25))
    ws <- Gen.listOfN(n,
      Gen.frequency(3 -> Gen.oneOf(qVocab), 1 -> Gen.oneOf(noise)))
  } yield ws.mkString(" ")

  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, 30)
    texts <- Gen.listOfN(n, docGen)
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  // degenerate single-bucket, primes, the old fixed 64, and a
  // larger-than-vocabulary count (most buckets empty)
  private val bucketsGen: Gen[Long] = Gen.oneOf(1L, 2L, 7L, 33L, 64L, 257L)

  property("probeIndex == bm25TopK at any nBuckets") =
    forAll(corpusGen, bucketsGen) { (corpus, nb) =>
      import spark.implicits._
      val cdf = corpus.toDF("doc_id", "text")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val scan = Retrieval.bm25TopK(cdf, queryTerms, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      val idx = java.nio.file.Files
        .createTempDirectory("graft_retr_idx_").toString
      val used = Retrieval.buildPostingsIndex(cdf, idx, "prop-fp", Some(nb))
      val probe = Retrieval.probeIndex(spark, idx, queryTerms, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      used == nb && probe == scan
    }
}
