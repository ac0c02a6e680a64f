package graft.operators

import java.security.MessageDigest

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property coverage of the DSIR wing on RANDOM corpora (DsirSpec's
  * seeded fuzz, widened to forAll): kernel scoring equals the
  * plain-Scala fold exactly (same JVM — no epsilon), the Gumbel top-k
  * is the reference weighted sample, the sampled fit equals the plain
  * fit over the same digest gate, and the whole chain is
  * permutation-invariant in the input order (hash-of-content, never
  * row-number). Tiny bucket domains force constant collisions; token
  * pools include multi-byte and empty-ish shapes. */
object DsirProps extends Properties("Dsir") {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // each case runs real Spark jobs (the sampled-fit property two
  // aggregation+collects) — trimmed like the sibling Spark-backed
  // suites (RetrievalProps 12, SqlLitProps 20)
  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private def refBuckets(text: String, b: Int): Seq[Long] = {
    val ts = text.split(' ').filter(_.nonEmpty)
    if (ts.length < 2) Seq.empty
    else ts.sliding(2).map(p => h60(p(0) + " " + p(1)) % b).toSeq
  }

  private def refLr(target: Seq[String], raw: Seq[String],
      b: Int): Array[Double] = {
    def fit(c: Seq[String]) = {
      val bs = c.flatMap(refBuckets(_, b))
      (bs.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong },
        bs.size.toLong)
    }
    val (tc, tt) = fit(target)
    val (rc, rt) = fit(raw)
    Array.tabulate(b) { i =>
      math.log((tc.getOrElse(i.toLong, 0L) + 1.0) / (tt + b)) -
        math.log((rc.getOrElse(i.toLong, 0L) + 1.0) / (rt + b))
    }
  }

  private val word = Gen.oneOf("a", "bb", "ccc", "the", "über", "快", "x1")
  private val docGen: Gen[String] =
    Gen.chooseNum(0, 18).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 30)
    texts <- Gen.listOfN(n, docGen)
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
  private val bucketsGen = Gen.oneOf(3, 16, 64)

  property("kernel scoring == plain-Scala fold, bit-exact") =
    forAll(corpusGen, corpusGen, bucketsGen) { (t, r, b) =>
      val lr = refLr(t.map(_._2), r.map(_._2), b)
      val got = Dsir.importanceWeights(r.toDF("doc_id", "text"), lr)
        .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2)))
        .toMap
      r.forall { case (id, text) =>
        val bs = refBuckets(text, b)
        got(id) == ((bs.size.toLong, bs.foldLeft(0.0)((a, k) => a + lr(k.toInt))))
      }
    }

  property("gumbel top-k == reference weighted sample, any k") =
    forAll(corpusGen, Gen.chooseNum(1, 40)) { (c, k) =>
      val scored = c.map { case (id, t) => (id, t.length / 7.0 - 1.0) }
      def key(id: Long, w: Double) = {
        val u = (h60(s"dsir:$id") % 4294967296L + 0.5) / 4294967296.0
        w - math.log(-math.log(u))
      }
      val want = scored.map { case (id, w) => (id, key(id, w)) }
        .sortBy { case (id, g) => (-g, id) }.take(k).map(_._1)
      val got = Dsir.gumbelResample(scored.toDF("doc_id", "logw"), k = k)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
      got == want
    }

  property("sampled fit == plain fit over the same digest gate") =
    forAll(corpusGen, corpusGen, Gen.oneOf(2, 3, 5)) { (t, r, mod) =>
      val got = Dsir.importanceLogRatios(t.toDF("doc_id", "text"),
        r.toDF("doc_id", "text"), 16, rawSampleMod = mod)
      val rFit = r.filter { case (id, _) => h60(s"dsirfit:$id") % mod == 0 }
      val want = refLr(t.map(_._2), rFit.map(_._2), 16)
      got.sameElements(want)
    }

  property("scores are input-order invariant (hash-of-content)") =
    forAll(corpusGen, corpusGen) { (t, r) =>
      val lr = refLr(t.map(_._2), r.map(_._2), 16)
      def run(rows: Seq[(Long, String)]) =
        Dsir.importanceWeights(rows.toDF("doc_id", "text"), lr)
          .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
          .sortBy(_._1).toSeq
      run(r) == run(r.reverse)
    }
}
