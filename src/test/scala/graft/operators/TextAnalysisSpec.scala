package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavior of the text-analysis library surface beyond what the
  * x1/x2/x3/x4/x5/x6/x16/x17 oracle entries pin (those gate the
  * DEFAULT parameterizations end-to-end against DuckDB): parameter
  * generality, order sensitivity of the fingerprints, threshold
  * monotonicity of the repetition filter, and the KL zero/positive
  * contract of the divergence. */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions._

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("langProfile counts arbitrary marker sets and honors the threshold") {
    val d = docsOf(
      1L -> "der hund und der ball und der park",
      2L -> "the cat sat on the mat")
    val out = TextAnalysis
      .langProfile(d, markers = Seq("der", "und"), threshold = 0.4,
        label = "de-like")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_der"), r.getAs[Long]("n_und"),
          r.getAs[String]("predicted"))).toMap
    assert(out(1L) == ((3L, 2L, "de-like")), s"got $out")
    assert(out(2L) == ((0L, 0L, "other")), s"got $out")
  }

  test("qualityScore labels follow the configured thresholds") {
    val short = "one two three"
    val repetitive = ("spam " * 30).trim // 30 tokens, 1 distinct
    val ok = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = docsOf(1L -> short, 2L -> repetitive, 3L -> ok)
    val lab = TextAnalysis.qualityScore(d)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("quality")).toMap
    assert(lab == Map(1L -> "too_short", 2L -> "repetitive", 3L -> "ok"))
    // raising minTokens reclassifies the ok doc as too_short
    val strict = TextAnalysis.qualityScore(d, minTokens = 50)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("quality")).toMap
    assert(strict(3L) == "too_short")
  }

  test("fingerprints are order-sensitive in the doc, stable across partitioning") {
    val d = docsOf(1L -> "alpha beta gamma", 2L -> "gamma beta alpha")
    for (fp <- Seq(
        TextAnalysis.positionalFingerprint(d),
        TextAnalysis.rollingFingerprint(d))) {
      val v = fp.collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fingerprint")).toMap
      assert(v(1L) != v(2L), "same bag of tokens, different order must differ")
    }
    // partitioning must not change the XOR-folded fingerprint
    val one = TextAnalysis.rollingFingerprint(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fingerprint")).toMap
    val many = TextAnalysis.rollingFingerprint(d.repartition(7)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fingerprint")).toMap
    assert(one == many)
  }

  test("repetitionFilter thresholds are monotone: tightening only drops docs") {
    val d = docsOf(
      1L -> "a b c d e f g h i j k l m n o p",
      2L -> ("x y z " * 10).trim,
      3L -> ("dup dup dup " * 5).trim)
    def kept(dup3: Double, top: Double): Set[Long] =
      TextAnalysis.repetitionFilter(d, dup3, top)
        .filter(col("keep_doc") === 1L)
        .collect().map(_.getAs[Long]("doc_id")).toSet
    val loose = kept(0.9, 0.9)
    val default = kept(0.3, 0.2)
    val tight = kept(0.0, 0.05)
    assert(default.subsetOf(loose) && tight.subsetOf(default),
      s"monotonicity violated: $tight ⊄ $default ⊄ $loose")
    assert(loose.contains(1L) && !default.contains(3L),
      "the varied doc passes loose; the dup-trigram doc fails defaults")
  }

  test("sourceDivergence: identical distributions give zero KL, skew is positive") {
    import spark.implicits._
    val d = Seq(
      ("s1", "aa bb cc aa bb cc"),
      ("s2", "aa bb cc aa bb cc"),      // identical distribution to s1
      ("s3", "aa aa aa aa aa bb"))      // skewed toward aa
      .toDF("source", "text")
    val st = TextAnalysis.unigramCounts(d)
    val kl = TextAnalysis.sourceDivergence(st)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("kl_micro")).toMap
    // s1/s2 match the corpus blend less exactly (s3 shifts q), but they
    // must be EQUAL to each other and strictly below the skewed source.
    assert(kl("s1") == kl("s2"), s"identical sources must agree: $kl")
    assert(kl("s3") > kl("s1"), s"skewed source must diverge more: $kl")
    // a corpus of one source is its own blend: KL exactly 0
    val solo = TextAnalysis.sourceDivergence(
      TextAnalysis.unigramCounts(d.filter(col("source") === "s1")))
      .collect().head.getAs[Long]("kl_micro")
    assert(solo == 0L)
  }

  test("unigramCounts groups by an arbitrary column name") {
    import spark.implicits._
    val d = Seq(("en", "a b a")).toDF("lang", "text")
    val st = TextAnalysis.unigramCounts(d, groupCol = "lang")
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("token"),
        r.getAs[Long]("c_st"))).toSet
    assert(st == Set(("en", "a", 2L), ("en", "b", 1L)))
  }
}
