package graft.operators

import graft.SparkTestSession
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

/** The library-surface escaping contract: every caller-supplied token
  * that reaches expression text (markers, stopwords, BM25 terms) goes
  * through [[SqlLit]], so quote-, backslash-, dot-, backtick- and
  * unicode-bearing tokens COUNT instead of breaking the parse — or
  * worse, splicing into the expression (`don't` once truncated the
  * literal at the apostrophe). Truth is computed Scala-side on the
  * same whitespace-token contract. */
object SqlLitProps extends Properties("SqlLit") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private val hostile = Seq(
    "don't", "back\\slash", "\\'", "a.b", "`tick`", "it''s",
    "héllo", "日本", "100%", "quo\"te", "$x", "--", "én'd\\")

  private val tokenGen: Gen[String] =
    Gen.oneOf(Gen.oneOf(hostile), Gen.nonEmptyListOf(
      Gen.oneOf(('a' to 'c') ++ Seq('\'', '\\', '.', '`', 'ü')))
      .map(_.mkString))

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def toks(text: String): Seq[String] =
    text.split(" ", -1).toSeq.filter(_.nonEmpty)

  property("langProfile counts hostile marker tokens exactly") =
    forAll(Gen.listOfN(3, tokenGen)) { ms0 =>
      val markers = ms0.distinct
      val text1 = (markers ++ Seq("pad", "pad") ++ markers).mkString(" ")
      val text2 = "plain words only here"
      val d = docsOf(1L -> text1, 2L -> text2)
      val rows = TextAnalysis.langProfile(d, markers = markers)
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      // marker columns are positional after (doc_id, n_tokens)
      markers.zipWithIndex.forall { case (m, i) =>
        rows(1L).getLong(2 + i) == toks(text1).count(_ == m) &&
          rows(2L).getLong(2 + i) == toks(text2).count(_ == m)
      } :| s"markers=$markers rows=$rows"
    }

  property("qualityScore counts hostile stopwords exactly") =
    forAll(Gen.listOfN(3, tokenGen)) { ws0 =>
      val stops = ws0.distinct
      val text = (stops ++ Seq("x", "y", "z") ++ stops.take(1)).mkString(" ")
      val row = TextAnalysis.qualityScore(docsOf(1L -> text), stopwords = stops)
        .collect()(0)
      val ts = toks(text)
      val expect = BigDecimal(ts.count(stops.contains).toDouble / ts.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (row.getAs[Double]("stopword_ratio") == expect) :|
        s"stops=$stops row=$row expect=$expect"
    }

  property("bm25TopK scores hostile query terms without a parse error") =
    Prop.secure {
      val d = docsOf(
        1L -> "don't stop me don't",
        2L -> "back\\slash city",
        3L -> "plain text here")
      val out = Retrieval.bm25TopK(d,
        queries = Seq((10L, "don't"), (11L, "back\\slash")), k = 2)
        .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("doc_id"))
      out.contains(10L -> 1L) && out.contains(11L -> 2L)
    }

  property("quote round-trips any printable string through the parser") =
    forAll { (s: String) =>
      // control chars can't appear in tokens (whitespace contract), but
      // the literal itself must round-trip for every printable string
      val clean = s.filter(c => c >= ' ')
      spark.sql(s"SELECT ${SqlLit.quote(clean)} AS v")
        .collect()(0).getString(0) == clean
    }
}
