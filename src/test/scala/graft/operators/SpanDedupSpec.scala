package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Pins the d17 exact-substring dedup ACTION pass against a
  * plain-Scala reference implementation (the BpeSpec pattern): the
  * census-with-first build, the keep-first cut rule, and the overlap
  * semantics (a token is removed iff ANY flagged non-keeper window
  * covers it; keeper windows save only themselves) on hand examples
  * and on seeded random corpora dense with duplicated material. */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** The engine's deterministic sampling gate, replicated: 60-bit
    * md5 prefix of the span text, kept iff ≡ 0 (mod `mod`). */
  private def md5Gate(span: String, mod: Long): Boolean = {
    if (mod <= 1L) return true
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(span.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % mod == 0
  }

  /** Reference: spans identified by their TEXT (md5 is injective here);
    * first occurrence = min (doc_id, pos); cut = all other occurrences
    * of spans with ≥ minCount total occurrences; token removed iff
    * covered by a cut window. `mod > 1` applies the engine's digest
    * sampling gate to span coverage (counts/firsts over sampled spans
    * only — the d17c semantics). */
  private def reference(rows: Seq[(Long, String)], n: Int,
      minCount: Int, mod: Long = 1L): Seq[(Long, Long, Long, String)] = {
    def toks(t: String) = t.split(" ", -1).filter(_.nonEmpty).toSeq
    val occ = for {
      (id, t) <- rows
      ts = toks(t)
      i <- 0 to ts.length - n
      if ts.length >= n
      span = ts.slice(i, i + n).mkString(" ")
      if md5Gate(span, mod)
    } yield (id, i, span)
    val bySpan = occ.groupBy(_._3)
    val flagged = bySpan.filter(_._2.size >= minCount)
    val firsts = flagged.map { case (s, os) =>
      s -> os.map(o => (o._1, o._2)).min
    }
    val cut = flagged.toSeq.flatMap { case (s, os) =>
      os.filterNot(o => (o._1, o._2) == firsts(s))
    }
    val covered: Map[Long, Set[Int]] = cut.groupBy(_._1).map {
      case (id, os) => id -> os.flatMap(o => o._2 until o._2 + n).toSet
    }
    rows.map { case (id, t) =>
      val ts = toks(t)
      val cov = covered.getOrElse(id, Set.empty[Int])
      val kept = ts.zipWithIndex.collect { case (tok, i) if !cov(i) => tok }
      (id, ts.length.toLong, kept.length.toLong, kept.mkString(" "))
    }.sortBy(_._1)
  }

  /** `maxLiteralFlagged = Long.MaxValue` forces LITERAL mode (the
    * default at spec scale anyway); `0` forces BLOOM mode. */
  private def run(rows: Seq[(Long, String)], n: Int,
      minCount: Int = 2,
      maxLiteralFlagged: Long = Long.MaxValue,
      sampleMod: Long = 1L,
      maxBloomKeys: Long = Long.MaxValue): Seq[(Long, Long, Long, String)] = {
    val d = df(rows)
    val census = Dedup.spanCensusWithFirst(d, n, minCount = minCount.toLong,
      sampleMod = sampleMod)
    Dedup.spanDedupCorpus(d, census, n,
        maxLiteralFlagged = maxLiteralFlagged, maxBloomKeys = maxBloomKeys)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
  }

  test("keep-first: an exact duplicate doc is fully cut, the first kept") {
    val out = run(Seq(1L -> "a b c d", 2L -> "a b c d"), n = 3)
    assert(out == Seq((1L, 4L, 4L, "a b c d"), (2L, 4L, 0L, "")))
  }

  test("within-doc repeats cut all but the first occurrence") {
    val out = run(Seq(3L -> "x y z q x y z"), n = 3)
    assert(out == Seq((3L, 7L, 4L, "x y z q")))
  }

  test("a keeper window loses tokens overlapped by a different cut span") {
    // Flagged spans: "b c d" (first at doc 1 pos 1) and "c d e"
    // (first at doc 2 pos 1). In doc 2 the keeper "c d e" covers
    // tokens 1..3, but the CUT occurrence of "b c d" at pos 0 covers
    // tokens 0..2 — so keeper tokens 1 and 2 are removed anyway and
    // only token 3 ("e") survives. Doc 3's occurrences are all cut.
    val rows = Seq(1L -> "a b c d", 2L -> "b c d e", 3L -> "b c d e")
    val out = run(rows, n = 3)
    assert(out == Seq((1L, 4L, 4L, "a b c d"), (2L, 4L, 1L, "e"),
      (3L, 4L, 0L, "")))
    assert(out == reference(rows, 3, 2))
  }

  test("census-with-first reports min (doc_id, pos) and exact counts") {
    val census = Dedup.spanCensusWithFirst(
      df(Seq(1L -> "p q r s", 2L -> "p q r", 5L -> "z p q r")), 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSeq
    // "p q r" occurs in docs 1 (pos 0), 2 (pos 0), 5 (pos 1)
    assert(census.length == 1)
    assert(census.head._2 == 3L && census.head._3 == 3L)
    assert(census.head._4 == 1L && census.head._5 == 0)
  }

  test("random duplicate-dense corpora match the reference exactly") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 12) {
      val alphabet = Seq("a", "b", "c", "d")
      val nDocs = 2 + rnd.nextInt(8)
      val base = (1L to nDocs.toLong).map { id =>
        val len = rnd.nextInt(14)
        id -> (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.size)))
          .mkString(" ")
      }
      // duplicate a random doc wholesale to force cross-doc spans
      val rows = if (base.nonEmpty && rnd.nextBoolean())
        base :+ ((nDocs + 1L) -> base(rnd.nextInt(base.size))._2)
      else base
      val n = 2 + rnd.nextInt(2) // span width 2 or 3
      withClue(s"trial $trial (n=$n, rows=$rows): ") {
        assert(run(rows, n) == reference(rows, n, 2))
      }
    }
  }

  test("bloom mode equals literal mode and the reference on fuzzed corpora") {
    // a different seed from the literal sweep so the two fuzz passes
    // cover different corpora; every trial checks bloom ≡ reference
    // (and thereby bloom ≡ literal, both pinned to the same reference)
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 10) {
      val alphabet = Seq("a", "b", "c", "d")
      val nDocs = 2 + rnd.nextInt(8)
      val base = (1L to nDocs.toLong).map { id =>
        val len = rnd.nextInt(14)
        id -> (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.size)))
          .mkString(" ")
      }
      val rows = if (base.nonEmpty && rnd.nextBoolean())
        base :+ ((nDocs + 1L) -> base(rnd.nextInt(base.size))._2)
      else base
      val n = 2 + rnd.nextInt(2)
      withClue(s"trial $trial (n=$n, rows=$rows): ") {
        val ref = reference(rows, n, 2)
        assert(run(rows, n, maxLiteralFlagged = 0L) == ref, "bloom mode")
        assert(run(rows, n) == ref, "literal mode")
      }
    }
  }

  test("sampled census-with-first matches the gated reference on fuzzed corpora") {
    // mod = 2 keeps ~half of span space on these tiny alphabets (mod 4
    // can leave nothing flagged on short corpora); position fidelity
    // through the gate is the point — a collapsed posexplode index
    // would shift keeper positions and cut the wrong tokens
    val rnd = new scala.util.Random(131)
    for (trial <- 1 to 10) {
      val alphabet = Seq("a", "b", "c", "d")
      val nDocs = 2 + rnd.nextInt(8)
      val base = (1L to nDocs.toLong).map { id =>
        val len = rnd.nextInt(14)
        id -> (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.size)))
          .mkString(" ")
      }
      val rows = if (base.nonEmpty && rnd.nextBoolean())
        base :+ ((nDocs + 1L) -> base(rnd.nextInt(base.size))._2)
      else base
      val n = 2 + rnd.nextInt(2)
      withClue(s"trial $trial (n=$n, rows=$rows): ") {
        assert(run(rows, n, sampleMod = 2L) == reference(rows, n, 2, mod = 2L))
      }
    }
  }

  test("bloom mode handles the keeper-overlap hand case") {
    val rows = Seq(1L -> "a b c d", 2L -> "b c d e", 3L -> "b c d e")
    val out = run(rows, n = 3, maxLiteralFlagged = 0L)
    assert(out == Seq((1L, 4L, 4L, "a b c d"), (2L, 4L, 1L, "e"),
      (3L, 4L, 0L, "")))
  }

  test("no-prefilter tier (census past the Bloom build ceiling) is identical") {
    // maxBloomKeys = 0 skips the Bloom probe entirely: every window
    // flows into the exact span_h join — the prefilter is an
    // optimization, never a semantic step
    val rnd = new scala.util.Random(211)
    for (trial <- 1 to 5) {
      val alphabet = Seq("a", "b", "c")
      val rows = (1L to (2 + rnd.nextInt(6)).toLong).map { id =>
        id -> (1 to rnd.nextInt(12))
          .map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString(" ")
      }
      val n = 2 + rnd.nextInt(2)
      withClue(s"trial $trial (n=$n, rows=$rows): ") {
        assert(run(rows, n, maxLiteralFlagged = 0L, maxBloomKeys = 0L) ==
          reference(rows, n, 2))
      }
    }
  }

  test("span_cut_positions kernel guards degenerate inputs") {
    // out-of-range (5) and negative (-1) positions are ignored; pos 1
    // with n=2 cuts tokens 1..2
    val r = spark.sql(
      "SELECT span_cut_positions('a b c', 2, array(5, -1, 1)) AS r").head()
      .getStruct(0)
    assert(r.getSeq[String](0) == Seq("a") && r.getInt(1) == 3)
    // n < 1 → tokens unchanged
    val r0 = spark.sql(
      "SELECT span_cut_positions('a b', 0, array(0)) AS r").head()
      .getStruct(0)
    assert(r0.getSeq[String](0) == Seq("a", "b") && r0.getInt(1) == 2)
    // NULL entries are ignored — ArrayData.getInt would read the
    // zeroed slot as position 0 and silently cut the first n tokens
    val rn = spark.sql("SELECT span_cut_positions('a b c', 2, " +
      "array(CAST(NULL AS INT), 1)) AS r").head().getStruct(0)
    assert(rn.getSeq[String](0) == Seq("a") && rn.getInt(1) == 3,
      s"null cut entry mishandled: ${rn.getSeq[String](0)}")
  }

  test("span_cut kernel ignores null keeper entries and null fields") {
    // 'a b' is the flagged 2-gram; a NULL keeper slot must neither NPE
    // (getStruct on a null slot) nor mint a spurious keeper, and a
    // struct with a null pos/hash field is equally ignored — the
    // window still cuts because no VALID keeper names it
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("a b".getBytes("UTF-8")).map("%02x".format(_)).mkString
    def cut(keepers: String): Seq[String] = spark.sql(
      s"SELECT span_cut('a b c', 2, X'$hex', $keepers) AS r")
      .head().getStruct(0).getSeq[String](0)
    val nullSlot = "array(CAST(NULL AS struct<pos:int,h:string>), " +
      "named_struct('pos', 0, 'h', md5('a b')))"
    assert(cut(nullSlot) == Seq("a", "b", "c"), "valid keeper ignored")
    val nullField = "array(named_struct('pos', CAST(NULL AS INT), " +
      "'h', md5('a b')))"
    assert(cut(nullField) == Seq("c"), "null-pos keeper should not save")
  }

  test("degenerate shapes: empty corpus, empty docs, no duplicates") {
    assert(run(Seq.empty, n = 3) == Seq.empty)
    assert(run(Seq(1L -> "", 2L -> ""), n = 2) ==
      Seq((1L, 0L, 0L, ""), (2L, 0L, 0L, "")))
    val uniq = Seq(1L -> "a b c", 2L -> "d e f")
    assert(run(uniq, n = 3) == reference(uniq, 3, 2))
    assert(run(uniq, n = 3).forall(r => r._2 == r._3), "nothing cut")
    // bloom mode on the same degenerate shapes (an EMPTY flagged
    // census must not crash the Bloom build — expectedItems floors
    // at 1)
    assert(run(Seq.empty, n = 3, maxLiteralFlagged = 0L) == Seq.empty)
    assert(run(uniq, n = 3, maxLiteralFlagged = 0L) == reference(uniq, 3, 2))
  }
}
