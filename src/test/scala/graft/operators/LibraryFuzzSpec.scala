package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hostile-input sweep over EVERY operators/ library surface: the four
  * corpus shapes that historically break expression-building or
  * aggregate edge cases — an empty corpus, all-empty documents, a
  * single row, and quote/backslash-bearing tokens — run through each
  * surface's main entry points. The contract is mechanical: no
  * exception, and the boring invariant (empty in → empty or zeroed
  * out; single row in → the obvious row out). SqlLitProps pins the
  * counting EXACTNESS of hostile tokens; this suite pins that no
  * surface crashes or fabricates rows on degenerate geometry. */
class LibraryFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame = {
    val df = rows.toDF("doc_id", "text")
    df.withColumn("source", lit("s1")).withColumn("quality", lit(0.5))
  }

  private val hostileText = """don't "quote" back\slash it''s $x"""
  private val corpora: Seq[(String, DataFrame)] = Seq(
    "empty" -> docs(),
    "all-empty-docs" -> docs(1L -> "", 2L -> "", 3L -> ""),
    "single-row" -> docs(7L -> "one tiny document here"),
    "hostile-tokens" -> docs(1L -> hostileText, 2L -> hostileText,
      3L -> "plain text"))

  private def forEachCorpus(f: (String, DataFrame) => Unit): Unit =
    corpora.foreach { case (name, d) =>
      withClue(s"corpus '$name': ") { f(name, d) }
    }

  test("Curation funnel surfaces survive degenerate corpora") {
    forEachCorpus { (_, d) =>
      val sel = Curation.funnel(d, Seq(
        Curation.exactDedup(),
        Curation.decontaminate(pmod(col("doc_id"), lit(2)) === 0),
        Curation.qualityMetric(),
        Curation.selectTokenBudget(1, 2)))
      assert(sel.count() <= d.count(), "curation fabricated rows")
      val mix = Curation.funnel(d, Seq(
        Curation.exactDedup(),
        Curation.qualityMetric(carryCols = Seq("source")),
        Curation.domainMix(Seq(("s1", 500000L)).toDF("source", "w_micro"))))
      assert(mix.count() <= d.count(), "domain mix fabricated rows")
      // an empty stage list is the identity
      assert(Curation.funnel(d, Seq.empty).collect().map(_.toSeq).toSet ===
        d.collect().map(_.toSeq).toSet)
    }
  }

  // ---------------------------------------------------- TextAnalysis

  test("Bpe and LanguageModel surfaces survive degenerate corpora") {
    forEachCorpus { (name, d) =>
      val vocab = TextAnalysis.vocabulary(d).select(col("token"), col("tf"))
      val merges = Bpe.trainMerges(vocab, nMerges = 3)
      val rows = merges.collect()
      assert(rows.length <= 3)
      // hostile corpus has multi-char tokens -> at least one merge, and
      // every merged symbol concatenates left+right
      if (name == "hostile-tokens") assert(rows.nonEmpty)
      rows.foreach(r =>
        assert(r.getString(3) == r.getString(1) + r.getString(2)))
      val seg = Bpe.applyMerges(vocab,
        rows.map(r => (r.getString(1), r.getString(2))).toSeq)
      // symbols always concatenate back to the token
      seg.collect().foreach(r =>
        assert(r.getSeq[String](2).mkString == r.getString(0)))
      // bigram perplexity: docs with < 2 tokens contribute no row
      val ppl = LanguageModel.bigramPerplexity(d)
      assert(ppl.count() <=
        d.filter(expr(s"size(${TextAnalysis.tokensExpr}) >= 2")).count())
      ppl.collect().foreach(r =>
        assert(r.getDouble(2) > 0.0, "perplexity is positive"))
    }
  }

  test("TextAnalysis surfaces survive degenerate corpora") {
    forEachCorpus { (name, d) =>
      val n = d.count()
      assert(TextAnalysis.langProfile(d, markers = Seq("don't", "the"))
        .count() == n)
      assert(TextAnalysis.qualityScore(d, stopwords = Seq("\\'", "a"))
        .count() == n)
      assert(TextAnalysis.tokenStats(d.withColumn("n_chars", length(col("text"))))
        .count() == n)
      // fingerprints aggregate over the token fan-out: one row per doc
      // WITH tokens (the oracle's explode+group semantics — an empty
      // doc has no fingerprint row, it doesn't crash)
      val nTokened = d.filter(expr(s"size(${TextAnalysis.tokensExpr}) > 0")).count()
      assert(TextAnalysis.positionalFingerprint(d).count() == nTokened)
      assert(TextAnalysis.rollingFingerprint(d).count() == nTokened)
      assert(TextAnalysis.repetitionSignals(d).count() == n)
      assert(TextAnalysis.repetitionFilter(d).count() <= n)
      val uc = TextAnalysis.unigramCounts(d)
      assert(TextAnalysis.sourceDivergence(uc).count() <= 1,
        "one source at most")
      if (name == "empty") assert(uc.count() == 0)
      // vocabulary: tf >= df >= 1 for every token; empty corpora empty
      TextAnalysis.vocabulary(d).collect().foreach { r =>
        assert(r.getLong(1) >= r.getLong(2) && r.getLong(2) >= 1L)
      }
      // classifier: one row per doc WITH tokens, keep in {0, 1}
      val cls = TextAnalysis.hashedClassifierScore(d)
      assert(cls.count() == nTokened)
      assert(cls.filter(!col("keep").isin(0L, 1L)).count() == 0)
    }
  }

  // ----------------------------------------------------------- Dedup

  test("Dedup surfaces survive degenerate corpora") {
    forEachCorpus { (name, d) =>
      val exact = Dedup.exactDuplicates(d).collect()
      assert(exact.map(_.getAs[Long]("n_copies")).sum == d.count())
      val sh = Dedup.shingles(d)
      val pairs = Dedup.nearDupPairs(spark, sh, threshold = 0.0).collect()
      name match {
        case "empty" | "all-empty-docs" | "single-row" =>
          assert(pairs.isEmpty, s"got ${pairs.toSeq}")
        case "hostile-tokens" =>
          // docs 1 and 2 are identical hostile text → one exact pair
          assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
            Seq((1L, 2L)))
          assert(pairs.head.getAs[Double]("jaccard") == 1.0)
      }
      assert(Dedup.dropIds(Dedup.nearDupPairs(spark, sh)).count() <= d.count())
      // span census: docs shorter than the span width contribute
      // nothing; identical hostile docs 1/2 share every span
      val spans = Dedup.spanDuplicates(d, spanTokens = 3, sampleMod = 1)
        .collect()
      name match {
        case "hostile-tokens" =>
          assert(spans.nonEmpty &&
            spans.forall(_.getAs[Long]("n_docs") == 2L), s"got ${spans.toSeq}")
        case _ => assert(spans.isEmpty)
      }
      assert(Dedup.spanDuplicates(d, spanTokens = 3, sampleMod = 1,
        minCount = 1).count() >= spans.length)
    }
    // adaptive sample modulus: identity below target, ceil above
    assert(Dedup.adaptiveSampleMod(0L) == 1L)
    assert(Dedup.adaptiveSampleMod(50000000L) == 1L)
    assert(Dedup.adaptiveSampleMod(50000001L) == 2L)
    assert(Dedup.adaptiveSampleMod(1000L, targetCensusSpans = 300L) == 4L)
  }

  test("spanDuplicates auto sampleMod ≡ the pinned modulus it resolves") {
    // 3 docs x 10 tokens, span 3 → 8 windows each, 24 spans total;
    // autoTargetSpans = 4 → adaptiveSampleMod(24, 4) = 6
    val reps = docs((1L to 3L).map(i =>
      i -> (1 to 10).map(j => s"w${j % 5}").mkString(" ")): _*)
    def census(mod: Long, target: Long = 50000000L) =
      Dedup.spanDuplicates(reps, spanTokens = 3, sampleMod = mod,
          autoTargetSpans = target)
        .orderBy("span_h").collect().map(_.toSeq).toSeq
    assert(Dedup.adaptiveSampleMod(24L, 4L) == 6L)
    assert(census(0L, target = 4L) == census(6L), "auto resolves to mod 6")
    // default target on a tiny corpus resolves to the exact census
    assert(census(0L) == census(1L))
    assert(census(1L).nonEmpty)
    // textCol is quoted, not spliced: a hostile column name works
    val renamed = reps.withColumnRenamed("text", "my `text` col")
    val viaRenamed = Dedup.spanDuplicates(renamed, spanTokens = 3,
        sampleMod = 1, textCol = "my `text` col")
      .orderBy("span_h").collect().map(_.toSeq).toSeq
    assert(viaRenamed == census(1L))
  }

  // ----------------------------------------------- Indexing/Sketching

  test("Indexing and Sketching surfaces survive degenerate corpora") {
    forEachCorpus { (name, d) =>
      val dl = d.withColumn("lang", lit("xx"))
      val kw = Indexing.topKeywords(d, k = 2).collect()
      // at most k rows per doc, ranks within 1..k, integer score law
      assert(kw.groupBy(_.getAs[Any]("doc_id")).forall(_._2.length <= 2))
      kw.foreach { r =>
        assert(r.getAs[Long]("rank") >= 1L && r.getAs[Long]("rank") <= 2L)
        assert(r.getAs[Long]("score") ==
          r.getAs[Long]("tf") * 1000000L / r.getAs[Long]("df"))
      }
      val inv = Indexing.invertedIndex(d).collect()
      val invSh = Indexing.invertedIndexSharded(d).collect()
      // sharding is invisible (the x11b contract), df >= postings count
      assert(inv.map(_.toSeq).toSeq == invSh.map(_.toSeq).toSeq, name)
      inv.foreach { r =>
        val nPost = r.getString(2).split(",").count(_.nonEmpty)
        assert(r.getLong(1) >= nPost && nPost <= 20)
      }
      val kmv = Sketching.kmvDistinctWithExact(dl, groupCol = "lang").collect()
      // below k hashes the estimate IS the exact count
      kmv.foreach { r =>
        if (r.getLong(1) < 64L) assert(r.getLong(2) == r.getLong(1))
      }
      val bk = Sketching.kmvBottomK(dl, groupCol = "lang").collect()
      assert(bk.length == kmv.length)
      kmv.zip(bk).foreach { case (a, b) =>
        assert(a.getLong(2) == b.getLong(2), "same estimate both forms")
      }
    }
  }

  // -------------------------------------------------------- Sampling

  test("Sampling surfaces survive degenerate corpora") {
    val thr = (t: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =>
      t * lit(1000000L) / c
    forEachCorpus { (_, d) =>
      val kept = Sampling.sampleByStratum(d, "source", "doc_id", "fuzz", thr)
      assert(kept.count() <= d.count())
      val labeled = d.withColumn("split",
        Sampling.splitLabel(col("doc_id"), salt = "don't"))
      assert(labeled.filter(
        !col("split").isin("train", "val", "test")).count() == 0)
    }
    // empty corpus: thresholds relation itself is empty, not a crash
    assert(Sampling.stratumThresholds(docs(), "source",
      (t, c) => t * lit(1000000L) / c).count() == 0)
    // prioritySample: zero / negative / null weights are dropped, not
    // an ANSI div-by-zero job failure
    val weighted = Seq((1L, 4L), (2L, 0L), (3L, -3L), (4L, 2L))
      .toDF("doc_id", "w")
      .unionByName(Seq(5L).toDF("doc_id")
        .withColumn("w", lit(null).cast("long")))
    val pri = Sampling.prioritySample(weighted, k = 10).collect()
    assert(pri.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 4L),
      "only positive-weight rows compete")
    assert(Sampling.prioritySample(weighted.limit(0), k = 3).count() == 0)
    // mixtureWeights: a zero-mass stratum yields NULL weight/epochs
    // (not weight=1.0 / epochs=Infinity)
    val masses = Seq(("a", 100L), ("b", 0L)).toDF("source", "tokens")
    val mw = Sampling.mixtureWeights(masses).collect()
    val byS = mw.map(r => r.getString(0) ->
      (r.get(2), r.get(3))).toMap
    assert(byS("b") == ((null, null)), s"zero-mass stratum: ${byS("b")}")
    assert(byS("a")._1 != null && byS("a")._2 != null)
    assert(Sampling.mixtureWeights(masses.limit(0)).count() == 0)
  }

  // ---------------------------------------------------------- Dsir

  test("Dsir surfaces survive degenerate corpora") {
    val B = 32
    forEachCorpus { (name, d) =>
      // target == raw == the degenerate corpus: every log ratio is a
      // well-defined finite double (add-one smoothing tolerates zero
      // totals), the table is exactly B wide
      val lr = Dsir.importanceLogRatios(d, d, buckets = B)
      assert(lr.length == B)
      assert(lr.forall(x => !x.isNaN && !x.isInfinite),
        s"non-finite log ratio on '$name'")
      val scored = Dsir.importanceWeights(d, lr)
      val rows = scored.collect()
      assert(rows.length == d.count())
      // docs with < 2 tokens score exactly the fold zero
      rows.filter(_.getLong(1) == 0L)
        .foreach(r => assert(r.getDouble(2) == 0.0))
      val picked = Dsir.gumbelResample(scored, k = 2)
      assert(picked.count() <= math.min(2L, rows.length.toLong))
    }
    // guards fail loudly, not downstream
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(docs(), Array.empty[Double])
    }
    intercept[IllegalArgumentException] {
      Dsir.gumbelResample(
        docs(1L -> "x").withColumn("logw", lit(0.0))
          .withColumn("g", lit(1.0)), k = 1)
    }
  }

  // ------------------------------------------------- Decontamination

  test("Decontamination surfaces survive degenerate corpora") {
    val evalDocs = docs(100L -> hostileText).select(
      col("doc_id").as("eval_id"), col("text"))
    val evalG = Decontamination.ngramHashes(
      evalDocs.select(col("eval_id").as("doc_id"), col("text")))
      .select(col("doc_id").as("eval_id"), col("gh")).distinct().cache()
    val bloom = Decontamination.evalBloom(evalG, math.max(evalG.count(), 1L))
    forEachCorpus { (name, d) =>
      val train = Decontamination.ngramHashes(d)
      val flagged = Decontamination.flagExact(train, evalG, Some(bloom))
      name match {
        case "hostile-tokens" =>
          // docs 1/2 are the eval text verbatim → both flagged
          assert(flagged.count() == 2, s"flagged=${flagged.collect().toSeq}")
        case _ => assert(flagged.count() == 0)
      }
      // fuzzy path over the same corpora (eval row unioned in)
      val sh = Dedup.shingles(d.unionByName(
          evalDocs.select(col("eval_id").as("doc_id"), col("text"))
            .withColumn("source", lit("eval"))
            .withColumn("quality", lit(0.0))))
        .withColumn("is_eval", col("doc_id") >= 100L)
        .withColumn("bh", expr("minhash_lsh_bands(ws)"))
      val fuzzy = Decontamination.fuzzyMatches(spark, sh, threshold = 0.5)
      if (name == "hostile-tokens") assert(fuzzy.count() == 2)
      else assert(fuzzy.count() == 0)
    }
  }

  // ------------------------------------------------------ Similarity

  private def emb(rows: (Long, Seq[Double])*): DataFrame =
    rows.toDF("vec_id", "v")

  test("Similarity surfaces survive degenerate embedding sets") {
    val shapes = Seq(
      "empty" -> emb(),
      "single" -> emb(1L -> Seq(1d, 0d, 0d, 0d)),
      // includes an all-zeros vector: excluded, never a crash
      "few" -> emb(1L -> Seq(1d, 0d, 0d, 0d), 2L -> Seq(0.9, 0.1, 0d, 0d),
        3L -> Seq(0d, 1d, 0d, 0d), 4L -> Seq(0d, 0d, 0d, 0d)))
    shapes.foreach { case (name, e) =>
      withClue(s"embeddings '$name': ") {
        val pred = col("vec_id") === 1L
        val bf = Similarity.bruteForceTopK(e, pred, k = 2)
        val lsh = Similarity.lshTopK(e, pred, k = 2, dims = 4)
        val ivf = Similarity.ivfTopK(e, pred, k = 2, nCells = 2, nprobe = 2)
        val qt = Similarity.quantizedTopK(e, pred, k = 2, coarseK = 2, dims = 4)
        Seq(bf, lsh, ivf, qt).foreach { out =>
          val rows = out.collect()
          assert(rows.length <= 2)
          // a query never returns itself, and the zero-norm vector is
          // excluded rather than erroring the division
          assert(rows.forall(r => r.getAs[Long]("vec_id") != 1L &&
            r.getAs[Long]("vec_id") != 4L))
          if (name == "empty" || name == "single") assert(rows.isEmpty)
        }
        if (name == "few")
          assert(bf.collect().head.getAs[Long]("vec_id") == 2L,
            "nearest neighbor of q1 is v2")
      }
    }
    // the array<double> contract is an analysis error, not a deep
    // in-task ClassCastException
    val bad = Seq(1L -> Seq(1f, 0f)).toDF("vec_id", "v")
    val e = intercept[Exception] {
      Similarity.bruteForceTopK(bad, col("vec_id") === 1L, 1).collect()
    }
    assert(String.valueOf(e.getMessage).toLowerCase.contains("vec_dot"), e.getMessage)
  }

  test("Clustering surfaces survive degenerate embedding sets") {
    val shapes = Seq(
      "empty" -> emb(),
      "single" -> emb(1L -> Seq(1d, 0d, 0d, 0d)),
      "all-zero" -> emb(1L -> Seq(0d, 0d, 0d, 0d), 2L -> Seq(0d, 0d, 0d, 0d)),
      "few" -> emb(1L -> Seq(1d, 0d, 0d, 0d), 2L -> Seq(0.9, 0.1, 0d, 0d),
        3L -> Seq(0d, 1d, 0d, 0d), 4L -> Seq(0d, 0d, 0d, 0d)))
    shapes.foreach { case (name, e) =>
      withClue(s"embeddings '$name': ") {
        val n = e.count()
        val asg = Clustering.kMeansAssign(e, k = 3, iters = 2)
        assert(asg.count() == n, "every vector assigned, even zero-norm")
        // dedup excludes zero-norm rows instead of erroring the division;
        // k=3 seeds 1/2/3 into their own clusters (no pairs), k=1 puts
        // the near-dup pair in one cluster
        assert(Clustering.semanticDrops(e, k = 3, iters = 2, tau = 0.9)
          .collect().isEmpty)
        val drops = Clustering.semanticDrops(e, k = 1, iters = 2, tau = 0.9)
          .collect().map(_.getLong(0)).toSet
        if (name == "few") assert(drops == Set(2L))
        else assert(drops.isEmpty)
      }
    }
    // the array<double> contract surfaces as an analysis-time error
    val bad = Seq(1L -> Seq(1f, 0f)).toDF("vec_id", "v")
    val e = intercept[Exception] {
      Clustering.semanticDrops(bad, 2, 1, 0.5).collect()
    }
    assert(String.valueOf(e.getMessage).toLowerCase.contains("vec_dot"), e.getMessage)
  }

  // ------------------------------------------------------- Retrieval

  test("Retrieval surfaces survive degenerate corpora (scan and index)") {
    forEachCorpus { (name, d) =>
      val out = Retrieval.bm25TopK(d,
        queries = Seq((1L, "don't"), (2L, "document")), k = 3)
      name match {
        case "hostile-tokens" =>
          assert(out.filter(col("query_id") === 1L).count() == 2)
        case "single-row" =>
          assert(out.filter(col("query_id") === 2L).count() == 1)
        case _ => assert(out.count() == 0)
      }
      val idx = graft.SessionTemp.dir("graft_fuzz_idx_")
      Retrieval.buildPostingsIndex(d, idx, fingerprint = "fuzz",
        nBuckets = None)
      val probed = Retrieval.probeIndex(spark, idx,
        Seq((1L, "don't"), (2L, "document")), 3)
      assert(probed.collect().toSeq == out.collect().toSeq,
        "probe form must equal scan form on degenerate corpora too")
    }
  }

  // --------------------------------------------------- Sessionization

  test("Sessionization surfaces survive degenerate event streams") {
    def events(rows: (Long, Long, String, Long)*): DataFrame =
      rows.toDF("user_id", "sec", "event_type", "event_id")
        .select(col("event_id"), expr("timestamp_seconds(sec)").as("ts"),
          col("user_id"), col("event_type"))
    val shapes = Seq(
      "empty" -> events(),
      "single" -> events((1L, 10L, "don't", 1L)))
    val stages = Seq("don't" -> "1_a", "b" -> "2_b")
    shapes.foreach { case (name, ev) =>
      withClue(s"events '$name': ") {
        val n = ev.count()
        assert(Sessionization.sessionize(ev, 1800L).count() == n)
        assert(Sessionization.sessionizeBucketed(ev, 1800L, 21600L).count() == n)
        val f = Sessionization.funnel(ev, stages, "0_all")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val fb = Sessionization.funnelBucketed(ev, stages, "0_all", 21600L)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val expect =
          if (name == "empty") Map("0_all" -> 0L, "1_a" -> 0L, "2_b" -> 0L)
          else Map("0_all" -> 1L, "1_a" -> 1L, "2_b" -> 0L)
        assert(f == expect, s"funnel $f")
        assert(fb == expect, s"funnelBucketed $fb")
        assert(Sessionization.lastTouch(ev, "don't", "x", 100L).count() == 0)
        assert(Sessionization
          .lastTouchBucketed(ev, "don't", "x", 100L, 3600L).count() == 0)
      }
    }
  }

  // --------------------------------------------------------- Packing

  test("Packing surfaces survive degenerate corpora") {
    forEachCorpus { (_, d) =>
      val n = d.count()
      val withTok = d.select(col("source"), col("doc_id"),
        size(expr(TextAnalysis.tokensExpr)).cast("long").as("n_tokens"))
      val packed = Packing.packSequences(withTok, tokenBudget = 8L)
      assert(packed.agg(coalesce(sum("n_docs"), lit(0L))).collect()(0)
        .getLong(0) == n, "every doc lands in exactly one sequence")
      // the sharded form is output-identical on degenerate shapes too
      assert(Packing.packSequencesSharded(withTok, 8L, shardSpan = 2L)
        .collect().toSeq == packed.collect().toSeq)
      // every doc yields >= 1 chunk, even empty text
      assert(Packing.chunkOverlapping(d, width = 10, stride = 5)
        .groupBy("doc_id").count().count() == n)
      val ord = Packing.trainingOrder(d, nShards = 4, salt = "don't")
      assert(ord.count() == n)
    }
  }

  test("Packing/Selection/Similarity accept hostile column names") {
    // names with spaces and quotes reach col()/quoteName, never raw
    // expression text — a splice would throw a parse error here
    val hostile = "the text's col"
    val plain = docs(1L -> "alpha beta gamma delta", 2L -> "alpha alpha")
    val renamed = plain.withColumnRenamed("text", hostile)
    val a = Packing.chunkOverlapping(plain, width = 5, stride = 5).collect().toSeq
    val b = Packing.chunkOverlapping(renamed, width = 5, stride = 5,
      textCol = hostile).collect().toSeq
    assert(a == b, "hostile-named column must chunk identically")

    val m = Seq(1L -> 10L, 2L -> 20L).toDF("doc_id", "n tok's")
    assert(Selection.tokenBudgetFraction(m, 1L, 2L, tokensCol = "n tok's")
      .collect()(0).getLong(0) == 15L)

    val e = Seq((1L, Seq(1d, 0d), Seq(0d, 1d))).toDF("id", "a v's", "b v's")
    assert(e.select(round(Similarity.cosine("a v's", "b v's"), 4).as("c"))
      .collect()(0).getDouble(0) == 0.0)
  }

  // ---------------------------------------------------- TemporalJoins

  test("TemporalJoins.asofJoin survives empty sides") {
    def side(rows: (Long, Long, Double)*) =
      rows.toDF("k", "t", "x")
    val l = side((1L, 10L, 1.0))
    val r = side()
    assert(TemporalJoins.asofJoin(l, r, Seq("k"), "t", suffix = "_r")
      .count() == 0)
    assert(TemporalJoins.asofJoin(side(), side((1L, 5L, 2.0)), Seq("k"), "t",
      suffix = "_r").count() == 0)
  }
}
