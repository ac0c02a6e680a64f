package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the round-5 training-pipeline entries (the
  * DuckDB hash gate checks values; this pins the SEMANTICS under
  * `sbt test`): d9's connected components really partition the pair
  * graph, p2's scrub leaves no matchable PII, p3 only flags train docs
  * that share an n-gram with the eval set (over a broadcast join), and
  * e4's streaming session merge agrees with batch `session_window`.
  */
class TrainingPipelineSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  // ------------------------------------------------------------- d9

  test("d9: cluster assignment is a partition refined by the d3 pair graph") {
    val clusters = Catalog.byName("d9_dup_clusters").fn(spark, sfDir)
      .select("doc_id", "cluster_id", "cluster_size", "is_keeper")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val pairs = Catalog.byName("d3_minhash_lsh").fn(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    // every doc appears exactly once (it's the full corpus assignment)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(clusters.size == nDocs)

    // pair endpoints always land in the same cluster (transitivity is
    // what d6's pair-local keep-list cannot guarantee)
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1,
        s"pair ($a,$b) split across clusters ${clusters(a)._1}/${clusters(b)._1}")
    }
    assert(pairs.nonEmpty, "fixture has no near-dup pairs — spec is vacuous")

    // cluster id is the minimum member; exactly that member is the keeper
    val members = clusters.groupBy(_._2._1).view.mapValues(_.keys.toSeq)
    members.foreach { case (cid, ms) =>
      assert(ms.min == cid, s"cluster $cid: min member ${ms.min}")
      ms.foreach { m =>
        val keeper = clusters(m)._3
        assert(keeper == (if (m == cid) 1L else 0L))
        assert(clusters(m)._2 == ms.size.toLong,
          s"doc $m: cluster_size ${clusters(m)._2} != ${ms.size}")
      }
    }
  }

  test("d9: driver union-find and distributed propagation agree") {
    val local = Catalog.byName("d9_dup_clusters").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("spark.graft.cc.localEdges", "0") // force the big-graph path
    try {
      val distributed = Catalog.byName("d9_dup_clusters").fn(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(local == distributed,
        s"paths disagree: ${local.diff(distributed).take(3)} vs ${distributed.diff(local).take(3)}")
    } finally spark.conf.unset("spark.graft.cc.localEdges")
  }

  // ------------------------------------------------------------- p2

  test("p2: scrubbed text contains no matchable email/phone spans") {
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
    // rebuild the synthesized raw + scrub exactly as the query does and
    // assert redaction is complete (counts after scrub = 0) and the
    // detector counts match the doc_id arithmetic that seeded them
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("raw", concat(
        col("text"),
        when(pmod(col("doc_id"), lit(3)) =!= 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit(" cc admin"), col("doc_id").cast("string"),
            lit("@corp.example.org"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit(" tel +1-555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
          .otherwise(lit(""))))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(col("raw"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>"))
    val leftover = d
      .filter(regexp_count(col("scrubbed"), lit(emailRe)) > 0 ||
        regexp_count(col("scrubbed"), lit(phoneRe)) > 0)
      .count()
    assert(leftover == 0, s"$leftover docs still match PII after scrub")

    val bad = Catalog.byName("p2_pii_scrub").fn(spark, sfDir)
      .withColumn("want_emails",
        (pmod(col("doc_id"), lit(3)) =!= 0).cast("long") +
          (pmod(col("doc_id"), lit(5)) === 0).cast("long"))
      .withColumn("want_phones", (pmod(col("doc_id"), lit(2)) === 0).cast("long"))
      .filter(col("n_emails") =!= col("want_emails") ||
        col("n_phones") =!= col("want_phones"))
      .count()
    assert(bad == 0, s"$bad docs with unexpected PII counts")
  }

  // ------------------------------------------------------------- p3

  test("p3: flags exactly the train docs sharing a 4-gram with the eval set") {
    val out = Catalog.byName("p3_decontaminate").fn(spark, sfDir).collect()
    assert(out.nonEmpty, "no contaminated docs at fixture scale — vacuous")
    assert(out.forall(_.getLong(0) % 97 != 0), "eval docs must not be flagged")

    // independent recompute on the STRING grams (the query joins on the
    // 60-bit md5-prefix hash; equality here also rules out hash-collision slop)
    val g = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), explode(expr("word_ngrams(text, 4)")).as("g"))
    val ev = g.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select(col("g")).distinct()
    val expected = g.filter(pmod(col("doc_id"), lit(97)) =!= 0)
      .join(ev, "g").select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet == expected)
  }

  test("p3: eval n-gram side is broadcast (corpus never shuffles)") {
    val plan = Catalog.byName("p3_decontaminate").fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast hash join against the eval set:\n$plan")
  }

  // ------------------------------------------------------------- e4

  test("e4: streaming session merge equals batch session_window at the cutoff") {
    val streamed = Catalog.byName("e4_stream_sessions").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val ev = graft.sources.Records.table(spark, sfDir, "events")
    val maxMs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000L
    val batch = ev
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .filter(unix_micros(col("session_window.end")) / 1000L <= maxMs - 3600000L)
      .select(col("user_id").cast("long"),
        col("session_window.start").cast("long"),
        col("session_window.end").cast("long"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    assert(streamed.nonEmpty, "no sessions emitted — vacuous")
    assert(streamed == batch,
      s"streaming/batch session mismatch: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
  }

  // ------------------------------------------------------------- p4

  test("p4: bloom pre-filtered decontamination is bit-identical to p3") {
    // the Bloom filter may pass false positives into the exact join, but
    // the join must remove every one of them — outputs are identical
    val exact = Catalog.byName("p3_decontaminate").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloomed = Catalog.byName("p4_bloom_decontaminate").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact.nonEmpty, "fixture flags no contaminated docs — vacuous")
    assert(bloomed == exact,
      s"bloom/exact mismatch: ${bloomed.diff(exact).take(3)} vs ${exact.diff(bloomed).take(3)}")
  }

  // ------------------------------------------------------------- p5

  test("p5: temperature sampling flattens the mix monotonically, keeps the floor") {
    val rows = Catalog.byName("p5_temperature_sample").fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val minDocs = rows.map(_._2).min
    rows.foreach { case (src, nDocs, nKept) =>
      assert(nKept <= nDocs, s"$src kept more than it has")
      // keep RATE target is (min/n)^0.5, strictly gentler than p1's
      // min/n flattening; the hash gate is binomial around it, so only
      // pin the hard bounds: the smallest source keeps everything
      // (threshold = 1e6), and expected-rate ordering holds in aggregate
      if (nDocs == minDocs) assert(nKept == nDocs, s"floor source $src lost docs")
    }
    // α=0.5 downsamples less aggressively than α=0 (p1): totals must
    // reflect that — temperature keep-total ≥ balanced keep-total
    val p1Total = Catalog.byName("p1_stratified_sample").fn(spark, sfDir).count()
    val p5Total = rows.map(_._3).sum
    assert(p5Total >= p1Total,
      s"temperature sample ($p5Total) smaller than balanced sample ($p1Total)")
  }

  // ------------------------------------------------------------- p6

  test("p6: packing is a partition of the corpus and chunks at the budget") {
    val seqs = Catalog.byName("p6_sequence_pack").fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(seqs.nonEmpty)
    // every doc lands in exactly one sequence
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(seqs.map(_._3).sum == d.count())
    // token totals per source survive the packing (no tokens lost)
    val perSource = d
      .select(col("source"), expr("size(filter(split(text, ' '), t -> t != ''))")
        .cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    seqs.groupBy(_._1).foreach { case (src, ss) =>
      assert(ss.map(_._4).sum == perSource(src), s"$src token totals differ")
      // sequence ids are the dense chunk index of a concatenated stream:
      // all but the last chunk of a source span ≥ the 256-token budget
      // (a doc starting inside chunk k pushes the cumulative count past
      // 256·k), i.e. ids are contiguous from 0
      val ids = ss.map(_._2).sorted.toSeq
      assert(ids == (0L until ids.size.toLong),
        s"$src sequence ids not contiguous: $ids")
    }
  }

  // ------------------------------------------------------------- x7

  test("x7: vocabulary tf/df match an independent recompute") {
    val vocab = Catalog.byName("x7_vocab").fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(vocab.nonEmpty)
    val docsLocal = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val tf = docsLocal.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong)
    val df = docsLocal.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong)
    assert(vocab.keySet == tf.keySet.toSet)
    vocab.foreach { case (t, (gotTf, gotDf)) =>
      assert(gotTf == tf(t), s"token '$t' tf $gotTf != ${tf(t)}")
      assert(gotDf == df(t), s"token '$t' df $gotDf != ${df(t)}")
      assert(gotDf <= gotTf)
    }
  }

  // ------------------------------------------------------------- p7

  test("p7: split is a partition of the corpus with hash-stable assignment") {
    val rows = Catalog.byName("p7_hash_split").fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    // every doc lands in exactly one split
    assert(rows.map(_._3).sum == d.count())
    assert(rows.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    // the split is doc-id-determined, independent of partitioning: an
    // independent recompute of one doc's bucket agrees with the census
    val splits = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val recomputed = d.selectExpr(
        "pmod(cast(conv(substr(md5(concat('split:', cast(doc_id as string))), 1, 15), 16, 10) as long), 100) as b")
      .collect().map(_.getLong(0))
      .map(b => if (b < 90) "train" else if (b < 95) "val" else "test")
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(splits == recomputed, s"census $splits != recompute $recomputed")
    // train dominates: the 90/5/5 gate is binomial but 90% vs 5% cannot
    // invert on any real corpus
    assert(splits.getOrElse("train", 0L) > splits.getOrElse("val", 0L))
    assert(splits.getOrElse("train", 0L) > splits.getOrElse("test", 0L))
  }

  // ------------------------------------------------------------- x8

  test("x8: classifier score matches an exact integer recompute") {
    val got = Catalog.byName("x8_quality_classifier").fn(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toMap
    assert(got.nonEmpty)
    val docsLocal = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    assert(got.keySet == docsLocal.map(_._1).toSet)
    // weight = (md5_60bit("qw:"+token) mod 2001) - 1000, summed as longs
    def w(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(("qw:" + t).getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
    }
    docsLocal.foreach { case (id, ts) =>
      val (nTok, raw, score, keep) = got(id)
      assert(nTok == ts.length.toLong)
      val expRaw = ts.map(w).sum
      assert(raw == expRaw, s"doc $id raw $raw != $expRaw")
      val expScore = BigDecimal(expRaw.toDouble / (nTok * 1000L).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(score - expScore) < 1e-9, s"doc $id score $score != $expScore")
      assert(keep == (if (expRaw > 0) 1L else 0L))
    }
  }

  // ------------------------------------------------------------- p8

  test("p8: funnel is monotone and consistent with its component operators") {
    val rows = Catalog.byName("p8_funnel").fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq ==
      Seq("0_all", "1_dedup", "2_lang", "3_quality", "4_classifier"))
    // cumulative gates only ever shrink the census
    rows.sliding(2).foreach { case Array((s1, d1, t1), (s2, d2, t2)) =>
      assert(d2 <= d1 && t2 <= t1, s"funnel grew from $s1 to $s2")
    }
    val byStage = rows.map(r => r._1 -> r._2).toMap
    // stage 0 is the corpus; stage 1 is d1's keeper count (one per
    // distinct content hash); stage 4 agrees with x8's keep flags on
    // the docs that survive stages 1-3
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(byStage("0_all") == d.count())
    assert(byStage("1_dedup") ==
      Catalog.byName("d1_exact_dedup").fn(spark, sfDir).count())
  }

  // ------------------------------------------------------------ d10

  test("d10: incremental dedup excludes every existing hash, keeps batch keepers") {
    val out = Catalog.byName("d10_incremental_dedup").fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // independent recompute of the batch membership and hash sets
    def md5Hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def isNew(id: Long): Boolean =
      java.lang.Long.parseLong(md5Hex(s"inc:$id").take(15), 16) % 5 == 0
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> md5Hex(r.getString(1)))
    val existing = d.collect { case (id, h) if !isNew(id) => h }.toSet
    val batch = d.filter { case (id, _) => isNew(id) }
    assert(batch.nonEmpty && existing.nonEmpty, "degenerate split — vacuous")
    // no output hash may already exist in the corpus index
    out.foreach { case (h, _, _) =>
      assert(!existing.contains(h), s"hash $h already in the corpus")
    }
    // keeper/copies agree with a local groupBy over the fresh batch
    val expected = batch.filterNot { case (_, h) => existing.contains(h) }
      .groupBy(_._2).view
      .mapValues(g => (g.map(_._1).min, g.size.toLong)).toMap
    assert(out.map(_._1).toSet == expected.keySet)
    out.foreach { case (h, keeper, copies) =>
      assert((keeper, copies) == expected(h), s"hash $h keeper/copies mismatch")
    }
  }

  // ------------------------------------------------------------- x9

  test("x9: top pairs match a local frequency-weighted recompute") {
    val got = Catalog.byName("x9_bpe_pairs").fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.length == 20)
    val tf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong)
    val pairCounts = tf.toSeq.filter(_._1.length >= 2)
      .flatMap { case (t, n) => t.sliding(2).map(_ -> n) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (p, n) => (-n, p) }
    assert(got.toSeq == pairCounts.take(20),
      s"top pairs diverge: ${got.take(3)} vs ${pairCounts.take(3)}")
    // descending with deterministic tie-break
    got.sliding(2).foreach { case Array((p1, n1), (p2, n2)) =>
      assert(n1 > n2 || (n1 == n2 && p1 < p2))
    }
  }

  // ------------------------------------------------------------- e5

  test("e5: funnel stages match a local per-user event replay") {
    val got = Catalog.byName("e5_conversion_funnel").fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.map(_._1).toSeq == Seq(
      "0_active", "1_click", "2_view_after_click", "3_purchase_after_view"))
    val byStage = got.toMap
    // monotone funnel
    assert(byStage("1_click") >= byStage("2_view_after_click"))
    assert(byStage("2_view_after_click") >= byStage("3_purchase_after_view"))
    // independent replay: walk each user's events in (ts, event_id) order
    val events = graft.sources.Records.table(spark, sfDir, "events")
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) as us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    var (nC, nV, nP) = (0L, 0L, 0L)
    events.groupBy(_._1).foreach { case (_, es) =>
      var (c, v, p) = (false, false, false)
      es.sortBy(e => (e._4, e._2)).foreach { case (_, _, tpe, _) =>
        if (tpe == "click") c = true
        else if (tpe == "view" && c) v = true
        else if (tpe == "purchase" && v) p = true
      }
      if (c) nC += 1; if (v) nV += 1; if (p) nP += 1
    }
    assert(byStage("0_active") == events.map(_._1).distinct.length.toLong)
    assert(byStage("1_click") == nC, s"click ${byStage("1_click")} != $nC")
    assert(byStage("2_view_after_click") == nV)
    assert(byStage("3_purchase_after_view") == nP)
  }

  // ------------------------------------------------------------ x10

  test("x10: top keywords match a local integer-scored recompute") {
    val got = Catalog.byName("x10_top_keywords").fn(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    val docsLocal = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val df = docsLocal.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val expected = docsLocal.flatMap { case (id, ts) =>
      ts.groupBy(identity).toSeq
        .map { case (t, o) =>
          (t, o.length.toLong, df(t), o.length.toLong * 1000000L / df(t)) }
        .sortBy { case (t, _, _, sc) => (-sc, t) }
        .take(3).zipWithIndex
        .map { case ((t, tf, d, sc), i) => (id, i + 1L, t, tf, d, sc) }
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == expected.toSeq,
      s"keyword mismatch: ${got.take(2).toSeq} vs ${expected.take(2)}")
  }

  // ------------------------------------------------------------- e6

  test("e6: streaming funnel state agrees with the batch funnel census") {
    val perUser = Catalog.byName("e6_stream_funnel").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(perUser.nonEmpty)
    assert(perUser.map(_._1).distinct.length == perUser.length, "dup users")
    val e5 = Catalog.byName("e5_conversion_funnel").fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perUser.length.toLong == e5("0_active"))
    assert(perUser.count(_._2 >= 1).toLong == e5("1_click"))
    assert(perUser.count(_._2 >= 2).toLong == e5("2_view_after_click"))
    assert(perUser.count(_._2 >= 3).toLong == e5("3_purchase_after_view"))
  }

  // ------------------------------------------------------------- d11

  test("d11: keeper is the longest doc per d9 cluster, min doc_id on ties") {
    val d9 = Catalog.byName("d9_dup_clusters").fn(spark, sfDir)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Catalog.byName("d11_quality_keeper").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == d9.size, "d11 must cover the full corpus")
    rows.foreach { case (doc, cl, _, _) =>
      assert(d9(doc) == cl, s"doc $doc cluster moved: ${d9(doc)} vs $cl") }
    rows.groupBy(_._2).foreach { case (cl, members) =>
      val keepers = members.filter(_._4 == 1L)
      assert(keepers.length == 1, s"cluster $cl has ${keepers.length} keepers")
      val best = members.map(_._3).max
      val expected = members.filter(_._3 == best).map(_._1).min
      assert(keepers.head._1 == expected,
        s"cluster $cl kept ${keepers.head._1}, expected $expected")
    }
  }

  // ------------------------------------------------------------- x11

  test("x11: exact df and first-20 sorted postings vs a local rebuild") {
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty).distinct
        .map(_ -> r.getLong(0)))
      .groupBy(_._1).view
      .mapValues(ps => ps.map(_._2).sorted).toMap
    val rows = Catalog.byName("x11_inverted_index").fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.map(_._1).toSet == expected.keySet)
    rows.foreach { case (tok, df, postings) =>
      val exp = expected(tok)
      assert(df == exp.length.toLong, s"$tok df $df != ${exp.length}")
      assert(postings == exp.take(20).mkString(","), s"$tok postings wrong")
    }
  }

  // ------------------------------------------------------------- p9

  test("p9: weights clamp epochs at 1 and equalize the expected mix") {
    val rows = Catalog.byName("p9_mixture_weights").fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    val share = rows.map(_._2).sum.toDouble / rows.length
    rows.foreach { case (src, tokens, weight, epochs) =>
      assert(weight == math.min(1.0, epochs), s"$src weight/epochs disagree")
      // expected post-mix token mass ~= the equal share for every
      // over-represented source (weight < 1); 4-decimal rounding slack
      if (weight < 1.0)
        assert(math.abs(weight * tokens - share) / share < 1e-3,
          s"$src mix not equalized: ${weight * tokens} vs $share")
      else assert(tokens <= share * (1 + 1e-3), s"$src clamped but over share")
    }
  }

  // ------------------------------------------------------------- p10

  test("p10: the 200 kept docs are exactly the smallest u/w priorities") {
    import org.apache.spark.sql.functions._
    val got = Catalog.byName("p10_priority_sample").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 200)
    // independent local recompute of every doc's priority
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(concat('pri:', cast(doc_id as string)))," +
          " 1, 15), 16, 10) as long)").as("h"),
        col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1) % 4294967296L) * 1048576L / r.getLong(2)))
    val expected = all.sortBy { case (id, pri) => (pri, id) }.take(200)
    assert(got.map(r => (r._1, r._3)).toSeq == expected.toSeq)
    // weighting sanity: kept docs skew long — their mean weight exceeds
    // the corpus mean (u is uniform, priority divides by w)
    val meanKept = got.map(_._2).sum.toDouble / got.length
    val meanAll = spark.read.parquet(s"$sfDir/documents.parquet")
      .agg(avg("n_chars")).collect().head.getDouble(0)
    assert(meanKept > meanAll, s"kept mean $meanKept !> corpus mean $meanAll")
  }

  // ------------------------------------------------------------- x12

  test("x12: estimator matches a local bottom-k recompute; small groups exact") {
    import org.apache.spark.sql.functions._
    val got = Catalog.byName("x12_kmv_distinct").fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // independent recompute of the k-th smallest hash per lang
    val hashes = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"), explode(expr("word_ngrams(text, 3)")).as("w"))
      .select(col("lang"),
        expr("cast(conv(substring(md5(w), 1, 15), 16, 10) as long)").as("h"))
      .distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted)
    hashes.foreach { case (lang, hs) =>
      val (exact, est) = got(lang)
      assert(exact == hs.length.toLong, s"$lang exact")
      val expected =
        if (hs.length < 64) hs.length.toLong
        else math.floor(63.0 * 1152921504606846976.0 / hs(63)).toLong
      assert(est == expected, s"$lang est $est != $expected")
    }
    // a corpus whose groups are all smaller than k takes the exact path
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_x12_").toString
    Seq((1L, "a b c d e", "xx", "s", 9L), (2L, "c d e f g", "xx", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val small = Catalog.byName("x12_kmv_distinct").fn(spark, dir).collect()
    assert(small.length == 1 && small.head.getLong(1) == small.head.getLong(2),
      "sub-k group must report exact == est")
    assert(small.head.getDouble(3) == 0.0)
  }

  // ------------------------------------------------------------- e7

  test("e7: stream-stream join emits exactly the batch interval join") {
    import org.apache.spark.sql.functions._
    val got = Catalog.byName("e7_stream_join").fn(spark, sfDir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val evRaw = spark.read.parquet(s"$sfDir/events.parquet")
    val ev = evRaw
      .withColumn("ts", graft.sources.Records.tsToTimestamp(evRaw.schema("ts").dataType))
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("tsus"))
    val batch = ev.filter(col("event_type") === "purchase").as("p")
      .join(ev.filter(col("event_type") === "view").as("v"), expr(
        "p.user_id = v.user_id AND p.tsus >= v.tsus AND " +
          "p.tsus <= v.tsus + 7200000000"))
      .select(col("p.event_id"), col("v.event_id"),
        expr("(p.tsus - v.tsus) div 1000000"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got === batch)
  }

  // ------------------------------------------------------------- x6

  test("x6: repetition fractions are in [0,1] and dup_word_frac is exact") {
    val rows = Catalog.byName("x6_repetition").fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq(2, 3, 4).foreach { i =>
        val v = r.getDouble(i)
        assert(v >= 0.0 && v <= 1.0, s"doc ${r.getLong(0)}: col $i = $v")
      }
    }
    // independent recompute of dup_word_frac for one known doc
    val doc = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect().head
    val toks = doc.getString(1).split(" ").filter(_.nonEmpty)
    val expected = BigDecimal((toks.length - toks.distinct.length).toDouble /
      toks.length).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = rows.find(_.getLong(0) == doc.getLong(0)).get.getDouble(2)
    assert(math.abs(got - expected) < 1e-9)
  }

  // ------------------------------------------------------------- e10

  test("e10: attribution matches a local per-user carry replay") {
    val got = Catalog.byName("e10_last_touch").fn(spark, sfDir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    val events = graft.sources.Records.table(spark, sfDir, "events")
      .selectExpr("user_id", "event_id", "event_type",
        "unix_timestamp(ts) as epoch")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // replay: walk each user's events in (ts, event_id) order carrying
    // the last click; attribute purchases within the 7-day lookback
    val expected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Option[Long], Option[Long])]
    events.groupBy(_._1).foreach { case (_, es) =>
      var lastClick: Option[(Long, Long)] = None // (event_id, epoch)
      es.sortBy(e => (e._4, e._2)).foreach { case (_, id, tpe, ep) =>
        if (tpe == "click") lastClick = Some((id, ep))
        else if (tpe == "purchase") {
          val hit = lastClick.filter { case (_, cep) => ep - cep <= 604800L }
          expected += ((id, hit.map(_._1), hit.map(ep - _._2)))
        }
      }
    }
    assert(got == expected.sortBy(_._1).toSeq)
    assert(got.exists(_._2.isDefined) && got.exists(_._2.isEmpty),
      "fixture should exercise both attributed and unattributed purchases")
    // the bucketed twin must be row-identical (same oracle SQL gates
    // both; this pins it directly, including cross-bucket carries)
    val gotB = Catalog.byName("e10b_last_touch_bucketed").fn(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(gotB == got, "e10b diverged from e10")
  }

  // ------------------------------------------------------------- d15

  test("d15: boilerplate set and per-doc removal match a local rebuild") {
    val rows = Catalog.byName("d15_boilerplate_removal").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def chunksOf(t: String): Seq[String] =
      t.split(" ").filter(_.nonEmpty).grouped(3).map(_.mkString(" ")).toSeq
    val df = scala.collection.mutable.Map.empty[String, Set[Long]]
    texts.foreach { case (id, t) =>
      chunksOf(t).foreach(c => df(c) = df.getOrElse(c, Set.empty) + id) }
    val boiler = df.collect { case (c, ids) if ids.size >= 5 => c }.toSet
    assert(boiler.nonEmpty, "fixture should contain boilerplate passages")
    rows.foreach { case (id, nChunks, nKept, keptText) =>
      val cs = chunksOf(texts(id))
      assert(nChunks == cs.length.toLong, s"doc $id chunk count")
      val kept = cs.filterNot(boiler.contains)
      assert(nKept == kept.length.toLong, s"doc $id kept count")
      assert(keptText == kept.mkString(" "), s"doc $id kept text")
    }
    assert(rows.exists(r => r._3 < r._2),
      "fixture should have docs that lose passages")
  }

  // ------------------------------------------------------------- p12

  test("p12: training order is reproducible and independent of layout") {
    val a = Catalog.byName("p12_training_order").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // per-shard positions are contiguous from 1
    a.groupBy(_._2).foreach { case (sh, rs) =>
      assert(rs.map(_._3).sorted == (1L to rs.length.toLong),
        s"shard $sh positions not contiguous") }
    // every doc appears exactly once (a permutation, not a sample)
    assert(a.map(_._1).distinct.length == a.length)
    // layout independence: the same order under a different shuffle width
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      val b = Catalog.byName("p12_training_order").fn(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(a == b, "order changed with cluster layout")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
