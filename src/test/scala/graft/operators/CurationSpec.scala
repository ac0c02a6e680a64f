package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Curation stage-list builder against hand-inlined chains: each
  * builder stage must equal the operator composition it names (the
  * catalog entries p15/p18/p19 gate the same compositions against
  * DuckDB; this spec pins the BUILDER itself, so a funnel refactor
  * cannot silently change stage semantics), and the materialization
  * policy must be behavior-invisible. */
class CurationSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** 30 docs: ids 0-9 duplicated as 100-109 (dedup pressure), every
    * 3rd doc the eval slice, two sources. */
  private def corpus = {
    val base = (0L until 20L).map { i =>
      (i, (0 until 6).map(j => s"w${(i + j) % 7}").mkString(" "),
        if (i % 2 == 0) "srcA" else "srcB")
    }
    val dups = (0L until 10L).map { i =>
      (100L + i, base(i.toInt)._2, "srcB")
    }
    (base ++ dups).toDF("doc_id", "text", "source")
  }

  private val evalPred = pmod(col("doc_id"), lit(3)) === 0

  test("exactDedup stage == keeper semi join; decontaminate == flag anti join") {
    val d = corpus
    val dd = Curation.funnel(d, Seq(Curation.exactDedup()))
    val wantDd = d.join(
      Dedup.exactDuplicates(d).select(col("keeper_doc_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    assert(dd.collect().map(_.toSeq).toSet ===
      wantDd.collect().map(_.toSeq).toSet)
    // every duplicated text keeps exactly its min id
    assert(dd.filter(col("doc_id") >= 100L).count() === 0L)

    val clean = Curation.funnel(dd, Seq(Curation.decontaminate(evalPred)))
    val grams = Decontamination.ngramHashes(dd, 4)
    val evalG = grams.filter(evalPred)
      .select(col("doc_id").as("eval_id"), col("gh")).distinct()
    val flagged = Decontamination
      .flagExact(grams.filter(!evalPred), evalG).select("doc_id")
    val wantClean = dd.filter(!evalPred)
      .join(flagged, Seq("doc_id"), "left_anti")
    assert(clean.collect().map(_.toSeq).toSet ===
      wantClean.collect().map(_.toSeq).toSet)
    // the eval slice is gone from the clean pool
    assert(clean.filter(evalPred).count() === 0L)
  }

  test("materialization is behavior-invisible; select stages == member operators") {
    val d = corpus
    val viaFunnel = Curation.funnel(d, Seq(
      Curation.exactDedup(),
      Curation.decontaminate(evalPred),
      Curation.qualityMetric(carryCols = Seq("source")),
      Curation.domainMix(Seq(("srcA", 300000L), ("srcB", 200000L))
        .toDF("source", "w_micro"))))
    // the same chain with NO materialized metric stage
    val inline = {
      val dd = Curation.funnel(d,
        Seq(Curation.exactDedup(), Curation.decontaminate(evalPred)))
      val m = Selection.vocabRichnessMicro(dd, carryCols = Seq("source"))
      Selection.selectByDomainBudget(m,
        Selection.domainBudgets(m,
          Seq(("srcA", 300000L), ("srcB", 200000L))
            .toDF("source", "w_micro")))
    }
    assert(viaFunnel.collect().map(_.toSeq).toSeq ===
      inline.collect().map(_.toSeq).toSeq)

    val viaBudget = Curation.funnel(d, Seq(
      Curation.exactDedup(),
      Curation.decontaminate(evalPred),
      Curation.qualityMetric(),
      Curation.selectTokenBudget(1, 2)))
    val inlineBudget = {
      val dd = Curation.funnel(d,
        Seq(Curation.exactDedup(), Curation.decontaminate(evalPred)))
      val m = Selection.vocabRichnessMicro(dd)
      Selection.selectByTokenBudget(m,
        Selection.tokenBudgetFraction(m, 1, 2))
    }
    assert(viaBudget.collect().map(_.toSeq).toSeq ===
      inlineBudget.collect().map(_.toSeq).toSeq)
  }

  test("dsirResample stage == the p17b chain over the funnel's pool") {
    val d = corpus
    val target = d.filter(col("source") === "srcA")
    val got = Curation.funnel(d, Seq(
      Curation.exactDedup(),
      Curation.materialized("fuzpool")(_
        .filter(col("source") =!= "srcA")
        .select(col("doc_id"), col("text"))),
      Curation.dsirResample(target, k = 5, buckets = 64)))
    val want = {
      val dd = Curation.funnel(d, Seq(Curation.exactDedup()))
      val pool = dd.filter(col("source") =!= "srcA")
        .select(col("doc_id"), col("text"))
      val lr = Dsir.importanceLogRatios(target, pool, 64)
      Dsir.gumbelResample(
        Dsir.importanceWeights(pool, lr)
          .select(col("doc_id"), col("logw")), 5)
    }
    assert(got.collect().map(_.toSeq).toSeq ===
      want.collect().map(_.toSeq).toSeq)
  }

  test("domain-mix over the CURATED pool: each domain slice == selectByTokenBudget on that slice") {
    // the SelectionProps slice property, re-pinned on a funnel-curated
    // metric (dedup + decontamination upstream) instead of a synthetic
    // table — the p19 shape
    val weights = Seq(("srcA", 400000L), ("srcB", 150000L))
      .toDF("source", "w_micro")
    val m = Curation.funnel(corpus, Seq(
      Curation.exactDedup(),
      Curation.decontaminate(evalPred),
      Curation.qualityMetric(carryCols = Seq("source"))))
    val budgets = Selection.domainBudgets(m, weights)
    val mixed = Selection.selectByDomainBudget(m, budgets)
    for (src <- Seq("srcA", "srcB")) {
      val b = budgets.filter(col("source") === src)
        .select(col("b")).limit(1)
      val slice = Selection.selectByTokenBudget(
          m.filter(col("source") === src), b)
        .collect().map(_.toSeq).toSeq
      val got = mixed.filter(col("source") === src)
        .select(col("doc_id"), col("quality_micro"), col("n_tok"))
        .collect().map(_.toSeq).toSeq
      assert(got === slice, s"domain $src diverges from its slice")
    }
  }

  test("funnelWithReport: result == funnel; the observed trail == direct per-stage counts") {
    val d = corpus
    val stages = Seq(
      Curation.exactDedup(),
      Curation.decontaminate(evalPred),
      Curation.qualityMetric(carryCols = Seq("source")))
    val (result, report) = Curation.funnelWithReport(d, stages)
    assert(result.collect().map(_.toSeq).toSet ===
      Curation.funnel(d, stages).collect().map(_.toSeq).toSet,
      "audit form changed the funnel's result")
    // recompute every stage boundary directly and compare the trail
    val toks = sum(size(filter(split(coalesce(col("text"), lit("")), " "),
      t => t =!= "")).cast("long"))
    def countsOf(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val agg =
        if (df.columns.contains("text")) df.agg(count(lit(1)), toks)
        else df.agg(count(lit(1)), sum(col("n_tok")))
      val r = agg.collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val expected = stages.inits.toSeq.reverse // prefixes: [], [s1], ...
      .map(prefix => countsOf(Curation.funnel(d, prefix)))
    val got = report.orderBy("stage_idx").collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected,
      s"observed trail $got != recomputed per-stage counts $expected")
    assert(report.orderBy("stage_idx").collect().map(_.getString(1)).toSeq
      === ("input" +: stages.map(_.name)))
  }

  test("audit materialization is selective and exact: single-reader boundaries ride free") {
    // boundary decisions: only multi-branch successors (and the last
    // stage / funnel-policy materializations) force a parquet landing
    val stages = Seq(
      Curation.exactDedup(),                                // multi-reader
      Curation.decontaminate(evalPred),                     // multi-reader
      Curation.qualityMetric(carryCols = Seq("source")),    // single-reader
      Curation.domainMix(Seq(("srcA", 300000L), ("srcB", 200000L))
        .toDF("source", "w_micro")))                        // multi-reader
    assert(Curation.materializeBoundary(stages, 0),
      "decontaminate multi-reads its input — boundary 0 must land")
    assert(!Curation.materializeBoundary(stages, 1),
      "qualityMetric single-reads its input — boundary 1 rides free")
    assert(Curation.materializeBoundary(stages, 2),
      "metric output is funnel-policy materialized")
    assert(Curation.materializeBoundary(stages, 3), "last stage lands")

    // the skipped boundary must not change the result or the trail:
    // compare against per-stage direct recomputation (the same oracle
    // as the main report test, now crossing a free boundary)
    val (result, report) = Curation.funnelWithReport(corpus, stages)
    assert(result.collect().map(_.toSeq).toSet ===
      Curation.funnel(corpus, stages).collect().map(_.toSeq).toSet)
    val toks = sum(size(filter(split(coalesce(col("text"), lit("")), " "),
      t => t =!= "")).cast("long"))
    def countsOf(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val agg =
        if (df.columns.contains("text")) df.agg(count(lit(1)), toks)
        else df.agg(count(lit(1)), sum(col("n_tok")))
      val r = agg.collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val expected = stages.inits.toSeq.reverse
      .map(prefix => countsOf(Curation.funnel(corpus, prefix)))
    val got = report.orderBy("stage_idx").collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("audit input boundary rides a single-reader first stage for free") {
    // first stage single-reader (exactDedupKept): the input observe
    // rides its plan — no dedicated noop pass — and the trail is exact
    val keepers = Dedup.exactDuplicates(corpus)
      .select(col("keeper_doc_id"))
    val stages = Seq(
      Curation.exactDedupKept(keepers),
      Curation.qualityMetric(carryCols = Seq("source")))
    assert(stages.head.inputReadOnce)
    val (result, report) = Curation.funnelWithReport(corpus, stages)
    assert(result.collect().map(_.toSeq).toSet ===
      Curation.funnel(corpus, stages).collect().map(_.toSeq).toSet)
    val rows = report.orderBy("stage_idx").collect()
    assert(rows.map(_.getString(1)).toSeq ===
      Seq("input", "exact_dedup_kept", "metric"))
    assert(rows(0).getLong(2) === corpus.count())
    assert(rows(1).getLong(2) ===
      Curation.funnel(corpus, Seq(stages.head)).count())
  }

  test("report-only audit (materializeResult=false): same report, same result") {
    val stages = Seq(
      Curation.exactDedup(),
      Curation.decontaminate(evalPred),
      Curation.qualityMetric(carryCols = Seq("source")),
      Curation.domainMix(Seq(("srcA", 300000L), ("srcB", 200000L))
        .toDF("source", "w_micro")))
    val (resM, repM) = Curation.funnelWithReport(corpus, stages)
    val (resN, repN) = Curation.funnelWithReport(corpus, stages,
      materializeResult = false)
    assert(repN.orderBy("stage_idx").collect().map(_.toSeq).toSeq ===
      repM.orderBy("stage_idx").collect().map(_.toSeq).toSeq,
      "report drifted between materialized and noop final boundaries")
    assert(resN.collect().map(_.toSeq).toSet ===
      resM.collect().map(_.toSeq).toSet,
      "re-derived result drifted from the materialized result")
  }

  test("empty stage list: input-only report, no 30s spin-wait") {
    // regression: the single-reader short-circuit was vacuously true on
    // Nil, so the input observe never executed and the report assembly
    // spun its full 30s deadline before throwing
    val t0 = System.nanoTime()
    val (res, rep) = Curation.funnelWithReport(corpus, Nil)
    val rows = rep.orderBy("stage_idx").collect()
    assert((System.nanoTime() - t0) / 1e9 < 25.0,
      "empty-stage report hit the observe deadline")
    assert(rows.length === 1)
    assert(rows(0).getString(1) === "input")
    assert(rows(0).getLong(2) === corpus.count())
    assert(res.count() === corpus.count())
  }

  test("stage names are validated (they name temp dirs)") {
    intercept[IllegalArgumentException] {
      Curation.Stage("../evil", identity)
    }
    intercept[IllegalArgumentException] {
      Curation.Stage("", identity)
    }
  }
}
