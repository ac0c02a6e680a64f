package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The curation FUNNEL as an engine capability — the stage-list builder
 * behind catalog entries p15 (dedup → decontaminate → select), p18
 * (dedup → decontaminate → DSIR → resample) and p19 (dedup →
 * decontaminate → domain mix): a production training-set build is a
 * short pipeline of the library's own operators, and composing them
 * should be a library call, not a catalog idiom re-typed per entry
 * (the Sessionization/Packing promotion discipline).
 *
 * A [[Stage]] is a named relational transform. [[funnel]] folds the
 * corpus through the stages in order; a stage marked `materialize`
 * writes its output ONCE to a session-temp parquet and hands the
 * re-read relation to the next stage — the p15/p18 policy for the
 * point in the funnel where one narrow relation feeds multiple
 * downstream consumers (a metric table read by both the budget
 * aggregate and the selection join, a clean pool feeding both the
 * DSIR fit and the scoring scan): without it, Catalyst re-runs the
 * whole upstream funnel per consumer. Everything stays declarative
 * otherwise — no action is taken for un-materialized stages, so the
 * optimizer sees the fused chain.
 *
 * Scale shape is inherited from the member operators (hash semi/anti
 * joins, bucket-bounded fits, keyed windows — never a global sort or
 * an all-pairs step); the funnel adds no shuffle of its own.
 */
object Curation {

  /** One funnel stage: `transform` the corpus, optionally materialize
    * the result (session-temp parquet, read back once).
    *
    * `inputReadOnce` declares that `transform` references its input
    * relation exactly ONCE in the plan it returns (a single linear
    * chain — no self-join, no aggregate-plus-join fan-out back to the
    * input). [[funnelWithReport]] uses it to skip materializing the
    * PRECEDING stage's output: an observe node is exact iff its subtree
    * executes exactly once, so a single-reader consumer can carry its
    * input's observe inside its own plan for free, while a multi-branch
    * consumer (the default, `false` — the safe claim) needs the
    * boundary materialized first. Purely a physical hint: stage
    * semantics and [[funnel]] are unaffected. */
  final case class Stage(name: String, transform: DataFrame => DataFrame,
      materialize: Boolean = false, inputReadOnce: Boolean = false) {
    // ASCII-explicit (not isLetterOrDigit, which is Unicode-wide and
    // would admit names the documented contract excludes)
    require(name.nonEmpty && name.forall(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_' || c == '-'),
      s"stage name '$name' must be [A-Za-z0-9_-]+ (it names a temp dir)")
  }

  /** Ad-hoc stage sugar. */
  def stage(name: String)(f: DataFrame => DataFrame): Stage =
    Stage(name, f)

  /** Ad-hoc materialized stage sugar. */
  def materialized(name: String)(f: DataFrame => DataFrame): Stage =
    Stage(name, f, materialize = true)

  /** Keep-first exact dedup ([[Dedup.exactDuplicates]] keeper set,
    * applied as a semi join — one hash aggregation, one hash join).
    * Input needs (doc_id, `textCol`), like the member operator. */
  def exactDedup(textCol: String = "text"): Stage =
    Stage("exact_dedup", { d =>
      d.join(Dedup.exactDuplicates(d, textCol)
          .select(col("keeper_doc_id").as("doc_id")),
        Seq("doc_id"), "left_semi")
    })

  /** Keep-first exact dedup against an EXTERNALLY-maintained keeper
    * set (`keepers(keeper_doc_id)` — e.g.
    * [[graft.streaming.IncrementalDedup.kept]]'s durable index): the
    * streaming twin of [[exactDedup]], for funnels over an ARRIVING
    * corpus where the keeper set is maintained incrementally instead
    * of recomputed per run. Same physical shape — one hash semi
    * join. */
  def exactDedupKept(keepers: DataFrame): Stage =
    Stage("exact_dedup_kept", { d =>
      d.join(keepers.select(col("keeper_doc_id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_semi")
    }, inputReadOnce = true) // one semi join; keepers is external

  /** Eval-set decontamination: drop the eval slice itself AND every
    * remaining doc sharing an exact `n`-gram hash with it
    * ([[Decontamination.ngramHashes]] → [[Decontamination.flagExact]]
    * — distinct-hash semi join, then an anti join back; the corpus is
    * scanned once for grams). `evalPred` selects the eval slice; it is
    * applied to BOTH the corpus and the gram relation, so express it
    * over `doc_id` (the one column the grams carry — e.g.
    * `pmod(col("doc_id"), lit(97)) === 0`). */
  def decontaminate(evalPred: Column, n: Int = 4): Stage =
    Stage("decontaminate", { d =>
      val grams = Decontamination.ngramHashes(d, n)
      val evalG = grams.filter(evalPred)
        .select(col("doc_id").as("eval_id"), col("gh")).distinct()
      val flagged = Decontamination
        .flagExact(grams.filter(!evalPred), evalG)
        .select(col("doc_id"))
      d.filter(!evalPred).join(flagged, Seq("doc_id"), "left_anti")
    })

  /** The narrow per-doc metric relation
    * ([[Selection.vocabRichnessMicro]]), MATERIALIZED — downstream
    * selection reads it at least twice (budget aggregate + selection),
    * and it is integers-per-doc, not the corpus. */
  def qualityMetric(carryCols: Seq[String] = Seq.empty,
      idCol: String = "doc_id"): Stage =
    Stage("metric",
      d => Selection.vocabRichnessMicro(d, idCol, carryCols = carryCols),
      materialize = true,
      inputReadOnce = true) // one linear select chain over the input

  /** Best-quality-first selection to a `num/den` fraction of the
    * pool's tokens ([[Selection.selectByTokenBudget]] over
    * [[Selection.tokenBudgetFraction]]). Expects the metric relation
    * (use after [[qualityMetric]]). */
  def selectTokenBudget(num: Long, den: Long): Stage =
    Stage("select_budget", m =>
      Selection.selectByTokenBudget(m,
        Selection.tokenBudgetFraction(m, num, den)))

  /** Domain-mix selection to per-source token budgets
    * ([[Selection.selectByDomainBudget]] over
    * [[Selection.domainBudgets]]): `weightsMicro(source, w_micro)` are
    * target corpus shares in micro units. Expects the metric relation
    * with `source` carried (use after `qualityMetric(Seq("source"))`). */
  def domainMix(weightsMicro: DataFrame): Stage =
    Stage("domain_mix", m =>
      Selection.selectByDomainBudget(m,
        Selection.domainBudgets(m, weightsMicro)))

  /** Domain mix WITH repetition ([[Selection.domainMixWithRepetition]]
    * over [[Selection.domainBudgets]]): budgets larger than a domain
    * holds repeat the domain, at most `maxEpochs` passes, the last
    * partial — the data-constrained-scaling mix shape. Expects the
    * metric relation with `source` carried. */
  def domainMixEpochs(weightsMicro: DataFrame, maxEpochs: Int = 4): Stage =
    Stage("domain_mix_epochs", m =>
      Selection.domainMixWithRepetition(m,
        Selection.domainBudgets(m, weightsMicro), maxEpochs))

  /** DSIR importance resampling of the pool against a target seed set
    * ([[Dsir.importanceLogRatios]] → [[Dsir.importanceWeights]] →
    * [[Dsir.gumbelResample]]): fit on the pool it receives — the
    * method's contract is to score the docs one could actually train
    * on, so place this AFTER dedup/decontamination stages. Output:
    * (idCol, logw, g), the resample. */
  def dsirResample(target: DataFrame, k: Int, buckets: Int = 4096,
      idCol: String = "doc_id"): Stage =
    Stage("dsir_resample", { pool =>
      val lr = Dsir.importanceLogRatios(target, pool, buckets,
        idCol = idCol)
      Dsir.gumbelResample(
        Dsir.importanceWeights(pool, lr, idCol)
          .select(col(idCol), col("logw")),
        k, idCol = idCol)
    })

  /** Fold the corpus through the stages in order. Materialized stages
    * write once to [[graft.SessionTemp]] (cleaned at session end) and
    * re-read; everything else stays one declarative plan. */
  def funnel(corpus: DataFrame, stages: Seq[Stage]): DataFrame =
    stages.foldLeft(corpus) { (df, st) =>
      val out = st.transform(df)
      if (!st.materialize) out
      else {
        val tmp = graft.SessionTemp.dir(s"graft_cur_${st.name}_")
        out.write.mode("overwrite").parquet(tmp)
        df.sparkSession.read.parquet(tmp)
      }
    }

  /** [[funnel]] with a VERIFIED audit trail: every stage boundary gets
    * an `observe()` counter (rows out + whitespace tokens out — free
    * aggregates riding the stage's own execution, no extra pass), and
    * the report comes back as a small relation
    * (stage_idx, stage, rows_out, tokens_out) with stage 0 = the
    * input corpus. An observe node is exact iff its subtree executes
    * exactly once, so a boundary is materialized only where that is
    * not already true ([[materializeBoundary]]): a stage consumed by a
    * multi-branch successor (decontaminate's gram and corpus sides)
    * would execute its observe node once per branch — materialization
    * makes the write the single consumer — while a single-reader
    * successor (`inputReadOnce`) carries the observe inside its own
    * plan, so that boundary costs NOTHING over the plain funnel (no
    * extra scan, write, or exchange — at 100 TB a skipped boundary is
    * a full corpus write+read avoided). The final stage and
    * `materialize`-flagged stages still land in session-temp parquet
    * (the report needs every metric observed before it is built, and
    * the funnel's own multi-consumer policy is unchanged). CurationSpec
    * pins the audit form result- and report-identical to the
    * all-materialized form. Returns (result, report). */
  /** Whether [[funnelWithReport]] must land stage `i`'s output in
    * session-temp parquet: yes for the LAST stage (every observe has
    * to have fired before the report is assembled, and the returned
    * result must not re-run the funnel per consumer), for stages whose
    * output the funnel's own policy multi-consumes (`materialize`),
    * and for stages whose SUCCESSOR reads its input through more than
    * one plan branch (the observe node would execute per branch).
    * A single-reader successor (`inputReadOnce`) makes the boundary
    * free — the observe rides the successor's execution. */
  private[operators] def materializeBoundary(stages: Seq[Stage],
      i: Int): Boolean =
    i == stages.size - 1 || stages(i).materialize ||
      !stages(i + 1).inputReadOnce

  /** @param materializeResult when false, the FINAL stage's observe
    *   fires on a noop pass instead of a session-temp parquet landing —
    *   for report-only callers (p22 discards the result) this removes
    *   the result-sized write+read entirely; the returned result is the
    *   declarative plan over the last materialized boundary, so a
    *   caller that DOES consume it simply re-runs the final stage once
    *   (its observe re-fires with identical values, after the report
    *   was already assembled — harmless). */
  def funnelWithReport(corpus: DataFrame,
      stages: Seq[Stage],
      materializeResult: Boolean = true): (DataFrame, DataFrame) = {
    val s = corpus.sparkSession
    val prefix = "graft_obs_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12) + "_"
    val acc =
      new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (n, row) =>
          if (n.startsWith(prefix))
            acc.put(n, (row.getLong(0), row.getLong(1)))
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    def observed(df: DataFrame, i: Int, name: String): DataFrame = {
      // tokens: whitespace tokens where the stage still carries text;
      // the metric/mix stages carry the already-counted n_tok
      val tokens =
        if (df.columns.contains("text"))
          sum(size(filter(split(coalesce(col("text"), lit("")), " "),
            t => t =!= "")).cast("long"))
        else if (df.columns.contains("n_tok")) sum(col("n_tok"))
        else sum(lit(0L))
      df.observe(s"$prefix${i}_$name",
        count(lit(1)).as("rows_out"),
        coalesce(tokens, lit(0L)).cast("long").as("tokens_out"))
    }
    s.listenerManager.register(listener)
    try {
      // the input boundary follows the same single-reader rule as any
      // other: a single-reader first stage carries the input observe in
      // its own plan; a multi-branch first stage (exactDedup reads its
      // input for both the keeper aggregate and the semi join) would
      // execute it once per branch, so the metrics ride a dedicated
      // noop pass instead — as does an EMPTY stage list, where no
      // successor exists to carry the input observe at all
      var cur = observed(corpus, 0, "input")
      if (stages.isEmpty || !stages.head.inputReadOnce) {
        cur.write.format("noop").mode("overwrite").save()
        cur = corpus
      }
      for ((st, i) <- stages.zipWithIndex) {
        val out = observed(st.transform(cur), i + 1, st.name)
        cur =
          if (!materializeBoundary(stages, i)) out
          else if (i == stages.size - 1 && !materializeResult &&
              !stages(i).materialize) {
            // report-only mode: the final observe fires on a noop pass;
            // nothing result-sized lands on disk
            out.write.format("noop").mode("overwrite").save()
            out
          } else {
            val tmp = graft.SessionTemp.dir(s"graft_obs_${st.name}_")
            out.write.mode("overwrite").parquet(tmp)
            s.read.parquet(tmp)
          }
      }
      // observed metrics arrive on an ASYNC listener bus — bounded wait
      val names = ("input" +: stages.map(_.name)).zipWithIndex
        .map { case (n, i) => s"$prefix${i}_$n" }
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!names.forall(acc.containsKey) && System.nanoTime() < deadline)
        Thread.sleep(20)
      require(names.forall(acc.containsKey),
        s"observed ${acc.size}/${names.size} stage metrics within 30s")
      import s.implicits._
      val report = ("input" +: stages.map(_.name)).zipWithIndex
        .map { case (n, i) =>
          val (r, t) = acc.get(s"$prefix${i}_$n")
          (i.toLong, n, r, t)
        }.toDF("stage_idx", "stage", "rows_out", "tokens_out")
      (cur, report)
    } finally s.listenerManager.unregister(listener)
  }
}
