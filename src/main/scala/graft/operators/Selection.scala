package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Budget-bounded corpus selection as an engine capability — the
 * library surface behind catalog entry p13 (token-budget selection),
 * promoted like [[Packing]] / [[Sessionization]]: "rank by quality,
 * take until the token budget is spent", the standard final step of
 * training-set construction.
 *
 * Scale shape (the p13 design the round-14 verdict graded): the naive
 * formulation is a running sum over the GLOBALLY SORTED corpus — an
 * unpartitioned corpus-sized window that serializes through one task
 * (exactly what PlanShapeSpec forbids). [[selectByTokenBudget]] never
 * sorts the corpus: token totals aggregate per rank VALUE (bounded by
 * the rank domain, ≤ 1e6+1 for micro-unit ratios — the unpartitioned
 * prefix-sum window is AGGREGATE-bounded, the sanctioned q20 shape),
 * the budget boundary picks ≤ 1 rank value, fully-kept values join
 * back broadcast, and only the docs AT the boundary value pay a keyed
 * running-sum window (boundary-group-sized). The 100 TB plan: scan +
 * one narrow agg exchange + broadcast joins.
 */
object Selection {

  /** Per-document vocabulary-richness quality in pure integer
    * micro-units: 1e6 · distinct / total tokens, integer division — no
    * FP anywhere, so any engine agrees bit-for-bit including ties.
    * Input needs (idCol, `text`); output (idCol, carryCols…, n_tok,
    * quality_micro). `carryCols` pass through the row-wise select
    * chain unchanged — domain-keyed callers (p16) carry `source` here
    * for FREE instead of re-attaching it with a corpus-sized self-join
    * on the id. Callers materialize the result before reuse (the x16
    * pattern). */
  def vocabRichnessMicro(docs: DataFrame, idCol: String = "doc_id",
      tokensExpr: String = TextAnalysis.tokensExpr,
      carryCols: Seq[String] = Nil): DataFrame = {
    // the chain defines these internally — a carry column named after
    // one would emit a duplicate and fail downstream with an
    // AMBIGUOUS_REFERENCE far from the cause. Compared lower-cased in
    // Locale.ROOT: Spark resolution is case-insensitive by default
    // (and locale-independent — a Turkish-locale toLowerCase maps I to
    // dotless ı and would silently miss the collision)
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    val reserved =
      Set("ts", "n_tok", "n_distinct", "quality_micro", lc(idCol))
    val clash = carryCols.filter(c => reserved(lc(c)))
    require(clash.isEmpty,
      s"carryCols ${clash.mkString(", ")} collide with the metric " +
        s"chain's own columns (${reserved.mkString(", ")})")
    require(carryCols.map(lc).distinct.size == carryCols.size,
      s"duplicate carryCols: ${carryCols.mkString(", ")}")
    val carry = carryCols.map(col)
    docs
      .select(col(idCol) +: carry :+ expr(tokensExpr).as("ts"): _*)
      .select(col(idCol) +: carry ++: Seq(
        size(col("ts")).cast("long").as("n_tok"),
        expr("size(array_distinct(ts))").cast("long").as("n_distinct")): _*)
      .select(col(idCol) +: carry ++: Seq(col("n_tok"),
        when(col("n_tok") === 0L, 0L)
          .otherwise(expr("1000000L * n_distinct div n_tok"))
          .cast("long").as("quality_micro")): _*)
  }

  /** A 1-row budget relation: `num/den` of the corpus's total tokens
    * (integer arithmetic), as column `b`. */
  def tokenBudgetFraction(m: DataFrame, num: Long, den: Long,
      tokensCol: String = "n_tok"): DataFrame =
    m.agg(expr(s"sum(${SqlLit.quoteName(tokensCol)}) * $num div $den")
      .cast("long").as("b"))

  /** Keep documents in exact (`rankCol` DESC, `idCol`) order until the
    * inclusive running `tokensCol` sum exceeds `budget` (a 1-row
    * relation with column `b`, e.g. [[tokenBudgetFraction]]).
    * `tokensCol` is whatever the caller measures — to budget on REAL
    * tokenizer counts instead of whitespace counts, feed the metric
    * relation through [[Bpe.tokenCountsViaVocab]] and select
    * `n_bpe_tokens` as the tokens column (the p6c pattern; one
    * doc-keyed join against this relation's idCol). Output
    * (idCol, rankCol, tokensCol) sorted in selection order — identical
    * to the global-running-sum formulation, computed without ever
    * sorting the corpus (see the object Scaladoc). */
  def selectByTokenBudget(m: DataFrame, budget: DataFrame,
      rankCol: String = "quality_micro", idCol: String = "doc_id",
      tokensCol: String = "n_tok"): DataFrame = {
    val qmeta = m.groupBy(rankCol)
      .agg(sum(tokensCol).as("q_tok"))
      .withColumn("cum_excl", coalesce(
        sum("q_tok").over(Window.orderBy(col(rankCol).desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(budget))
    val fullQ = qmeta
      .filter(col("cum_excl") + col("q_tok") <= col("b"))
      .select(col(rankCol))
    // <=, not <: a rank value starting EXACTLY at the budget still
    // keeps its zero-token prefix under the inclusive running-sum
    // semantics (cum == b is kept) — SelectionProps found the strict
    // form dropping a zero-token doc at a boundary-exact budget
    val boundaryQ = qmeta
      .filter(col("cum_excl") <= col("b") &&
        col("cum_excl") + col("q_tok") > col("b"))
      .select(col(rankCol), col("cum_excl"), col("b"))
    val kept = m.join(broadcast(fullQ), Seq(rankCol))
      .select(col(idCol), col(rankCol), col(tokensCol))
      .unionAll(
        m.join(broadcast(boundaryQ), Seq(rankCol))
          .withColumn("run", sum(tokensCol).over(
            Window.partitionBy(rankCol).orderBy(idCol)))
          .filter(col("cum_excl") + col("run") <= col("b"))
          .select(col(idCol), col(rankCol), col(tokensCol)))
    kept.orderBy(col(rankCol).desc, col(idCol))
  }

  /** Per-domain token budgets from target mixture weights — the
    * budget relation [[selectByDomainBudget]] consumes. `weightsMicro`
    * is (domainCol, w_micro): the domain's target share of the WHOLE
    * corpus's tokens in integer micro-units (1e6 = everything).
    * b_domain = corpus_total · w_micro div 1e6, pure integer
    * arithmetic. Weights need not sum to 1e6 (a mix is a set of
    * per-domain targets, not a partition), and a weight larger than
    * the domain's natural share simply leaves its budget slack — the
    * selection then keeps the whole domain, which is how up-weighted
    * mixes behave when the corpus runs out of a domain's tokens. */
  def domainBudgets(m: DataFrame, weightsMicro: DataFrame,
      domainCol: String = "source",
      tokensCol: String = "n_tok"): DataFrame =
    weightsMicro.crossJoin(broadcast(
        m.agg(sum(tokensCol).cast("long").as("__tot"))))
      // NOT `__tot * w_micro div 1e6`: at the brief's scale the raw
      // product overflows Long (1.85e13 corpus tokens × the p16b
      // 500000 weight > 2^63 — ANSI throws, non-ANSI wraps to a
      // NEGATIVE budget that silently drops the most up-weighted
      // domain). Decompose __tot = q·1e6 + r: the value is exactly
      // q·w + (r·w div 1e6), and each term is overflow-safe whenever
      // the BUDGET itself fits a Long (q·w ≤ the budget + w;
      // r·w < 1e6·w) — a budget past 2^63 tokens has no
      // representable meaning anyway, and ANSI still fails it loudly.
      .select(col(domainCol),
        expr("__tot div 1000000 * w_micro + " +
          "(__tot % 1000000) * w_micro div 1000000")
          .cast("long").as("b"))

  /** [[selectByTokenBudget]] applied independently per domain — the
    * data-mixing step of training-set construction ("sample each
    * source to its target weight"): within every domain, keep
    * documents in exact (`rankCol` DESC, `idCol`) order until the
    * inclusive running `tokensCol` sum exceeds that domain's budget.
    * `budgets` is (domainCol, b), e.g. [[domainBudgets]]; domains
    * absent from it are dropped (a mix names its sources).
    *
    * Scale shape — the p13 design, keyed by domain: token totals
    * aggregate per (domain, rank) VALUE, so the prefix-sum window is
    * PARTITIONED by domain (parallel across domains, each partition
    * aggregate-bounded by the rank domain — strictly better than
    * p13's sanctioned unpartitioned form). The budget boundary picks
    * ≤ 1 rank value per domain (broadcast — domain-count-sized);
    * fully-kept (domain, rank) pairs join back WITHOUT a hint: their
    * count is domains × rank values, so the runtime (AQE) decides
    * broadcast vs shuffle from the real size — the x10 discipline,
    * not a forced hint that would ship a multi-domain rank table past
    * the broadcast ceiling. Only docs at each domain's boundary rank
    * pay a keyed running-sum window (boundary-group-sized). The
    * 100 TB plan: scan + one narrow (domain, rank) agg exchange +
    * size-decided joins — the corpus is never globally sorted.
    *
    * Output (domainCol, idCol, rankCol, tokensCol) in selection order
    * per domain. */
  def selectByDomainBudget(m: DataFrame, budgets: DataFrame,
      domainCol: String = "source", rankCol: String = "quality_micro",
      idCol: String = "doc_id", tokensCol: String = "n_tok"): DataFrame = {
    val qmeta = m.groupBy(domainCol, rankCol)
      .agg(sum(tokensCol).as("q_tok"))
      .withColumn("cum_excl", coalesce(
        sum("q_tok").over(Window.partitionBy(domainCol)
          .orderBy(col(rankCol).desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(broadcast(budgets), Seq(domainCol))
    val fullQ = qmeta
      .filter(col("cum_excl") + col("q_tok") <= col("b"))
      .select(col(domainCol), col(rankCol))
    // <= (inclusive) at the full-value gate and the boundary filter —
    // the same boundary-exact semantics SelectionProps pinned for p13
    val boundaryQ = qmeta
      .filter(col("cum_excl") <= col("b") &&
        col("cum_excl") + col("q_tok") > col("b"))
      .select(col(domainCol), col(rankCol), col("cum_excl"), col("b"))
    val kept = m.join(fullQ, Seq(domainCol, rankCol))
      .select(col(domainCol), col(idCol), col(rankCol), col(tokensCol))
      .unionAll(
        m.join(broadcast(boundaryQ), Seq(domainCol, rankCol))
          .withColumn("run", sum(tokensCol).over(
            Window.partitionBy(domainCol, rankCol).orderBy(idCol)))
          .filter(col("cum_excl") + col("run") <= col("b"))
          .select(col(domainCol), col(idCol), col(rankCol),
            col(tokensCol)))
    kept.orderBy(col(domainCol), col(rankCol).desc, col(idCol))
  }

  /** [[selectByDomainBudget]] with REPETITION — how real mixes spend a
    * budget LARGER than a domain's token count: repeat the domain.
    * Each domain runs at most `maxEpochs` passes, the last possibly
    * partial: `full = min(b div tok_domain, maxEpochs)` complete
    * passes (every doc, epochs 1..full), then — only when the cap
    * isn't hit — the REMAINDER budget `b − full·tok` buys a
    * best-quality-first partial pass (epoch full+1) with exactly
    * [[selectByDomainBudget]]'s inclusive running-sum semantics. The
    * cap bounds output at `maxEpochs × |corpus|` rows (repetition past
    * ~4 epochs has sharply diminishing returns for LM training — the
    * data-constrained scaling result — so uncapped repetition is never
    * what a pipeline wants); a zero-token domain gets no full passes
    * and its zero-token docs ride the partial pass once.
    *
    * Scale shape: the per-domain (tok, full, remainder) table is
    * domain-count-sized (broadcast); full passes are ONE corpus join +
    * an in-row `sequence` explode (filtered to full ≥ 1 — Spark's
    * `sequence(1, 0)` infers a DESCENDING step and would emit [1, 0]);
    * the partial pass is [[selectByDomainBudget]] on the remainder
    * budgets. No global sort, no corpus shuffle beyond the p16 shape.
    *
    * Output (domainCol, idCol, epoch, rankCol, tokensCol) ordered by
    * (domain, epoch, rank DESC, id). */
  def domainMixWithRepetition(m: DataFrame, budgets: DataFrame,
      maxEpochs: Int = 4,
      domainCol: String = "source", rankCol: String = "quality_micro",
      idCol: String = "doc_id", tokensCol: String = "n_tok"): DataFrame = {
    require(maxEpochs >= 1, "maxEpochs must be at least 1")
    // materialized ONCE (session-temp, the x14/p14 pattern): dom is
    // referenced by the full-pass join, the remainder budgets, and
    // the epoch-number join — unmaterialized, each reference would
    // re-run the corpus-wide aggregation (and selectByDomainBudget
    // evaluates its budget subtree twice more)
    val domQ = m.groupBy(domainCol)
      .agg(sum(tokensCol).cast("long").as("__tok"))
      .join(broadcast(budgets), Seq(domainCol))
      // ANSI mode: `div` by a zero-token domain would throw, so the
      // zero case is decided before the division
      .withColumn("__full",
        when(col("__tok") > 0L,
          least(expr("b div __tok"), lit(maxEpochs.toLong)))
        .otherwise(0L))
      .withColumn("__rem",
        when(col("__full") < maxEpochs,
          col("b") - col("__full") * col("__tok")).otherwise(0L))
    val tmp = graft.SessionTemp.dir("graft_mix_dom_")
    domQ.write.mode("overwrite").parquet(tmp)
    val dom = m.sparkSession.read.parquet(tmp)
    val fullPasses = m
      .join(broadcast(dom.filter(col("__full") >= 1L)
        .select(col(domainCol), col("__full"))), Seq(domainCol))
      .select(col(domainCol), col(idCol),
        explode(expr("sequence(1L, __full)")).as("epoch"),
        col(rankCol), col(tokensCol))
    val fracBudgets = dom.filter(col("__full") < maxEpochs)
      .select(col(domainCol), col("__rem").as("b"),
        (col("__full") + 1L).as("__ep"))
    val fractional = selectByDomainBudget(m,
        fracBudgets.select(col(domainCol), col("b")),
        domainCol, rankCol, idCol, tokensCol)
      .join(broadcast(fracBudgets.select(col(domainCol), col("__ep"))),
        Seq(domainCol))
      .select(col(domainCol), col(idCol), col("__ep").as("epoch"),
        col(rankCol), col(tokensCol))
    fullPasses.unionAll(fractional)
      .orderBy(col(domainCol), col("epoch"), col(rankCol).desc,
        col(idCol))
  }
}
