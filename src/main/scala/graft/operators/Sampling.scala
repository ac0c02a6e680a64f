package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling and splitting as an engine capability — the
 * library surface behind catalog entries p1 (stratified balance), p5
 * (temperature sampling) and p7 (train/val/test split), promoted like
 * [[TemporalJoins]] / [[Retrieval]] / [[Dedup]] / [[Similarity]].
 *
 * Everything here is built on ONE primitive: a salted md5 hash of the
 * row id reduced to a unit interval in integer micro-units
 * ([[hashUnitMicro]]). That makes every sample REPRODUCIBLE — same
 * corpus ⇒ same sample on any cluster size, any partitioning, any
 * engine (the DuckDB oracles reproduce the gate bit-for-bit) — and
 * INCREMENTAL-SAFE: re-running after adding data never moves an
 * existing row in or out of the sample (hash-of-id, not row-number or
 * rand()). Keep decisions are codegen'd per-row filters against
 * broadcast thresholds; the only shuffle is the stratum count
 * aggregation. No global sort, no per-stratum rank window, at any
 * scale.
 *
 * Threshold arithmetic is passed in as an expression
 * ([[stratumThresholds]]' `thrOf`) rather than parameterized by a
 * generic `pow`: the gated entries' IEEE op ORDER is part of their
 * cross-engine contract (`floor(1e6·t/cnt)` and `floor(1e6·sqrt(t/n))`
 * are not the same double program as `floor(1e6·pow(t/n, p))`), so the
 * library preserves each caller's exact expression.
 */
object Sampling {

  /** Salted 60-bit md5 of `id` reduced mod `m` — THE engine-wide
    * deterministic per-id draw every sampler and gate derives from
    * (unit-micro draws, split buckets, priority uniforms, the DSIR
    * Gumbel uniform and fit gate). One definition so a change to the
    * hash width or salt convention lands everywhere at once. DuckDB:
    * `('0x'||substr(md5(salt||':'||CAST(id AS VARCHAR)),1,15))::BIGINT % m`. */
  def saltedHashMod(salt: String, id: Column, m: Long): Column =
    pmod(conv(substring(md5(concat(lit(salt + ":"), id.cast("string"))),
      1, 15), 16, 10).cast("long"), lit(m))

  /** Salted 60-bit md5 of `id`, reduced mod 1e6 — a deterministic
    * draw from [0, 1e6) unique to (salt, id). Spark side of the
    * engine-wide gate; DuckDB:
    * `('0x'||substr(md5(salt||':'||CAST(id AS VARCHAR)),1,15))::BIGINT % 1000000`. */
  def hashUnitMicro(salt: String, id: Column): Column =
    saltedHashMod(salt, id, 1000000L)

  /** Per-stratum keep thresholds: counts each stratum, finds the
    * smallest, and evaluates `thrOf(minCount, count)` per stratum —
    * returned as (stratum, cnt, thr) with thr in micro-units, sized to
    * broadcast (strata are languages/sources/domains, never rows). */
  def stratumThresholds(corpus: DataFrame, stratum: String,
      thrOf: (Column, Column) => Column): DataFrame = {
    val counts = corpus.groupBy(stratum).agg(count(lit(1)).as("cnt"))
    val tgt = counts.agg(min("cnt").as("t"))
    counts.crossJoin(broadcast(tgt))
      .select(col(stratum), col("cnt"),
        thrOf(col("t"), col("cnt")).cast("long").as("thr"))
  }

  /** Stratified sample: keep a row iff its salted hash draw clears its
    * stratum's threshold. Returns the kept rows of `corpus` (all
    * columns), with the decision a broadcast-join + per-row filter. */
  def sampleByStratum(corpus: DataFrame, stratum: String, idCol: String,
      salt: String, thrOf: (Column, Column) => Column): DataFrame =
    corpus.join(broadcast(
        stratumThresholds(corpus, stratum, thrOf).select(stratum, "thr")),
        Seq(stratum))
      .filter(hashUnitMicro(salt, col(idCol)) < col("thr"))

  /** Deterministic train/val/test label from a salted hash of the id:
    * bucket < trainPct → "train", < trainPct+valPct → "val", else
    * "test". Adding data never reassigns an existing id. */
  def splitLabel(id: Column, salt: String = "split",
      trainPct: Int = 90, valPct: Int = 5): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages ($trainPct/$valPct)")
    val bucket = saltedHashMod(salt, id, 100L)
    when(bucket < trainPct, lit("train"))
      .when(bucket < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** P10 — deterministic weighted sampling without replacement
    * (priority sampling, Duffield–Lund–Thorup): each row draws a
    * salted 32-bit uniform `u`, its priority is `u·2²⁰ div weight`
    * (exact integer arithmetic — no FP, so ranks agree bit-for-bit on
    * any engine), and the k smallest priorities win — heavier rows
    * draw smaller priorities proportionally. Physically a
    * TakeOrderedAndProject: per-partition partial top-k, never a
    * global sort. Output: the input columns plus `u` and `pri`,
    * sorted (pri, id). Rows with a non-positive (or null) weight are
    * dropped up front — a zero weight is an ANSI div-by-zero error and
    * a negative one has no priority-sampling meaning. */
  def prioritySample(d: DataFrame, k: Int, salt: String = "pri",
      idCol: String = "doc_id", weightCol: String = "w"): DataFrame = {
    require(k > 0, "k must be positive")
    val u = saltedHashMod(salt, col(idCol), 4294967296L)
    d.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("u", u)
      .withColumn("pri",
        expr(s"(u * 1048576) div ${SqlLit.quoteName(weightCol)}"))
      .orderBy(col("pri"), col(idCol))
      .limit(k)
  }

  /** P9 — mixture weights: given per-stratum masses (tokens, bytes,
    * docs — any additive unit in `massCol`), emit each stratum's
    * equal-share sampling weight `min(1, share/mass)` (downsample the
    * over-represented) and its implied epoch count `share/mass`
    * unclamped (>1 ⇒ the mix upsamples that stratum by repetition).
    * One 1-row broadcast total; divisions run long/long → IEEE double
    * left-to-right, identically on any engine. Appends (weight,
    * epochs) to the input relation, sorted by stratum. A zero-mass
    * stratum gets NULL weight/epochs (double x/0 is ±Inf, not an ANSI
    * error, and a silent weight=1.0 would read as "keep everything"). */
  def mixtureWeights(per: DataFrame, stratumCol: String = "source",
      massCol: String = "tokens"): DataFrame = {
    val tot = per.agg(sum(massCol).as("tt"), count(lit(1)).as("ns"))
    val share = col("tt") / col("ns") / col(massCol)
    // the when() must wrap the WHOLE weight: least() skips nulls, so
    // least(1.0, null-share) would silently resurrect weight = 1.0
    per.crossJoin(broadcast(tot))
      .withColumn("weight",
        when(col(massCol) > 0, round(least(lit(1.0), share), 4)))
      .withColumn("epochs", when(col(massCol) > 0, round(share, 4)))
      .drop("tt", "ns")
      .orderBy(stratumCol)
  }
}
