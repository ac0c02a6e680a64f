package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis signals as an engine capability — the library surface
 * behind catalog entries x1 (language-marker profile), x2 (quality
 * scoring), x3 (token statistics), x4/x5 (document fingerprints), x6
 * (repetition signals), x16 (Gopher-style repetition filter) and x17
 * (per-source distribution divergence), promoted like [[TemporalJoins]]
 * / [[Retrieval]] / [[Dedup]] / [[Similarity]] / [[Sampling]].
 *
 * Design rules shared by every function here:
 *   - PER-ROW, IN-SCAN: every per-document signal is a codegen'd
 *     projection over one corpus scan — no shuffle, no join, no window
 *     — so the operator pipelines inside the scan stage at 100 TB.
 *     The only exceptions are the two fingerprints (one map-side-
 *     combining aggregate over the token fan-out) and the divergence
 *     (one (source, token) aggregate ≪ corpus by Heaps' law).
 *   - CROSS-ENGINE DETERMINISM: ratios are rounded at fixed precision
 *     or floored to integer micro-units so the DuckDB oracles
 *     reproduce every value bit-for-bit; XOR / sum aggregates are
 *     order-free so partitioning never changes a result.
 *   - The tokenizer ([[tokensExpr]]) is the engine-wide whitespace
 *     contract (`filter(split(text,' '), t -> t != '')`); the DuckDB
 *     twin is `list_filter(string_split(text,' '), t -> t <> '')`.
 *
 * Reference anchor: the reference validates per-record transform
 * results by content (`uReplicator-Worker/.../WorkerInstanceTest.java`
 * count/content asserts); these signals are the data-quality analog a
 * training pipeline runs before mixing/sampling ([[Sampling]]).
 */
object TextAnalysis {

  /** Whitespace tokens, empties removed (codegen'd higher-order fn).
    * Evaluates the `text` column of the input relation. */
  val tokensExpr = "filter(split(text, ' '), t -> t != '')"

  /** md5 → 60-bit int (15 hex chars); DuckDB:
    * `('0x'||substr(md5(x),1,15))::BIGINT`. */
  private def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Let-bound token-count struct: `fields` are (name, exprOf(ts));
    * tokenization runs ONCE per row regardless of how many counts read
    * it. A bare `toks` column would be re-inlined per reference by
    * CollapseProject — the `transform(array(...), ts -> ...)` wrapper
    * is the stable let-binding. Returned as struct column `tc`. */
  def tokenCounts(d: DataFrame, fields: (String, String)*): DataFrame = {
    val body = fields.map { case (n, e) => s"${SqlLit.quote(n)}, $e" }.mkString(", ")
    d.withColumn("tc", expr(
      s"transform(array($tokensExpr), ts -> named_struct($body))[0]"))
  }

  /** X1 — language-marker profile: count each marker token, flag the
    * document `label` when the combined marker ratio clears
    * `threshold`. Input needs (doc_id, text); output one row per doc
    * with `n_tokens`, one `n_<marker>` per marker, `marker_ratio`
    * (6 dp) and `predicted`. Pure per-row projection. */
  def langProfile(d: DataFrame, markers: Seq[String] = Seq("the", "a"),
      threshold: Double = 0.05, label: String = "en-like",
      otherLabel: String = "other"): DataFrame = {
    require(markers.nonEmpty, "at least one marker token")
    // markers are quoted into the count expression and read back via
    // getField / backticked refs, so quote-, backslash-, dot- or
    // unicode-bearing marker tokens count correctly instead of breaking
    // the expression parse (SqlLitProps pins this on hostile tokens).
    val cnt = markers.map(m =>
      s"n_$m" -> s"size(filter(ts, t -> t = ${SqlLit.quote(m)}))")
    val names = "n_tokens" +: cnt.map(_._1)
    val base = names.foldLeft(
      tokenCounts(d, ("n_tokens" -> "size(ts)") +: cnt: _*)) { (df, n) =>
        df.withColumn(n, col("tc").getField(n).cast("long")) }
    def ref(n: String) = col(SqlLit.quoteName(n))
    val total = cnt.map { case (n, _) => ref(n) }
      .reduce((a, b) => a + b)
    base
      // zero-token guard: ANSI mode makes 0/0 an error, not NaN — an
      // empty doc profiles as null ratio → otherLabel (LibraryFuzzSpec)
      .withColumn("marker_ratio",
        when(col("n_tokens") > 0,
          round(total.cast("double") / col("n_tokens"), 6)))
      .withColumn("predicted",
        when(col("marker_ratio") >= threshold, label).otherwise(otherLabel))
      .select(col("doc_id") +: col("n_tokens") +:
        cnt.map { case (n, _) => ref(n) } :+
        col("marker_ratio") :+ col("predicted"): _*)
  }

  /** X2 — quality scoring: lexical diversity + stopword ratio, with a
    * three-way label (`too_short` below `minTokens`, `repetitive`
    * below `minDistinctRatio`, else `ok`). Per-row projection. */
  def qualityScore(d: DataFrame,
      stopwords: Seq[String] = Seq("the", "a", "of"),
      minTokens: Int = 20, minDistinctRatio: Double = 0.3): DataFrame = {
    require(stopwords.nonEmpty, "at least one stopword")
    val stopPred = stopwords.map(w => s"t = ${SqlLit.quote(w)}").mkString(" or ")
    val base = tokenCounts(d,
      "n_tokens" -> "size(ts)",
      "n_distinct" -> "size(array_distinct(ts))",
      "n_stop" -> s"size(filter(ts, t -> $stopPred))")
      .withColumn("n_tokens", col("tc.n_tokens").cast("long"))
      .withColumn("n_distinct", col("tc.n_distinct").cast("long"))
      .withColumn("n_stop", col("tc.n_stop").cast("long"))
    base
      // zero-token guard as in langProfile; an empty doc still labels
      // "too_short" via the count branch below
      .withColumn("distinct_ratio",
        when(col("n_tokens") > 0,
          round(col("n_distinct").cast("double") / col("n_tokens"), 6)))
      .withColumn("stopword_ratio",
        when(col("n_tokens") > 0,
          round(col("n_stop").cast("double") / col("n_tokens"), 6)))
      .withColumn("quality",
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("distinct_ratio") < minDistinctRatio, "repetitive")
          .otherwise("ok"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("distinct_ratio"), col("stopword_ratio"), col("quality"))
  }

  /** X3 — token statistics: whitespace token count, alpha-regex token
    * count, summed token chars and chars-per-token (4 dp). Input needs
    * (doc_id, text, n_chars); `n_chars` passes through. */
  def tokenStats(d: DataFrame): DataFrame =
    tokenCounts(d,
      "n_tokens" -> "size(ts)",
      "n_alpha" -> "size(filter(ts, t -> t rlike '^[a-z]+$'))",
      "token_chars" -> "aggregate(ts, 0L, (acc, t) -> acc + length(t))")
      .select(col("doc_id"),
        col("tc.n_tokens").cast("long").as("n_tokens"),
        col("tc.n_alpha").cast("long").as("n_alpha"),
        col("tc.token_chars").cast("long").as("token_chars"),
        col("n_chars"))
      .withColumn("chars_per_token",
        when(col("n_tokens") > 0,
          round(col("token_chars").cast("double") / col("n_tokens"), 4)))

  /** X4 — positional fingerprint in exact integer arithmetic:
    * Σ (pos+1)·(ascii(w) + 7·len(w)) over the token sequence. Sum is
    * order-free (map-side combine), the positional weight keeps the
    * fingerprint order-SENSITIVE in the document. One aggregate over
    * the token fan-out — partials absorb it inside the scan stage. */
  def positionalFingerprint(d: DataFrame): DataFrame =
    d.select(col("doc_id"), posexplode(expr(tokensExpr)).as(Seq("pos", "w")))
      .groupBy("doc_id")
      .agg(sum((col("pos") + 1) * (ascii(col("w")) + lit(7) * length(col("w"))))
        .cast("long").as("fingerprint"),
        count(lit(1)).as("n_tokens"))

  /** X5 — rolling-rotate fingerprint: each token's 32-bit md5 hash is
    * rotated by its position (order-sensitive), then XOR-folded. XOR
    * is commutative so the aggregation parallelizes with map-side
    * combine and is order-insensitive ACROSS partitions while the
    * rotate keeps the fingerprint order-sensitive IN the document. */
  def rollingFingerprint(d: DataFrame): DataFrame =
    d.select(col("doc_id"), posexplode(expr(tokensExpr)).as(Seq("pos", "w")))
      .withColumn("h32", pmod(md5Long(col("w")), lit(4294967296L)))
      .withColumn("r", pmod(col("pos"), lit(32)))
      .withColumn("rot",
        expr("pmod(shiftleft(h32, cast(r as int)), 4294967296L) + " +
          "shiftright(h32, cast(32 - r as int))"))
      .groupBy("doc_id")
      .agg(expr("bit_xor(rot)").as("fingerprint"),
        count(lit(1)).as("n_tokens"))

  /** X6 — repetition / boilerplate signals (the Gopher-family
    * repetition quality measures): duplicate-token fraction,
    * duplicate-3-gram fraction and the coverage of the single most
    * frequent bigram, per document. All six underlying counters come
    * from ONE codegen'd kernel call per row
    * ([[graft.functions.Sketches.repetitionStats]], registered as
    * `repetition_stats` by [[graft.GraftExtensions]]): zero shuffle —
    * where the relational form would explode and re-aggregate
    * corpus-sized token tables twice. */
  def repetitionSignals(d: DataFrame): DataFrame =
    d.withColumn("rs", expr("repetition_stats(text)"))
      .select(col("doc_id"),
        col("rs")(0).as("n_tokens"),
        round(when(col("rs")(0) > 0,
          (col("rs")(0) - col("rs")(1)).cast("double") / col("rs")(0))
          .otherwise(0.0), 6).as("dup_word_frac"),
        round(when(col("rs")(4) > 0,
          (col("rs")(4) - col("rs")(5)).cast("double") / col("rs")(4))
          .otherwise(0.0), 6).as("dup_trigram_frac"),
        round(when(col("rs")(2) > 0,
          col("rs")(3).cast("double") / col("rs")(2))
          .otherwise(0.0), 6).as("top_bigram_frac"))

  /** X16 — Gopher repetition FILTER: per-doc duplicate-trigram
    * fraction and top-token coverage, with `keep_doc` = 1 iff both
    * clear their thresholds. In-row, one pass (the distinct-trigram
    * count reuses the `word_ngrams` kernel); callers materialize the
    * result BEFORE any global sort so a range partitioner never
    * re-runs the heavy projection. */
  def repetitionFilter(d: DataFrame, maxDupTrigramFrac: Double = 0.3,
      maxTopTokenFrac: Double = 0.2): DataFrame =
    d.select(col("doc_id"), expr(tokensExpr).as("ts"), col("text"))
      .select(col("doc_id"),
        size(col("ts")).cast("long").as("n_tok"),
        greatest(size(col("ts")) - 2, lit(0)).cast("long").as("tri_total"),
        size(expr("word_ngrams(text, 3)")).cast("long").as("tri_distinct"),
        expr("array_max(transform(array_distinct(ts), " +
          "t -> size(filter(ts, x -> x = t))))")
          .cast("long").as("top_cnt"))
      .withColumn("dup3_frac",
        when(col("tri_total") === 0, lit(0.0))
          .otherwise(lit(1.0) - col("tri_distinct").cast("double") /
            col("tri_total").cast("double")))
      .withColumn("top_frac",
        when(col("n_tok") > 0,
          col("top_cnt").cast("double") / col("n_tok").cast("double"))
          .otherwise(0.0))
      .withColumn("keep_doc",
        (col("dup3_frac") <= lit(maxDupTrigramFrac) &&
          col("top_frac") <= lit(maxTopTokenFrac)).cast("long"))
      .select(col("doc_id"), col("n_tok"), col("tri_total"),
        col("tri_distinct"), col("dup3_frac"), col("top_frac"),
        col("keep_doc"))

  /** (source, token) unigram counts — the ONE corpus explode behind
    * [[sourceDivergence]]. Map-side partials absorb the token fan-out
    * inside the scan stage; the result is (sources × vocabulary)-sized,
    * ≪ corpus by Heaps' law. Callers at scale materialize this once
    * and derive everything downstream from it. */
  def unigramCounts(d: DataFrame, groupCol: String = "source"): DataFrame =
    d.select(col(groupCol), explode(expr(tokensExpr)).as("token"))
      .groupBy(groupCol, "token").agg(count(lit(1)).as("c_st"))

  /** X17 — per-source token-distribution divergence KL(source ‖ corpus)
    * from a [[unigramCounts]] table: corpus token counts, source totals
    * and the corpus total all DERIVE from the counts table (never
    * re-exploding the corpus); the divergence join is token-keyed
    * (vocab-sized both sides), totals broadcast. Each term's
    * contribution p·ln(p/q) is computed on ratios of exact BIGINTs and
    * floored to SIGNED integer micro-units, so the per-source sum is
    * exact integer math — order-free and engine-portable. */
  def sourceDivergence(st: DataFrame, groupCol: String = "source"): DataFrame = {
    val ct = st.groupBy("token").agg(sum("c_st").as("c_t"))
    val ts = st.groupBy(groupCol).agg(sum("c_st").as("t_s"))
    val tot = st.agg(sum("c_st").as("t_all"))
    st.join(ct, "token")
      .join(broadcast(ts), groupCol)
      .crossJoin(broadcast(tot))
      .withColumn("p", col("c_st").cast("double") / col("t_s").cast("double"))
      .withColumn("q", col("c_t").cast("double") / col("t_all").cast("double"))
      .withColumn("term_micro",
        floor(col("p") * log(col("p") / col("q")) * lit(1000000.0))
          .cast("long"))
      .groupBy(groupCol)
      .agg(max("t_s").as("n_tokens"), sum("term_micro").as("kl_micro"))
  }

  /** X7 — corpus vocabulary: term frequency + exact document frequency
    * per token — the input to stopword lists, boilerplate detection,
    * and tokenizer/vocab construction ([[Bpe.trainMerges]] consumes
    * the (token, tf) projection). One explode feeds a single hash
    * aggregation keyed on the token; map-side partials absorb the
    * token fan-out inside the scan stage, and the exact distinct-doc
    * count is Spark's standard two-phase count-distinct expansion.
    * Output is vocabulary-sized (≪ corpus) at any scale. */
  def vocabulary(d: DataFrame, idCol: String = "doc_id"): DataFrame =
    d.select(col(idCol), explode(expr(tokensExpr)).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col(idCol)).as("df"))
      .orderBy("token")

  /** X8 — hashed linear quality classifier: each token's weight is a
    * salted md5 hash mapped to [-1000, 1000] (a stand-in for trained
    * fastText-style weights — the SHAPE is the real thing: per-token
    * weight lookup + per-doc linear score, all in one scan), the doc
    * score is the tf-weighted mean in exact integer micro-units, and
    * `keep` gates on score > 0. Explode keeps a doc's tokens
    * co-partitioned, so partial aggregation collapses the fan-out to
    * one row per doc inside the scan stage — the shuffle moves
    * doc-count rows, not token-count rows. */
  def hashedClassifierScore(d: DataFrame, idCol: String = "doc_id",
      salt: String = "qw"): DataFrame =
    d.select(col(idCol), explode(expr(tokensExpr)).as("token"))
      .withColumn("w",
        pmod(md5Long(concat(lit(salt + ":"), col("token"))), lit(2001L))
          - lit(1000L))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum("w").as("raw_score"))
      .select(col(idCol), col("n_tokens"), col("raw_score"),
        round(col("raw_score").cast("double") /
          (col("n_tokens") * lit(1000L)).cast("double"), 6).as("score"),
        when(col("raw_score") > 0, lit(1L)).otherwise(lit(0L)).as("keep"))
      .orderBy(idCol)
}
