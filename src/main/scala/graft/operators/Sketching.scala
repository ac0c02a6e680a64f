package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exactly-reproducible cardinality sketches as an engine capability —
 * the library surface behind catalog entries x12 (KMV distinct-count
 * sketch vs exact) and x13 (its partial-aggregate production form),
 * promoted to thin calls like [[Indexing]] / [[Dedup]].
 *
 * KMV (bottom-k) over a SHARED deterministic md5-derived hash — unlike
 * HLL/approx_count_distinct, whose register layouts differ per engine
 * and can never hash-gate — picks the same k-th smallest 60-bit hash
 * and the same IEEE-double estimate est = (k−1)·2^60 / h_k on any
 * engine (63·2^60 is exactly representable; one rounding in the
 * divide), so the sketch itself sits under a DuckDB oracle.
 *
 * Scale shapes (unchanged from the gated entries):
 *  - [[kmvDistinctWithExact]]: distinct hashes + a group-partitioned
 *    WindowGroupLimit k-th-smallest (bounded per-group state) next to
 *    the exact count — the validation form.
 *  - [[kmvBottomK]]: the production form through the custom
 *    `bottom_k_distinct` TypedImperativeAggregate
 *    ([[graft.functions.BottomKDistinct]]): a k-capped set on the MAP
 *    side, exactly k longs per group across the shuffle, exact partial
 *    merges (bottom-k is a semilattice) — O(k) state per group
 *    end-to-end, no distinct pass, no window, never touching the full
 *    distinct set.
 */
object Sketching {

  /** 2^60 as an exactly-representable double (the KMV hash domain). */
  private val HashDomain = 1152921504606846976.0

  private def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Per-group distinct word-`ngram` hashes — the shared input relation
    * of both sketch forms: (groupCol, h), exact-integer 60-bit.
    * `textCol` is quoted through [[SqlLit.quoteName]] (the
    * spanDuplicates discipline — any column name is safe). */
  private def groupHashes(corpus: DataFrame, groupCol: String,
      ngram: Int, textCol: String): DataFrame =
    corpus
      .select(col(groupCol), explode(expr(
        s"word_ngrams(${SqlLit.quoteName(textCol)}, $ngram)")).as("w"))
      .select(col(groupCol), md5Long(col("w")).as("h"))

  /** X12 — KMV distinct-count sketch NEXT TO the exact count (the
    * validation form): (groupCol, exact, kmv_est, err). Estimate is
    * (k−1)·2^60 / h_k from the k-th smallest distinct hash; exact when
    * a group has fewer than k hashes. */
  def kmvDistinctWithExact(corpus: DataFrame, groupCol: String = "lang",
      k: Int = 64, ngram: Int = 3, textCol: String = "text"): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val hs = groupHashes(corpus, groupCol, ngram, textCol).distinct()
    val w = Window.partitionBy(groupCol).orderBy("h")
    val kth = hs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === k)
      .select(col(groupCol), col("h").as("h_k"))
    hs.groupBy(groupCol).agg(count(lit(1)).as("exact"))
      .join(kth, Seq(groupCol), "left")
      .select(col(groupCol), col("exact"),
        when(col("h_k").isNull, col("exact"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(HashDomain) / col("h_k")))
          .cast("long").as("kmv_est"))
      .withColumn("err",
        round(abs(col("kmv_est") - col("exact")).cast("double") / col("exact"), 4))
      .orderBy(groupCol)
  }

  /** X13 — the sketch-only production form via `bottom_k_distinct`:
    * (groupCol, sketch_size, kmv_est). No exact column — the whole
    * point is never materializing the distinct set. */
  def kmvBottomK(corpus: DataFrame, groupCol: String = "source",
      k: Int = 64, ngram: Int = 3, textCol: String = "text"): DataFrame = {
    require(k >= 2, "k must be at least 2")
    groupHashes(corpus, groupCol, ngram, textCol)
      .groupBy(groupCol)
      .agg(expr(s"bottom_k_distinct(h, $k)").as("ks"))
      .select(col(groupCol), size(col("ks")).cast("long").as("sketch_size"),
        when(size(col("ks")) < k, size(col("ks")).cast("long"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(HashDomain) /
            element_at(col("ks"), k)))
          .cast("long").as("kmv_est"))
      .orderBy(groupCol)
  }
}
