package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Retrieval-side index construction as an engine capability — the
 * library surface behind catalog entries x10 (per-document TF-IDF
 * keywords), x11 (inverted index) and x11b (its hot-token-sharded
 * production form), promoted to thin calls like [[Retrieval]] /
 * [[TextAnalysis]].
 *
 * Scale shapes (unchanged from the gated entries):
 *  - [[topKeywords]]: one (doc, token) aggregation feeds BOTH tf and
 *    df (df is its per-token row count — no countDistinct Expand), the
 *    two consumers share the identical shuffle subtree
 *    (ReusedExchange), and the per-doc top-k is a doc-partitioned
 *    row_number. The vocabulary join carries NO broadcast hint: the df
 *    table is Heaps-law vocabulary-sized — millions of types on a real
 *    corpus, past the 8 GB broadcast ceiling at 100 TB — so the gate
 *    is AQE's runtime size check (the join converts to broadcast when
 *    the materialized vocab shuffle is small, stays a token-keyed
 *    shuffle join when it is not). AQE measures the ACTUAL relation at
 *    the exact point a count-based gate would have to guess or pay an
 *    extra job for, and unlike [[Broadcasts.sizeGated]] it costs no
 *    materialization of the derived frame — the right form when the
 *    gated side is an aggregation mid-plan rather than a parquet twin.
 *    Scoring is exact-integer (tf·1e6 ÷ df) rather than
 *    tf·ln(N/df): floating-point ln is not identically rounded across
 *    engines and a last-ulp rank flip would fail a hash gate.
 *  - [[invertedIndex]]: bounded state per token — the distinct
 *    (token, doc) pairs flow through a token-partitioned row_number
 *    that keeps only the first `maxPostings` BEFORE any list
 *    materializes (an unbounded collect_set would pin corpus-sized
 *    state for stopwords); exact df counts on the same partitioning.
 *  - [[invertedIndexSharded]]: the hot-token-safe form — per-token
 *    work first spreads over `nShards` hash shards of the doc space so
 *    a stopword's corpus-sized postings are processed by nShards
 *    tasks, then a second-level limit over the ≤ maxPostings·nShards
 *    survivors per token yields the global first-maxPostings (two-level
 *    top-k, both levels WindowGroupLimit — no token ever pins more
 *    than maxPostings rows per task at level 1). Identical output to
 *    [[invertedIndex]] (the x11b oracle IS x11's SQL).
 */
object Indexing {

  /** X10 — each document's top-`k` keywords, TF-IDF-shaped: frequent
    * in the doc, rare in the corpus, scored by the exact integer
    * tf·1e6 div df (ties to the lexicographically first token).
    * Input needs (idCol, text); output (idCol, rank, token, tf, df,
    * score) sorted by (idCol, rank). */
  def topKeywords(corpus: DataFrame, k: Int = 3, idCol: String = "doc_id",
      tokensExpr: String = TextAnalysis.tokensExpr): DataFrame = {
    require(k > 0, "k must be positive")
    val perDocTok = corpus
      .select(col(idCol), explode(expr(tokensExpr)).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val vocab = perDocTok.groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(idCol).orderBy(desc("score"), asc("token"))
    perDocTok
      .join(vocab, "token") // no hint — AQE gates by measured size

      .withColumn("score", expr("tf * 1000000L div df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank").cast("long").as("rank"),
        col("token"), col("tf"), col("df"), col("score"))
      .orderBy(idCol, "rank")
  }

  /** X11 — inverted index: token → (exact df, comma-joined first
    * `maxPostings` posting ids). Input needs (idCol numeric, text);
    * output (token, df, postings) sorted by token. */
  def invertedIndex(corpus: DataFrame, maxPostings: Int = 20,
      idCol: String = "doc_id",
      tokensExpr: String = TextAnalysis.tokensExpr): DataFrame = {
    require(maxPostings > 0, "maxPostings must be positive")
    val pairs = corpus
      .select(col(idCol).cast("long").as(idCol),
        explode(expr(tokensExpr)).as("token"))
      .distinct()
    val w = Window.partitionBy("token").orderBy(idCol)
    val dfs = pairs.groupBy("token").agg(count(lit(1)).as("df"))
    val postings = pairs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxPostings)
      .groupBy("token")
      .agg(array_join(transform(array_sort(collect_list(col(idCol))),
        x => x.cast("string")), ",").as("postings"))
    dfs.join(postings, "token")
      .select(col("token"), col("df"), col("postings"))
      .orderBy("token")
  }

  /** X11B — [[invertedIndex]] for the stopword regime: the doc space
    * splits into `nShards` hash shards, each shard keeps its own
    * first-`maxPostings` (bounded per-shard state), exact df sums
    * per-shard counts, and a second-level limit yields the global
    * first-`maxPostings`. Output identical to [[invertedIndex]]. */
  def invertedIndexSharded(corpus: DataFrame, maxPostings: Int = 20,
      nShards: Int = 8, idCol: String = "doc_id",
      tokensExpr: String = TextAnalysis.tokensExpr): DataFrame = {
    require(maxPostings > 0, "maxPostings must be positive")
    require(nShards > 0, "nShards must be positive")
    val pairs = corpus
      .select(col(idCol).cast("long").as(idCol),
        explode(expr(tokensExpr)).as("token"))
      .distinct()
      .withColumn("shard", pmod(col(idCol), lit(nShards.toLong)))
    val w1 = Window.partitionBy("token", "shard").orderBy(idCol)
    val w2 = Window.partitionBy("token").orderBy(idCol)
    val sharded = pairs.groupBy("token", "shard")
      .agg(count(lit(1)).as("n"))
      .groupBy("token").agg(sum("n").as("df"))
    val survivors = pairs
      .withColumn("rn", row_number().over(w1))
      .filter(col("rn") <= maxPostings)
      .withColumn("rn2", row_number().over(w2))
      .filter(col("rn2") <= maxPostings)
      .groupBy("token")
      .agg(array_join(transform(array_sort(collect_list(col(idCol))),
        x => x.cast("string")), ",").as("postings"))
    sharded.join(survivors, "token")
      .select(col("token"), col("df"), col("postings"))
      .orderBy("token")
  }
}
