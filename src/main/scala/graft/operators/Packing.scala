package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence assembly for pretraining as an engine capability — the
 * library surface behind catalog entries p6 (fixed-budget sequence
 * packing), p11 (overlapping-window chunking) and p12 (deterministic
 * training-order shuffle), promoted like [[Sessionization]] /
 * [[Sampling]] / [[Dedup]]: parameterized functions first, bench
 * entries as thin calls.
 *
 * Scale shapes (unchanged from the gated entries):
 *  - [[packSequences]]: the running token sum is a window PARTITIONED
 *    BY the pack group — packing is sequential by definition, but only
 *    within a group; groups pack in parallel. When a single giant
 *    group would exceed a task width, [[packSequencesSharded]] is the
 *    scale form: sub-shard each group by a coarse id range, pack the
 *    shards in parallel, then stitch the per-shard tails with a
 *    shard-count-sized summary window — identical output (the p6b
 *    oracle runs p6's exact SQL), no unpartitioned global sort, no
 *    serialized hot group.
 *  - [[chunkOverlapping]]: one generator expression per row —
 *    `sequence` builds the stride index list and `explode` fans out,
 *    all inside whole-stage codegen, zero shuffle. Chunk identity is
 *    the md5 of the substring — stable across engines — so downstream
 *    exact-dedup ([[Dedup.exactDuplicates]]) composes directly.
 *  - [[trainingOrder]]: order depends only on ids (salted content-id
 *    hash → shard, within-shard (hash, id)) — never on partitioning,
 *    cluster size, or scan order — so two runs produce byte-identical
 *    shard files. Physically repartition-by-shard +
 *    sortWithinPartitions at the writer: one corpus shuffle, no global
 *    sort; shard count scales with the corpus (fixed-size shards).
 */
object Packing {

  /** P6 — fixed-budget sequence packing: concatenate documents in
    * deterministic (`idCol`) order within each `groupCol` and chunk at
    * `tokenBudget` tokens. A document's sequence id is
    * floor(tokens-before-it / budget) — the chunk its first token
    * lands in. Input needs (groupCol, idCol, tokensCol); output one
    * row per (group, seq_id) with `n_docs` and `seq_tokens`, sorted. */
  def packSequences(docs: DataFrame, tokenBudget: Long,
      groupCol: String = "source", idCol: String = "doc_id",
      tokensCol: String = "n_tokens"): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("cum_before", coalesce(sum(tokensCol).over(w), lit(0L)))
      .withColumn("seq_id",
        floor(col("cum_before").cast("double") / lit(tokenBudget.toDouble))
          .cast("long"))
      .groupBy(groupCol, "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol).as("seq_tokens"))
      .orderBy(groupCol, "seq_id")
  }

  /** P6B — [[packSequences]] for the giant-group regime (one bot/mega
    * source bigger than a task width): two-level pack-then-stitch with
    * IDENTICAL output.
    *
    * The decomposition: within a group, docs pack in `idCol` order, so
    * bucketing the group by a coarse id range (`shard = floor(id /
    * shardSpan)` — monotone in id) splits the running sum into
    * per-shard partial sums plus a per-shard OFFSET (the total tokens
    * of all earlier shards). Each shard's window runs in its own task
    * (partitioned by (group, shard)); the offsets come from one
    * shard-count-sized prefix-sum window per group (the e1b
    * "bucket-then-stitch" pattern); global cum-before = offset +
    * local cum-before, exactly the flat window's value. The offset
    * table is groups×shards rows — broadcast to the corpus, never a
    * corpus shuffle beyond the one the flat form already pays.
    *
    * `idCol` must be numeric (the coarse range needs arithmetic);
    * `shardSpan` is the id-range width per shard — size it so a shard
    * is around one task's worth of rows (ids are usually near-dense,
    * so span ≈ rows/shard). The input relation is scanned TWICE (local
    * pack windows + shard offsets) — pass the narrow (group, id,
    * n_tokens) projection, materialized if its derivation is heavy
    * (token counting at 100 TB belongs in an earlier materialized
    * stage, not re-run per scan). */
  def packSequencesSharded(docs: DataFrame, tokenBudget: Long,
      shardSpan: Long, groupCol: String = "source",
      idCol: String = "doc_id", tokensCol: String = "n_tokens"): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    require(shardSpan > 0, "shardSpan must be positive")
    val wLocal = Window.partitionBy(groupCol, "__shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOffset = Window.partitionBy(groupCol).orderBy("__shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = docs
      .withColumn("__shard",
        floor(col(idCol).cast("double") / lit(shardSpan.toDouble))
          .cast("long"))
      .withColumn("__cum_local",
        coalesce(sum(tokensCol).over(wLocal), lit(0L)))
    val offsets = local.groupBy(groupCol, "__shard")
      .agg(sum(tokensCol).as("__shard_tokens"))
      .withColumn("__offset",
        coalesce(sum("__shard_tokens").over(wOffset), lit(0L)))
      .select(col(groupCol), col("__shard"), col("__offset"))
    local.join(broadcast(offsets), Seq(groupCol, "__shard"))
      .withColumn("cum_before", col("__offset") + col("__cum_local"))
      .withColumn("seq_id",
        floor(col("cum_before").cast("double") / lit(tokenBudget.toDouble))
          .cast("long"))
      .groupBy(groupCol, "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol).as("seq_tokens"))
      .orderBy(groupCol, "seq_id")
  }

  /** P11 — overlapping-window chunking: re-cut each document into
    * `width`-char windows every `stride` chars (stride ≤ width ⇒
    * overlap). Output (id, chunk_idx, chunk_len, chunk_md5), one row
    * per chunk; an empty or short doc yields exactly one chunk. */
  def chunkOverlapping(docs: DataFrame, width: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(width > 0 && stride > 0, "width and stride must be positive")
    require(stride <= width,
      s"stride ($stride) must not exceed width ($width) or characters fall in no chunk")
    // Column-API substr (positions are Columns) — no expression text is
    // assembled, so a hostile column name can't reach the SQL parser
    val sub = col(textCol).substr(
      (col("chunk_idx") * stride + 1).cast("int"), lit(width))
    docs
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        floor((greatest(length(col(textCol)), lit(1)) - 1) / stride)
          .cast("long"))))
      .select(col(idCol), col("chunk_idx"),
        length(sub).cast("long").as("chunk_len"),
        md5(sub.cast("binary")).as("chunk_md5"))
      .orderBy(idCol, "chunk_idx")
  }

  /** P12 — deterministic training order: salted content-id hash →
    * shard (`hash mod nShards`), within-shard order (hash, id).
    * Output (id, shard, pos), byte-identical on any cluster layout;
    * adding data never reorders surviving (shard, pos) prefixes of
    * untouched shards. */
  def trainingOrder(docs: DataFrame, nShards: Int, salt: String = "ord",
      idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val h = conv(substring(md5(concat(lit(salt + ":"),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
    docs
      .select(col(idCol).cast("long").as(idCol), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("long"))
      .withColumn("pos",
        row_number().over(Window.partitionBy("shard").orderBy("h", idCol))
          .cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
      .orderBy("shard", "pos")
  }
}
