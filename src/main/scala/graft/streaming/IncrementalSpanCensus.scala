package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin of the d16/d17 span wing's BUILD side: a
  * continuously-arriving document stream maintains a PERSISTENT
  * cross-document repeated-span census (the Lee et al. 2022
  * exact-substring-dedup primitive) across micro-batches AND
  * crash/restart — on plain parquet, no transactional table format,
  * the [[IncrementalDedup]] layout discipline applied to ADDITIVE
  * state.
  *
  * Census partials are per-batch (span_h, n_docs, n_occurrences)
  * aggregates; because every document arrives in exactly one batch,
  * both counts are ADDITIVE across batches — the merged census is a
  * sum, never a distinct-merge. That additivity changes the
  * crash-safety contract vs the dedup index:
  *  - per-batch partitions (`census/batch=<id>`, overwrite) stay
  *    idempotent under checkpoint replay exactly like
  *    [[IncrementalDedup]] (same batch id ⇒ same file set ⇒ same
  *    partial, overwritten in place);
  *  - but compaction CANNOT use [[BatchedParquetIndex]]'s
  *    duplicate-tolerant publish-then-delete (a crash between publish
  *    and delete would leave rows counted TWICE). Instead the READER
  *    enforces a preference rule: partitions with id ≤ the highest
  *    published `compacted=<n>` are invisible — so publishing the
  *    merged partition IS the commit point, and every crash point
  *    (before publish, after publish, mid-delete) leaves the visible
  *    census exactly correct, never a superset.
  *
  * At 100 TB the per-batch partial is batch-span-vocabulary-sized
  * (map-side partials absorb within-batch repeats); the merged census
  * read is one sum over the visible partitions; [[run]] compacts on a
  * cadence so the partition count stays bounded over a long-lived
  * stream.
  *
  * The partials ALSO carry each span's first occurrence — min over
  * (doc_id, pos) structs, which merges across batches exactly like the
  * sums (min of per-batch mins; the position comes from the
  * position-carrying `span_hashes_pos` kernel). That makes the
  * maintained census a full [[graft.operators.Dedup
  * .spanCensusWithFirst]] relation, so the stream's output is a
  * CONSUMED input, not just the d16 diagnostic: [[censusWithFirst]]
  * feeds [[graft.operators.Dedup.spanDedupCorpus]] directly (the d19
  * composition — run the keep-first action pass over the accumulated
  * corpus on whatever cadence the pipeline wants, [[dedupAccumulated]]).
  * [[census]] still projects the counts-only d16 shape. */
object IncrementalSpanCensus {

  def run(s: SparkSession, docsDir: String, workDir: String,
      spanTokens: Int = 8, failAtBatch: Option[Long] = None,
      compactEvery: Int = 16): Unit =
    BatchStreamRunner.run(s, docsDir, workDir, "documents*.parquet",
      (batch, id) => runBatch(batch, id, workDir, spanTokens),
      (ss, upTo) => compact(ss, workDir, upTo),
      failAtBatch, compactEvery)

  private[streaming] def runBatch(batch: DataFrame, id: Long,
      workDir: String, spanTokens: Int): Unit =
    batch
      .select(col("doc_id"), explode_outer(
        expr(s"span_hashes_pos(text, $spanTokens, 1L)")).as("w"))
      .filter(col("w").isNotNull)
      .select(col("doc_id"), col("w").getField("pos").as("pos"),
        col("w").getField("h").as("span_h"))
      .groupBy("span_h")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(struct(col("doc_id"), col("pos"))).as("first"))
      .write.mode("overwrite").parquet(s"$workDir/census/batch=$id")

  /** The merged census: (span_h, n_docs, n_occurrences) over every
    * document streamed so far, spans occurring ≥ `minCount` times —
    * the counts-only d16 shape (the `first` column is projected away
    * before the merge). */
  def census(s: SparkSession, workDir: String,
      minCount: Long = 2L): DataFrame =
    merged(s, workDir)
      .filter(col("n_occurrences") >= minCount)
      .select("span_h", "n_docs", "n_occurrences")

  /** The merged census WITH each span's first occurrence — the
    * [[graft.operators.Dedup.spanCensusWithFirst]] relation, built
    * incrementally: (span_h, n_docs, n_occurrences, first_doc,
    * first_pos). min(first) merges across partials exactly like the
    * sums. */
  def censusWithFirst(s: SparkSession, workDir: String,
      minCount: Long = 2L): DataFrame =
    merged(s, workDir)
      .filter(col("n_occurrences") >= minCount)
      .select(col("span_h"), col("n_docs"), col("n_occurrences"),
        col("first").getField("doc_id").as("first_doc"),
        col("first").getField("pos").as("first_pos"))

  /** THE census merge — the one place that knows how partials combine
    * (counts are additive, the keeper is the min (doc_id, pos) struct).
    * Both the read path ([[merged]]) and [[compact]] go through here:
    * when a partial gains a column, this is the single edit point —
    * split, a column added to one site and not the other would
    * silently corrupt everything older than the compaction horizon. */
  private def mergeAgg(partials: DataFrame): DataFrame =
    partials.groupBy("span_h")
      .agg(sum("n_docs").as("n_docs"),
        sum("n_occurrences").as("n_occurrences"),
        min("first").as("first"))

  private def merged(s: SparkSession, workDir: String): DataFrame =
    AdditiveBatchState.merged(s, new Path(s"$workDir/census"), mergeAgg)

  /** The d19 composition: the keep-first action pass
    * ([[graft.operators.Dedup.spanDedupCorpus]]) over the documents
    * accumulated so far, consuming the INCREMENTALLY-maintained
    * census — identical output to rebuilding the census from scratch
    * (the merged partials ARE the batch census; spec-pinned), so a
    * pipeline can emit a deduplicated snapshot on any cadence without
    * ever re-scanning history for the census side. */
  def dedupAccumulated(s: SparkSession, workDir: String,
      corpus: DataFrame, spanTokens: Int = 8): DataFrame =
    graft.operators.Dedup.spanDedupCorpus(corpus,
      censusWithFirst(s, workDir), spanTokens)

  /** Sum-merge every visible partition with id ≤ `upToBatch` into ONE
    * `compacted=<upToBatch>` partition, then delete the sources.
    * Crash-safe by publish-then-delete + the reader's preference rule
    * (see object Scaladoc): the rename IS the commit — before it the
    * tmp is `_`-invisible, after it every source with id ≤ upToBatch
    * is reader-invisible whether or not its delete completed. A re-run
    * that finds the target published skips the merge and finishes the
    * deletions. `failpoint` injects test crashes.
    *
    * The merged partition is written HASH-PARTITIONED on `span_h` at a
    * corpus-scaled file count
    * ([[BatchedParquetIndex.compactionPartitions]] over the source
    * partitions' bytes): the partials keep EVERY span (the ≥ minCount
    * filter is read-side — a later occurrence can lift a count), so
    * the merged census approaches the corpus's distinct span count and
    * must be written as wide as the data, never through one task. The
    * rename commit point is unchanged — it operates on the directory,
    * however many files it holds — and clustering by span_h means the
    * NEXT compaction's merge of this partition shuffles rows that are
    * already co-located. */
  def compact(s: SparkSession, workDir: String, upToBatch: Long,
      failpoint: String = "",
      targetFileBytes: Long = BatchedParquetIndex.DefaultTargetFileBytes): Unit =
    AdditiveBatchState.compact(s, new Path(s"$workDir/census"), upToBatch,
      mergeAgg, keyCols = Seq("span_h"), targetFileBytes = targetFileBytes,
      failpoint = failpoint)
}
