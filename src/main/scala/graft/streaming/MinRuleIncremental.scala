package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic MIN-RULE incremental dedup over an arbitrary bucketing — the
  * shared engine of [[IncrementalNearDup]] (MinHash-LSH band buckets)
  * and [[IncrementalEmbeddingDup]] (hyperplane cosine buckets).
  *
  * Semantics: an item is a near-dup iff ANY earlier item (smaller id —
  * arrival order) shares at least one bucket with it; `dup_of` is the
  * smallest such item. Equivalently m(x) = min id over x's buckets
  * (including x), kept iff m(x) == x. The rule is non-recursive — no
  * verdict depends on another verdict — so results are independent of
  * batch slicing (given id-ordered arrival) and a plain SQL oracle can
  * state them over the whole corpus at once.
  *
  * The durable index stores per-bucket MINIMA only (min over
  * batch-minima == min over items, so nothing corpus-sized persists),
  * in [[BatchedParquetIndex]]'s batch-addressed layout: overwrite
  * partitions + strictly-prior reads give layout-borne exactly-once
  * under checkpoint replay, and compaction is the shared crash-safe
  * publish-then-delete (min-aggregation tolerates duplicate bucket
  * rows, which is what makes every crash point leave a usable
  * superset). */
private[streaming] object MinRuleIncremental {

  /** @param bucketize batch → one row per (item, bucket):
    *                  (`idCol`, `bucketCols`...) — everything else in
    *                  the batch is the caller's business
    * @param globFilter source-file glob inside `srcDir` */
  def run(s: SparkSession, srcDir: String, workDir: String,
      globFilter: String, idCol: String, bucketCols: Seq[String],
      bucketize: DataFrame => DataFrame,
      failAtBatch: Option[Long], compactEvery: Int): Unit =
    BatchStreamRunner.run(s, srcDir, workDir, globFilter,
      (batch, id) =>
        runBatch(batch, id, workDir, idCol, bucketCols, bucketize),
      (ss, upTo) => BatchedParquetIndex.compact(ss,
        s"$workDir/index", upTo, keyCols = bucketCols),
      failAtBatch, compactEvery)

  private def runBatch(batch: DataFrame, id: Long, workDir: String,
      idCol: String, bucketCols: Seq[String],
      bucketize: DataFrame => DataFrame): Unit = {
    val ss = batch.sparkSession
    // the bucketize kernel (64-permutation MinHash / hyperplane over
    // every batch row — the batch's heavy work) runs EXACTLY ONCE: its
    // narrow (id, bucket) output lands in session-temp parquet and both
    // write actions below read that. Derived data, not state — a replay
    // recomputes it into a fresh dir; session temp is reclaimed at JVM
    // exit.
    val bTmp = graft.SessionTemp.dir("graft_minrule_b_")
    bucketize(batch).write.mode("overwrite").parquet(bTmp)
    val b = ss.read.parquet(bTmp)
    // per-bucket batch min — the index contribution AND the in-batch
    // comparison table (future batches only ever need bucket minima)
    val idxRows = b.groupBy(bucketCols.map(col): _*)
      .agg(min(idCol).as("min_id"))
    // the index partition lands FIRST so the status plan can read the
    // narrow (bucket, min_id) parquet back instead of re-running
    // bucketize+agg a second time — each write action executes its
    // whole subtree, so the old status-then-index order priced the
    // bucketize kernel (the batch's heavy work: the 64-permutation
    // MinHash or the hyperplane kernel over every row) once per action
    // PLUS once per join branch. Order is replay-safe: both writes are
    // per-batch overwrites, the checkpoint only commits after both, and
    // index readers see strictly-prior batches only.
    idxRows.write.mode("overwrite").parquet(s"$workDir/index/batch=$id")
    val idx = ss.read.parquet(s"$workDir/index/batch=$id")
    // ONE min source: in-batch minima cover every bucket of b (built
    // from it), so unioning the prior index and min-aggregating over
    // all matches is exactly least(m_in, m_prior) — and b (the kernel)
    // is referenced once instead of once per side. Duplicate bucket
    // rows a crashed compaction may have left in the prior index are
    // absorbed by the min, as before.
    val minSources = BatchedParquetIndex.prior(ss, s"$workDir/index", id)
      .fold(idx)(prior =>
        idx.unionByName(prior.select(idx.columns.map(col): _*)))
    val m = b.join(minSources, bucketCols)
      .groupBy(idCol).agg(min("min_id").as("m"))
    val status = m.select(col(idCol),
      (col("m") === col(idCol)).as("kept"),
      when(col("m") < col(idCol), col("m")).as("dup_of"))
    status.write.mode("overwrite").parquet(s"$workDir/results/batch=$id")
  }

  /** (idCol, kept, dup_of) across every processed batch. */
  def results(s: SparkSession, workDir: String, idCol: String): DataFrame =
    s.read.parquet(s"$workDir/results")
      .select(col(idCol), col("kept"), col("dup_of"))
}
