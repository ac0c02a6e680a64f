package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dsir, Sampling}

/** Streaming member of the DSIR wing (Xie et al. 2023,
  * arXiv:2302.03169 — the batch surface is
  * [[graft.operators.Dsir]]): a continuously-arriving raw pool
  * maintains the RAW-side hashed-bigram bucket-count model
  * incrementally across micro-batches AND crash/restart, so importance
  * resampling over the accumulated corpus never re-scans history to
  * fit the model — the d18→d19 composition applied to DSIR.
  *
  * Why this is the span-census pattern verbatim: a document's bigram
  * buckets are a pure per-row function, and every document arrives in
  * exactly one batch, so per-batch (bucket, cnt) partials are ADDITIVE
  * — the merged model is a sum, never a distinct-merge. The partials
  * therefore live in [[AdditiveBatchState]]'s layout (per-batch
  * overwrite partitions, reader preference rule, publish-rename
  * compaction commit): every crash point leaves the visible model
  * exactly correct, and a double-counted bucket partial would be a
  * WRONG model, not a conservative one. Each partial is
  * bucket-BOUNDED (≤ `buckets` rows — parameter-sized), so state
  * stays tiny no matter the corpus; compaction merely bounds the
  * partition count over a long-lived stream.
  *
  * The TARGET seed set is small and static by the method's definition
  * (a curated Wikipedia/textbook sample), so its fit is read-time and
  * always exact. The log-ratio literal is frozen per consumption
  * ([[logRatios]]) — a pipeline refreshes it on whatever cadence it
  * emits resamples, and because the Gumbel keys are incremental-safe
  * (salted md5 of the id — a new doc never moves an existing doc's
  * key; `Dsir.gumbelResample`), consecutive snapshots are
  * prefix-consistent wherever their models agree.
  *
  * [[resampleAccumulated]] is the consumed output: score the
  * accumulated pool against the incrementally-maintained model and
  * keep the Gumbel top-k — bit-identical to the pure-batch
  * p17b chain (spec-pinned; the catalog gates it against the same
  * DuckDB oracle), so incremental maintenance and batch slicing are
  * invisible in the sample.
  *
  * `rawSampleMod > 1` applies the engine's deterministic 1/m digest
  * gate (60-bit salted md5 of the id) INSIDE each batch — the gate is
  * a per-doc function, so the incrementally-fit sampled model equals
  * the batch sampled fit (p17c) exactly, and the 100-TB fit-cost
  * lever survives streaming unchanged. */
object IncrementalDsir {

  /** The raw pool a streamed documents fixture contributes: everything
    * outside the src0 seed set — the p17-family split. */
  def defaultRawFilter: Column = col("source") =!= "src0"

  def run(s: SparkSession, docsDir: String, workDir: String,
      buckets: Int = 4096, rawFilter: Column = defaultRawFilter,
      rawSampleMod: Int = 1, failAtBatch: Option[Long] = None,
      compactEvery: Int = 16, includeUnigrams: Boolean = false): Unit = {
    require(rawSampleMod >= 1, "rawSampleMod must be at least 1")
    BatchStreamRunner.run(s, docsDir, workDir, "documents*.parquet",
      (batch, id) => runBatch(batch, id, workDir, buckets, rawFilter,
        rawSampleMod, includeUnigrams),
      (ss, upTo) => compact(ss, workDir, upTo),
      failAtBatch, compactEvery)
  }

  private[streaming] def runBatch(batch: DataFrame, id: Long,
      workDir: String, buckets: Int, rawFilter: Column,
      rawSampleMod: Int, includeUnigrams: Boolean = false): Unit = {
    val pool = batch.filter(rawFilter)
    val fitPool =
      if (rawSampleMod == 1) pool
      else pool.filter(Sampling.saltedHashMod("dsirfit", col("doc_id"),
        rawSampleMod.toLong) === 0L)
    Dsir.bucketCounts(fitPool, buckets, includeUnigrams)
      .write.mode("overwrite").parquet(s"$workDir/model/batch=$id")
  }

  /** Counts are additive across batches (each doc in exactly one) —
    * the one place the partial combination rule is stated. */
  private def mergeAgg(partials: DataFrame): DataFrame =
    partials.groupBy("bucket").agg(sum("cnt").as("cnt"))

  /** The merged raw model: (bucket, cnt) over every document streamed
    * so far — ≤ `buckets` rows, one sum over the visible partials. */
  def rawModel(s: SparkSession, workDir: String): DataFrame =
    AdditiveBatchState.merged(s, new Path(s"$workDir/model"), mergeAgg)

  /** Freeze the log-ratio literal: exact read-time fit of the (small,
    * static) target corpus vs the incrementally-maintained raw model —
    * [[Dsir.logRatiosFromCounts]], so the arithmetic is the batch
    * fit's, stated once. No history re-scan: the raw side is a
    * bucket-bounded state read. */
  def logRatios(s: SparkSession, workDir: String, target: DataFrame,
      buckets: Int = 4096, includeUnigrams: Boolean = false): Array[Double] = {
    val rows = rawModel(s, workDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // the TARGET fit must use the same feature space the maintained
    // raw model was built with (the caller's run(includeUnigrams))
    val (tc, tt) = Dsir.fitCounts(target, buckets, includeUnigrams)
    Dsir.logRatiosFromCounts(tc, tt, rows.toMap, rows.map(_._2).sum,
      buckets)
  }

  /** The consumed output: Gumbel top-`k` importance resample of the
    * accumulated raw pool, scored against the incrementally-maintained
    * model — identical to the pure-batch p17b chain (the model is the
    * same sums, the scoring scan and the top-k are the same plans), so
    * a pipeline can emit samples on any cadence without re-fitting
    * from history. Output: (idCol, logw, g) in (g DESC, id) order. */
  def resampleAccumulated(s: SparkSession, workDir: String,
      target: DataFrame, pool: DataFrame, k: Int,
      buckets: Int = 4096, idCol: String = "doc_id",
      includeUnigrams: Boolean = false): DataFrame = {
    val lr = logRatios(s, workDir, target, buckets, includeUnigrams)
    val scored =
      if (includeUnigrams) Dsir.importanceWeightsUniBi(pool, lr, idCol)
      else Dsir.importanceWeights(pool, lr, idCol)
    Dsir.gumbelResample(scored.select(col(idCol), col("logw")),
      k, idCol = idCol)
  }

  /** Crash-safe publish-rename compaction of the model partials — see
    * [[AdditiveBatchState.compact]]. The merged model is
    * bucket-bounded, so the corpus-scaled file count is naturally 1
    * here; the shared path keeps the commit protocol uniform. */
  def compact(s: SparkSession, workDir: String, upToBatch: Long,
      failpoint: String = "",
      targetFileBytes: Long = BatchedParquetIndex.DefaultTargetFileBytes): Unit =
    AdditiveBatchState.compact(s, new Path(s"$workDir/model"), upToBatch,
      mergeAgg, keyCols = Seq("bucket"), targetFileBytes = targetFileBytes,
      failpoint = failpoint)
}
