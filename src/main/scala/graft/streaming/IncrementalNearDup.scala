package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming INCREMENTAL NEAR-dedup — the MinHash-LSH twin of
  * [[IncrementalDedup]], and the daily production job of a training-data
  * pipeline: documents arrive continuously and each is checked against a
  * PERSISTENT band-signature index of everything seen before, on plain
  * parquet, exactly-once across crash/restart.
  *
  * Semantics (deliberately non-recursive so a SQL oracle can state
  * them): a document is a near-dup iff ANY earlier document (smaller
  * doc_id — arrival order) shares at least one of its 16 LSH band
  * hashes; `dup_of` is the SMALLEST such earlier doc. Equivalently: with
  * `m(d)` = min doc_id over all docs sharing a band bucket with d
  * (including d itself), d is kept iff m(d) == d. Unlike a
  * keep-list-recursive rule ("dup of a KEPT doc"), m(d) never depends
  * on other docs' verdicts, so the streaming result is independent of
  * how arrivals are sliced into batches (provided slices respect doc_id
  * order, which arrival order gives for free).
  *
  * Per micro-batch, everything is ONE codegen'd kernel call per row
  * ([[graft.functions.Sketches]]: `word_ngrams` shingles +
  * `minhash_lsh_bands` — zero shuffle) plus one (band, band_hash)
  * shuffle of the 16-rows-per-doc band table:
  *  - the batch's per-bucket min doc (`idxRows`) IS the index
  *    contribution — 16 rows/doc at most, min-merged per bucket, so the
  *    durable index stays bucket-sized, not corpus-sized;
  *  - a doc's in-batch m comes from joining its bands back to
  *    `idxRows`; its prior m from joining against index partitions of
  *    batches strictly before this one ([[BatchedParquetIndex.prior]] —
  *    a replayed batch never sees its own failed attempt);
  *  - results and index land in batch-addressed overwrite partitions,
  *    so checkpoint replay overwrites instead of appending — the same
  *    layout-borne exactly-once as IncrementalDedup, and the same
  *    crash-safe in-pipeline compaction (consumers min-aggregate, so
  *    duplicate bucket rows across partitions are harmless).
  *
  * Reference analog: generalizes the recovery dedup contract of S7
  * (uReplicator-Worker/src/main/java/com/uber/stream/ureplicator/worker/
  * ConsumerIterator.java:46-86) from exact offset identity to
  * similarity identity.
  */
object IncrementalNearDup {

  private val thrown = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def run(s: SparkSession, docsDir: String, workDir: String,
      failAtBatch: Option[Long] = None,
      compactEvery: Int = 16): Unit = {
    val schema = s.read.option("pathGlobFilter", "documents*.parquet")
      .parquet(docsDir).schema
    val q = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(docsDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: java.lang.Long) =>
        runBatch(batch, id.toLong, workDir)
        if (failAtBatch.contains(id.toLong) &&
            thrown.add(s"$workDir#$id"))
          throw new RuntimeException(
            s"injected crash after batch $id writes, before commit")
        if (compactEvery > 0 && id.toLong > 0 &&
            id.toLong % compactEvery == 0)
          BatchedParquetIndex.compact(batch.sparkSession,
            s"$workDir/index", id.toLong - 1)
        ()
      }
      .option("checkpointLocation", s"$workDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private[streaming] def runBatch(batch: DataFrame, id: Long,
      workDir: String): Unit = {
    val ss = batch.sparkSession
    val bands = batch
      .select(col("doc_id"), expr("word_ngrams(text, 3)").as("ws"))
      .filter(size(col("ws")) > 0)
      .withColumn("bh", expr("minhash_lsh_bands(ws)"))
      .select(col("doc_id"),
        posexplode(col("bh")).as(Seq("band", "band_hash")))
    // per-bucket batch min — the index contribution AND the in-batch
    // comparison table (future batches only ever need bucket minima,
    // since min over batch-minima == min over docs)
    val idxRows = bands.groupBy("band", "band_hash")
      .agg(min("doc_id").as("min_doc"))
    val mIn = bands.join(idxRows, Seq("band", "band_hash"))
      .groupBy("doc_id").agg(min("min_doc").as("m_in"))
    val m = BatchedParquetIndex.prior(ss, s"$workDir/index", id) match {
      case Some(prior) =>
        val mPrior = bands
          .join(prior.select(col("band"), col("band_hash"),
            col("min_doc").as("prior_doc")), Seq("band", "band_hash"))
          .groupBy("doc_id").agg(min("prior_doc").as("m_prior"))
        mIn.join(mPrior, Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("m_in"), coalesce(col("m_prior"), col("m_in"))).as("m"))
      case None => mIn.select(col("doc_id"), col("m_in").as("m"))
    }
    val status = m.select(col("doc_id"),
      (col("m") === col("doc_id")).as("kept"),
      when(col("m") < col("doc_id"), col("m")).as("dup_of"))
    status.write.mode("overwrite").parquet(s"$workDir/results/batch=$id")
    idxRows.write.mode("overwrite").parquet(s"$workDir/index/batch=$id")
  }

  /** Per-document verdicts across every processed batch:
    * (doc_id, kept, dup_of) — docs with no shingles are absent, as in
    * the batch oracle. */
  def results(s: SparkSession, workDir: String): DataFrame =
    s.read.parquet(s"$workDir/results")
      .select(col("doc_id"), col("kept"), col("dup_of"))
}
