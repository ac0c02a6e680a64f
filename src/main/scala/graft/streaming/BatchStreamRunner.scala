package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** The shared micro-batch runner of the durable incremental modules
  * ([[IncrementalDedup]], [[MinRuleIncremental]],
  * [[IncrementalSpanCensus]], [[IncrementalDsir]]) — previously stated
  * four times: schema-probed file stream (one file per trigger, so a
  * fixture slice IS a batch), per-batch state write, a one-shot
  * injected-crash hook AFTER the batch's writes but BEFORE the
  * checkpoint commit (the exactly-once replay hazard every crash spec
  * drives), and the in-pipeline compaction cadence.
  *
  * The cadence compacts STRICTLY prior batches only (`id - 1`, never
  * `id`): if the process crashes between the compaction and the
  * checkpoint commit, batch `id` replays — its own partition must stay
  * un-compacted so the overwrite replay addresses exactly its old
  * partition, and (for the strictly-prior index readers) its re-read
  * must not see a compacted partition containing its own failed
  * attempt's rows. That reasoning is the subtlest line in the
  * streaming wing; it now lives in exactly one place. */
private[streaming] object BatchStreamRunner {

  /** batches that already threw once, keyed (workDir, batchId) — the
    * injected crash fires on the first attempt only, so a restarted
    * query completes. Shared across modules: work dirs are unique. */
  private val thrown = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** @param runBatch  write batch `id`'s state partitions (overwrite —
    *                  idempotent under checkpoint replay)
    * @param compact   merge state partitions with id ≤ the given
    *                  upToBatch (invoked on the cadence with `id - 1`) */
  def run(s: SparkSession, srcDir: String, workDir: String,
      globFilter: String,
      runBatch: (DataFrame, Long) => Unit,
      compact: (SparkSession, Long) => Unit,
      failAtBatch: Option[Long], compactEvery: Int): Unit = {
    val schema = s.read.option("pathGlobFilter", globFilter)
      .parquet(srcDir).schema
    val q = s.readStream.schema(schema)
      .option("pathGlobFilter", globFilter)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: java.lang.Long) =>
        runBatch(batch, id.toLong)
        if (failAtBatch.contains(id.toLong) &&
            thrown.add(s"$workDir#$id"))
          throw new RuntimeException(
            s"injected crash after batch $id writes, before commit")
        if (compactEvery > 0 && id.toLong > 0 &&
            id.toLong % compactEvery == 0)
          compact(batch.sparkSession, id.toLong - 1)
        ()
      }
      .option("checkpointLocation", s"$workDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
