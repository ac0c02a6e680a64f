package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming twin of d10's incremental dedup: a continuously-arriving
  * document stream is deduplicated against a PERSISTENT content-hash
  * index, maintaining an exactly-once `kept` table across micro-batches
  * AND crash/restart — on plain parquet, no transactional table format.
  *
  * Exactly-once is LAYOUT-BORNE rather than log-borne:
  *  - each micro-batch writes ONLY batch-addressed partitions
  *    (`kept/batch=<id>/`, `index/batch=<id>/`) with overwrite
  *    semantics, so a batch replayed after a crash overwrites its own
  *    partial output instead of appending duplicates;
  *  - the anti-join reads index partitions with `batch < id` ONLY
  *    (partition-pruned scan), so a replayed batch never sees its own
  *    failed attempt's index rows (which would wrongly drop every doc
  *    of the batch as "already seen");
  *  - the Structured Streaming checkpoint replays a failed batch with
  *    the SAME id and file set (file-source WAL), which is what makes
  *    the two properties above sufficient.
  *
  * At 100 TB the per-batch index partitions are 16 bytes/doc like
  * d10's index; the `batch < id` scan accumulates one partition per
  * batch, so production deployments compact old partitions into one
  * (identical content, fewer files) on a schedule — the anti-join is
  * unchanged. Reference analog: the reference skips re-consumed
  * records by offset on recovery (S7,
  * uReplicator-Worker/src/main/java/com/uber/stream/ureplicator/worker/
  * ConsumerIterator.java:46-86); this generalizes offset-dedup to
  * content-dedup with a durable index.
  *
  * IncrementalDedupSpec drives the crash: fail a chosen batch AFTER its
  * writes but BEFORE the checkpoint commits, restart, and assert the
  * final table equals the batch oracle with zero duplicates.
  */
object IncrementalDedup {

  /** batches that already threw once, keyed (workDir, batchId) — the
    * injected crash fires on the first attempt only, so the restarted
    * query completes */
  private val thrown = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def run(s: SparkSession, docsDir: String, workDir: String,
      failAtBatch: Option[Long] = None): Unit = {
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
    // first-seen within the batch: min doc_id per content hash
    val inBatch = batch
      .select(md5(col("text")).as("content_hash"), col("doc_id"))
      .groupBy("content_hash").agg(min("doc_id").as("keeper_doc_id"))
    val fresh = priorIndex(ss, s"$workDir/index", id) match {
      case Some(ix) => inBatch.join(ix, Seq("content_hash"), "left_anti")
      case None => inBatch
    }
    // batch-addressed partitions + overwrite = idempotent under replay
    fresh.write.mode("overwrite").parquet(s"$workDir/kept/batch=$id")
    fresh.select("content_hash").write.mode("overwrite")
      .parquet(s"$workDir/index/batch=$id")
  }

  /** index partitions of batches strictly BEFORE `id` (never the
    * current batch's own failed attempt) */
  private def priorIndex(ss: SparkSession, idxRoot: String,
      id: Long): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(idxRoot)
    val fs = root.getFileSystem(ss.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    val parts = fs.listStatus(root).toSeq.map(_.getPath)
      .filter { p =>
        p.getName.startsWith("batch=") &&
          p.getName.stripPrefix("batch=").toLong < id
      }
    if (parts.isEmpty) None
    else Some(ss.read.parquet(parts.map(_.toString): _*))
  }

  /** the deduplicated table: every batch's survivors */
  def kept(s: SparkSession, workDir: String): DataFrame =
    s.read.parquet(s"$workDir/kept")
      .select(col("content_hash"), col("keeper_doc_id"))

  /** Compact all index partitions with `batch <= upToBatch` into ONE
    * partition addressed `batch=<upToBatch>` — identical content, one
    * file set instead of one per batch, so the `batch < id` pruning
    * scan stays correct for every future batch (the merged partition
    * keeps the HIGHEST compacted id, and ids only grow). Safe to run
    * between streaming runs (same single-writer assumption as the
    * pipeline itself); a batch replayed AFTER compaction still never
    * sees its own rows because its id is above `upToBatch`. The scan
    * cost of an N-batch history drops from N listings to 1 + the
    * uncompacted tail. */
  def compactIndex(s: SparkSession, workDir: String,
      upToBatch: Long): Unit = {
    val idxRoot = s"$workDir/index"
    val root = new org.apache.hadoop.fs.Path(idxRoot)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val parts = fs.listStatus(root).toSeq.map(_.getPath)
      .filter { p =>
        p.getName.startsWith("batch=") &&
          p.getName.stripPrefix("batch=").toLong <= upToBatch
      }
    if (parts.size <= 1) return
    val tmp = s"$idxRoot/_compact_$upToBatch"
    s.read.parquet(parts.map(_.toString): _*)
      .repartition(1).write.mode("overwrite").parquet(tmp)
    parts.foreach(p => fs.delete(p, true))
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(s"$idxRoot/batch=$upToBatch"))
  }
}
