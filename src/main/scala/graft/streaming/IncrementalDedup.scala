package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * batch, so [[run]] compacts old partitions in-pipeline every
  * `compactEvery` batches (identical content, bounded file sets — the
  * anti-join is unchanged). Reference analog: the reference skips
  * re-consumed records by offset on recovery (S7,
  * uReplicator-Worker/src/main/java/com/uber/stream/ureplicator/worker/
  * ConsumerIterator.java:46-86); this generalizes offset-dedup to
  * content-dedup with a durable index.
  *
  * IncrementalDedupSpec drives the crashes: fail a chosen batch AFTER
  * its writes but BEFORE the checkpoint commits (restart must replay it
  * exactly-once), and fail [[compactIndex]] at each internal step (the
  * index must never lose a hash).
  */
object IncrementalDedup {

  /** batches that already threw once, keyed (workDir, batchId) — the
    * injected crash fires on the first attempt only, so the restarted
    * query completes */
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
        // In-pipeline compaction cadence: STRICTLY prior batches only
        // (upToBatch = id - 1, never id) — if we crash here and batch
        // `id` replays, its prior-index scan must not see a compacted
        // partition containing its own failed attempt's rows.
        if (compactEvery > 0 && id.toLong > 0 &&
            id.toLong % compactEvery == 0)
          compactIndex(batch.sparkSession, workDir, id.toLong - 1)
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

  /** id of an index partition dir: `batch=<n>` (written by one batch) or
    * `compacted=<n>` (the merge of every partition with id <= n). Both
    * obey the same visibility rule — a partition named with id n holds
    * ONLY hashes first seen at batches <= n. */
  private def partitionId(name: String): Option[Long] = {
    val eq = name.indexOf('=')
    if (eq < 0) None
    else name.take(eq) match {
      case "batch" | "compacted" =>
        try Some(name.drop(eq + 1).toLong) catch { case _: NumberFormatException => None }
      case _ => None
    }
  }

  private def indexParts(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Seq[(Path, Long)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath)
      .flatMap(p => partitionId(p.getName).map(p -> _))

  /** index partitions of batches strictly BEFORE `id` (never the
    * current batch's own failed attempt) */
  private def priorIndex(ss: SparkSession, idxRoot: String,
      id: Long): Option[DataFrame] = {
    val root = new Path(idxRoot)
    val fs = root.getFileSystem(ss.sparkContext.hadoopConfiguration)
    val parts = indexParts(fs, root).collect { case (p, n) if n < id => p }
    if (parts.isEmpty) None
    else Some(ss.read.parquet(parts.map(_.toString): _*))
  }

  /** the deduplicated table: every batch's survivors */
  def kept(s: SparkSession, workDir: String): DataFrame =
    s.read.parquet(s"$workDir/kept")
      .select(col("content_hash"), col("keeper_doc_id"))

  /** Compact all index partitions with id <= `upToBatch` into ONE
    * partition addressed `compacted=<upToBatch>` — identical hash set,
    * one file set instead of one per batch, so the `batch < id` pruning
    * scan stays correct for every future batch (the merged partition
    * keeps the HIGHEST compacted id, and ids only grow; a batch
    * replayed AFTER compaction still never sees its own rows when
    * upToBatch < its id — which [[run]] guarantees by compacting
    * `id - 1`). The scan cost of an N-batch history drops from N
    * listings to 1 + the uncompacted tail.
    *
    * CRASH-SAFE by publish-then-delete: the merged partition is
    * written to an `_`-prefixed tmp (invisible to [[priorIndex]]),
    * atomically renamed to its final `compacted=` name, and only THEN
    * are the source partitions deleted. A crash at any point leaves the
    * visible index a SUPERSET of the true hash set (tmp invisible →
    * originals intact; after publish → originals coexist with the
    * merge), and duplicate hashes across partitions are harmless to the
    * left_anti join — the index can never silently forget a hash.
    * Single-writer assumption is the same as the pipeline's own
    * (compaction runs inside its foreachBatch, or between runs).
    *
    * `failpoint` is a test hook (IncrementalDedupSpec) that injects a
    * crash "before-publish", "after-publish", or "mid-delete". */
  def compactIndex(s: SparkSession, workDir: String, upToBatch: Long,
      failpoint: String = ""): Unit = {
    val idxRoot = s"$workDir/index"
    val root = new Path(idxRoot)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    // stale tmp from a previously crashed compaction: invisible to the
    // scan, safe to drop and redo
    fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("_compact_"))
      .foreach(p => fs.delete(p, true))
    val parts = indexParts(fs, root).filter(_._2 <= upToBatch)
    if (parts.size <= 1) return
    val target = new Path(s"$idxRoot/compacted=$upToBatch")
    // compare by NAME: listStatus paths are scheme-qualified
    // (file:/...), `target` is not — URI equality would treat the
    // published partition as a source and delete it
    val sources = parts.collect { case (p, _) if p.getName != target.getName => p }
    // If the target already exists, a previous compaction at this id
    // crashed AFTER publishing — its merge was built from every part
    // <= upToBatch (ids only grow, so no new source can have appeared
    // since), so only the source deletions remain. Re-merging would
    // rename into an existing dir (nests on local FS) — skip it.
    if (!fs.exists(target)) {
      val tmp = new Path(s"$idxRoot/_compact_$upToBatch")
      s.read.parquet(sources.map(_.toString): _*)
        .repartition(1).write.mode("overwrite").parquet(tmp.toString)
      if (failpoint == "before-publish")
        throw new RuntimeException("injected compaction crash before publish")
      if (!fs.rename(tmp, target))
        throw new java.io.IOException(s"rename $tmp -> $target failed")
    }
    if (failpoint == "after-publish")
      throw new RuntimeException("injected compaction crash after publish")
    sources.foreach { p =>
      fs.delete(p, true)
      if (failpoint == "mid-delete")
        throw new RuntimeException("injected compaction crash mid-delete")
    }
  }
}
