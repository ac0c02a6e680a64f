package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

/** Batch-addressed parquet layout for ADDITIVE streaming state — the
  * [[IncrementalSpanCensus]] discipline extracted so other
  * additive-state maintainers ([[IncrementalDsir]]'s raw bucket-count
  * model) share it verbatim rather than re-deriving the crash-safety
  * argument.
  *
  * Contract: every source row lands in exactly ONE `batch=<id>`
  * partition (per-batch overwrite keeps checkpoint replay idempotent),
  * and the caller's `mergeAgg` combines partials such that
  * mergeAgg(A ∪ B) == mergeAgg(mergeAgg(A) ∪ B) — sums, mins, maxes.
  * Because partials are summed, compaction CANNOT use
  * [[BatchedParquetIndex]]'s duplicate-tolerant publish-then-delete (a
  * crash between publish and delete would double-count). Instead the
  * READER enforces a preference rule: partitions with id ≤ the highest
  * published `compacted=<n>` are invisible — publishing the merged
  * partition IS the commit point, and every crash point (before
  * publish, after publish, mid-delete) leaves the visible state
  * exactly correct, never a superset.
  *
  * The compacted partition is written HASH-PARTITIONED on the caller's
  * key at a corpus-scaled file count
  * ([[BatchedParquetIndex.compactionPartitions]] over the source
  * partitions' bytes): merged additive state can approach the key
  * domain's full size (the span census keeps EVERY span), so the write
  * must be as wide as the data — never one task. The rename commit is
  * unchanged: it operates on the directory, however many files it
  * holds. */
private[streaming] object AdditiveBatchState {

  /** (isCompacted, id) of a state partition dir name. */
  private def partId(name: String): Option[(Boolean, Long)] = {
    val eq = name.indexOf('=')
    if (eq < 0) None
    else name.take(eq) match {
      case "batch" =>
        try Some((false, name.drop(eq + 1).toLong))
        catch { case _: NumberFormatException => None }
      case "compacted" =>
        try Some((true, name.drop(eq + 1).toLong))
        catch { case _: NumberFormatException => None }
      case _ => None
    }
  }

  private def allParts(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Seq[(Path, Boolean, Long)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath)
      .flatMap(p => partId(p.getName).map { case (c, n) => (p, c, n) })

  /** The VISIBLE partitions under the preference rule: the highest
    * published `compacted=<n>` plus every `batch=<k>` with k > n.
    * Anything with id ≤ n is already summed into the compacted
    * partition — reading it too would double-count. */
  private def visibleParts(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Seq[Path] = {
    val all = allParts(fs, root)
    val maxC = all.collect { case (_, true, n) => n }
      .foldLeft(-1L)(math.max)
    all.collect {
      case (p, true, n) if n == maxC => p
      case (p, false, n) if n > maxC => p
    }
  }

  /** Bucket-layout marker a bucketed compacted partition carries at its
    * root (underscore-prefixed → invisible to Spark's file listing):
    * its text content is the bucket MODULUS the `kb=<b>` partition
    * directories were written with. A partition without the marker is
    * plain (pre-bucketing layout or a per-batch partial). */
  private val BucketMarker = "_kb"

  /** Name of the bucket partition column a bucketed compacted
    * partition is laid out by. Deliberately NOT underscore-prefixed:
    * hidden-path filters would make `kb=<b>` directories invisible. */
  private[streaming] val BucketCol = "kb"

  private def bucketModulus(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Option[Int] = {
    val m = new Path(p, BucketMarker)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt)
      finally in.close()
    }
  }

  /** One state partition as a relation. A bucketed compacted partition
    * reads through partition discovery (its [[BucketCol]] column is
    * RETAINED so a probe can partition-prune on it) and carries its
    * modulus; plain partitions carry None. An empty bucketed partition
    * (zero rows ⇒ zero `kb=` subdirectories ⇒ nothing to infer a
    * schema from) contributes nothing and is skipped. */
  private def partRelation(s: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Option[(DataFrame, Option[Int])] =
    bucketModulus(fs, p) match {
      case None => Some((s.read.parquet(p.toString), None))
      case Some(nB) =>
        if (!fs.listStatus(p).exists(_.getPath.getName.startsWith(
            BucketCol + "=")))
          None
        else Some((s.read.parquet(p.toString), Some(nB)))
    }

  /** Every visible partition as a relation (see [[partRelation]]) —
    * the read primitive [[merged]] / [[mergedUpTo]] and key-probing
    * readers ([[graft.streaming.IncrementalSpanCensus]]'s
    * delta-restricted census) build on. */
  private[streaming] def visibleRelations(s: SparkSession, root: Path,
      upTo: Long = Long.MaxValue): Seq[(DataFrame, Option[Int])] = {
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val ps = visibleParts(fs, root).filter(p =>
      partId(p.getName).exists(_._2 <= upTo))
    require(ps.nonEmpty, s"no state partitions ≤ $upTo under $root")
    ps.flatMap(p => partRelation(s, fs, p))
  }

  /** Union of relations with any bucket partition column dropped —
    * every non-probing reader's view of the state. */
  private def unionPlain(rels: Seq[(DataFrame, Option[Int])],
      root: Path): DataFrame = {
    val dfs = rels.map { case (df, nB) =>
      if (nB.isDefined) df.drop(BucketCol) else df
    }
    require(dfs.nonEmpty,
      s"every visible state partition under $root is empty-bucketed")
    dfs.reduce(_.unionByName(_))
  }

  /** mergeAgg over every visible partition — the one read path. */
  def merged(s: SparkSession, root: Path,
      mergeAgg: DataFrame => DataFrame): DataFrame =
    mergeAgg(unionPlain(visibleRelations(s, root), root))

  /** [[merged]] restricted to visible partitions with id ≤ `upTo` — the
    * deterministic "state as of batch upTo" read a compaction-boundary
    * epoch derivation needs (partials > upTo exist while the cadence
    * runs with `id - 1`, and must not leak into the epoch). Replay-
    * stable: partitions ≤ upTo are never touched by a later batch's
    * overwrite, and a compaction that already folded them publishes a
    * `compacted=<n>` with n ≤ upTo holding identical content. */
  def mergedUpTo(s: SparkSession, root: Path, upTo: Long,
      mergeAgg: DataFrame => DataFrame): DataFrame =
    mergeAgg(unionPlain(visibleRelations(s, root, upTo), root))

  /** mergeAgg every visible partition with id ≤ `upToBatch` into ONE
    * `compacted=<upToBatch>` partition (hash-partitioned on `keyCols`
    * at a corpus-scaled file count), then delete the sources.
    * Crash-safe by publish-rename + the reader's preference rule (see
    * object Scaladoc). A re-run that finds the target published skips
    * the merge and finishes the deletions. `failpoint` injects test
    * crashes. */
  def compact(s: SparkSession, root: Path, upToBatch: Long,
      mergeAgg: DataFrame => DataFrame, keyCols: Seq[String],
      targetFileBytes: Long = BatchedParquetIndex.DefaultTargetFileBytes,
      failpoint: String = "",
      bucketKey: Option[org.apache.spark.sql.Column] = None,
      minBuckets: Int = 64): Unit = {
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("_compact_"))
      .foreach(p => fs.delete(p, true))
    val target = new Path(root, s"compacted=$upToBatch")
    val mergeable = visibleParts(fs, root).filter { p =>
      partId(p.getName).exists(_._2 <= upToBatch) &&
        p.getName != target.getName
    }
    if (!fs.exists(target)) {
      if (mergeable.size <= 1) {
        // A prior compaction may have crashed mid-delete: partitions
        // with id ≤ the highest published compacted partition are
        // reader-INVISIBLE (already summed into it) but still on disk,
        // and if no later compaction ever sees ≥ 2 mergeable partials
        // they would persist forever. Finish that sweep here — the
        // same justification as the post-publish sweep below, with the
        // published partition in the target role.
        val maxC = allParts(fs, root).collect { case (_, true, n) => n }
          .foldLeft(-1L)(math.max)
        allParts(fs, root).collect {
          case (p, c, n) if n <= maxC && !(c && n == maxC) => p
        }.foreach(p => fs.delete(p, true))
        return
      }
      val tmp = new Path(root, s"_compact_$upToBatch")
      val n = BatchedParquetIndex.compactionPartitions(
        fs, mergeable, targetFileBytes)
      val mergedSrc = unionPlain(
        mergeable.flatMap(p => partRelation(s, fs, p)), root)
      val merged = mergeAgg(mergedSrc)
      // sortWithinPartitions on the key: each compacted file's row
      // groups then cover a narrow key range, so a later selective read
      // (a delta-restricted emission probing few keys) can skip row
      // groups via parquet min/max stats — without it a hash key's
      // uniform spread makes every row group's [min,max] span the whole
      // domain and nothing ever prunes. Cost is one in-task sort of
      // rows the repartition already co-located; merge results are
      // row-order-free so downstream reads are unaffected.
      //
      // With `bucketKey` set the partition is additionally laid out as
      // `kb=<pmod(key, nB)>` DIRECTORIES (nB scales with the write
      // width so bucket byte-size tracks targetFileBytes/4, floored at
      // `minBuckets`): a key-probing reader partition-PRUNES to the
      // buckets its probe set hashes into, so a probe of |S| keys reads
      // ≈ min(1, |S|/nB) of the state instead of all of it — the
      // probe-side term goes flat in census size once nB (∝ census)
      // outgrows |S|. The repartition moves to the bucket id so each
      // bucket lands in ONE task (≈ one file per bucket, never
      // n × nB); parallelism is min(n, nB) ≥ n for nB = 4n. The rename
      // commit is unchanged — it moves the directory, subdirs and all —
      // and the `_kb` modulus marker rides INSIDE it, so the layout
      // publishes atomically with the data.
      val nBOpt = bucketKey.map(_ => math.max(minBuckets, 4 * n))
      (bucketKey, nBOpt) match {
        case (Some(key), Some(nB)) =>
          merged
            .withColumn(BucketCol, pmod(key, lit(nB)).cast("int"))
            .repartition(math.max(n, s.sparkContext.defaultParallelism),
              col(BucketCol))
            .sortWithinPartitions(
              (col(BucketCol) +: keyCols.map(col)): _*)
            .write.mode("overwrite").partitionBy(BucketCol)
            .parquet(tmp.toString)
          val out = fs.create(new Path(tmp, BucketMarker), true)
          try out.write(nB.toString.getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        case _ =>
          val laid =
            if (keyCols.nonEmpty) merged.repartition(n, keyCols.map(col): _*)
              .sortWithinPartitions(keyCols.map(col): _*)
            else merged.repartition(n)
          laid.write.mode("overwrite").parquet(tmp.toString)
      }
      if (failpoint == "before-publish")
        throw new RuntimeException("injected compaction crash before publish")
      if (!fs.rename(tmp, target))
        throw new java.io.IOException(s"rename $tmp -> $target failed")
    }
    if (failpoint == "after-publish")
      throw new RuntimeException("injected compaction crash after publish")
    // delete EVERYTHING with id <= upToBatch (visible or stale — all
    // of it is represented in the target)
    allParts(fs, root).collect {
      case (p, _, n) if n <= upToBatch && p.getName != target.getName => p
    }.foreach { p =>
      fs.delete(p, true)
      if (failpoint == "mid-delete")
        throw new RuntimeException("injected compaction crash mid-delete")
    }
  }

  /** Highest visible partition id (batch or compacted), or -1 when the
    * root holds no state — the boundary a caller-driven REBASE
    * ([[publishRebase]]) must cover. */
  def maxVisibleId(s: SparkSession, root: Path): Long = {
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    visibleParts(fs, root)
      .flatMap(p => partId(p.getName).map(_._2))
      .foldLeft(-1L)(math.max)
  }

  /** Publish EXTERNALLY-computed content as `compacted=<upToBatch>`,
    * replacing every partition with id ≤ upToBatch — [[compact]]'s
    * commit protocol (tmp write → rename publish → sweep) for rebases
    * whose new content cannot be derived from the partials alone
    * (e.g. a re-score of the source corpus under a refreshed model:
    * the partials hold scores, not the text). Crash-safe by the same
    * argument: before the rename the old state is fully visible;
    * after it the preference rule hides everything the rebase
    * replaced; a re-run finishes the sweep. The caller must guarantee
    * `df` covers (supersedes) all partials with id ≤ upToBatch. */
  def publishRebase(s: SparkSession, root: Path, upToBatch: Long,
      df: DataFrame, failpoint: String = ""): Unit = {
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith("_compact_") ||
        p.getName.startsWith("_retired_"))
      .foreach(p => fs.delete(p, true))
    val target = new Path(root, s"compacted=$upToBatch")
    val tmp = new Path(root, s"_compact_$upToBatch")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (failpoint == "before-publish")
      throw new RuntimeException("injected rebase crash before publish")
    // REPUBLISH at the same boundary (the crash-heal path re-runs with
    // an unchanged maxVisibleId) must not open a window with the live
    // target DELETED while the new content is still a tmp dir: retire
    // the old target by METADATA RENAME (invisible name, no recursive
    // delete in the window) and swap the new one in — the exposed
    // window is two renames, and a crash inside it re-runs to the
    // identical content (the rebase derivation is deterministic).
    if (fs.exists(target) &&
        !fs.rename(target, new Path(root, s"_retired_$upToBatch")))
      throw new java.io.IOException(s"retire $target failed")
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"rename $tmp -> $target failed")
    fs.delete(new Path(root, s"_retired_$upToBatch"), true)
    if (failpoint == "after-publish")
      throw new RuntimeException("injected rebase crash after publish")
    allParts(fs, root).collect {
      case (p, _, n) if n <= upToBatch && p.getName != target.getName => p
    }.foreach { p =>
      fs.delete(p, true)
      if (failpoint == "mid-delete")
        throw new RuntimeException("injected rebase crash mid-delete")
    }
  }
}
