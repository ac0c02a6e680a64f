package graft

import org.apache.commons.io.FileUtils

import graft.streaming.IncrementalSpanCensus

/** A/B for the compaction write path (the round-18 verdict's named
  * scale-killer): merge the SAME span-census batch partials into a
  * compacted partition once through a single task (the old
  * `repartition(1)` behavior — forced here with an unreachable
  * `targetFileBytes`) and once hash-partitioned on `span_h` at a
  * corpus-scaled file count, and report both walls + the produced
  * file counts. The merge work is identical (same mergeAgg over the
  * same partials, same publish-rename commit); the delta is purely
  * the write funnel this round removed — at 100 TB the compacted
  * census is multi-TB and recurs every `compactEvery` batches, so the
  * single-task form is a recurring wall, not a one-off.
  *
  * Usage: CompactionScaleBench <docsDir> [targetFileBytes] [slices]
  * Prints one JSON line
  * `{"metric":"compaction_scale","batches":…,"census_rows":…,
  *   "single_sec":…,"wide_sec":…,"single_files":1,"wide_files":…}`.
  */
object CompactionScaleBench {
  def main(args: Array[String]): Unit = {
    val docsDir = args(0)
    val targetFileBytes = if (args.length > 1) args(1).toLong else 4L << 20
    val slices = if (args.length > 2) args(2).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local("graft-compaction-scale", cpus)
    spark.sparkContext.setLogLevel("WARN")

    // slice the corpus into `slices` documents-*.parquet files so the
    // file stream (maxFilesPerTrigger=1) produces that many batch
    // partials — the fixture ships one file, which would make the
    // merge a 1-partition no-op
    val sliced = BenchFixtures.sliceDocs(spark, docsDir, slices,
      "compact_docs_")

    // build the batch partials once (no in-pipeline compaction), then
    // clone the census dir so both arms merge identical inputs
    val work = SessionTemp.dir("compact_scale_")
    val t0 = System.nanoTime()
    IncrementalSpanCensus.run(spark, sliced, work, compactEvery = 0)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val censusDir = new java.io.File(s"$work/census")
    val batchIds = censusDir.listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).map(_.drop(6).toLong).sorted
    val upTo = batchIds.last
    val rows = IncrementalSpanCensus.census(spark, work, minCount = 1L)
      .count()

    def arm(name: String, tfb: Long): (Double, Int) = {
      val w = SessionTemp.dir(s"compact_${name}_")
      FileUtils.copyDirectory(new java.io.File(work),
        new java.io.File(w))
      val t = System.nanoTime()
      IncrementalSpanCensus.compact(spark, w, upTo,
        targetFileBytes = tfb)
      val sec = (System.nanoTime() - t) / 1e9
      val files = new java.io.File(s"$w/census/compacted=$upTo")
        .listFiles().count(_.getName.endsWith(".parquet"))
      (sec, files)
    }

    // single-task arm first (the old shape), wide arm second — the
    // second arm rides a warmer page cache, which only UNDERSTATES the
    // win if the order mattered; swap via args to check
    val (singleSec, singleFiles) = arm("single", Long.MaxValue)
    val (wideSec, wideFiles) = arm("wide", targetFileBytes)

    println(f"""{"metric":"compaction_scale","docs_dir":"$docsDir",""" +
      f""""batches":${batchIds.length},"census_rows":$rows,""" +
      f""""build_sec":$buildSec%.2f,""" +
      f""""target_file_bytes":$targetFileBytes,""" +
      f""""single_sec":$singleSec%.2f,"single_files":$singleFiles,""" +
      f""""wide_sec":$wideSec%.2f,"wide_files":$wideFiles}""")
    spark.stop()
  }
}
