package graft

import org.apache.spark.sql.functions._

import graft.streaming.IncrementalSpanCensus

/** Emission-cost curve for the bounded streaming span-dedup emission
  * ([[IncrementalSpanCensus.emitNewDocs]]): the d19 read path rewrites
  * the FULL accumulated corpus per emission (linear in the corpus),
  * the bounded path rewrites only the arrival delta (keep-first is
  * monotone under doc_id-ordered arrival, so an emitted doc's rewrite
  * is final — see the IncrementalSpanCensus section comment). This
  * main generates `docs` documents ([[GenData.documents]] — doc_id is
  * dense, so arrival slices are doc_id-monotone by construction),
  * absorbs and emits everything but a fixed-size final delta, then
  * measures (a) the bounded emission of that delta and (b) the d19
  * accumulated rewrite, both materialized to parquet for symmetric
  * I/O. The delta is FIXED across invocations, so comparing two corpus
  * sizes isolates the accumulated-size dependence. One JSON line:
  * `{"docs":n,"delta_rows":…,"emit_bounded_sec":…,
  * "emit_accumulated_sec":…}`.
  *
  * Usage: SpanEmitScaleBench <docs> [deltaRows] [mainSlices]
  */
object SpanEmitScaleBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args(0).toLong
    val deltaRows = if (args.length > 1) args(1).toLong else 5000L
    val mainSlices = if (args.length > 2) args(2).toInt else 4
    require(deltaRows < nDocs, "delta must be smaller than the corpus")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local("graft-span-emit-scale", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val docs = GenData.documents(spark, nDocs)
    val cut = nDocs - deltaRows
    val streamDir = SessionTemp.dir("span_emit_docs_")
    val workDir = SessionTemp.dir("span_emit_work_")

    def writeSlice(df: org.apache.spark.sql.DataFrame, idx: Int): Unit = {
      val stage = s"$streamDir/_stage_$idx"
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val ls = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
      val part =
        try ls.filter(_.toString.endsWith(".parquet")).findFirst().get()
        finally ls.close()
      java.nio.file.Files.move(part, java.nio.file.Paths.get(
        f"$streamDir/documents-$idx%03d.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(stage))
    }

    // accumulate everything but the delta, doc_id-ordered arrival
    val per = (cut + mainSlices - 1) / mainSlices
    for (i <- 0 until mainSlices)
      writeSlice(docs.filter(col("doc_id") >= i * per &&
        col("doc_id") < math.min((i + 1) * per, cut)), i)
    IncrementalSpanCensus.run(spark, streamDir, workDir)
    // emit from the WRITTEN slices, not the generating expressions —
    // in production the delta is arrived data, and re-evaluating the
    // generator would charge text synthesis to the bounded arm only
    IncrementalSpanCensus.emitNewDocs(spark, workDir,
      spark.read.option("pathGlobFilter", "documents*.parquet")
        .parquet(streamDir))

    // the arrival delta, absorbed into the census
    writeSlice(docs.filter(col("doc_id") >= cut), mainSlices)
    val delta = spark.read.parquet(
      f"$streamDir/documents-$mainSlices%03d.parquet")
    IncrementalSpanCensus.run(spark, streamDir, workDir)

    // SPAN_EMIT_COMPACT=1 (default): run the production compaction
    // cadence before the timed arms, so the emission probes the
    // key-BUCKETED compacted layout (the r22 state change) instead of
    // loose batch partials; =0 keeps the un-compacted layout as the
    // A/B baseline. Both timed arms read the same state either way.
    val compacted =
      !sys.env.get("SPAN_EMIT_COMPACT").contains("0")
    if (compacted) {
      val upTo = mainSlices.toLong // batches 0..mainSlices all visible
      // SPAN_EMIT_TARGET_BYTES scales the compaction's file count (and
      // with it the bucket count nB = 4·files) down to sizes where the
      // probe's bucket pruning is exercisable at local fixture scale —
      // production keeps the 128 MB default, where nB tracks census
      // bytes the same way
      sys.env.get("SPAN_EMIT_TARGET_BYTES").map(_.toLong) match {
        case Some(t) =>
          IncrementalSpanCensus.compact(spark, workDir, upTo,
            targetFileBytes = t)
        case None => IncrementalSpanCensus.compact(spark, workDir, upTo)
      }
    }

    // warm the census state (page cache + codegen) so arm ORDER does
    // not decide the comparison — both arms read the same partials
    IncrementalSpanCensus.censusWithFirst(spark, workDir).count()

    val t0 = System.nanoTime()
    IncrementalSpanCensus.emitNewDocs(spark, workDir, delta)
    val boundedSec = (System.nanoTime() - t0) / 1e9

    val all = spark.read.option("pathGlobFilter", "documents*.parquet")
      .parquet(streamDir)
    val accOut = SessionTemp.dir("span_emit_acc_")
    val t1 = System.nanoTime()
    IncrementalSpanCensus.dedupAccumulated(spark, workDir, all)
      .write.mode("overwrite").parquet(accOut)
    val accSec = (System.nanoTime() - t1) / 1e9

    // the bounded path's union must cover the same docs the
    // accumulated rewrite covers — cheap audit, not a timing arm
    val nBounded = IncrementalSpanCensus.emittedCorpus(spark, workDir)
      .count()
    val nAcc = spark.read.parquet(accOut).count()
    require(nBounded == nAcc, s"row counts drifted: $nBounded vs $nAcc")

    println(f"""{"docs":$nDocs,"delta_rows":$deltaRows,"emit_bounded_sec":$boundedSec%.2f,"emit_accumulated_sec":$accSec%.2f,"compacted":$compacted}""")
    spark.stop()
  }
}
