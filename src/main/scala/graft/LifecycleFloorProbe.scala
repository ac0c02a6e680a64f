package graft

import org.apache.spark.sql.functions._

/** Measurement tooling for the streaming-lifecycle fixed-cost floor
  * (r22 optimization round): times (1) a MINIMAL AvailableNow
  * file-stream lifecycle — schema probe, StreamExecution start/stop,
  * offset/commit logs, one no-op micro-batch — against fresh and
  * resumed checkpoints, and (2) the d20 bounded-span-emission entry
  * phase by phase (slice staging / census absorption / emission), so
  * the floor share of each lifecycle entry is a measured number
  * instead of a guess. Prints [probe] lines on stdout; not part of any
  * catalog query. */
object LifecycleFloorProbe {

  private def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-32s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-floor-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    // warm the streaming machinery once so the probe measures the
    // steady-state floor, not first-use classloading
    val warm = SessionTemp.dir("probe_warm_")
    spark.range(8).coalesce(1).write.mode("overwrite").parquet(s"$warm/src")
    val wq = spark.readStream
      .schema(spark.read.parquet(s"$warm/src").schema)
      .parquet(s"$warm/src")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: java.lang.Long) =>
        b.write.format("noop").mode("overwrite").save(); ()
      }
      .option("checkpointLocation", s"$warm/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    wq.awaitTermination()

    // ---- 1) minimal lifecycle floor ----
    val tmp = SessionTemp.dir("probe_min_")
    spark.range(8).coalesce(1).write.mode("overwrite").parquet(s"$tmp/src")
    val schema = spark.read.parquet(s"$tmp/src").schema
    def lifecycle(ckpt: String): Unit = {
      val q = spark.readStream.schema(schema).parquet(s"$tmp/src")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: java.lang.Long) =>
          b.write.format("noop").mode("overwrite").save(); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    for (i <- 1 to 5) t(s"fresh-ckpt lifecycle $i")(lifecycle(s"$tmp/ck$i"))
    // resume on the same checkpoint, no new data: pure restart cost
    for (i <- 1 to 3) t(s"resume no-data $i")(lifecycle(s"$tmp/ck1"))
    // resume with ONE new file: the d20/d21 multi-slice restart shape
    for (i <- 1 to 3) t(s"resume +1 file $i") {
      spark.range(8).coalesce(1).write.mode("overwrite")
        .parquet(s"$tmp/src/extra_$i")
      lifecycle(s"$tmp/ck1")
    }

    // ---- 2) d20 phase breakdown (same body as the entry) ----
    val workDir = SessionTemp.dir("probe_d20_")
    val streamDir = s"$workDir/docs"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(streamDir))
    val docs = graft.sources.Records.table(spark, sfDir, "documents")
    val mm = docs.agg(min(col("doc_id")), max(col("doc_id"))).collect()(0)
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val span = hi - lo + 1
    val cuts = Seq(lo, lo + span / 3, lo + 2 * (span / 3), hi + 1)
    for (i <- 0 until 3) {
      val delta = docs.filter(col("doc_id") >= cuts(i) &&
        col("doc_id") < cuts(i + 1))
      t(s"d20 slice $i stage") {
        val stage = s"$streamDir/_stage_$i"
        delta.coalesce(1).write.mode("overwrite").parquet(stage)
        val ls = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        val part =
          try ls.filter(_.toString.endsWith(".parquet")).findFirst().get()
          finally ls.close()
        java.nio.file.Files.move(part, java.nio.file.Paths.get(
          f"$streamDir/documents-$i%02d.parquet"))
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(stage))
      }
      t(s"d20 slice $i census run")(
        graft.streaming.IncrementalSpanCensus.run(spark, streamDir, workDir))
      t(s"d20 slice $i emit")(
        graft.streaming.IncrementalSpanCensus.emitNewDocs(spark, workDir,
          spark.read.parquet(f"$streamDir/documents-$i%02d.parquet")))
    }
    t("d20 final read")(
      graft.streaming.IncrementalSpanCensus.emittedCorpus(spark, workDir)
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
