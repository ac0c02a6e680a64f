package graft

import org.apache.spark.sql.functions._

import graft.sources.Records
import graft.streaming.IncrementalDsir

/** Emission-cost curve for the bounded streaming-DSIR emission
  * ([[IncrementalDsir.runScored]] / [[IncrementalDsir
  * .resampleIncremental]]): the r19 read path re-scores the full
  * accumulated pool per emission (linear in the corpus), the bounded
  * path merges ≤ k-row per-batch partials under a frozen epoch (flat —
  * parameter-sized state). This main slices one sf dir's documents
  * into `slices` stream files, runs the scored stream, and measures
  * (a) the bounded emission, (b) the accumulated re-score emission,
  * and (c) one epoch refresh (the linear cost the bounded design pays
  * per REFRESH instead of per emission). One JSON line:
  * `{"docs":n,"slices":…,"emit_incremental_sec":…,
  * "emit_accumulated_sec":…,"refresh_sec":…}`.
  *
  * Usage: DsirEmitScaleBench <sfDir> [slices]
  */
object DsirEmitScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val slices = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local("graft-dsir-emit-scale", cpus)
    spark.sparkContext.setLogLevel("WARN")

    // slice the fixture into stream files (one file = one micro-batch
    // under the runner's maxFilesPerTrigger=1)
    val docs = Records.table(spark, sfDir, "documents")
    val n = docs.count()
    val streamDir = SessionTemp.dir("dsir_emit_docs_")
    docs.repartition(slices).write.mode("overwrite")
      .parquet(s"$streamDir/_stage")
    val stage = java.nio.file.Paths.get(s"$streamDir/_stage")
    val ls = java.nio.file.Files.list(stage)
    try {
      var i = 0
      ls.filter(_.toString.endsWith(".parquet")).forEach { f =>
        java.nio.file.Files.move(f, java.nio.file.Paths.get(
          f"$streamDir/documents-$i%03d.parquet"))
        i += 1
      }
    } finally ls.close()

    val sliced = spark.read
      .option("pathGlobFilter", "documents*.parquet").parquet(streamDir)
    val target = sliced.filter(col("source") === "src0")
    val pool = sliced.filter(col("source") =!= "src0")
    val workDir = SessionTemp.dir("dsir_emit_work_")
    IncrementalDsir.runScored(spark, streamDir, workDir, target, k = 200)

    val t0 = System.nanoTime()
    val incRows = IncrementalDsir.resampleIncremental(spark, workDir,
      k = 200).count()
    val incSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val accRows = IncrementalDsir.resampleAccumulated(spark, workDir,
      target, pool, k = 200).count()
    val accSec = (System.nanoTime() - t1) / 1e9
    require(incRows == accRows, s"row counts drifted: $incRows vs $accRows")

    val t2 = System.nanoTime()
    IncrementalDsir.refreshEpoch(spark, workDir, target, pool, k = 200)
    val refreshSec = (System.nanoTime() - t2) / 1e9

    println(f"""{"docs":$n,"slices":$slices,"emit_incremental_sec":$incSec%.2f,"emit_accumulated_sec":$accSec%.2f,"refresh_sec":$refreshSec%.2f,"k":200}""")
    spark.stop()
  }
}
