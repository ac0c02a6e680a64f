package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Records

/** Probe-vs-rebuild curve for the persisted IVF index
  * ([[Similarity.buildIvfIndex]] / [[Similarity.probeIvfIndex]]): the
  * one-shot [[Similarity.ivfTopK]] pays seed fit + full corpus
  * assignment on EVERY query set, while the persisted form pays it
  * once and serves each probe from a directory-pruned scan of the
  * probed cells. This main measures all three on one sf dir —
  * one-shot wall, build wall, steady-state probe wall — printing one
  * JSON line `{"vectors":n,"n_cells":k,"oneshot_sec":…,"build_sec":…,
  * "probe_sec":…}`. nCells is corpus-scaled (expected cell size held
  * near `targetCellSize`, floored at 8) so the probe's pruned share
  * stays nprobe/nCells as the corpus grows.
  *
  * Usage: AnnScaleBench <sfDir> [targetCellSize]
  */
object AnnScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val target = if (args.length > 1) args(1).toLong else 2000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local("graft-ann-scale", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val raw = Records.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val par = spark.sparkContext.defaultParallelism
    val emb =
      if (raw.rdd.getNumPartitions < par) raw.repartition(par) else raw
    val n = emb.count()
    val nCells = math.max(8L, (n + target - 1) / target).toInt
    val queryPred = col("vec_id") < 20

    val t0 = System.nanoTime()
    val oneShotRows = Similarity.ivfTopK(emb, queryPred, k = 3,
      nCells = nCells, nprobe = 2).count()
    val oneShotSec = (System.nanoTime() - t0) / 1e9

    val idx = SessionTemp.dir("ann_scale_idx_")
    val t1 = System.nanoTime()
    Similarity.buildIvfIndex(emb, idx, "annbench", nCells = nCells)
    val buildSec = (System.nanoTime() - t1) / 1e9

    val q = emb.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val t2 = System.nanoTime()
    val probeRows = Similarity.probeIvfIndex(spark, idx, q, k = 3,
      nprobe = 2).count()
    val probeSec = (System.nanoTime() - t2) / 1e9
    require(probeRows == oneShotRows,
      s"probe row count $probeRows != one-shot $oneShotRows")

    println(f"""{"vectors":$n,"n_cells":$nCells,"oneshot_sec":$oneShotSec%.2f,"build_sec":$buildSec%.2f,"probe_sec":$probeSec%.2f,"topk_rows":$probeRows}""")
    spark.stop()
  }
}
